from shadernn_tpu.image.color import ColorFormat  # noqa: F401
from shadernn_tpu.image.image import Image  # noqa: F401
from shadernn_tpu.image.ingest import ingest_frames, make_ingest_fn  # noqa: F401
