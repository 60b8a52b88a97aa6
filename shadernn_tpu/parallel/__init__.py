from shadernn_tpu.parallel.mesh import make_mesh  # noqa: F401
from shadernn_tpu.parallel.sharding import shard_compiled, sharding_plan  # noqa: F401
