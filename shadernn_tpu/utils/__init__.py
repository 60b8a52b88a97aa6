from shadernn_tpu.utils.compile_cache import enable_compile_cache  # noqa: F401
from shadernn_tpu.utils.logging import get_logger, log_every_n_sec  # noqa: F401
from shadernn_tpu.utils.timer import ScopedTimer, Timer, TimingStats  # noqa: F401
