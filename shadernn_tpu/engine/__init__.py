from shadernn_tpu.engine.compile import CompiledModel, compile_graph  # noqa: F401
from shadernn_tpu.engine.engine import Engine  # noqa: F401
from shadernn_tpu.engine.processor import InferenceProcessor  # noqa: F401
