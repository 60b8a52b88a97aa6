from shadernn_tpu.graph.ir import Graph, Node, TensorSpec, Transform  # noqa: F401
