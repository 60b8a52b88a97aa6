from shadernn_tpu.models.zoo import build_model, list_models  # noqa: F401
