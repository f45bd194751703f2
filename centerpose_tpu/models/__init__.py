from centerpose_tpu.models.factory import create_model, MODEL_FACTORY  # noqa: F401
