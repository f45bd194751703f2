from centerpose_tpu.ops import image  # noqa: F401
