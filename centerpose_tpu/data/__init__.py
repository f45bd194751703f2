from centerpose_tpu.data.encode import encode_example  # noqa: F401
