from kantts_tpu.native.pitch import rapt, yin  # noqa: F401
