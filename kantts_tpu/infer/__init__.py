from kantts_tpu.infer.streaming import stream_synthesis  # noqa: F401
