from kantts_tpu.infer.chunked import make_chunked_infer  # noqa: F401
from kantts_tpu.infer.e2e import make_fused_infer  # noqa: F401
from kantts_tpu.infer.exported import ExportedTTS, export_fused_tts  # noqa: F401
from kantts_tpu.infer.streaming import stream_synthesis  # noqa: F401
