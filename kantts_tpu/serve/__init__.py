from kantts_tpu.serve.service import TTSService  # noqa: F401
from kantts_tpu.serve.server import make_http_server, wav_bytes  # noqa: F401
