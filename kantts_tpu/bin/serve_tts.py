"""Online TTS server CLI: dynamic-batching HTTP synthesis over one chip.

The online counterpart of the reference's offline text_to_wav pipeline
(reference kantts/bin/text_to_wav.py:73-117): load trained AM + vocoder
checkpoints once, then serve ``POST /tts`` requests, coalescing concurrent
traffic into batched jitted calls (serve/service.py).

    kantts-serve --am_ckpt .../ckpt/checkpoint_100000.pkl \\
                 --voc_ckpt .../ckpt/checkpoint_200000.pkl \\
                 --port 8272 --max_batch 8 --max_wait_ms 20

    curl -s localhost:8272/tts -d '{"text": "ni3 hao3"}' \\
         -H 'Content-Type: application/json' > out.wav
"""

from __future__ import annotations

import argparse
import logging
import os
import signal
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from kantts_tpu.serve import TTSService, make_http_server

logging.basicConfig(
    format="%(asctime)s, %(levelname)-4s [%(filename)s:%(lineno)d] %(message)s",
    datefmt="%Y-%m-%d:%H:%M:%S",
    level=logging.INFO,
)


def main():
    parser = argparse.ArgumentParser(description="dynamic-batching TTS server")
    parser.add_argument("--am_ckpt", type=str, required=True)
    parser.add_argument("--voc_ckpt", type=str, required=True)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8272)
    parser.add_argument("--frontend", type=str, default=None,
                        help="text front-end (see kantts-text-to-wav "
                             "--frontend); default: in-tree pinyin g2p")
    parser.add_argument("--speaker", type=str, default="F7")
    parser.add_argument("--lang", type=str, default="PinYin")
    parser.add_argument("--se_file", type=str, default=None)
    parser.add_argument("--max_batch", type=int, default=8,
                        help="utterances per jitted call (the static batch "
                             "dim; see PERFORMANCE.md batch sweep)")
    parser.add_argument("--max_wait_ms", type=float, default=20.0,
                        help="batching window after the first request")
    parser.add_argument("--int8", action="store_true",
                        help="serve the vocoder with int8 W8A8 interior "
                             "convs (same checkpoint; see infer_hifigan "
                             "--int8)")
    parser.add_argument("--warmup_text", type=str, default=None,
                        help="synthesize this text once before binding the "
                             "port, so the first live request skips the "
                             "cold compile (e.g. 'ni3 hao3')")
    args = parser.parse_args()

    service = TTSService.from_checkpoints(
        args.am_ckpt, args.voc_ckpt, frontend=args.frontend,
        se_file=args.se_file, max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms, int8=args.int8)
    # the service's speaker/lang tags feed the default front-end
    service.speaker, service.lang = args.speaker, args.lang

    if args.warmup_text:
        logging.info("warmup: synthesizing %r ...", args.warmup_text)
        dt = service.warmup(args.warmup_text)
        logging.info("warmup done in %.1fs (programs compiled)", dt)

    httpd = make_http_server(service, args.host, args.port)
    logging.info("serving on http://%s:%d (POST /tts, POST /tts/stream, "
                 "GET /healthz); max_batch=%d window=%.0fms", args.host,
                 args.port, args.max_batch, args.max_wait_ms)
    # SIGTERM (the orchestrator's stop signal) drains like Ctrl-C: stop
    # accepting, finish in-flight batches, exit 0. shutdown() must run off
    # the serve_forever thread, hence the helper thread.
    signal.signal(signal.SIGTERM, lambda *_: threading.Thread(
        target=httpd.shutdown, daemon=True).start())
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        service.close()
        logging.info("drained and stopped")


if __name__ == "__main__":
    main()
