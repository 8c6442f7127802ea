"""Export / run TTS serving artifacts (jax.export StableHLO programs).

``kantts-export export``: package an AM + vocoder checkpoint pair as an
ahead-of-time exported fused text-to-wav program (see infer/exported.py).
``kantts-export synth``: synthesize from an artifact — the serving-side
path: no model classes, no config plumbing, just the compiled program.

Capability parity: the deployment story of the reference's modelscope
pipeline around /root/reference/kantts/bin/text_to_wav.py:71-117, re-shaped
for TPU serving (the deployable unit is the compiled program, not Python
model code).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

logging.basicConfig(
    format="%(asctime)s, %(levelname)-4s [%(filename)s:%(lineno)d] %(message)s",
    datefmt="%Y-%m-%d:%H:%M:%S",
    level=logging.INFO,
)


def main():
    parser = argparse.ArgumentParser(description="TTS serving artifacts")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_exp = sub.add_parser("export", help="checkpoints -> serving artifact")
    p_exp.add_argument("--am_ckpt", required=True)
    p_exp.add_argument("--voc_ckpt", required=True)
    p_exp.add_argument("--output_dir", required=True)
    p_exp.add_argument("--max_input_len", type=int, default=96,
                       help="static symbol budget (inputs pad to it)")
    p_exp.add_argument("--max_output_len", type=int, default=None,
                       help="static mel budget (default: 24 frames/symbol)")
    p_exp.add_argument("--chunked", type=int, default=0, metavar="N",
                       help="chunked-batch vocoder epilogue (causal fullband)")
    p_exp.add_argument("--int8", action="store_true",
                       help="bake int8 W8A8 interior vocoder convs into the "
                            "artifact (same checkpoint; see infer_hifigan "
                            "--int8)")
    p_exp.add_argument("--platforms", default="cpu,tpu",
                       help="comma-separated lowering targets")

    p_syn = sub.add_parser("synth", help="artifact + symbols -> wavs")
    p_syn.add_argument("--artifact", required=True)
    p_syn.add_argument("--symbols_file", required=True,
                       help="utt\\tsymbol-sequence lines (metafile format)")
    p_syn.add_argument("--output_dir", required=True)
    p_syn.add_argument("--se_file", default=None,
                       help="speaker d-vector .npy for SE artifacts")

    args = parser.parse_args()
    if args.cmd == "export":
        from kantts_tpu.infer.exported import export_fused_tts

        meta = export_fused_tts(
            args.am_ckpt, args.voc_ckpt, args.output_dir,
            max_input_len=args.max_input_len,
            max_output_len=args.max_output_len,
            n_chunks=args.chunked,
            platforms=tuple(args.platforms.split(",")),
            int8=args.int8,
        )
        logging.info("Exported %s (platforms %s) to %s",
                     meta["kind"], meta["platforms"], args.output_dir)
    else:
        import time

        import numpy as np

        from kantts_tpu.infer.exported import ExportedTTS
        from kantts_tpu.utils.audio import save_wav

        tts = ExportedTTS(args.artifact)
        se = np.load(args.se_file) if args.se_file else None
        os.makedirs(args.output_dir, exist_ok=True)
        sr = tts.meta["sampling_rate"]
        with open(args.symbols_file, encoding="utf-8") as f:
            for line in f:
                if not line.strip():
                    continue
                utt_id, symbols = line.strip().split("\t", 1)
                t0 = time.time()
                wav, _ = tts.synthesize(symbols, se=se)
                dt = time.time() - t0
                save_wav(wav, os.path.join(args.output_dir, f"{utt_id}.wav"),
                         sr)
                logging.info("%s: %.2fs audio in %.3fs (%.0fx RT)", utt_id,
                             len(wav) / sr, dt, len(wav) / sr / max(dt, 1e-9))


if __name__ == "__main__":
    main()
