"""HiFi-GAN vocoder inference: mel npy files -> wav, with RTF report.

CLI parity: /root/reference/kantts/bin/infer_hifigan.py:66-139 — loads the
generator from a checkpoint, folds weight norm (the remove_weight_norm
analogue), binarizes NSF uv, runs per-mel synthesis (+PQMF if multiband),
writes PCM16 wavs and logs the real-time factor.
"""

from __future__ import annotations

import argparse
import glob
import logging
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from kantts_tpu.infer.chunked import make_chunked_infer
from kantts_tpu.models.builder import _tuplify
from kantts_tpu.models.hifigan.generator import Generator
from kantts_tpu.models.hifigan.layers import fold_weight_norm
from kantts_tpu.models.pqmf import PQMF
from kantts_tpu.utils.audio import save_wav
from kantts_tpu.utils.config import load_yaml

logging.basicConfig(
    format="%(asctime)s, %(levelname)-4s [%(filename)s:%(lineno)d] %(message)s",
    datefmt="%Y-%m-%d:%H:%M:%S",
    level=logging.INFO,
)


def binarize(mel, threshold=0.6):
    """Binarize the NSF uv channel (reference infer_hifigan.py:56-63)."""
    res_mel = mel.copy()
    res_mel[:, -1] = np.where(mel[:, -1] < threshold, 0.0, 1.0)
    return res_mel


def load_model(ckpt_path, config=None, quant=False):
    if config is None:
        config = load_yaml(os.path.join(
            os.path.dirname(os.path.dirname(ckpt_path)), "config.yaml"))
    gen_cfg = dict(config["Model"]["Generator"]["params"])
    gen_kwargs = _tuplify(gen_cfg)
    gen_kwargs["nsf_params"] = gen_cfg.get("nsf_params")
    if quant:  # serving-time int8 W8A8 on the same f32 checkpoint
        gen_kwargs["quant"] = True
    model = Generator(**gen_kwargs)
    with open(ckpt_path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    params = fold_weight_norm(payload["model"]["generator"])
    pqmf = None
    if gen_cfg.get("out_channels", 1) > 1:
        pqmf = PQMF(subbands=gen_cfg["out_channels"])
    return model, {"params": params}, pqmf, config


def hifigan_infer(input_mel, ckpt_path, output_dir, config=None,
                  frame_bucket: int = 100, chunked: int = 0, batch: int = 1,
                  int8: bool = False):
    model, variables, pqmf, config = load_model(ckpt_path, config, quant=int8)
    sampling_rate = config["audio_config"]["sampling_rate"]
    nsf_enable = config["Model"]["Generator"]["params"].get("nsf_params") is not None
    os.makedirs(output_dir, exist_ok=True)

    if os.path.isdir(input_mel):
        mel_files = sorted(glob.glob(os.path.join(input_mel, "*.npy")))
    else:
        with open(input_mel) as f:
            mel_files = [line.strip() for line in f if line.strip()]

    rng = jax.random.PRNGKey(0)

    if batch > 1:
        if chunked:
            raise SystemExit("--chunked (single-utterance latency) and "
                             "--batch (cross-utterance throughput) are "
                             "mutually exclusive")
        return _hifigan_infer_batched(
            model, variables, pqmf, mel_files, output_dir, sampling_rate,
            nsf_enable, frame_bucket, batch, rng)

    if chunked:
        # latency-optimized single-utterance path (infer/chunked.py):
        # exact for causal fullband generators (incl. NSF — the source is
        # computed once per utterance and windowed alongside the mel).
        if pqmf is not None or not model.causal:
            raise SystemExit(
                "--chunked requires a causal, fullband generator")
        if int8:
            raise SystemExit(
                "--chunked and --int8 are mutually exclusive: chunked "
                "inference is built on bit-exact windowing, and int8's "
                "dynamic per-example activation scales differ between a "
                "window and the full utterance")

        def synth(mel):
            fn = make_chunked_infer(model, int(mel.shape[1]), chunked)
            return fn(variables, mel, rng)
    else:
        @jax.jit
        def synth(mel):
            y = model.apply(variables, mel, rngs={"noise": rng})
            if pqmf is not None:
                y = pqmf.synthesis(y)
            return y

    total_audio, total_time = 0.0, 0.0
    for mel_file in mel_files:
        utt_id = os.path.splitext(os.path.basename(mel_file))[0]
        mel = np.load(mel_file)
        if mel.shape[0] == 0:
            logging.warning("%s: empty mel, skipping", utt_id)
            continue
        if nsf_enable:
            mel = binarize(mel)
        frames = mel.shape[0]
        # pad frames to a bucket so a few compilations serve all utterances
        L = int(np.ceil(frames / frame_bucket) * frame_bucket)
        mel_in = np.pad(mel, [(0, L - frames), (0, 0)]).astype(np.float32)[None]

        start = time.time()
        y = synth(jnp.asarray(mel_in))
        hop = y.shape[1] // L  # y is (B, samples, 1) after PQMF synthesis
        wav = np.asarray(y)[0, :, 0]
        elapsed = time.time() - start

        valid_samples = frames * hop
        wav = wav[:valid_samples]
        save_wav(wav, os.path.join(output_dir, f"{utt_id}.wav"), sampling_rate)

        audio_secs = valid_samples / sampling_rate
        total_audio += audio_secs
        total_time += elapsed
        logging.info("%s: %.2fs audio in %.3fs (RTF %.4f)", utt_id,
                     audio_secs, elapsed, elapsed / max(audio_secs, 1e-9))

    if total_audio > 0:
        logging.info("Finished: total RTF = %.5f (%.1fx realtime)",
                     total_time / total_audio, total_audio / max(total_time, 1e-9))


def _hifigan_infer_batched(model, variables, pqmf, mel_files, output_dir,
                           sampling_rate, nsf_enable, frame_bucket, batch,
                           rng):
    """Cross-utterance batched synthesis: utterances grouped by padded frame
    bucket, ``batch`` per jitted call (batch dim padded repeat-last so one
    program serves every group of a bucket).

    Exactly as accurate as the existing B=1 bucket padding — batch items
    never interact in the conv stacks, and each item's end-padding is the
    same zeros the single path applies. Pure throughput lever for offline
    corpus synthesis (the vocoder's MXU occupancy climbs with batch:
    PERFORMANCE.md B-sweep, 2.5% MFU at B=1 -> 27% at B=64)."""

    @jax.jit
    def synth(mel):
        y = model.apply(variables, mel, rngs={"noise": rng})
        if pqmf is not None:
            y = pqmf.synthesis(y)
        return y

    items = []
    for mel_file in mel_files:
        utt_id = os.path.splitext(os.path.basename(mel_file))[0]
        mel = np.load(mel_file)
        if mel.shape[0] == 0:
            logging.warning("%s: empty mel, skipping", utt_id)
            continue
        if nsf_enable:
            mel = binarize(mel)
        items.append((utt_id, mel))

    # sort by length so groups share a bucket; a few programs serve all
    items.sort(key=lambda it: -it[1].shape[0])
    total_audio, total_time = 0.0, 0.0
    for g0 in range(0, len(items), batch):
        group = items[g0 : g0 + batch]
        L = int(np.ceil(group[0][1].shape[0] / frame_bucket) * frame_bucket)
        mel_in = np.stack(
            [np.pad(m, [(0, L - m.shape[0]), (0, 0)]).astype(np.float32)
             for _, m in group]
            + [np.zeros((L, group[0][1].shape[1]), dtype=np.float32)]
            * (batch - len(group)))
        start = time.time()
        y = np.asarray(synth(jnp.asarray(mel_in)))
        elapsed = time.time() - start
        hop = y.shape[1] // L
        for (utt_id, mel), wav in zip(group, y):
            valid_samples = mel.shape[0] * hop
            save_wav(wav[:valid_samples, 0],
                     os.path.join(output_dir, f"{utt_id}.wav"), sampling_rate)
            total_audio += valid_samples / sampling_rate
        total_time += elapsed
        logging.info("batch of %d (bucket %d): %.3fs", len(group), L, elapsed)
    if total_audio > 0:
        logging.info("Finished: total RTF = %.5f (%.1fx realtime)",
                     total_time / total_audio,
                     total_audio / max(total_time, 1e-9))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--input_mel", type=str, required=True,
                        help="directory of mel npys or a list file")
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--chunked", type=int, default=0, metavar="N",
                        help="split each utterance into N causal-context "
                             "windows synthesized as one batch — lower "
                             "latency at identical output (causal non-NSF "
                             "fullband generators only)")
    parser.add_argument("--batch", type=int, default=1, metavar="B",
                        help="cross-utterance batched synthesis: utterances "
                             "per jitted call (offline throughput; exact)")
    parser.add_argument("--int8", action="store_true",
                        help="int8 W8A8 on the interior conv stacks (same "
                             "f32 checkpoint; 2x MXU rate, quality delta "
                             "reported by tools/quant_report.py)")
    args = parser.parse_args()
    hifigan_infer(args.input_mel, args.ckpt, args.output_dir,
                  chunked=args.chunked, batch=args.batch, int8=args.int8)


if __name__ == "__main__":
    main()
