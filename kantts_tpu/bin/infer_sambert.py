"""SAM-BERT acoustic inference: symbol sequences -> mel (+dur/f0/energy).

CLI parity: /root/reference/kantts/bin/infer_sambert.py:156-227 — per line of
the sentence file, write {utt}_mel.npy + dur/f0/energy txt; NSF checkpoints
get their last two mel channels f0-denormalized (:26-56).

TPU-native: the whole acoustic forward (encoder, AR duration scan, length
regulation, PNCA decode scan, postnet) is ONE jitted program per input
bucket; utterances are padded to bucketed lengths so a few compilations
serve any corpus.
"""

from __future__ import annotations

import argparse
import functools
import logging
import os
import sys
import time

import jax.numpy as jnp
import numpy as np
from flax import serialization

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT, sambert_infer
from kantts_tpu.text.ling_unit import KanTtsLinguisticUnit
from kantts_tpu.utils.config import load_yaml

logging.basicConfig(
    format="%(asctime)s, %(levelname)-4s [%(filename)s:%(lineno)d] %(message)s",
    datefmt="%Y-%m-%d:%H:%M:%S",
    level=logging.INFO,
)


def denorm_f0(mel, f0_threshold=30, uv_threshold=0.6, norm_type="mean_std",
              f0_feature=None):
    """De-normalize the NSF f0/uv channels appended to the mel
    (reference infer_sambert.py:26-56)."""
    f0 = mel[:, -2]
    uv = mel[:, -1]
    uv = np.where(uv < uv_threshold, 0.0, 1.0)
    if norm_type == "mean_std":
        f0_mvn = f0_feature
        f0 = f0 * f0_mvn[1:, :].squeeze() + f0_mvn[0:1, :].squeeze()
    else:  # global
        f0_max, f0_min = f0_feature
        f0 = f0 * (f0_max - f0_min) + f0_min
    f0 = np.maximum(f0, f0_threshold)
    mel[:, -2] = f0
    mel[:, -1] = uv
    return mel


def load_am_checkpoint(ckpt: str, config_path: str | None = None):
    if config_path is None:
        config_path = os.path.join(os.path.dirname(os.path.dirname(ckpt)),
                                   "config.yaml")
    config = load_yaml(config_path)
    ling_unit = KanTtsLinguisticUnit(config)
    config["Model"]["KanTtsSAMBERT"]["params"].update(ling_unit.get_unit_size())
    with open(ckpt, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    params = payload["model"]
    model = KanTtsSAMBERT(config["Model"]["KanTtsSAMBERT"]["params"])
    return model, {"params": params}, ling_unit, config


@functools.lru_cache(maxsize=16)
def _jitted_infer(model_key, max_output_len):
    """One compiled program per (model, output budget); input length buckets
    re-trace automatically through jit's shape cache."""
    import jax

    model = _MODEL_REGISTRY[model_key]

    @jax.jit
    def fn(variables, ling, emo, spk, lengths):
        return sambert_infer(model, variables, ling, emo, spk, lengths,
                             max_output_len=max_output_len)

    return fn


_MODEL_REGISTRY = {}


def am_synthesis(symbol_seq, model, variables, ling_unit, se=None,
                 input_bucket=32, frames_per_symbol=24):
    """One utterance: encode symbols and run the jitted acoustic forward
    (reference am_synthesis, infer_sambert.py:58-153)."""
    return am_synthesis_batch([symbol_seq], model, variables, ling_unit,
                              se=se, input_bucket=input_bucket,
                              frames_per_symbol=frames_per_symbol)[0]


def am_synthesis_batch(symbol_seqs, model, variables, ling_unit, se=None,
                       input_bucket=32, frames_per_symbol=24,
                       batch_pad_to=None):
    """A group of utterances through ONE jitted acoustic forward.

    TPU-native throughput lever the reference's per-utterance loop
    (reference infer_sambert.py:156-227) cannot express: utterances pad to
    the group's common symbol bucket and the batch dim pads to
    ``batch_pad_to`` (repeat-last), so one compiled program serves every
    group of a bucket. Per-item PNCA band widths (sambert.py) guarantee each
    utterance decodes under exactly the mask its own B=1 run would use —
    batch composition cannot change synthesis output.

    Returns a list of (dec_mel, postnet_mel, durations, f0, energy), one per
    input utterance.
    """
    from kantts_tpu.infer.exported import encode_symbol_inputs

    n_ling = 1 if ling_unit.using_byte() else 4
    r = model.config["outputs_per_step"]
    n_real = len(symbol_seqs)

    # common symbol bucket over the group (drop trailing EOS: reference [:, :-1])
    ns = [len(ling_unit.encode_symbol_sequence(s)[0]) - 1 for s in symbol_seqs]
    L_in = int(np.ceil(max(max(ns), 1) / input_bucket) * input_bucket)
    parts = [encode_symbol_inputs(ling_unit, s, L_in, n_ling, se=se)
             for s in symbol_seqs]
    while len(parts) < (batch_pad_to or 0):  # fixed B per compiled program
        parts.append(parts[-1])
    ling, emo, spk, lengths = (np.concatenate([p[i] for p in parts])
                               for i in range(4))

    max_output_len = int(np.ceil(L_in * frames_per_symbol / r) * r)
    model_key = id(model)
    _MODEL_REGISTRY[model_key] = model
    fn = _jitted_infer(model_key, max_output_len)
    res = fn(variables, jnp.asarray(ling), jnp.asarray(emo),
             jnp.asarray(spk), jnp.asarray(lengths))

    valid_all = np.asarray(res["LR_length_rounded"])
    dec_all = np.asarray(res["dec_outputs"])
    post_all = np.asarray(res["postnet_outputs"])
    dur_all = np.floor(
        np.exp(np.asarray(res["log_duration_predictions"])) - 1 + 0.5
    ).astype(np.int64)
    f0_all = np.asarray(res["pitch_predictions"])
    energy_all = np.asarray(res["energy_predictions"])
    bw = np.atleast_1d(np.asarray(res["x_band_width"]))

    outs = []
    for i in range(n_real):
        valid = int(valid_all[i])
        if valid == 0:
            # degenerate duration predictions (e.g. untrained model): emit a
            # minimal non-empty mel so downstream tools stay functional
            logging.warning("predicted zero total duration; emitting %d frames",
                            r)
            valid = r
        n = ns[i]
        logging.info("x_band_width:%d, h_band_width: %d",
                     int(bw[min(i, len(bw) - 1)]), int(bw[min(i, len(bw) - 1)]))
        outs.append((dec_all[i, :valid], post_all[i, :valid], dur_all[i, :n],
                     f0_all[i, :n], energy_all[i, :n]))
    return outs


def am_infer(sentence, ckpt, output_dir, se_file=None, config=None, batch=1):
    model, variables, ling_unit, cfg = load_am_checkpoint(ckpt, config)
    params_cfg = cfg["Model"]["KanTtsSAMBERT"]["params"]

    se_enable = params_cfg.get("SE", False)
    se = np.load(se_file) if se_enable and se_file else None

    nsf_enable = params_cfg.get("NSF", False)
    f0_feature, nsf_norm_type = None, "mean_std"
    if nsf_enable:
        nsf_norm_type = params_cfg.get("nsf_norm_type", "mean_std")
        if nsf_norm_type == "mean_std":
            f0_feature = np.load(os.path.join(
                os.path.dirname(os.path.dirname(ckpt)), "mvn.npy"))
        else:
            f0_feature = [params_cfg.get("nsf_f0_global_maximum", 730.0),
                          params_cfg.get("nsf_f0_global_minimum", 30.0)]

    results_dir = os.path.join(output_dir, "feat")
    os.makedirs(results_dir, exist_ok=True)

    utts = []
    with open(sentence, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split("\t")
            if len(parts) >= 2:
                utts.append((parts[0], parts[1]))

    def write_outputs(utt_id, mel_post, dur, f0, energy):
        if nsf_enable:
            mel_post = denorm_f0(mel_post, norm_type=nsf_norm_type,
                                 f0_feature=f0_feature)
        np.save(os.path.join(results_dir, f"{utt_id}_mel.npy"), mel_post)
        np.savetxt(os.path.join(results_dir, f"{utt_id}_dur.txt"), dur)
        np.savetxt(os.path.join(results_dir, f"{utt_id}_f0.txt"), f0)
        np.savetxt(os.path.join(results_dir, f"{utt_id}_energy.txt"), energy)

    if batch <= 1:
        for utt_id, symbols in utts:
            logging.info("Inference sentence: %s", utt_id)
            t0 = time.time()
            _, mel_post, dur, f0, energy = am_synthesis(
                symbols, model, variables, ling_unit, se=se
            )
            logging.info("synthesized %d frames in %.3fs",
                         mel_post.shape[0], time.time() - t0)
            write_outputs(utt_id, mel_post, dur, f0, energy)
        return

    # batched mode: sort by symbol count so groups share a bucket (one
    # compiled program per (bucket, batch)), then synthesize each group in
    # one jitted call — ~3x mel frames/s at batch 8 (PERFORMANCE.md sweep)
    order = sorted(range(len(utts)), key=lambda i: -len(utts[i][1]))
    for g0 in range(0, len(order), batch):
        group = order[g0 : g0 + batch]
        t0 = time.time()
        results = am_synthesis_batch(
            [utts[i][1] for i in group], model, variables, ling_unit, se=se,
            batch_pad_to=batch,
        )
        n_frames = sum(r[1].shape[0] for r in results)
        logging.info("batch of %d: %d frames in %.3fs", len(group), n_frames,
                     time.time() - t0)
        for i, (_, mel_post, dur, f0, energy) in zip(group, results):
            write_outputs(utts[i][0], mel_post, dur, f0, energy)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sentence", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--se_file", type=str, required=False)
    parser.add_argument("--batch", type=int, default=1,
                        help="utterances per jitted call (batched acoustic "
                             "inference; ~3x throughput at 8)")
    args = parser.parse_args()
    am_infer(args.sentence, args.ckpt, args.output_dir, args.se_file,
             batch=args.batch)


if __name__ == "__main__":
    main()
