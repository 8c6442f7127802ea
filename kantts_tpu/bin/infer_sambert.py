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
    feats = ling_unit.encode_symbol_sequence(symbol_seq)
    n_ling = 1 if ling_unit.using_byte() else 4
    r = model.config["outputs_per_step"]

    # drop trailing EOS from model inputs (reference [:, :-1])
    n = len(feats[0]) - 1
    L_in = int(np.ceil(max(n, 1) / input_bucket) * input_bucket)

    def pad_track(track, pad_id):
        return np.pad(track[:-1], (0, L_in - n), constant_values=pad_id)

    types = ling_unit.lfeat_type_list
    ling = np.stack(
        [pad_track(feats[i], ling_unit.pad_id(types[i])) for i in range(n_ling)],
        axis=-1,
    )[None]
    emo = pad_track(feats[n_ling], ling_unit.pad_id(types[n_ling]))[None]
    if se is not None:
        spk = np.repeat(se.reshape(1, -1), L_in, axis=0)[None].astype(np.float32)
    else:
        spk = pad_track(feats[n_ling + 1],
                        ling_unit.pad_id(types[n_ling + 1]))[None]
    lengths = np.asarray([n], dtype=np.int32)

    max_output_len = int(np.ceil(L_in * frames_per_symbol / r) * r)
    model_key = id(model)
    _MODEL_REGISTRY[model_key] = model
    fn = _jitted_infer(model_key, max_output_len)
    res = fn(variables, jnp.asarray(ling), jnp.asarray(emo),
             jnp.asarray(spk), jnp.asarray(lengths))
    valid = int(res["LR_length_rounded"][0])
    if valid == 0:
        # degenerate duration predictions (e.g. untrained model): emit a
        # minimal non-empty mel so downstream tools stay functional
        logging.warning("predicted zero total duration; emitting %d frames", r)
        valid = r
    dec = np.asarray(res["dec_outputs"])[0, :valid]
    post = np.asarray(res["postnet_outputs"])[0, :valid]
    dur = np.floor(
        np.exp(np.asarray(res["log_duration_predictions"])[0, :n]) - 1 + 0.5
    ).astype(np.int64)
    f0 = np.asarray(res["pitch_predictions"])[0, :n]
    energy = np.asarray(res["energy_predictions"])[0, :n]
    logging.info("x_band_width:%d, h_band_width: %d",
                 int(res["x_band_width"]), int(res["h_band_width"]))
    return dec, post, dur, f0, energy


def am_infer(sentence, ckpt, output_dir, se_file=None, config=None):
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

    with open(sentence, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split("\t")
            if len(parts) < 2:
                continue
            utt_id, symbols = parts[0], parts[1]
            logging.info("Inference sentence: %s", utt_id)
            t0 = time.time()
            _, mel_post, dur, f0, energy = am_synthesis(
                symbols, model, variables, ling_unit, se=se
            )
            logging.info("synthesized %d frames in %.3fs",
                         mel_post.shape[0], time.time() - t0)
            if nsf_enable:
                mel_post = denorm_f0(mel_post, norm_type=nsf_norm_type,
                                     f0_feature=f0_feature)
            np.save(os.path.join(results_dir, f"{utt_id}_mel.npy"), mel_post)
            np.savetxt(os.path.join(results_dir, f"{utt_id}_dur.txt"), dur)
            np.savetxt(os.path.join(results_dir, f"{utt_id}_f0.txt"), f0)
            np.savetxt(os.path.join(results_dir, f"{utt_id}_energy.txt"), energy)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sentence", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--se_file", type=str, required=False)
    args = parser.parse_args()
    am_infer(args.sentence, args.ckpt, args.output_dir, args.se_file)


if __name__ == "__main__":
    main()
