"""End-of-run quality evaluation for the sustained-training runs
(tools/bench_sustained.py): load the final checkpoint, synthesize the
held-out validation utterances, and report MCD vs target — the quality half
of the long-run evidence (step-time/memory stability is bench_sustained's
half).

- sambert: free-running autoregressive synthesis from the am_valid.lst
  symbol strings; DTW MCD between the predicted postnet mel and the target
  mel (both in the training-normalized domain — the same convention as
  tools/cross_stack_parity.py). Optionally vocodes the predicted mels with
  --voc-ckpt into eval wavs (full text->wav on the sustained checkpoints).
- hifigan: copy synthesis of the valid.lst utterances' ground-truth mels;
  MCD between generated and ground-truth waveforms via the framework mel
  front-end, plus waveform log-mel L1.

Usage:
  python tools/sustained_quality.py --model sambert \
      --stage /tmp/kantts_sustained_sambert --corpus /tmp/kantts_corpus_speech
  python tools/sustained_quality.py --model hifigan \
      --stage /tmp/kantts_sustained_hifigan --corpus /tmp/kantts_corpus_speech

Writes tools/sustained_quality_<model>.json and eval wavs/mels under
<stage>/eval_final/.
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def last_checkpoint(stage, at_steps=None):
    """Newest checkpoint in the stage, or the exact one at ``at_steps``
    (trend evaluation over retained checkpoints)."""
    ckpt_dir = os.path.join(stage, "ckpt")
    ckpts = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("checkpoint_") and name.endswith(".ckpt"):
            ckpts.append((int(name[len("checkpoint_"):-len(".ckpt")]), name))
    if not ckpts:
        raise SystemExit(f"no checkpoints in {ckpt_dir}")
    if at_steps is not None:
        match = [c for c in ckpts if c[0] == at_steps]
        if not match:
            raise SystemExit(f"no checkpoint at step {at_steps} in {ckpt_dir} "
                             f"(have {sorted(s for s, _ in ckpts)})")
        ckpts = match
    steps, name = max(ckpts)
    return os.path.join(ckpt_dir, name), steps


def _identity_fields(args):
    """Corpus/config/eval-set identity: what made the round-4 cross-
    checkpoint MCD comparisons unreadable was that n/corpus/eval-set
    changed silently between records. Every quality JSON now carries
    enough identity to judge comparability."""
    import hashlib

    corpus_meta = os.path.join(args.corpus, "raw_metafile.txt")
    n_corpus = None
    if os.path.exists(corpus_meta):
        with open(corpus_meta) as f:
            n_corpus = sum(1 for ln in f if ln.strip())
    cfg_path = os.path.join(args.stage, "config.yaml")
    cfg_hash = None
    if os.path.exists(cfg_path):
        cfg_hash = hashlib.sha256(open(cfg_path, "rb").read()).hexdigest()[:12]
    return {
        "corpus": os.path.abspath(args.corpus),
        "corpus_n_utts": n_corpus,
        "stage_config_sha": cfg_hash,
        "eval_n_requested": args.n,
        "eval_protocol": "first-n of am_valid/valid.lst, fixed order, v1",
    }


def read_valid_utts(corpus, name):
    path = os.path.join(corpus, name)
    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f if ln.strip()]
    return lines


def _teacher_forced_eval(args, model, variables, cfg):
    """Teacher-forced forward on the validation batch: same-grid MCD vs
    target, plus — when the config is MAS — how well the in-graph Viterbi
    recovered the corpus's GROUND-TRUTH alignment (gen_corpus writes the true
    per-phone durations; the MAS config never sees them)."""
    from kantts_tpu.data import DataLoader, DistributedSampler, get_am_datasets
    from kantts_tpu.utils.metrics import mel_cepstral_distortion

    _, valid_ds = get_am_datasets(
        [os.path.join(args.corpus, "raw_metafile.txt")], args.corpus, cfg,
        False, se_enable=False,
        input_bucket=int(cfg.get("input_bucket", 16)),
        frame_bucket=int(cfg.get("frame_bucket", 96)),
    )
    n = min(args.n, len(valid_ds))
    loader = DataLoader(
        valid_ds, n,
        sampler=DistributedSampler(len(valid_ds), 1, 0, shuffle=False),
        drop_last=False,
    )
    batch = next(iter(loader))
    utts = [os.path.splitext(os.path.basename(valid_ds.meta[i][1]))[0]
            for i in range(n)]
    import jax.numpy as jnp

    res = model.apply(
        {"params": variables["params"]},
        jnp.asarray(batch["input_lings"]),
        jnp.asarray(batch["input_emotions"]),
        jnp.asarray(batch["input_speakers"]),
        jnp.asarray(batch["valid_input_lengths"]),
        jnp.asarray(batch["valid_output_lengths"]),
        jnp.asarray(batch["mel_targets"]),
        duration_targets=(jnp.asarray(batch["durations"])
                          if batch.get("durations") is not None else None),
        pitch_targets=jnp.asarray(batch["pitch_contours"]),
        energy_targets=jnp.asarray(batch["energy_contours"]),
        attn_priors=(jnp.asarray(batch["attn_priors"])
                     if batch.get("attn_priors") is not None else None),
        deterministic=True,
    )
    post = np.asarray(res["postnet_outputs"])
    tgt = np.asarray(batch["mel_targets"])
    out_lens = np.asarray(batch["valid_output_lengths"])
    mcd_tf = [mel_cepstral_distortion(post[i, :out_lens[i]],
                                      tgt[i, :out_lens[i]], use_dtw=False)
              for i in range(n)]
    report = {
        "mcd_teacher_forced_vs_target_db": round(float(np.mean(mcd_tf)), 3),
    }

    if cfg["Model"]["KanTtsSAMBERT"]["params"].get("MAS", False):
        mas_dur = np.asarray(res["duration_targets"])
        in_lens = np.asarray(batch["valid_input_lengths"])
        l1, exact, tot = 0.0, 0, 0
        for i, utt in enumerate(utts):
            gt = np.load(os.path.join(args.corpus, "duration", f"{utt}.npy"))
            m = min(int(in_lens[i]), len(gt))
            d = mas_dur[i, :m].astype(np.int64)
            l1 += float(np.abs(d - gt[:m]).sum())
            exact += int((d == gt[:m]).sum())
            tot += m
        report.update(
            mas_vs_ground_truth_duration_l1_frames_per_phone=round(l1 / tot, 3),
            mas_vs_ground_truth_duration_exact_match=round(exact / tot, 4),
        )
    return report


def eval_sambert(args):
    from kantts_tpu.bin.infer_sambert import (am_synthesis_batch,
                                              load_am_checkpoint)
    from kantts_tpu.utils.metrics import mel_cepstral_distortion

    ckpt, steps = last_checkpoint(args.stage, args.ckpt_steps)
    model, variables, ling_unit, cfg = load_am_checkpoint(ckpt)
    lines = read_valid_utts(args.corpus, "am_valid.lst")[: args.n]
    utts = [ln.split("\t")[0] for ln in lines]
    symbol_seqs = [ln.split("\t")[1] for ln in lines]

    outs = am_synthesis_batch(symbol_seqs, model, variables, ling_unit)
    out_dir = os.path.join(args.stage, "eval_final")
    os.makedirs(out_dir, exist_ok=True)

    mcds, len_ratio = [], []
    for utt, (dec, post, dur, f0, energy) in zip(utts, outs):
        tgt = np.load(os.path.join(args.corpus, "mel", f"{utt}.npy"))
        n_mels = tgt.shape[1]
        pred = np.asarray(post)[:, :n_mels]  # NSF configs append f0/uv channels
        mcds.append(mel_cepstral_distortion(pred, tgt, use_dtw=True))
        len_ratio.append(pred.shape[0] / tgt.shape[0])
        np.save(os.path.join(out_dir, f"{utt}_mel.npy"), np.asarray(post))

    report = {
        "model": "sambert",
        "checkpoint_steps": steps,
        "n_valid_utts": len(utts),
        "eval_utts": utts,
        **_identity_fields(args),
        "mcd_free_running_vs_target_db": round(float(np.mean(mcds)), 3),
        "mcd_per_utt_db": [round(float(m), 3) for m in mcds],
        "predicted_over_target_length": round(float(np.mean(len_ratio)), 3),
    }
    report.update(_teacher_forced_eval(args, model, variables, cfg))

    if args.voc_ckpt:  # full text->wav eval wavs on the sustained checkpoints
        from kantts_tpu.bin.infer_hifigan import hifigan_infer

        mel_list = os.path.join(out_dir, "mels.lst")
        with open(mel_list, "w") as f:
            for utt in utts:
                f.write(os.path.join(out_dir, f"{utt}_mel.npy") + "\n")
        hifigan_infer(mel_list, args.voc_ckpt, out_dir)
        report["eval_wavs"] = sorted(
            n for n in os.listdir(out_dir) if n.endswith(".wav"))
    return report


def eval_hifigan(args):
    from kantts_tpu.bin.infer_hifigan import hifigan_infer
    from kantts_tpu.utils.audio import read_wav
    from kantts_tpu.utils.metrics import mcd_between_wavs

    ckpt, steps = last_checkpoint(args.stage, args.ckpt_steps)
    lines = read_valid_utts(args.corpus, "valid.lst")[: args.n]
    utts = [os.path.splitext(os.path.basename(ln.split("\t")[0]))[0]
            for ln in lines]

    out_dir = os.path.join(args.stage, "eval_final")
    os.makedirs(out_dir, exist_ok=True)
    mel_list = os.path.join(out_dir, "mels.lst")
    with open(mel_list, "w") as f:
        for utt in utts:
            f.write(os.path.join(args.corpus, "mel", f"{utt}.npy") + "\n")
    hifigan_infer(mel_list, ckpt, out_dir)

    import yaml

    sr = yaml.safe_load(open(os.path.join(
        args.corpus, "audio_config.yaml")))["audio_config"]["sampling_rate"]
    mcds, lmel_l1 = [], []
    for utt in utts:
        _, gen = read_wav(os.path.join(out_dir, f"{utt}.wav"))
        _, ref = read_wav(os.path.join(args.corpus, "wav", f"{utt}.wav"))
        n = min(len(gen), len(ref))
        mcds.append(mcd_between_wavs(gen[:n], ref[:n], sr))
        lmel_l1.append(_logmel_l1(gen[:n], ref[:n], sr))

    return {
        "model": "hifigan",
        "checkpoint_steps": steps,
        "n_valid_utts": len(utts),
        "eval_utts": utts,
        **_identity_fields(args),
        "mcd_copy_synthesis_vs_target_db": round(float(np.mean(mcds)), 3),
        "mcd_per_utt_db": [round(float(m), 3) for m in mcds],
        "logmel_l1_vs_target": round(float(np.mean(lmel_l1)), 4),
        "eval_wavs": sorted(
            n for n in os.listdir(out_dir) if n.endswith(".wav")),
    }


def _logmel_l1(a, b, sr, n_fft=1024, hop=256, n_mels=80):
    import jax.numpy as jnp

    from kantts_tpu.dsp.mel import mel_filterbank
    from kantts_tpu.dsp.stft import stft_magnitude

    fb = mel_filterbank(sr, n_fft, n_mels, 0.0, sr / 2)

    def lm(w):
        mag = np.asarray(stft_magnitude(
            jnp.asarray(w.astype(np.float32)), n_fft, hop, n_fft))
        return np.log(np.maximum(mag @ fb.T, 1e-5))

    la, lb = lm(a), lm(b)
    n = min(len(la), len(lb))
    return float(np.abs(la[:n] - lb[:n]).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["sambert", "hifigan"], required=True)
    ap.add_argument("--stage", required=True)
    ap.add_argument("--corpus", default="/tmp/kantts_corpus_speech")
    ap.add_argument("--n", type=int, default=6,
                    help="validation utterances to evaluate")
    ap.add_argument("--voc-ckpt", default=None,
                    help="(sambert) vocoder checkpoint for eval wavs")
    ap.add_argument("--ckpt-steps", type=int, default=None,
                    help="evaluate the checkpoint at this exact step "
                         "(default: the newest) — trend evaluation")
    ap.add_argument("--out-suffix", default="",
                    help="suffix for the output JSON name (trend records)")
    args = ap.parse_args()

    report = eval_sambert(args) if args.model == "sambert" else eval_hifigan(args)
    out = os.path.join(REPO, "tools",
                       f"sustained_quality_{args.model}{args.out_suffix}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps(report, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
