"""Sustained-training run on the real TPU: the full trainer loop (threaded
prefetch loader, bucketed collate, atomic+async checkpoint retention, eval
artifact dumps, TensorBoard) for >=10k steps on the speech-statistics corpus
from tools/gen_corpus.py — the long-run evidence the short parity harnesses
cannot give: step-time stability, host memory growth, compile-cache churn.

Reference cadence being modeled: 1M steps of sambert (configs/
sambert_16k_MAS.yaml:85) and 2.5M of hifigan (hifigan_v1_16k.yaml:201).

The run executes as checkpoint-resumed SEGMENTS in fresh subprocesses,
aligned to the save interval. Reason: this dev box's TPU relay leaks every
host->device transfer payload as unreclaimable host RSS (platform bug,
demonstrated by tools/relay_leak_probe.py — ~the batch payload per step,
which OOM-killed the first single-process attempt at ~130 GB after 4.6k
steps). A real TPU host (direct PCIe/DMA) runs the whole schedule in one
process; here the segments keep each process under the RAM ceiling AND
exercise checkpoint-resume continuity for real. The persistent XLA compile
cache is shared across segments so only the first pays the compile storm.

Usage:
  python tools/bench_sustained.py --model sambert --steps 10000
  python tools/bench_sustained.py --model hifigan --steps 10000
Writes tools/sustained_<model>.json and prints a summary table.
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _rss_mb(pid="self"):
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024.0
    except FileNotFoundError:
        pass
    return float("nan")


def ensure_corpus(corpus_dir, n):
    if os.path.exists(os.path.join(corpus_dir, "raw_metafile.txt")):
        return
    env = dict(os.environ, JAX_PLATFORMS="cpu")  # host-side preprocessing
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_corpus.py"),
         corpus_dir, "--n", str(n)],
        check=True, env=env,
    )


def stage_config(model, total_steps, max_steps, out_path, keep_all=False,
                 n_saves=5, model_params=()):
    name = ("sambert_16k_MAS.yaml" if model == "sambert"
            else "hifigan_v1_16k.yaml")
    cfg = yaml.safe_load(open(os.path.join(REPO, "kantts_tpu/configs", name)))
    cfg.update(
        train_max_steps=max_steps,
        save_interval_steps=max(total_steps // n_saves, 1),
        eval_interval_steps=max(total_steps // 4, 1),
        log_interval_steps=100,
        keep_last_checkpoints=0 if keep_all else 3,
        async_checkpoint=True,
        num_workers=2,
        # coarse buckets: the 1.5-16 s corpus spans many default buckets and
        # every distinct shape pair costs a full remote XLA compile on this
        # box (~10 min); 64/480 bounds the program count at <~8
        input_bucket=64,
        frame_bucket=480,
    )
    if model == "sambert":
        cfg["linguistic_unit"]["speaker_list"] = "F7,F1,M2,M9"
    for kv in model_params:  # e.g. scheduled_sampling_prob=0.5
        key, val = kv.split("=", 1)
        section = (cfg["Model"]["KanTtsSAMBERT"]["params"]
                   if model == "sambert"
                   else cfg["Model"]["Generator"]["params"])
        section[key] = yaml.safe_load(val)
    with open(out_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return cfg


def latest_checkpoint(stage):
    ckpt_dir = os.path.join(stage, "ckpt")
    if not os.path.isdir(ckpt_dir):
        return None, 0
    ckpts = []
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"checkpoint[_-](\d+)\.ckpt", name)
        if m:
            ckpts.append((int(m.group(1)), name))
    if not ckpts:
        return None, 0
    steps, name = max(ckpts)
    return os.path.join(ckpt_dir, name), steps


def run_segment(model, cfg_path, corpus, stage, resume, rss_samples,
                period_s=15.0):
    cmd = [sys.executable, "-m", f"kantts_tpu.bin.train_{model}",
           "--model_config", cfg_path, "--root_dir", corpus,
           "--stage_dir", stage]
    if resume:
        cmd += ["--resume_path", resume]
        if model == "hifigan":
            # the hifigan CLI's bare --resume_path is fine-tune style
            # (weights only, mirroring the reference); segments need the
            # step counter + optimizer states back
            cmd += ["--resume_training_state"]
    env = dict(
        os.environ,
        JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, ".jax_compile_cache"),
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="2",
    )
    proc = subprocess.Popen(cmd, env=env, cwd=REPO)
    peak = 0.0
    while proc.poll() is None:
        time.sleep(period_s)
        r = _rss_mb(proc.pid)
        if np.isfinite(r):
            peak = max(peak, r)
            rss_samples.append((time.time(), r))
    if proc.returncode != 0:
        raise SystemExit(
            f"segment failed rc={proc.returncode} (cmd: {' '.join(cmd)})")
    return peak


def parse_sps(log_path):
    """steps_per_sec series from the trainer's stdout.log.

    The log APPENDS across processes, so a step range re-trained after a
    killed/abandoned segment appears more than once; keep the LAST
    occurrence per step (the surviving trajectory) and return in step
    order."""
    # value is sentence-terminated ("... = 0.419."): don't eat the final dot
    pat = re.compile(r"\(Steps: (\d+)\) steps_per_sec = ([0-9]+(?:\.[0-9]+)?)")
    by_step = {}
    with open(log_path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                by_step[int(m.group(1))] = float(m.group(2))
    return sorted(by_step.items())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["sambert", "hifigan"], required=True)
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--corpus", default="/tmp/kantts_corpus_speech")
    ap.add_argument("--n-utts", type=int, default=256)
    ap.add_argument("--stage", default=None)
    ap.add_argument("--segment-steps", type=int, default=None,
                    help="steps per process segment (default: the save "
                    "interval = steps//n-saves; must be a multiple of it so "
                    "every segment ends on a checkpoint)")
    ap.add_argument("--keep-all-ckpts", action="store_true",
                    help="retain every interval checkpoint (trend evals via "
                    "tools/quality_trend.py need them)")
    ap.add_argument("--n-saves", type=int, default=5,
                    help="number of save intervals across the run (also the "
                    "trend-eval granularity with --keep-all-ckpts)")
    ap.add_argument("--model-param", action="append", default=[],
                    metavar="KEY=VAL",
                    help="override a Model params key in the staged config "
                    "(e.g. scheduled_sampling_prob=0.5); repeatable")
    ap.add_argument("--out-suffix", default="",
                    help="suffix for the report filename (variant runs, "
                    "e.g. _ss, so they don't clobber the baseline record)")
    args = ap.parse_args()

    ensure_corpus(args.corpus, args.n_utts)
    stage = args.stage or f"/tmp/kantts_sustained_{args.model}"
    os.makedirs(stage, exist_ok=True)
    cfg_path = os.path.join(stage, "model_config.yaml")

    save_interval = max(args.steps // args.n_saves, 1)
    seg = args.segment_steps or save_interval
    if seg % save_interval:
        raise SystemExit(f"--segment-steps {seg} must be a multiple of the "
                         f"save interval {save_interval}")
    if args.steps % save_interval:
        # fail NOW, not after hours of training: a final segment boundary off
        # the save grid would end without a checkpoint to continue from
        raise SystemExit(f"--steps {args.steps} must be a multiple of the "
                         f"save interval {save_interval}")

    t0 = time.time()
    rss_samples = []
    seg_reports = []
    _, done_steps = latest_checkpoint(stage)
    while done_steps < args.steps:
        boundary = min(done_steps + seg, args.steps)
        stage_config(args.model, args.steps, boundary, cfg_path,
                     keep_all=args.keep_all_ckpts, n_saves=args.n_saves,
                     model_params=args.model_param)
        resume, at = latest_checkpoint(stage)
        t_seg = time.time()
        peak = run_segment(args.model, cfg_path, args.corpus, stage, resume,
                           rss_samples)
        ckpt, done_steps = latest_checkpoint(stage)
        if done_steps < boundary:
            raise SystemExit(f"segment ended at step {done_steps} < boundary "
                             f"{boundary}; no checkpoint to continue from")
        seg_reports.append({
            "from_step": at, "to_step": done_steps,
            "wall_s": round(time.time() - t_seg, 1),
            "rss_peak_mb": round(peak, 1),
        })
        print(f"segment {at}->{done_steps}: {seg_reports[-1]['wall_s']}s, "
              f"peak RSS {peak:.0f} MB", flush=True)
    wall = time.time() - t0

    sps = parse_sps(os.path.join(stage, "stdout.log"))
    vals = [v for _, v in sps]
    head = vals[1:11]    # steps 200-1100 (skip the compile-heavy first window)
    tail = vals[-10:]
    report = {
        "model": args.model,
        "steps": args.steps,
        "model_params": list(args.model_param),
        "corpus": args.corpus,
        "corpus_n_utts": args.n_utts,
        "wall_s": round(wall, 1),
        "segments": seg_reports,
        "steps_per_sec_series": sps,
        "sps_steps_200_1100": round(float(np.mean(head)), 3) if head else None,
        "sps_last_1000": round(float(np.mean(tail)), 3) if tail else None,
        "sps_min_after_warmup": round(min(vals[1:]), 3) if len(vals) > 1 else None,
        "sps_max": round(max(vals), 3) if vals else None,
        "rss_peak_mb": (round(max(v for _, v in rss_samples), 1)
                        if rss_samples else None),
        "rss_note": ("host RSS grows ~linearly with steps on this box: the "
                     "TPU relay leaks each transferred batch payload "
                     "(platform bug; see tools/relay_leak_probe.py). "
                     "Segments bound it; a real TPU host does not leak."),
        "ckpts_kept": sorted(os.listdir(os.path.join(stage, "ckpt"))),
    }
    out = os.path.join(
        REPO, "tools", f"sustained_{args.model}{args.out_suffix}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps({k: v for k, v in report.items()
                      if k != "steps_per_sec_series"}, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
