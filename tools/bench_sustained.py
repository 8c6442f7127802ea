"""Sustained-training run on the real TPU: the full trainer loop (threaded
prefetch loader, bucketed collate, atomic+async checkpoint retention, eval
artifact dumps, TensorBoard) for >=10k steps on the speech-statistics corpus
from tools/gen_corpus.py — the long-run evidence the short parity harnesses
cannot give: step-time stability, host memory growth, compile-cache churn.

Reference cadence being modeled: 1M steps of sambert (configs/
sambert_16k_MAS.yaml:85) and 2.5M of hifigan (hifigan_v1_16k.yaml:201).

Usage:
  python tools/bench_sustained.py --model sambert --steps 10000
  python tools/bench_sustained.py --model hifigan --steps 10000
Writes tools/sustained_<model>.json and prints a summary table.
"""

import argparse
import json
import os
import re
import sys
import threading
import time

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


class RssSampler(threading.Thread):
    def __init__(self, period_s=15.0):
        super().__init__(daemon=True)
        self.period_s = period_s
        self.samples = []
        self._stop = threading.Event()

    def run(self):
        while not self._stop.wait(self.period_s):
            self.samples.append((time.time(), _rss_mb()))

    def stop(self):
        self._stop.set()


def ensure_corpus(corpus_dir, n):
    if os.path.exists(os.path.join(corpus_dir, "raw_metafile.txt")):
        return
    from tools import gen_corpus  # noqa: F401  (run as a subprocess-free call)

    sys.argv = ["gen_corpus", corpus_dir, "--n", str(n)]
    gen_corpus.main()


def stage_config(model, steps, out_path):
    name = ("sambert_16k_MAS.yaml" if model == "sambert"
            else "hifigan_v1_16k.yaml")
    cfg = yaml.safe_load(open(os.path.join(REPO, "kantts_tpu/configs", name)))
    cfg.update(
        train_max_steps=steps,
        save_interval_steps=max(steps // 5, 1),
        eval_interval_steps=max(steps // 4, 1),
        log_interval_steps=100,
        keep_last_checkpoints=3,
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
    with open(out_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return cfg


def parse_sps(log_path):
    """steps_per_sec series from the trainer's stdout.log."""
    # value is sentence-terminated ("... = 0.419."): don't eat the final dot
    pat = re.compile(r"\(Steps: (\d+)\) steps_per_sec = ([0-9]+(?:\.[0-9]+)?)")
    out = []
    with open(log_path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                out.append((int(m.group(1)), float(m.group(2))))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["sambert", "hifigan"], required=True)
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--corpus", default="/tmp/kantts_corpus_speech")
    ap.add_argument("--n-utts", type=int, default=256)
    ap.add_argument("--stage", default=None)
    args = ap.parse_args()

    ensure_corpus(args.corpus, args.n_utts)
    stage = args.stage or f"/tmp/kantts_sustained_{args.model}"
    os.makedirs(stage, exist_ok=True)
    cfg_path = os.path.join(stage, "model_config.yaml")
    stage_config(args.model, args.steps, cfg_path)

    # persistent compile cache softens the bucketed-shape compile storm
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_compile_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    sampler = RssSampler()
    sampler.start()
    rss0 = _rss_mb()
    t0 = time.time()
    if args.model == "sambert":
        from kantts_tpu.bin.train_sambert import train
    else:
        from kantts_tpu.bin.train_hifigan import train
    train(cfg_path, args.corpus, stage, data_parallel=False)
    wall = time.time() - t0
    sampler.stop()

    sps = parse_sps(os.path.join(stage, "stdout.log"))
    vals = [v for _, v in sps]
    head = vals[1:11]    # steps 200-1100 (skip the compile-heavy first window)
    tail = vals[-10:]
    rss_series = sampler.samples
    report = {
        "model": args.model,
        "steps": args.steps,
        "wall_s": round(wall, 1),
        "steps_per_sec_series": sps,
        "sps_steps_200_1100": round(float(np.mean(head)), 3) if head else None,
        "sps_last_1000": round(float(np.mean(tail)), 3) if tail else None,
        "sps_min_after_warmup": round(min(vals[1:]), 3) if len(vals) > 1 else None,
        "sps_max": round(max(vals), 3) if vals else None,
        "rss_start_mb": round(rss0, 1),
        "rss_end_mb": round(_rss_mb(), 1),
        "rss_peak_mb": round(max(v for _, v in rss_series), 1) if rss_series else None,
        "ckpts_kept": sorted(os.listdir(os.path.join(stage, "ckpt"))),
    }
    out = os.path.join(REPO, "tools", f"sustained_{args.model}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps({k: v for k, v in report.items()
                      if k != "steps_per_sec_series"}, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
