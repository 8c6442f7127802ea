"""Quality TREND over a sustained run's retained checkpoints: run
tools/sustained_quality.py at every checkpoint step (same eval set, same n,
fixed order — the protocol the round-4 records lacked, which made the
6k-vs-8k MCD comparison unreadable) and collect one trend table.

Usage (after a bench_sustained run with --keep-all-ckpts):
  python tools/quality_trend.py --model sambert \
      --stage /tmp/kantts_sustained_sambert --corpus /tmp/kantts_corpus_speech

Writes tools/quality_trend_<model>.json:
  {"series": [{"checkpoint_steps": 2000, "mcd_free_running_vs_target_db": ...,
               "mcd_teacher_forced_vs_target_db": ...,
               "mas_vs_ground_truth_duration_l1_frames_per_phone": ...}, ...],
   ...identity fields from the per-checkpoint records...}
"""

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TREND_KEYS = [
    "checkpoint_steps",
    "mcd_free_running_vs_target_db",
    "mcd_teacher_forced_vs_target_db",
    "mcd_copy_synthesis_vs_target_db",
    "logmel_l1_vs_target",
    "mas_vs_ground_truth_duration_l1_frames_per_phone",
    "mas_vs_ground_truth_duration_exact_match",
    "predicted_over_target_length",
]

IDENTITY_KEYS = ["corpus", "corpus_n_utts", "stage_config_sha",
                 "eval_n_requested", "eval_protocol", "eval_utts",
                 "n_valid_utts", "model"]


def checkpoint_steps(stage):
    ckpt_dir = os.path.join(stage, "ckpt")
    steps = []
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"checkpoint_(\d+)\.ckpt", name)
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["sambert", "hifigan"], required=True)
    ap.add_argument("--stage", required=True)
    ap.add_argument("--corpus", default="/tmp/kantts_corpus_speech")
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--every", type=int, default=1,
                    help="evaluate every k-th checkpoint")
    args = ap.parse_args()

    steps_list = checkpoint_steps(args.stage)[:: args.every]
    series, identity = [], {}
    for steps in steps_list:
        suffix = f"_trend_{steps}"
        cmd = [sys.executable, os.path.join(REPO, "tools",
                                            "sustained_quality.py"),
               "--model", args.model, "--stage", args.stage,
               "--corpus", args.corpus, "--n", str(args.n),
               "--ckpt-steps", str(steps), "--out-suffix", suffix]
        subprocess.run(cmd, check=True, cwd=REPO)
        rec_path = os.path.join(
            REPO, "tools", f"sustained_quality_{args.model}{suffix}.json")
        with open(rec_path) as f:
            rec = json.load(f)
        os.remove(rec_path)  # the trend file carries the data
        series.append({k: rec[k] for k in TREND_KEYS if k in rec})
        identity = {k: rec[k] for k in IDENTITY_KEYS if k in rec}

    out = {"series": series, **identity}
    path = os.path.join(REPO, "tools", f"quality_trend_{args.model}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
