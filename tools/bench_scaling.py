"""Batch-scaling roofline sweep on the real chip: runs the bench.py targets
at B = 1, 2, 4, 8, 16, 32 and reports throughput + MFU per point, showing
where each workload saturates and what bounds it (launch overhead at small B,
MXU tile economics at large B). Feeds the roofline table in PERFORMANCE.md.

Run (one TPU process at a time!):
    python tools/bench_scaling.py [hifigan|sambert|train] [--batches 1,2,4,...]
Writes bench_scaling_<target>.json next to this file.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import bench

    bench._enable_compile_cache()
    target = next((a for a in sys.argv[1:] if not a.startswith("--")),
                  "hifigan")
    batches = [1, 2, 4, 8, 16, 32]
    for a in sys.argv[1:]:
        if a.startswith("--batches"):
            batches = [int(x) for x in a.split("=", 1)[1].split(",")]
    fns = {"hifigan": bench.bench_hifigan, "sambert": bench.bench_sambert,
           "train": bench.bench_train_step}

    rows = []
    for b in batches:
        os.environ["KANTTS_BENCH_BATCH"] = str(b)
        try:
            r = fns[target]()
        except Exception as e:
            print(f"B={b}: failed: {e!r}", file=sys.stderr)
            break
        r["batch"] = b
        rows.append(r)
        print(json.dumps(r), file=sys.stderr, flush=True)

    print(f"\n| B | {rows[0]['metric']} | achieved TFLOP/s | MFU |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['batch']} | {r['value']} | "
              f"{r.get('achieved_tflops', '-')} | {r.get('mfu', '-')} |")

    suffix = "_int8" if os.environ.get("KANTTS_BENCH_QUANT") == "1" else ""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"bench_scaling_{target}{suffix}.json")
    # merge with any prior sweep of the same target (extend the B range
    # without re-measuring old points)
    old = []
    if os.path.exists(path):
        with open(path) as f:
            old = [r for r in json.load(f)
                   if r.get("batch") not in {x["batch"] for x in rows}]
    rows = sorted(old + rows, key=lambda r: r["batch"])
    with open(path, "w") as f:
        json.dump(rows, f, indent=2)
        f.write("\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
