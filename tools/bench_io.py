"""Disk-backed input-pipeline benchmark: prove the prefetching DataLoader
keeps the TPU fed at the production SAM-BERT step rate.

Builds a real on-disk AM corpus (npy mels/durations/f0/energy + metafile),
then measures train steps/sec three ways:
  1. synthetic  — one in-memory batch reused every step (compute ceiling)
  2. loader n=0 — synchronous DataLoader on the disk corpus
  3. loader n=K — threaded prefetching DataLoader (num_workers=K)
The reference feeds training through torch DataLoader worker processes
(/root/reference/kantts/bin/train_sambert.py:124-142); target: (3) within
~10% of (1).

Run on the TPU: python tools/bench_io.py [n_utts] [n_steps]
"""

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import yaml

N_UTTS = int(sys.argv[1]) if len(sys.argv) > 1 else 256
N_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 60
N_SYM, HOP = 64, 200


def build_corpus(root):
    """N_UTTS utterances at production-ish lengths (~7 s, 80-mel)."""
    import pathlib

    root = pathlib.Path(root)
    for sub in ["mel", "duration", "f0", "energy"]:
        (root / sub).mkdir(parents=True)
    rng = np.random.RandomState(0)
    lines = []
    from tests.test_e2e import PHONES

    def symbols():
        toks = []
        for i in range(N_SYM):
            p = PHONES[i % len(PHONES)]
            flag = "s_begin" if i % 2 == 0 else "s_end"
            ws = "word_begin" if i % 2 == 0 else "word_end"
            toks.append(f"{{{p}$tone3${flag}${ws}$emotion_neutral$F7}}")
        return " ".join(toks)

    for i in range(N_UTTS):
        utt = f"utt{i:04d}"
        frames = 480 + 24 * (i % 5)  # 6.0 - 7.2 s at 12.5 ms frames
        np.save(root / "mel" / f"{utt}.npy",
                rng.randn(frames, 80).astype(np.float32))
        dur = np.full(N_SYM, frames // N_SYM, dtype=np.int64)
        dur[-1] += frames - dur.sum()
        np.save(root / "duration" / f"{utt}.npy", dur)
        np.save(root / "f0" / f"{utt}.npy",
                rng.rand(N_SYM).astype(np.float32) + 0.5)
        np.save(root / "energy" / f"{utt}.npy",
                rng.rand(N_SYM).astype(np.float32) + 0.5)
        lines.append(f"{utt}\t{symbols()}")
    meta = root / "am_train.lst"
    meta.write_text("\n".join(lines) + "\n")
    return str(meta)


def main():
    import jax
    import jax.numpy as jnp

    from kantts_tpu.data.dataset import AMDataset, DataLoader
    from kantts_tpu.losses import criterion_builder
    from kantts_tpu.models.builder import model_builder
    from kantts_tpu.train.steps import make_sambert_step

    root = tempfile.mkdtemp(prefix="bench_io_corpus_")
    meta = build_corpus(root)
    print(f"corpus: {N_UTTS} utts at {root}")

    full = yaml.safe_load(
        open(os.path.join(REPO, "kantts_tpu/configs/sambert_16k.yaml")))
    config = dict(full)
    dataset = AMDataset(config, meta, root, allow_cache=False,
                        input_bucket=N_SYM + 16, frame_bucket=600)
    config["Model"]["KanTtsSAMBERT"]["params"].update(
        dataset.ling_unit.get_unit_size())

    built = model_builder(config)
    criterion = criterion_builder(config)
    step = make_sambert_step(built["model"], criterion, built["tx"],
                             with_mas=False, fp_enable=False)
    B = 32

    # KANTTS_WIRE_F16=1: ship float32 batch arrays as f16 on the wire and
    # upcast on device — halves host->device bytes (mel targets dominate) at
    # ~1e-3 relative quantization of the targets. Off by default: training
    # stays byte-identical to the reference contract unless opted in.
    wire_f16 = bool(os.environ.get("KANTTS_WIRE_F16"))

    def to_device(batch):
        out = {}
        for k, v in batch.items():
            if v is None:
                continue
            if wire_f16 and getattr(v, "dtype", None) == np.float32:
                out[k] = jnp.asarray(v.astype(np.float16)).astype(jnp.float32)
            else:
                out[k] = jnp.asarray(v)
        return out

    # the jitted step donates its state argument, so a single live state
    # threads through every timed run
    live = {"state": built["state"]}

    def lookahead(host_iter):
        """One-deep device lookahead (Trainer._lookahead): dispatch batch
        k+1's async host->device transfer before step k consumes batch k."""
        it = iter(host_iter)
        nxt = to_device(next(it))
        for batch in it:
            cur, nxt = nxt, to_device(batch)
            yield cur
        yield nxt

    def run_steps(batch_iter, label):
        state = live["state"]
        i = 0
        t0 = None
        for batch in batch_iter:
            state, metrics = step(state, batch, jax.random.PRNGKey(i),
                                  jnp.asarray(0))
            i += 1
            if i == 5:  # warmup/compile boundary
                _ = float(metrics["TotalLoss"])
                t0 = time.perf_counter()
                i0 = i
            if i >= N_STEPS:
                break
        _ = float(metrics["TotalLoss"])
        live["state"] = state
        dt = (time.perf_counter() - t0) / (i - i0)
        frames = B * 600
        print(f"{label:16s}: {dt*1000:7.1f} ms/step, "
              f"{frames/dt:9.0f} mel frames/s")
        return dt

    # 1. synthetic ceiling: one resident batch reused
    one = to_device(dataset.collate_fn([dataset[i] for i in range(B)]))

    def synthetic_iter():
        while True:
            yield one

    dt_syn = run_steps(synthetic_iter(), "synthetic")

    # 2/3. disk-backed loaders, with the trainer's device lookahead
    for workers in (0, 4):
        loader = DataLoader(dataset, B, shuffle=True, num_workers=workers)

        def host_iter():
            while True:
                for b in loader:
                    yield b

        dt = run_steps(lookahead(host_iter()), f"loader n={workers}")
        print(f"  -> overhead vs synthetic: "
              f"{(dt - dt_syn) / dt_syn * 100:+.1f}%")


if __name__ == "__main__":
    main()
