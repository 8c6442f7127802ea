"""Benchmark on one TPU chip. Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline"}.

Default target: HiFi-GAN 16 kHz copy-synthesis throughput (the BASELINE.json
north-star is >=10x realtime per chip; the reference publishes no numbers —
see BASELINE.md). Set KANTTS_BENCH_TARGET=sambert for the acoustic-model
inference metric (mel frames/sec).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def bench_hifigan():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _hifigan_16k

    dtype_name = os.environ.get("KANTTS_BENCH_DTYPE", "bfloat16")
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]

    sample_rate, hop = 16000, 200
    frames = int(os.environ.get("KANTTS_BENCH_FRAMES", "400"))  # 5 s audio
    batch = int(os.environ.get("KANTTS_BENCH_BATCH", "1"))

    gen = _hifigan_16k(dtype=dtype)
    mel = jnp.asarray(
        np.random.RandomState(0).randn(batch, frames, 80).astype(np.float32)
    )
    params = gen.init(jax.random.PRNGKey(0), mel)

    # each iteration's input depends on the previous output (scalar feedback)
    # so iterations cannot be elided or overlapped — honest serial throughput
    fwd = jax.jit(
        lambda p, m, c: (lambda y: (y, c + jnp.sum(y[:, -1, 0])))(
            gen.apply(p, m + c * 1e-9)
        )
    )
    carry = jnp.asarray(0.0, dtype=jnp.float32)
    y, carry = fwd(params, mel, carry)
    assert y.shape == (batch, frames * hop, 1)
    _ = float(carry)  # host fetch = the only reliable completion barrier here

    n_iter = int(os.environ.get("KANTTS_BENCH_ITERS", "50"))
    best_dt = None
    for _trial in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            y, carry = fwd(params, mel, carry)
        _ = float(carry)
        dt = time.perf_counter() - t0
        best_dt = dt if best_dt is None else min(best_dt, dt)

    audio_seconds = n_iter * batch * frames * hop / sample_rate
    xrt = audio_seconds / best_dt
    return {
        "metric": "hifigan16k_copy_synthesis_xrt",
        "value": round(xrt, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(xrt / 10.0, 3),
    }


def bench_sambert():
    import jax
    import jax.numpy as jnp
    import yaml

    from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT, sambert_infer

    cfg = yaml.safe_load(
        open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "kantts_tpu/configs/sambert_16k.yaml"))
    )["Model"]["KanTtsSAMBERT"]["params"]
    cfg.update(sy=147, tone=10, syllable_flag=8, word_segment=8, emotion=36,
               speaker=4)
    model = KanTtsSAMBERT(cfg)
    rng = np.random.RandomState(0)
    B, T_in, MAXLEN = 1, 96, 576
    batch = dict(
        ling=jnp.asarray(rng.randint(0, 5, (B, T_in, 4)), dtype=jnp.int32),
        emo=jnp.asarray(rng.randint(0, 4, (B, T_in)), dtype=jnp.int32),
        spk=jnp.asarray(rng.randint(0, 2, (B, T_in)), dtype=jnp.int32),
        lengths=jnp.asarray([T_in]),
    )
    T_mel = 24
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["ling"], batch["emo"], batch["spk"], batch["lengths"],
        jnp.asarray([T_mel]), jnp.zeros((B, T_mel, 80)),
        duration_targets=jnp.full((B, T_in), T_mel / T_in),
        pitch_targets=jnp.zeros((B, T_in)),
        energy_targets=jnp.zeros((B, T_in)), deterministic=False,
    )
    fn = jax.jit(lambda v, l, e, s, ln: sambert_infer(model, v, l, e, s, ln,
                                                      MAXLEN))
    res = fn(variables, batch["ling"], batch["emo"], batch["spk"],
             batch["lengths"])
    _ = float(res["postnet_outputs"].sum())

    n_iter = 10
    best_dt = None
    for _trial in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            res = fn(variables, batch["ling"], batch["emo"], batch["spk"],
                     batch["lengths"])
        _ = float(res["postnet_outputs"].sum())
        dt = (time.perf_counter() - t0) / n_iter
        best_dt = dt if best_dt is None else min(best_dt, dt)

    frames_per_s = MAXLEN / best_dt
    return {
        "metric": "sambert16k_infer_mel_frames_per_s",
        "value": round(frames_per_s, 1),
        "unit": "mel_frames_per_sec_per_chip",
        # vs the 10x-realtime north star expressed in frames (80 frames/s * 10)
        "vs_baseline": round(frames_per_s / 800.0, 3),
    }


def main():
    target = os.environ.get("KANTTS_BENCH_TARGET", "hifigan")
    result = bench_hifigan() if target == "hifigan" else bench_sambert()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
