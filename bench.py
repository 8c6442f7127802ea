"""Benchmark: HiFi-GAN 16 kHz copy-synthesis throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = x-realtime factor (generated audio seconds per wall second);
vs_baseline = value / 10 (the BASELINE.json north-star of >=10x realtime per
chip; the reference publishes no numbers — see BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _hifigan_16k

    dtype_name = os.environ.get("KANTTS_BENCH_DTYPE", "bfloat16")
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]

    sample_rate = 16000
    hop = 200
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
    y, carry = jax.block_until_ready(fwd(params, mel, carry))  # compile
    assert y.shape == (batch, frames * hop, 1)

    _ = float(carry)  # warm the dispatch path

    # steady-state timing: the scalar carry chains every iteration, and the
    # final HOST FETCH (float()) is the only reliable completion barrier on
    # this platform (block_until_ready returns early through the relay)
    n_iter = int(os.environ.get("KANTTS_BENCH_ITERS", "50"))
    best_dt = None
    for _trial in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            y, carry = fwd(params, mel, carry)
        _ = float(carry)
        dt = time.perf_counter() - t0
        best_dt = dt if best_dt is None else min(best_dt, dt)
    dt = best_dt

    audio_seconds = n_iter * batch * frames * hop / sample_rate
    xrt = audio_seconds / dt
    print(json.dumps({
        "metric": "hifigan16k_copy_synthesis_xrt",
        "value": round(xrt, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(xrt / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
