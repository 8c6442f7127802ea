"""Sweep chunked-batch vocoder inference (infer/chunked.py) on the chip.

Single 5 s utterance (400 mel frames), hifigan_v1_16k, bf16 — the headline
bench shape. For each n_chunks the program recomputes ctx=62 frames of
causal context per window but runs the stack at batch=n_chunks; this sweep
finds where the batch-occupancy win beats the recompute tax.

Run (one TPU process at a time): python tools/bench_chunked.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    import bench

    bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _hifigan_16k
    from kantts_tpu.infer.chunked import make_chunked_infer

    dtype_name = os.environ.get("KANTTS_BENCH_DTYPE", "bfloat16")
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]
    voc = os.environ.get("KANTTS_BENCH_VOC", "16k")  # 16k | nsf24k
    # int8 W8A8 with STATIC calibrated activation scales: quantization is
    # then input-independent, so the chunked windows reproduce the full
    # program bit-exactly and the B=1 chunked path is valid under int8
    # (dynamic per-example scales would break it — see hifigan/layers.py).
    int8 = os.environ.get("KANTTS_BENCH_INT8", "0") == "1"
    quant_kw = dict(quant=True, quant_static=True) if int8 else {}
    rs = np.random.RandomState(0)
    if voc == "nsf24k":
        import yaml

        from kantts_tpu.models.hifigan.generator import Generator

        params_cfg = yaml.safe_load(open(os.path.join(
            REPO, "kantts_tpu/configs/hifigan_v1_nsf_24k.yaml"
        )))["Model"]["Generator"]["params"]
        gen = Generator(**{**params_cfg, "dtype": dtype, **quant_kw})
        sample_rate, hop = 24000, 240
        secs = float(os.environ.get("KANTTS_BENCH_SECONDS", "5"))
        frames = int(sample_rate * secs) // hop
        x = rs.randn(1, frames, 82).astype(np.float32)
        x[..., -2] = rs.uniform(80.0, 250.0, x.shape[:2])  # f0
        x[..., -1] = (rs.rand(*x.shape[:2]) > 0.3).astype(np.float32)  # uv
        mel = jnp.asarray(x)
    else:
        sample_rate, hop, frames = 16000, 200, 400
        gen = _hifigan_16k(dtype=dtype, **quant_kw)
        mel = jnp.asarray(rs.randn(1, frames, 80).astype(np.float32))
    # jitted init: eager init is one RPC per op on the relay-attached TPU
    params = jax.jit(gen.init)(jax.random.PRNGKey(0), mel)
    rng = jax.random.PRNGKey(0)
    if int8:
        from kantts_tpu.models.hifigan.generator import (
            calibrate_quant_scales,
        )

        cal = gen.clone(calibrate=True)
        params = dict(params)
        params["quant"] = calibrate_quant_scales(
            cal, params["params"], [mel], rng=rng)
        dtype_name = f"{dtype_name}+int8_static"
    n_iter = int(os.environ.get("KANTTS_BENCH_ITERS", "50"))

    results = []
    sweep = tuple(int(s) for s in os.environ.get(
        "KANTTS_BENCH_CHUNK_SET", "0,2,4,8,16").split(","))
    for n_chunks in sweep:
        if n_chunks == 0:  # plain full program baseline
            plain = jax.jit(
                lambda p, m: gen.apply(p, m, rngs={"noise": rng}))
            fwd = jax.jit(lambda p, m, c: (lambda y: (y, c + jnp.sum(
                y[:, -1, 0])))(plain(p, m + c * 1e-9)))
        else:
            run = make_chunked_infer(gen, frames, n_chunks)
            fwd = jax.jit(lambda p, m, c, run=run: (lambda y: (y, c + jnp.sum(
                y[:, -1, 0])))(run(p, m + c * 1e-9, rng)))
        carry = jnp.asarray(0.0, dtype=jnp.float32)
        t0 = time.time()
        y, carry = fwd(params, mel, carry)
        _ = float(carry)
        print(f"n_chunks={n_chunks}: compile+first {time.time()-t0:.1f}s, "
              f"out {y.shape}", file=sys.stderr, flush=True)
        assert y.shape == (1, frames * hop, 1)
        best_dt = None
        for _trial in range(3):
            t0 = time.perf_counter()
            for _ in range(n_iter):
                y, carry = fwd(params, mel, carry)
            _ = float(carry)
            dt = time.perf_counter() - t0
            best_dt = dt if best_dt is None else min(best_dt, dt)
        per_call = best_dt / n_iter
        xrt = (frames * hop / sample_rate) / per_call
        flops = bench._cost_flops(fwd, params, mel, carry)
        results.append({
            "n_chunks": n_chunks, "ms_per_utt": round(per_call * 1000, 2),
            "xrt": round(xrt, 1), "dtype": dtype_name,
            **bench._mfu_fields(flops, per_call, dtype_name),
        })
        print(json.dumps(results[-1]), file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
