"""Op-isolated roofline probes: what do the DOMINANT ops of each bench.py
workload achieve when run alone, at the workload's exact shapes?

The full-step MFU numbers (bench.py, PERFORMANCE.md) are single-digit for
training; PERFORMANCE.md attributes that to shape economics (d_model=128
contractions, small-channel convs). This tool tests that claim: each probe
runs ONE op class as a scan-chained kernel inside a single XLA program (no
per-step dispatch, perfect reuse — a generous upper bound for any program
built from that op at that shape). If the full step sits close to its own
ops' isolated rate, the step is at its structural ceiling; if it sits far
below, the gap is fusible/fixable and the probe names the target.

Measurement notes (hard-won on this relay):
- FLOPs are computed ANALYTICALLY. XLA cost_analysis() counts a While-loop
  body once, not trip_count times, so it undercounts scan-chained probes
  by the rep factor.
- Calls are pipelined through a data dependency (each call consumes the
  previous call's output) with ONE host fetch per timing loop — a fetch
  per call measures the relay round-trip (~40 ms here), not the op.

Probes:
- SAM-BERT train step ops (B=32, T_lfr=192, d=128, ffn=1024): the FFN
  matmul pair (the FLOP majority), the d=128 projection matmul, and the
  attention-shaped (B*H, T, 16) batched matmul pair.
- HiFi-GAN ops (train: B=16 crop 9600; infer: B=1, 5 s): the per-stage
  resblock convs (channels 128->16 over the upsample ladder) and a
  FLOP-weighted composite matching the generator's per-stage FLOP mix.
- A control probe at LLM-like shapes ((8192,2048)@(2048,2048) bf16) that
  shows what this chip/toolchain reaches when shapes are MXU-friendly —
  separating shape economics from environment problems.

All probes AOT-compile CONCURRENTLY (remote compile service) and measure
serially — same scheme as bench.py.

Output: one JSON line per probe to stdout + a markdown table to stderr +
tools/bench_roofline.json.
Reference for the workloads being bounded: kantts/train/trainer.py:898-1005
(SAM-BERT step), kantts/train/trainer.py:469-589 (GAN step).
"""

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def _peak(dtype_name):
    if "int8" in dtype_name:
        return float(os.environ.get("KANTTS_CHIP_PEAK_TFLOPS_INT8", "394"))
    return float(os.environ.get("KANTTS_CHIP_PEAK_TFLOPS", "197"))


def _aot(jfn, *args):
    return jfn.lower(*args).compile()


def _measure(prep, n_iter=15, trials=3):
    """Seconds per call, best of trials. Calls chain through their output
    (x -> fn(x) -> fn(fn(x))), so dispatch pipelines and only the final
    fetch pays the relay round-trip."""
    fn, x = prep["fn"], prep["x"]
    y = fn(x)  # warmup
    _ = float(np.asarray(y).ravel()[0])
    best = None
    for _t in range(trials):
        xx = y
        t0 = time.perf_counter()
        for _ in range(n_iter):
            xx = fn(xx)
        _ = float(np.asarray(xx).ravel()[0])
        dt = (time.perf_counter() - t0) / n_iter
        best = dt if best is None else min(best, dt)
    tflops = prep["flops"] / best / 1e12
    row = {"probe": prep["name"], "dtype": prep["dtype"],
           "gflops_per_call": round(prep["flops"] / 1e9, 1),
           "ms_per_call": round(best * 1e3, 2),
           "achieved_tflops": round(tflops, 2),
           "mfu": round(tflops / _peak(prep["dtype"]), 4)}
    print(json.dumps(row), flush=True)
    return row


def _norm(z):
    """Cheap VPU renorm so hundreds of chained matmuls neither overflow nor
    denormal-flush; negligible next to the MXU work being measured."""
    import jax.numpy as jnp

    return z * jax.lax.rsqrt(jnp.mean(jnp.square(z)) + 1e-12)


import jax  # noqa: E402  (used inside _norm)


def prep_matmul(name, m, k, n, dtype_name, reps):
    """Scan-chained (m,k)@(k,n)@(n,k) matmul pair; the carry feeds back so
    neither the chain nor the call sequence can be elided."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    dt = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(m, k), dtype=dt)
    w1 = jnp.asarray(rng.randn(k, n) * 0.02, dtype=dt)
    w2 = jnp.asarray(rng.randn(n, k) * 0.02, dtype=dt)

    def body(carry, _):
        z = _norm((carry @ w1) @ w2)
        return z.astype(dt), ()

    f = jax.jit(lambda x0: lax.scan(body, x0, None, length=reps)[0])
    flops = reps * 2 * (2 * m * k * n)
    return dict(name=name, fn=_aot(f, x), x=x, flops=flops, dtype=dtype_name)


def prep_attention(name, bh, t, dh, dtype_name, reps):
    """Attention-shaped batched matmuls: QK^T then PV at SAM-BERT head dims."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    dt = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(bh, t, dh) * 0.1, dtype=dt)
    kv = jnp.asarray(rng.randn(bh, t, dh) * 0.1, dtype=dt)

    def body(carry, _):
        s = jnp.einsum("btd,bsd->bts", carry, kv)
        o = _norm(jnp.einsum("bts,bsd->btd", s, kv))
        return o.astype(dt), ()

    f = jax.jit(lambda q0: lax.scan(body, q0, None, length=reps)[0])
    flops = reps * 2 * (2 * bh * t * t * dh)
    return dict(name=name, fn=_aot(f, q), x=q, flops=flops, dtype=dtype_name)


def prep_conv(name, b, t, c, kernel, dtype_name, reps):
    """Scan-chained channels-last 1-D conv (c -> c, SAME), the resblock op.
    Weights are unit-gain (std 1/sqrt(k*c)) so no per-rep normalization is
    needed — a full-tensor reduction in the loop body was observed to wreck
    the conv lowering (while leaving matmul probes untouched)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    dt = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, t, c) * 0.1, dtype=dt)
    w = jnp.asarray(rng.randn(kernel, c, c) / np.sqrt(kernel * c), dtype=dt)

    def body(carry, _):
        y = lax.conv_general_dilated(
            carry, w, window_strides=(1,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"))
        return y.astype(dt), ()

    f = jax.jit(lambda x0: lax.scan(body, x0, None, length=reps)[0])
    flops = reps * 2 * b * t * c * c * kernel
    return dict(name=name, fn=_aot(f, x), x=x, flops=flops, dtype=dtype_name)


def hifigan_stage_mix(train=True):
    """(T, C) per upsample stage + that stage's share of generator FLOPs.
    hifigan_v1_16k: channels 256, scales (10,5,2,2), resblock kernels
    (3,7,11) x dilations (1,3,5,7) -> 24 convs of C->C per stage at k_avg=7,
    plus the transposed upsample conv entering the stage."""
    frames = 48 if train else 400
    scales = [10, 5, 2, 2]
    chans = [128, 64, 32, 16]
    t = frames
    rows, fl = [], []
    for s, c in zip(scales, chans):
        t *= s
        # upsample conv: 2*T*C_in*C_out*k (k=2s), C_in=2c
        f_up = 2 * t * (2 * c) * c * (2 * s)
        # 3 resblocks x (4 dilated + 4 unit) convs C->C, kernels 3/7/11
        f_res = sum(2 * t * c * c * k * 8 for k in (3, 7, 11))
        rows.append((t, c))
        fl.append(f_up + f_res)
    tot = sum(fl)
    return [(t, c, f / tot) for (t, c), f in zip(rows, fl)]


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    m_lfr = 32 * 192
    jobs = [
        # ---- control: MXU-friendly shapes (what this chip CAN do here) ----
        ("control_llm_mm_8192x2048x2048",
         lambda: prep_matmul("control_llm_mm_8192x2048x2048", 8192, 2048,
                             2048, "bfloat16", reps=100)),
        ("control_llm_mm_8192x2048x2048_f32",
         lambda: prep_matmul("control_llm_mm_8192x2048x2048_f32", 8192, 2048,
                             2048, "float32", reps=40)),
        # ---- SAM-BERT train-step ops (B=32, T_lfr=192, d=128, ffn=1024) ---
        ("sambert_ffn_mm_6144x128x1024",
         lambda: prep_matmul("sambert_ffn_mm_6144x128x1024", m_lfr, 128,
                             1024, "float32", reps=400)),
        ("sambert_ffn_mm_6144x128x1024_bf16",
         lambda: prep_matmul("sambert_ffn_mm_6144x128x1024_bf16", m_lfr, 128,
                             1024, "bfloat16", reps=400)),
        ("sambert_proj_mm_6144x128x128",
         lambda: prep_matmul("sambert_proj_mm_6144x128x128", m_lfr, 128, 128,
                             "float32", reps=1500)),
        ("sambert_attn_bh256_t192_dh16",
         lambda: prep_attention("sambert_attn_bh256_t192_dh16", 32 * 8, 192,
                                16, "float32", reps=800)),
    ]
    # ---- HiFi-GAN conv stages ----
    mixes = {}
    for train, tag, b in ((True, "train_b16", 16), (False, "infer_b1", 1)):
        mixes[tag] = hifigan_stage_mix(train)
        dt = "float32" if train else "bfloat16"
        for t, c, _frac in mixes[tag]:
            name = f"hifigan_{tag}_conv_t{t}_c{c}"
            reps = max(60, int(4e10 / (2 * b * t * c * c * 7)))
            jobs.append((name, (lambda nn=name, bb=b, tt=t, cc=c, dd=dt,
                                rr=reps: prep_conv(nn, bb, tt, cc, 7, dd, rr))))

    pool = ThreadPoolExecutor(max_workers=min(len(jobs), 8))
    futures = {name: pool.submit(fn) for name, fn in jobs}

    rows, by_name = [], {}
    pending = [name for name, _ in jobs]
    deadline = time.perf_counter() + float(
        os.environ.get("KANTTS_ROOFLINE_BUDGET_S", "3000"))
    while pending and time.perf_counter() < deadline:
        progressed = False
        for name in list(pending):
            if futures[name].done():
                pending.remove(name)
                try:
                    r = _measure(futures[name].result())
                except Exception as e:
                    print(f"{name}: failed {e!r}", file=sys.stderr, flush=True)
                    continue
                rows.append(r)
                by_name[name] = r
                progressed = True
        if not progressed:
            time.sleep(2.0)
    for name in pending:
        print(f"{name}: compile did not finish in budget", file=sys.stderr)

    # FLOP-weighted harmonic mean = the composite ceiling for a program
    # spending the generator's own FLOP mix across these stages
    for tag, dt in (("train_b16", "float32"), ("infer_b1", "bfloat16")):
        parts = []
        for t, c, frac in mixes[tag]:
            r = by_name.get(f"hifigan_{tag}_conv_t{t}_c{c}")
            if r is None:
                break
            parts.append((r["achieved_tflops"], frac))
        else:
            comp = 1.0 / sum(frac / rate for rate, frac in parts)
            row = {"probe": f"hifigan_{tag}_composite_ceiling", "dtype": dt,
                   "achieved_tflops": round(comp, 2),
                   "mfu": round(comp / _peak("bfloat16"), 4)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    # markdown table to stderr for PERFORMANCE.md
    print("\n| probe | dtype | GFLOPs/call | TFLOP/s | MFU |", file=sys.stderr)
    print("|---|---|---|---|---|", file=sys.stderr)
    for r in rows:
        print(f"| {r['probe']} | {r['dtype']} | "
              f"{r.get('gflops_per_call', '-')} | {r['achieved_tflops']} | "
              f"{100 * r['mfu']:.1f}% |", file=sys.stderr)

    out = os.path.join(REPO, "tools", "bench_roofline.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
        f.write("\n")
    print(f"wrote {out}", file=sys.stderr)
    os._exit(0)  # don't wait for abandoned compile threads


if __name__ == "__main__":
    main()
