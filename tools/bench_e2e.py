"""End-to-end text->wav on the real chip: two-program pipeline (AM program,
then vocoder program, mel stays on device) vs the FUSED single XLA program
(infer/e2e.py). Production dims: sambert_16k -> hifigan_v1_16k, 576-frame
budget (7.2 s audio).

Run (one TPU process at a time): python tools/bench_e2e.py
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import yaml


def main():
    import bench

    bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _hifigan_16k
    from kantts_tpu.infer.e2e import make_fused_infer
    from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT, sambert_infer

    cfg = yaml.safe_load(
        open(os.path.join(REPO, "kantts_tpu/configs/sambert_16k.yaml"))
    )["Model"]["KanTtsSAMBERT"]["params"]
    cfg.update(sy=147, tone=10, syllable_flag=8, word_segment=8, emotion=36,
               speaker=4)
    am = KanTtsSAMBERT(cfg)
    gen = _hifigan_16k(dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    B, T_in, MAXLEN, hop, sr = 1, 96, 576, 200, 16000
    ling = jnp.asarray(rng.randint(0, 5, (B, T_in, 4)), dtype=jnp.int32)
    emo = jnp.asarray(rng.randint(0, 4, (B, T_in)), dtype=jnp.int32)
    spk = jnp.asarray(rng.randint(0, 2, (B, T_in)), dtype=jnp.int32)
    lengths = jnp.asarray([T_in] * B)
    T_mel = 24
    am_vars = am.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        ling, emo, spk, lengths, jnp.asarray([T_mel] * B),
        jnp.zeros((B, T_mel, 80)),
        duration_targets=jnp.full((B, T_in), T_mel / T_in),
        pitch_targets=jnp.zeros((B, T_in)),
        energy_targets=jnp.zeros((B, T_in)), deterministic=False,
    )
    voc_vars = gen.init(jax.random.PRNGKey(2), jnp.zeros((B, MAXLEN, 80)))
    key = jax.random.PRNGKey(0)

    # ---- two-program pipeline (mel stays on device between programs) ----
    am_fn = jax.jit(lambda v, l, e, s, ln: sambert_infer(am, v, l, e, s, ln,
                                                         MAXLEN))
    voc_fn = jax.jit(lambda v, m, r: gen.apply(v, m, rngs={"noise": r}))

    def run_two():
        res = am_fn(am_vars, ling, emo, spk, lengths)
        return voc_fn(voc_vars, res["postnet_outputs"], key)

    t0 = time.perf_counter()
    wav = run_two()
    _ = float(wav.sum())
    print(f"two-program compile+first: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    n = 10
    best_two = None
    for _trial in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            wav = run_two()
        _ = float(wav.sum())
        dt = (time.perf_counter() - t0) / n
        best_two = dt if best_two is None else min(best_two, dt)

    # ---------------- fused single program ----------------
    fused = make_fused_infer(am, gen, MAXLEN)
    t0 = time.perf_counter()
    wav, nf = fused(am_vars, voc_vars, ling, emo, spk, lengths, key)
    _ = float(wav.sum())
    print(f"fused compile+first: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    best_fused = None
    for _trial in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            wav, nf = fused(am_vars, voc_vars, ling, emo, spk, lengths, key)
        _ = float(wav.sum())
        dt = (time.perf_counter() - t0) / n
        best_fused = dt if best_fused is None else min(best_fused, dt)

    # ------------- fused + chunked vocoder epilogue -------------
    n_chunks = int(os.environ.get("KANTTS_BENCH_CHUNKS", "8"))
    fused_c = make_fused_infer(am, gen, MAXLEN, n_chunks=n_chunks)
    t0 = time.perf_counter()
    wav, nf = fused_c(am_vars, voc_vars, ling, emo, spk, lengths, key)
    _ = float(wav.sum())
    print(f"fused+chunked compile+first: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    best_fused_c = None
    for _trial in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            wav, nf = fused_c(am_vars, voc_vars, ling, emo, spk, lengths, key)
        _ = float(wav.sum())
        dt = (time.perf_counter() - t0) / n
        best_fused_c = dt if best_fused_c is None else min(best_fused_c, dt)

    audio_s = MAXLEN * hop / sr
    import json

    print(json.dumps({
        "two_program_ms": round(best_two * 1000, 2),
        "fused_ms": round(best_fused * 1000, 2),
        "fused_chunked_ms": round(best_fused_c * 1000, 2),
        "n_chunks": n_chunks,
        "speedup": round(best_two / best_fused, 3),
        "speedup_chunked": round(best_two / best_fused_c, 3),
        "fused_chunked_xrt": round(audio_s / best_fused_c, 1),
        "fused_xrt": round(audio_s / best_fused, 1),
        "audio_seconds_budget": audio_s,
    }))


if __name__ == "__main__":
    main()
