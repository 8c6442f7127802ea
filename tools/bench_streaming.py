"""First-chunk latency benchmark for streaming synthesis on the TPU.

Measures, at the production 16 kHz configs (sambert_16k + hifigan_v1_16k
causal), the time from "text ready" to "first audio chunk ready":
  t_first = t_acoustic(full utterance, one jitted program)
          + t_vocoder(first chunk window)
plus the steady-state per-chunk time. Weights are random — latency is a
function of architecture + shapes only.

Run: python tools/bench_streaming.py [chunk_frames]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import yaml


def main(chunk_frames=24):
    import jax
    import jax.numpy as jnp

    # persistent XLA compile cache (same location as bench.py) — the
    # acoustic-model program alone takes minutes to build cold
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("KANTTS_BENCH_CACHE",
                       os.path.join(REPO, ".jax_compile_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from kantts_tpu.infer.streaming import (
        causal_receptive_field_frames,
        stream_synthesis,
    )
    from kantts_tpu.models.builder import hifigan_model_builder
    from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT, sambert_infer

    # ---------------- acoustic model (one jitted program) ----------------
    cfg = yaml.safe_load(
        open(os.path.join(REPO, "kantts_tpu/configs/sambert_16k.yaml"))
    )["Model"]["KanTtsSAMBERT"]["params"]
    cfg.update(sy=147, tone=10, syllable_flag=8, word_segment=8, emotion=36,
               speaker=4)
    model = KanTtsSAMBERT(cfg)
    rng = np.random.RandomState(0)
    B, T_in, MAXLEN = 1, 96, 576  # ~7.2 s utterance budget
    ling = jnp.asarray(rng.randint(0, 5, (B, T_in, 4)), dtype=jnp.int32)
    emo = jnp.asarray(rng.randint(0, 4, (B, T_in)), dtype=jnp.int32)
    spk = jnp.asarray(rng.randint(0, 2, (B, T_in)), dtype=jnp.int32)
    lengths = jnp.asarray([T_in])
    T_mel = 24
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        ling, emo, spk, lengths, jnp.asarray([T_mel]),
        jnp.zeros((B, T_mel, 80)),
        duration_targets=jnp.full((B, T_in), T_mel / T_in),
        pitch_targets=jnp.zeros((B, T_in)),
        energy_targets=jnp.zeros((B, T_in)), deterministic=False,
    )
    am = jax.jit(lambda v, l, e, s, ln: sambert_infer(model, v, l, e, s, ln,
                                                      MAXLEN))
    res = am(variables, ling, emo, spk, lengths)
    _ = float(res["postnet_outputs"].sum())  # warmup/compile

    # ---------------- causal vocoder ----------------
    voc_full = yaml.safe_load(
        open(os.path.join(REPO, "kantts_tpu/configs/hifigan_v1_16k.yaml")))
    built = hifigan_model_builder(voc_full)
    gen = built["generator"]
    voc_vars = {"params": built["state"].gen_params}
    hop = int(np.prod(gen.upsample_scales))
    sr = 16000
    ctx = causal_receptive_field_frames(
        gen.kernel_size, gen.upsample_scales, gen.resblock_kernel_sizes,
        gen.resblock_dilations)
    print(f"receptive field: {ctx} frames; chunk: {chunk_frames} frames "
          f"({chunk_frames * hop / sr * 1e3:.0f} ms audio)")

    mel0 = np.asarray(res["postnet_outputs"])[0]
    for _ in stream_synthesis(gen, voc_vars, mel0,
                              chunk_frames=chunk_frames):
        break  # compile the chunk program

    # ---------------- timed runs ----------------
    n_trials = 10
    first, total_chunks, chunk_times = [], None, []
    for trial in range(n_trials):
        t0 = time.perf_counter()
        res = am(variables, ling, emo, spk, lengths)
        mel = np.asarray(res["postnet_outputs"])[0]
        stream = stream_synthesis(gen, voc_vars, mel,
                                  chunk_frames=chunk_frames)
        chunk = next(stream)
        _ = float(chunk.sum())
        first.append(time.perf_counter() - t0)
        rest_t0 = time.perf_counter()
        n = 1
        for chunk in stream:
            n += 1
        _ = float(chunk.sum())
        chunk_times.append((time.perf_counter() - rest_t0) / max(n - 1, 1))
        total_chunks = n

    audio_per_chunk_ms = chunk_frames * hop / sr * 1e3
    first_ms = np.median(first) * 1e3
    steady_ms = np.median(chunk_times) * 1e3
    print(f"first-chunk latency: {first_ms:.1f} ms (median of {n_trials}; "
          f"{MAXLEN}-frame acoustic budget + first {chunk_frames}-frame chunk)")
    print(f"steady-state: {steady_ms:.1f} ms/chunk for {audio_per_chunk_ms:.0f} ms "
          f"audio -> {audio_per_chunk_ms / steady_ms:.1f}x real time, "
          f"{total_chunks} chunks/utt")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 24)
