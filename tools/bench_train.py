"""Measure production-config training step times on the attached TPU.

Run: python tools/bench_train.py [sambert|hifigan|both]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml


def _enable_compile_cache():
    """Persistent XLA compile cache (same location as bench.py) — the GAN
    step program alone takes ~10 min to build cold."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("KANTTS_BENCH_CACHE",
                       os.path.join(os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))), ".jax_compile_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def fetch(x):
    """Host fetch = reliable completion barrier on this platform."""
    import jax

    return float(jax.tree_util.tree_leaves(x)[0].sum())


def bench_sambert():
    import jax
    import jax.numpy as jnp

    from kantts_tpu.losses import criterion_builder
    from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT
    from kantts_tpu.train.optim import optimizer_builder
    from kantts_tpu.train.states import TrainState
    from kantts_tpu.train.steps import make_sambert_step

    full = yaml.safe_load(open("kantts_tpu/configs/sambert_16k.yaml"))
    cfg = full["Model"]["KanTtsSAMBERT"]["params"]
    cfg.update(sy=147, tone=10, syllable_flag=8, word_segment=8, emotion=36,
               speaker=4)
    model = KanTtsSAMBERT(cfg)
    rng = np.random.RandomState(0)
    B, T_in, T_mel = 32, 96, 576
    dur = np.full((B, T_in), T_mel // T_in, dtype=np.float32)
    dur[:, -1] += T_mel - dur[0].sum()
    batch = {
        "input_lings": jnp.asarray(rng.randint(0, 5, (B, T_in, 4)), dtype=jnp.int32),
        "input_emotions": jnp.asarray(rng.randint(0, 4, (B, T_in)), dtype=jnp.int32),
        "input_speakers": jnp.asarray(rng.randint(0, 2, (B, T_in)), dtype=jnp.int32),
        "valid_input_lengths": jnp.asarray([T_in] * B),
        "valid_output_lengths": jnp.asarray([T_mel] * B),
        "mel_targets": jnp.asarray(rng.randn(B, T_mel, 80).astype(np.float32)),
        "pitch_contours": jnp.asarray(np.abs(rng.randn(B, T_in)).astype(np.float32)),
        "energy_contours": jnp.asarray(np.abs(rng.randn(B, T_in)).astype(np.float32)),
        "durations": jnp.asarray(dur),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_lings"], batch["input_emotions"], batch["input_speakers"],
        batch["valid_input_lengths"], batch["valid_output_lengths"],
        batch["mel_targets"], duration_targets=batch["durations"],
        pitch_targets=batch["pitch_contours"],
        energy_targets=batch["energy_contours"], deterministic=False,
    )
    criterion = criterion_builder(full)
    tx, _ = optimizer_builder(
        full["Model"]["KanTtsSAMBERT"]["optimizer"],
        full["Model"]["KanTtsSAMBERT"]["scheduler"], full.get("grad_norm"),
    )
    state = TrainState(variables["params"], tx.init(variables["params"]),
                       jnp.asarray(0, dtype=jnp.int32))
    # donation would invalidate the reused state between timing loops; rebuild
    step = make_sambert_step(model, criterion, tx, False, False)

    t0 = time.time()
    state, metrics = step(state, batch, jax.random.PRNGKey(0), jnp.asarray(0))
    _ = fetch(metrics["TotalLoss"])
    print(f"sambert compile+first: {time.time()-t0:.1f}s")
    n = 20
    t0 = time.time()
    for i in range(n):
        state, metrics = step(state, batch, jax.random.PRNGKey(i), jnp.asarray(0))
    _ = fetch(metrics["TotalLoss"])
    dt = (time.time() - t0) / n
    print(f"sambert train step (B={B}, T_in={T_in}, T_mel={T_mel}): "
          f"{dt*1000:.1f} ms -> {B/dt:.0f} utts/s, "
          f"{B*T_mel/dt:.0f} mel frames/s")


def bench_hifigan():
    import jax
    import jax.numpy as jnp

    from kantts_tpu.losses import criterion_builder
    from kantts_tpu.models.builder import hifigan_model_builder
    from kantts_tpu.train.steps import make_gan_step

    full = yaml.safe_load(open("kantts_tpu/configs/hifigan_v1_16k.yaml"))
    if os.environ.get("KANTTS_BENCH_MIXED"):
        full["mixed_precision"] = True
        print("mixed_precision: bf16 G/D compute, f32 params")
    built = hifigan_model_builder(full)
    criterion = criterion_builder(full)
    rng = np.random.RandomState(0)
    B, steps_len, hop = 16, 9600, 200
    wav = jnp.asarray(0.3 * rng.randn(B, steps_len, 1).astype(np.float32))
    mel = jnp.asarray(rng.randn(B, steps_len // hop, 80).astype(np.float32))

    step = make_gan_step(
        built["generator"], built["discriminators"], criterion,
        built["gen_tx"], built["disc_txs"], built["pqmf"],
        train_generator=True, include_adversarial=True,
    )
    state = built["state"]
    # cost analysis BEFORE any call (the step donates its state argument)
    from bench import _cost_flops, _mfu_fields

    flops = _cost_flops(step, state, wav, mel, jax.random.PRNGKey(0))
    t0 = time.time()
    state, metrics = step(state, wav, mel, jax.random.PRNGKey(0))
    _ = fetch(metrics["generator_loss"])
    print(f"hifigan compile+first: {time.time()-t0:.1f}s")
    n = 20
    t0 = time.time()
    for i in range(n):
        state, metrics = step(state, wav, mel, jax.random.PRNGKey(i))
    _ = fetch(metrics["generator_loss"])
    dt = (time.time() - t0) / n
    audio_s = B * steps_len / 16000
    dtype_name = ("bfloat16" if os.environ.get("KANTTS_BENCH_MIXED")
                  else "float32")
    print(f"hifigan GAN step (B={B}, {steps_len} samples): {dt*1000:.1f} ms "
          f"-> {audio_s/dt:.1f}s audio/s trained, {B/dt:.1f} crops/s; "
          f"roofline: {_mfu_fields(flops, dt, dtype_name)}")


if __name__ == "__main__":
    _enable_compile_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("sambert", "both"):
        bench_sambert()
    if which in ("hifigan", "both"):
        bench_hifigan()
