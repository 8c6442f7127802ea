"""Mixed-precision (bf16 compute, f32 params) GAN and SAM-BERT training
paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from kantts_tpu.losses import criterion_builder
from kantts_tpu.models.builder import hifigan_model_builder, model_builder
from kantts_tpu.train.steps import make_gan_step, make_sambert_step
from tests.test_e2e import HIFIGAN_TINY, SAMBERT_TINY


@pytest.mark.slow
def test_mixed_precision_gan_step():
    config = yaml.safe_load(yaml.safe_dump(HIFIGAN_TINY))
    config["mixed_precision"] = True
    built = hifigan_model_builder(config)

    # params stay f32
    leaves = jax.tree_util.tree_leaves(built["state"].gen_params)
    assert all(leaf.dtype == jnp.float32 for leaf in leaves)

    criterion = criterion_builder(config)
    step = make_gan_step(
        built["generator"], built["discriminators"], criterion,
        built["gen_tx"], built["disc_txs"], built["pqmf"],
        train_generator=True, include_adversarial=True,
    )
    rng = np.random.RandomState(0)
    wav = jnp.asarray(0.3 * rng.randn(2, 1600, 1).astype(np.float32))
    mel = jnp.asarray(rng.randn(2, 8, 80).astype(np.float32))
    state, metrics = step(built["state"], wav, mel, jax.random.PRNGKey(0))
    for key in ("generator_loss", "discriminator_loss", "mel_loss"):
        assert np.isfinite(float(metrics[key])), key
    # updated params remain f32
    leaves = jax.tree_util.tree_leaves(state.gen_params)
    assert all(leaf.dtype == jnp.float32 for leaf in leaves)


def _sambert_batch(rng, B=2, T_in=8, T_mel=24, n_mels=80):
    dur = np.full((B, T_in), T_mel // T_in, dtype=np.float32)
    return {
        "input_lings": jnp.asarray(rng.randint(0, 5, (B, T_in, 4)),
                                   dtype=jnp.int32),
        "input_emotions": jnp.asarray(rng.randint(0, 4, (B, T_in)),
                                      dtype=jnp.int32),
        "input_speakers": jnp.asarray(rng.randint(0, 2, (B, T_in)),
                                      dtype=jnp.int32),
        "valid_input_lengths": jnp.asarray([T_in] * B),
        "valid_output_lengths": jnp.asarray([T_mel] * B),
        "mel_targets": jnp.asarray(rng.randn(B, T_mel, n_mels)
                                   .astype(np.float32)),
        "pitch_contours": jnp.asarray(np.abs(rng.randn(B, T_in))
                                      .astype(np.float32)),
        "energy_contours": jnp.asarray(np.abs(rng.randn(B, T_in))
                                       .astype(np.float32)),
        "durations": jnp.asarray(dur),
    }


@pytest.mark.slow
def test_mixed_precision_sambert_step():
    config = yaml.safe_load(yaml.safe_dump(SAMBERT_TINY))
    config["mixed_precision"] = True
    config["Model"]["KanTtsSAMBERT"]["params"].update(
        sy=20, tone=6, syllable_flag=8, word_segment=8, emotion=5, speaker=3
    )
    built = model_builder(config)
    assert built["model"].config.get("compute_dtype") == "bfloat16"
    leaves = jax.tree_util.tree_leaves(built["state"].params)
    assert all(leaf.dtype == jnp.float32 for leaf in leaves)

    criterion = criterion_builder(config)
    step = make_sambert_step(built["model"], criterion, built["tx"],
                             with_mas=False, fp_enable=False)
    batch = _sambert_batch(np.random.RandomState(0))
    state, metrics = step(built["state"], batch, jax.random.PRNGKey(0),
                          jnp.asarray(0))
    for key in ("mel_loss", "mel_loss_", "dur_loss"):
        assert np.isfinite(float(metrics[key])), key
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(leaf.dtype == jnp.float32 for leaf in leaves)


@pytest.mark.slow  # 18-37 s of XLA:CPU trace+compile on this 1-core box; equivalent coverage stays in the full tier
def test_mixed_precision_sambert_close_to_f32():
    """bf16 forward stays close to the f32 forward with the same params."""
    from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT

    config = yaml.safe_load(yaml.safe_dump(SAMBERT_TINY))
    cfg = config["Model"]["KanTtsSAMBERT"]["params"]
    cfg.update(sy=20, tone=6, syllable_flag=8, word_segment=8, emotion=5,
               speaker=3)
    rng = np.random.RandomState(0)
    batch = _sambert_batch(rng)

    def forward(extra):
        model = KanTtsSAMBERT({**cfg, **extra})
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch["input_lings"], batch["input_emotions"],
            batch["input_speakers"], batch["valid_input_lengths"],
            batch["valid_output_lengths"], batch["mel_targets"],
            duration_targets=batch["durations"],
            pitch_targets=batch["pitch_contours"],
            energy_targets=batch["energy_contours"], deterministic=True,
        )
        res = model.apply(
            variables, batch["input_lings"], batch["input_emotions"],
            batch["input_speakers"], batch["valid_input_lengths"],
            batch["valid_output_lengths"], batch["mel_targets"],
            duration_targets=batch["durations"],
            pitch_targets=batch["pitch_contours"],
            energy_targets=batch["energy_contours"], deterministic=True,
        )
        return np.asarray(res["postnet_outputs"])

    f32 = forward({})
    bf16 = forward({"compute_dtype": "bfloat16"})
    # identical init (dtype does not change param init); outputs close
    scale = max(np.abs(f32).max(), 1.0)
    assert np.abs(f32 - bf16).max() / scale < 0.08


def test_mixed_precision_sambert_infer():
    """Free-running inference (scan decode, bf16 KV caches) runs and stays
    close to the f32 decode."""
    from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT, sambert_infer

    config = yaml.safe_load(yaml.safe_dump(SAMBERT_TINY))
    cfg = config["Model"]["KanTtsSAMBERT"]["params"]
    cfg.update(sy=20, tone=6, syllable_flag=8, word_segment=8, emotion=5,
               speaker=3)
    rng = np.random.RandomState(0)
    batch = _sambert_batch(rng)

    def infer(extra):
        model = KanTtsSAMBERT({**cfg, **extra})
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch["input_lings"], batch["input_emotions"],
            batch["input_speakers"], batch["valid_input_lengths"],
            batch["valid_output_lengths"], batch["mel_targets"],
            duration_targets=batch["durations"],
            pitch_targets=batch["pitch_contours"],
            energy_targets=batch["energy_contours"], deterministic=True,
        )
        res = sambert_infer(model, variables, batch["input_lings"],
                            batch["input_emotions"], batch["input_speakers"],
                            batch["valid_input_lengths"], max_output_len=48)
        return np.asarray(res["postnet_outputs"])

    f32 = infer({})
    bf16 = infer({"compute_dtype": "bfloat16"})
    assert np.isfinite(bf16).all()
    scale = max(np.abs(f32).max(), 1.0)
    assert np.abs(f32 - bf16).max() / scale < 0.12
