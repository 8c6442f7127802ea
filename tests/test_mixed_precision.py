"""Mixed-precision (bf16 compute, f32 params) GAN training path."""

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from kantts_tpu.losses import criterion_builder
from kantts_tpu.models.builder import hifigan_model_builder
from kantts_tpu.train.steps import make_gan_step
from tests.test_e2e import HIFIGAN_TINY


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
