"""Data-parallel semantics on the virtual 8-device CPU mesh: a sharded-batch
step must produce the SAME update as the single-device step (allreduce
correctness), mirroring what DDP guarantees in the reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kantts_tpu.losses import criterion_builder
from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT
from kantts_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from kantts_tpu.train.optim import optimizer_builder
from kantts_tpu.train.states import TrainState
from kantts_tpu.train.steps import make_sambert_step
from tests.test_sambert import TINY


def build_batch(B=8):
    rng = np.random.RandomState(0)
    T_in, T_mel = 12, 24
    batch = {
        "input_lings": jnp.asarray(rng.randint(0, 5, (B, T_in, 4)), dtype=jnp.int32),
        "input_emotions": jnp.asarray(rng.randint(0, 4, (B, T_in)), dtype=jnp.int32),
        "input_speakers": jnp.asarray(rng.randint(0, 2, (B, T_in)), dtype=jnp.int32),
        "valid_input_lengths": jnp.asarray([12] * B),
        "valid_output_lengths": jnp.asarray([24] * B),
        "mel_targets": jnp.asarray(rng.randn(B, T_mel, 10).astype(np.float32)),
        "pitch_contours": jnp.asarray(np.abs(rng.randn(B, T_in)).astype(np.float32)),
        "energy_contours": jnp.asarray(np.abs(rng.randn(B, T_in)).astype(np.float32)),
        "durations": jnp.asarray(np.full((B, T_in), 2.0, dtype=np.float32)),
    }
    return batch


@pytest.mark.slow
def test_dp_step_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    batch = build_batch()
    model = KanTtsSAMBERT(TINY)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_lings"], batch["input_emotions"], batch["input_speakers"],
        batch["valid_input_lengths"], batch["valid_output_lengths"],
        batch["mel_targets"], duration_targets=batch["durations"],
        pitch_targets=batch["pitch_contours"],
        energy_targets=batch["energy_contours"], deterministic=False,
    )
    criterion = criterion_builder({
        "Loss": {"MelReconLoss": {"enable": True, "params": {"loss_type": "mae"}},
                 "ProsodyReconLoss": {"enable": True, "params": {"loss_type": "mae"}}}
    })
    tx, _ = optimizer_builder(
        {"type": "Adam", "params": {"lr": 1e-3}}, None, grad_norm=1.0
    )

    def fresh_state():
        params = jax.tree_util.tree_map(jnp.copy, variables["params"])
        return TrainState(params, tx.init(params),
                          jnp.asarray(0, dtype=jnp.int32))

    # single-device baseline (deterministic=dropout rng fixed)
    single = make_sambert_step(model, criterion, tx, False, False)
    s1, m1 = single(fresh_state(), batch, jax.random.PRNGKey(3), jnp.asarray(0))

    # 8-way DP
    mesh = make_mesh(8)
    dp_step = make_sambert_step(model, criterion, tx, False, False, mesh=mesh)
    state_dp = replicate(fresh_state(), mesh)
    batch_dp = shard_batch(batch, mesh)
    s2, m2 = dp_step(state_dp, batch_dp, jax.random.PRNGKey(3), jnp.asarray(0))

    np.testing.assert_allclose(float(m1["TotalLoss"]), float(m2["TotalLoss"]),
                               rtol=1e-5)
    p1 = jax.tree_util.tree_leaves(s1.params)
    p2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
