"""Tensor / sequence parallelism on the virtual 8-device CPU mesh.

The TP-sharded step must produce the same update as the single-device step
(GSPMD specs steer layout, not semantics); the time-sharded vocoder forward
must reproduce the single-device waveform (conv halo-exchange correctness).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kantts_tpu.losses import criterion_builder
from kantts_tpu.models.hifigan.generator import Generator
from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT
from kantts_tpu.parallel.mesh import shard_batch
from kantts_tpu.parallel.tp import (
    MODEL_AXIS,
    make_mesh_2d,
    shard_state,
    time_sharded,
    tp_shardings,
)
from kantts_tpu.train.optim import optimizer_builder
from kantts_tpu.train.states import TrainState
from kantts_tpu.train.steps import make_sambert_step
from tests.test_hifigan import CFG_16K
from tests.test_parallel import build_batch
from tests.test_sambert import TINY


def _sambert_fixtures():
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
    return batch, model, variables, criterion, tx


@pytest.mark.slow
def test_tp_spec_rules():
    """Attention/FFN kernels shard over model; heads/norms stay replicated."""
    mesh = make_mesh_2d(2, 4)
    model = KanTtsSAMBERT(TINY)
    batch = build_batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_lings"], batch["input_emotions"], batch["input_speakers"],
        batch["valid_input_lengths"], batch["valid_output_lengths"],
        batch["mel_targets"], duration_targets=batch["durations"],
        pitch_targets=batch["pitch_contours"],
        energy_targets=batch["energy_contours"], deterministic=False,
    )
    sh = tp_shardings(variables["params"], mesh)
    enc = sh["text_encoder"]["ling_enc"]["fft_0"]
    assert enc["slf_attn"]["w_qkv"]["kernel"].spec == (None, MODEL_AXIS)
    assert enc["slf_attn"]["fc"]["kernel"].spec == (MODEL_AXIS, None)
    assert enc["pos_ffn"]["w_1"]["kernel"].spec == (None, None, MODEL_AXIS)
    assert enc["pos_ffn"]["w_2"]["kernel"].spec == (None, MODEL_AXIS, None)
    # output heads / embeddings / norms replicated
    assert sh["duration_predictor"]["fc"]["kernel"].spec == ()
    assert sh["text_encoder"]["sy_emb"]["embedding"].spec == ()
    assert enc["slf_attn"]["layer_norm"]["scale"].spec == ()
    pnca = sh["mel_decoder"]["mel_dec"]["pnca_0"]["pnca_attn"]
    assert pnca["w_x_qkv"]["kernel"].spec == (None, MODEL_AXIS)
    assert pnca["fc_x"]["kernel"].spec == (MODEL_AXIS, None)


@pytest.mark.slow
def test_tp_dp_step_matches_single_device():
    """(2 data x 4 model) mesh: sharded params + sharded batch reproduce the
    single-device update."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    batch, model, variables, criterion, tx = _sambert_fixtures()

    def fresh_state():
        params = jax.tree_util.tree_map(jnp.copy, variables["params"])
        return TrainState(params, tx.init(params),
                          jnp.asarray(0, dtype=jnp.int32))

    single = make_sambert_step(model, criterion, tx, False, False)
    s1, m1 = single(fresh_state(), batch, jax.random.PRNGKey(3), jnp.asarray(0))

    mesh = make_mesh_2d(2, 4)
    state_tp = shard_state(fresh_state(), mesh)
    tp_step = make_sambert_step(
        model, criterion, tx, False, False, mesh=mesh,
        state_shardings=tp_shardings(state_tp, mesh),
    )
    s2, m2 = tp_step(state_tp, shard_batch(batch, mesh),
                     jax.random.PRNGKey(3), jnp.asarray(0))

    np.testing.assert_allclose(float(m1["TotalLoss"]), float(m2["TotalLoss"]),
                               rtol=1e-5)
    # TP changes float reduction order (row-parallel psum; sharded global
    # grad-norm), and clip_by_global_norm scales EVERY update by the norm, so
    # a ~1e-7 norm wiggle moves all params a few 1e-5 — wider atol than the
    # pure-DP test, still far below one optimizer step (lr=1e-3).
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


@pytest.mark.slow
def test_sequence_parallel_vocoder_matches_single_device():
    """Time-sharded generator forward == single-device forward (XLA halo
    exchange around every conv shard edge)."""
    assert len(jax.devices()) >= 8
    gen = Generator(**CFG_16K, causal=True)
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(1, 24, 80).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), mel)

    y_ref = jax.jit(gen.apply)(params, mel)

    mesh = make_mesh_2d(1, 8)
    mel_sp = time_sharded(mel, mesh)
    with mesh:
        y_sp = jax.jit(gen.apply)(params, mel_sp)
    assert [d for d in y_sp.sharding.device_set] != []
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_ref), atol=1e-5)
