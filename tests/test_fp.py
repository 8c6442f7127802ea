"""Filled-pause subsystem tests: insertion-plan semantics vs the reference's
splice loop, in-graph application, and FP-mode train/infer forwards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kantts_tpu.models.sambert.fp import (
    apply_fp_insertion,
    build_fp_insertion_plan,
    extend_wraparound,
    fp_classes_from_predictions,
)
from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT, sambert_infer_fp
from tests.test_sambert import TINY


def test_plan_matches_reference_splice_semantics():
    """Reference inserts the 3-token filler BEFORE each labeled position
    (kantts_sambert.py:830-859); verify against a direct list-splice oracle."""
    fp_label = np.array([[0, 2, 0, 3, 0, 0]], dtype=np.int32)
    lengths = np.array([6], dtype=np.int32)
    src, f_cls, f_ph, inter, L = build_fp_insertion_plan(fp_label, lengths,
                                                         bucket=4)
    assert inter[0] == 6 + 3 * 2

    # oracle: python splice on token ids
    tokens = list(range(6))
    out = []
    for j, tok in enumerate(tokens):
        c = int(fp_label[0, j])
        if c > 0:
            out.extend([("F", c, p) for p in range(3)])
        out.append(("T", tok))

    for pos, item in enumerate(out):
        if item[0] == "T":
            assert f_cls[0, pos] == 0
            assert src[0, pos] == item[1]
        else:
            assert f_cls[0, pos] == item[1]
            assert f_ph[0, pos] == item[2]


def test_apply_fp_insertion_gather():
    B, T, D = 1, 4, 2
    text = jnp.asarray(np.arange(B * T * D, dtype=np.float32).reshape(B, T, D))
    bank = jnp.asarray(100 + np.arange(3 * 3 * D, dtype=np.float32)
                       .reshape(3, 3, D))
    fp_label = np.array([[0, 1, 0, 0]], dtype=np.int32)
    src, f_cls, f_ph, inter, L = build_fp_insertion_plan(
        fp_label, np.array([4]), bucket=8
    )
    out = np.asarray(apply_fp_insertion(text, bank,
                                        jnp.asarray(src), jnp.asarray(f_cls),
                                        jnp.asarray(f_ph)))
    np.testing.assert_allclose(out[0, 0], np.asarray(text)[0, 0])
    # filler class 1 -> bank[0, phase]
    np.testing.assert_allclose(out[0, 1], np.asarray(bank)[0, 0])
    np.testing.assert_allclose(out[0, 2], np.asarray(bank)[0, 1])
    np.testing.assert_allclose(out[0, 3], np.asarray(bank)[0, 2])
    np.testing.assert_allclose(out[0, 4], np.asarray(text)[0, 1])


def test_fp_classes_from_predictions():
    fp_p = np.zeros((1, 3, 4), dtype=np.float32)
    fp_p[0, 0, 0] = 1.0
    fp_p[0, 1, 2] = 1.0
    fp_p[0, 2, 3] = 1.0
    masks = np.array([[False, False, True]])
    cls = fp_classes_from_predictions(fp_p, masks)
    np.testing.assert_array_equal(cls, [[0, 2, 0]])


def test_extend_wraparound():
    x = np.array([[1, 2, 3]])
    np.testing.assert_array_equal(extend_wraparound(x, 7),
                                  [[1, 2, 3, 1, 2, 3, 1]])


def _fp_batch(rng, B=2, T_in=8, T_mel=24, L=16):
    fp_label = np.zeros((B, T_in), dtype=np.int32)
    fp_label[0, 2] = 1
    fp_label[1, 1] = 2
    fp_label[1, 4] = 3
    lengths = np.array([8, 7], dtype=np.int32)
    src, f_cls, f_ph, inter, L = build_fp_insertion_plan(fp_label, lengths,
                                                         out_len=L)
    dur = np.zeros((B, L), dtype=np.float32)
    for b in range(B):
        n = int(inter[b])
        dur[b, :n] = 2
        dur[b, n - 1] += T_mel - dur[b].sum()
    batch = dict(
        inputs_ling=jnp.asarray(rng.randint(0, 5, (B, T_in, 4)), dtype=jnp.int32),
        inputs_emotion=jnp.asarray(rng.randint(0, 4, (B, T_in)), dtype=jnp.int32),
        inputs_speaker=jnp.asarray(rng.randint(0, 2, (B, T_in)), dtype=jnp.int32),
        input_lengths=jnp.asarray(lengths),
        output_lengths=jnp.asarray([T_mel, T_mel - 4]),
        mel_targets=jnp.asarray(rng.randn(B, T_mel, 10).astype(np.float32)),
        duration_targets=jnp.asarray(dur),
        pitch_targets=jnp.asarray(np.abs(rng.randn(B, L)).astype(np.float32)),
        energy_targets=jnp.asarray(np.abs(rng.randn(B, L)).astype(np.float32)),
        fp_label=jnp.asarray(fp_label),
        fp_plan=(jnp.asarray(src), jnp.asarray(f_cls), jnp.asarray(f_ph),
                 jnp.asarray(inter)),
        fp_dict_lings=jnp.asarray(rng.randint(0, 5, (3, 3, 4)), dtype=jnp.int32),
    )
    return batch, inter


@pytest.mark.slow
def test_fp_train_forward():
    cfg = dict(TINY, FP=True)
    model = KanTtsSAMBERT(cfg)
    rng = np.random.RandomState(0)
    batch, inter = _fp_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, deterministic=False,
    )
    res = model.apply(variables, **batch, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    assert res["fp_predictions"].shape == (2, 8, 4)
    assert res["dec_outputs"].shape == (2, 24, 10)
    # prosody predictions are on the augmented length
    assert res["log_duration_predictions"].shape == (2, 16)
    np.testing.assert_array_equal(np.asarray(res["valid_inter_lengths"]),
                                  np.asarray(inter))


@pytest.mark.slow
def test_fp_infer():
    cfg = dict(TINY, FP=True)
    model = KanTtsSAMBERT(cfg)
    rng = np.random.RandomState(0)
    batch, _ = _fp_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, deterministic=False,
    )
    res = sambert_infer_fp(
        model, variables, batch["inputs_ling"], batch["inputs_emotion"],
        batch["inputs_speaker"], batch["input_lengths"],
        batch["fp_dict_lings"], max_output_len=48,
    )
    assert res["postnet_outputs"].shape[0] == 2
    assert res["fp_predictions"].shape == (2, 8, 4)
