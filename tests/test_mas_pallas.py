"""Pallas MAS kernel tests (interpret mode on CPU) against the numpy DP and
the lax.scan implementation."""

import jax.numpy as jnp
import numpy as np

from kantts_tpu.models.sambert.alignment import b_mas, mas_width1_np
from kantts_tpu.ops.mas_pallas import b_mas_pallas


def test_pallas_mas_matches_numpy_dp():
    rng = np.random.RandomState(1)
    B, T_mel, T_text = 5, 24, 16
    attn = rng.rand(B, 1, T_mel, T_text).astype(np.float32)
    in_lens = np.array([16, 4, 5, 7, 9])
    out_lens = np.array([24, 10, 12, 20, 16])
    hard = np.asarray(b_mas_pallas(
        jnp.asarray(attn), jnp.asarray(in_lens), jnp.asarray(out_lens),
        group=4, interpret=True,
    ))
    for b in range(B):
        ref = mas_width1_np(attn[b, 0, : out_lens[b], : in_lens[b]])
        np.testing.assert_array_equal(
            hard[b, 0, : out_lens[b], : in_lens[b]], ref
        )
        assert hard[b, 0, out_lens[b]:, :].sum() == 0
        assert hard[b, 0, :, in_lens[b]:].sum() == 0


def test_pallas_mas_matches_scan():
    rng = np.random.RandomState(3)
    B, T_mel, T_text = 4, 30, 12
    attn = rng.rand(B, 1, T_mel, T_text).astype(np.float32)
    attn /= attn.sum(-1, keepdims=True)
    in_lens = jnp.asarray([12, 8, 10, 6])
    out_lens = jnp.asarray([30, 20, 24, 15])
    hp = np.asarray(b_mas_pallas(jnp.asarray(attn), in_lens, out_lens,
                                 group=2, interpret=True))
    hs = np.asarray(b_mas(jnp.asarray(attn), in_lens, out_lens))
    np.testing.assert_array_equal(hp, hs)
