"""LSTM layers as lax.scan recurrences (Flax/linen).

The reference relies on torch nn.LSTM (variance predictors, duration AR
predictor, postnet). Here the input projection x@W_ih for all timesteps is
one big batched matmul (MXU-friendly); only the recurrent h@W_hh runs inside
the scan. Gate order (i, f, g, o) and double-bias layout match torch so
weights are convertible 1:1.

Bidirectional runs the reverse direction on a length-aware time-reversed
sequence — the functional equivalent of torch's pack_padded_sequence path in
VarFsmnRnnNARPredictor (reference adaptors.py:126-131): padding never pollutes
the backward states of valid positions.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _torch_lstm_init(hidden: int):
    bound = 1.0 / np.sqrt(hidden)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def lstm_scan(
    x_proj: jnp.ndarray,
    w_hh: jnp.ndarray,
    b_hh: jnp.ndarray,
    h0: jnp.ndarray,
    c0: jnp.ndarray,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """x_proj: (B, T, 4H) = x@W_ih + b_ih; returns (outputs (B,T,H), (hT, cT))."""
    H = h0.shape[-1]

    def step(carry, xt):
        h, c = carry
        gates = xt + h @ w_hh + b_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    # unroll amortizes per-step loop overhead across the many serial LSTM
    # scans in a train step (predictors at T_in, postnet at T_mel, and their
    # backward scans); trace-time tunable like the decode unrolls
    unroll = int(os.environ.get("KANTTS_LSTM_UNROLL", "1"))
    (hT, cT), ys = jax.lax.scan(step, (h0, c0), jnp.swapaxes(x_proj, 0, 1),
                                unroll=max(1, min(unroll, x_proj.shape[1])))
    return jnp.swapaxes(ys, 0, 1), (hT, cT)


def lstm_scan_grouped(
    x_proj: jnp.ndarray,
    w_hh: jnp.ndarray,
    b_hh: jnp.ndarray,
    h0: jnp.ndarray,
    c0: jnp.ndarray,
) -> jnp.ndarray:
    """G independent LSTM scans fused into ONE lax.scan (the recurrences
    share no state, so batching them trades G serial scans for one scan
    whose step does G-fold work — on TPU the scan-step launch/sync overhead
    dominates these small recurrences, so this is nearly a G-fold win).

    x_proj: (G, B, T, 4H); w_hh: (G, H, 4H); b_hh: (G, 4H);
    h0/c0: (G, B, H). Returns outputs (G, B, T, H). Per-group numerics are
    identical to lstm_scan (same dot, same op order).
    """

    def step(carry, xt):
        h, c = carry  # (G, B, H)
        gates = xt + jnp.einsum("gbh,ghk->gbk", h, w_hh) + b_hh[:, None, :]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    unroll = int(os.environ.get("KANTTS_LSTM_UNROLL", "1"))
    xs = jnp.moveaxis(x_proj, 2, 0)  # (T, G, B, 4H)
    _, ys = jax.lax.scan(step, (h0, c0), xs,
                         unroll=max(1, min(unroll, x_proj.shape[2])))
    return jnp.moveaxis(ys, 0, 2)  # (G, B, T, H)


def reverse_sequence(x: jnp.ndarray, lengths: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Reverse each row's first ``lengths[b]`` steps; padding stays in place
    as zeros. x: (B, T, D)."""
    B, T = x.shape[0], x.shape[1]
    if lengths is None:
        return jnp.flip(x, axis=1)
    t = jnp.arange(T)[None, :]
    idx = jnp.clip(lengths[:, None] - 1 - t, 0, T - 1)
    valid = t < lengths[:, None]
    gathered = jnp.take_along_axis(x, idx[..., None], axis=1)
    return jnp.where(valid[..., None], gathered, 0.0)


class LSTM(nn.Module):
    """(Stacked) unidirectional LSTM; weights per layer mirror torch naming."""

    hidden: int
    num_layers: int = 1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        initial_state: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ):
        """x: (B, T, D) -> (out (B, T, H), (h (L,B,H), c (L,B,H)))."""
        B = x.shape[0]
        init = _torch_lstm_init(self.hidden)
        hs, cs = [], []
        h_in = x
        for layer in range(self.num_layers):
            d_in = h_in.shape[-1]
            w_ih = self.param(f"w_ih_l{layer}", init, (d_in, 4 * self.hidden))
            w_hh = self.param(f"w_hh_l{layer}", init, (self.hidden, 4 * self.hidden))
            b_ih = self.param(f"b_ih_l{layer}", init, (4 * self.hidden,))
            b_hh = self.param(f"b_hh_l{layer}", init, (4 * self.hidden,))
            if initial_state is not None:
                h0, c0 = initial_state[0][layer], initial_state[1][layer]
            else:
                h0 = jnp.zeros((B, self.hidden), dtype=x.dtype)
                c0 = jnp.zeros((B, self.hidden), dtype=x.dtype)
            x_proj = h_in @ w_ih + b_ih
            h_in, (hT, cT) = lstm_scan(x_proj, w_hh, b_hh, h0, c0)
            hs.append(hT)
            cs.append(cT)
        return h_in, (jnp.stack(hs), jnp.stack(cs))

    @staticmethod
    def cell_step(params, layer: int, xt: jnp.ndarray, state):
        """Single-timestep application for incremental decoding.

        params: this module's param dict; xt: (B, D); state: (h, c) each
        (B, H). Returns (out (B, H), (h, c)).
        """
        w_ih = params[f"w_ih_l{layer}"]
        w_hh = params[f"w_hh_l{layer}"]
        b_ih = params[f"b_ih_l{layer}"]
        b_hh = params[f"b_hh_l{layer}"]
        h, c = state
        gates = xt @ w_ih + b_ih + h @ w_hh + b_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return h, (h, c)


class BiLSTM(nn.Module):
    """Single-layer bidirectional LSTM with length-aware reverse direction.

    Both directions run in ONE fused scan (lstm_scan_grouped): their
    recurrences are independent, and on TPU the serial scan-step overhead —
    not the tiny per-step matmuls — dominates, so two scans cost ~twice one.
    Parameter names/layout match torch exactly (weights convertible 1:1)."""

    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None):
        """x: (B, T, D) -> (B, T, 2H)."""
        B, d_in = x.shape[0], x.shape[-1]
        init = _torch_lstm_init(self.hidden)

        def params(suffix):
            w_ih = self.param(f"w_ih_l0{suffix}", init, (d_in, 4 * self.hidden))
            w_hh = self.param(f"w_hh_l0{suffix}", init, (self.hidden, 4 * self.hidden))
            b_ih = self.param(f"b_ih_l0{suffix}", init, (4 * self.hidden,))
            b_hh = self.param(f"b_hh_l0{suffix}", init, (4 * self.hidden,))
            return w_ih, w_hh, b_ih, b_hh

        fw, fh, fbi, fbh = params("")
        rw, rh, rbi, rbh = params("_reverse")
        x_rev = reverse_sequence(x, lengths)
        x_proj = jnp.stack([x @ fw + fbi, x_rev @ rw + rbi])  # (2, B, T, 4H)
        zeros = jnp.zeros((2, B, self.hidden), dtype=x.dtype)
        ys = lstm_scan_grouped(x_proj, jnp.stack([fh, rh]),
                               jnp.stack([fbh, rbh]), zeros, zeros)
        fwd = ys[0]
        bwd = reverse_sequence(ys[1], lengths)
        return jnp.concatenate([fwd, bwd], axis=-1)
