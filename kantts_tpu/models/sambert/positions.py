"""Positional encodings for SAM-BERT.

Parity target: /root/reference/kantts/models/sambert/positions.py.
The reference's SinusoidalPositionEncoder grows its table dynamically when a
sequence exceeds max_len (positions.py:21-27) — an XLA recompilation hazard.
Here the table is sized once to the static max length (bucketed shapes make
runtime growth unnecessary).

Layout quirks preserved exactly:
- SinusoidalPositionEncoder: positions start at 1; angles use exponent
  hid_idx/(d/2-1); sin fills the FIRST half of channels, cos the SECOND half.
- DurSinusoidalPositionEncoder: interleaved sin/cos over even/odd channels,
  with inv_timescales 10000^(2*(i//2)/depth); the position within each phone
  is derived from the duration cumsum via the same interval-matrix trick as
  the LengthRegulator.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def sinusoid_position_table(n_position: int, d_hid: int) -> np.ndarray:
    """(n_position, d_hid) table; position p row encodes p+1."""
    pos = np.arange(1, n_position + 1, dtype=np.float64)[:, None]
    half = d_hid // 2
    denom = np.power(10000.0, np.arange(half, dtype=np.float64) / float(half - 1))
    angles = pos / denom[None, :]
    table = np.zeros((n_position, d_hid), dtype=np.float64)
    table[:, :half] = np.sin(angles)
    table[:, half:] = np.cos(angles)
    return table.astype(np.float32)


def add_sinusoidal_position(x: jnp.ndarray, max_len: Optional[int] = None) -> jnp.ndarray:
    """x: (B, T, D) -> x + PE[:T]; table sized statically to max(T, max_len)."""
    T, D = x.shape[-2], x.shape[-1]
    table = jnp.asarray(sinusoid_position_table(max(T, max_len or 0), D))
    return x + table[None, :T, :]


@lru_cache(maxsize=None)
def _dur_inv_timescales(depth: int) -> np.ndarray:
    idx = np.arange(depth)
    return np.power(10000.0, 2 * (idx // 2) / depth).astype(np.float32)


def duration_position_encoding(
    durations: jnp.ndarray,
    depth: int,
    out_len: int,
    masks: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Frame positions within each phone, sinusoidally encoded.

    durations: (B, T_in) (float or int); out_len: static output frame count
    (must already be a multiple of outputs_per_step — bucketed shapes replace
    the reference's pad-to-multiple, positions.py:89-92).
    Returns (B, out_len, depth).
    """
    reps = jnp.floor(durations.astype(jnp.float32) + 0.5)
    cums = jnp.cumsum(jnp.pad(reps, ((0, 0), (1, 0))), axis=1)  # (B, T_in+1)
    rng = jnp.arange(out_len, dtype=jnp.float32)[None, :, None]
    mult = (cums[:, None, :-1] <= rng) & (cums[:, None, 1:] > rng)
    mult = mult.astype(jnp.float32)  # (B, out_len, T_in)
    offsets = jnp.einsum("bot,bt->bo", mult, cums[:, :-1])
    dur_pos = rng[:, :, 0] - offsets + 1.0  # position-in-phone, 1-based

    if masks is not None:
        dur_pos = jnp.where(masks, 0.0, dur_pos)

    inv = jnp.asarray(_dur_inv_timescales(depth))
    ang = dur_pos[:, :, None] / inv[None, None, :]
    even = jnp.sin(ang[:, :, 0::2])
    odd = jnp.cos(ang[:, :, 1::2])
    out = jnp.zeros(ang.shape, dtype=ang.dtype)
    out = out.at[:, :, 0::2].set(even)
    out = out.at[:, :, 1::2].set(odd)
    return out
