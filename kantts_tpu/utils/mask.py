"""Padding-mask primitives (JAX).

``get_mask_from_lengths`` is the universal padding-mask primitive of the
reference (/root/reference/kantts/models/utils.py:13-23): True marks PADDING
positions (ids >= length). All model code masks with
``jnp.where(mask[..., None], 0, x)`` mirroring ``masked_fill``.

TPU-first notes: ``max_len`` is always a static int here (bucketed shapes);
there is no data-dependent ``max(lengths)`` path under jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def get_mask_from_lengths(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """Boolean padding mask: shape (B, max_len); True where position >= length."""
    ids = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return ids >= lengths[:, None]


def mask_fill(x: jnp.ndarray, mask: jnp.ndarray, value: float = 0.0) -> jnp.ndarray:
    """Set positions where ``mask`` is True to ``value``; mask broadcast on trailing dims."""
    while mask.ndim < x.ndim:
        mask = mask[..., None]
    return jnp.where(mask, jnp.asarray(value, dtype=x.dtype), x)


def lengths_to_padded_lfr_lengths(lengths: jnp.ndarray, r: int) -> jnp.ndarray:
    """Number of low-frame-rate groups after rounding lengths up to a multiple of r.

    Mirrors get_lfr_mask_from_lengths's per-item padding computation
    (reference kantts_sambert.py:736-750) without the python loop.
    """
    return (lengths + r - 1) // r
