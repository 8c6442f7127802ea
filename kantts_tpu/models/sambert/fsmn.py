"""FSMN (feedforward sequential memory network) encoder, Flax/linen.

Parity target: /root/reference/kantts/models/sambert/fsmn.py —
FeedForwardNet (conv1x1 pair, second bias-free), MemoryBlockV2 (depthwise
conv1d with asymmetric left/right padding derived from ``shift``), residual
stacking. The depthwise conv maps to an XLA feature-grouped conv.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from kantts_tpu.models.sambert.common import _torch_linear_kernel_init_conv


class FeedForwardNet(nn.Module):
    """conv(k=1) -> ReLU -> dropout -> conv(k=1, no bias)
    (reference fsmn.py:8-40)."""

    d_hid: int
    d_out: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.Conv(self.d_hid, (1,), kernel_init=_torch_linear_kernel_init_conv,
                    name="w_1")(x)
        h = jax.nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.d_out, (1,), use_bias=False,
                    kernel_init=_torch_linear_kernel_init_conv, name="w_2")(h)
        return h


class MemoryBlockV2(nn.Module):
    """Depthwise temporal conv with shift-controlled asymmetric padding and a
    residual connection (reference fsmn.py:43-72).

    shift > 0 moves the receptive field into the past: left pad
    round((k-1)/2)+shift, right pad (k-1)//2-shift.
    """

    filter_size: int
    shift: int = 0
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if mask is not None:
            x = jnp.where(mask[..., None], 0.0, x)
        d = x.shape[-1]
        lp = int(round((self.filter_size - 1) / 2)) + self.shift
        rp = (self.filter_size - 1) // 2 - self.shift

        w = self.param(
            "conv_dw",
            _torch_linear_kernel_init_conv,
            (self.filter_size, 1, d),  # depthwise: (k, in/groups=1, out=d)
        )
        h = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[(lp, rp)],
            dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=d,
        )
        h = h + x
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        if mask is not None:
            h = jnp.where(mask[..., None], 0.0, h)
        return h


class FsmnEncoderV2(nn.Module):
    """Stack of (FFN -> memory block) with residuals when dims match
    (reference fsmn.py:75-124)."""

    filter_size: int
    fsmn_num_layers: int
    num_memory_units: int
    ffn_inner_dim: int
    dropout: float = 0.0
    shift: int | Sequence[int] = 0

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        shifts = self.shift
        if not isinstance(shifts, (list, tuple)):
            shifts = [shifts] * self.fsmn_num_layers

        h = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        for i in range(self.fsmn_num_layers):
            context = FeedForwardNet(
                self.ffn_inner_dim, self.num_memory_units, self.dropout,
                name=f"ffn_{i}",
            )(h, deterministic)
            memory = MemoryBlockV2(
                self.filter_size, shifts[i], self.dropout, name=f"memory_{i}"
            )(context, mask, deterministic)
            memory = nn.Dropout(self.dropout, deterministic=deterministic)(memory)
            if memory.shape[-1] == h.shape[-1]:
                memory = memory + h
            h = memory
        return h
