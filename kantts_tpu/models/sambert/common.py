"""SAM-BERT transformer primitives (Flax/linen).

Parity targets: /root/reference/kantts/models/sambert/__init__.py:8-184 —
Prenet (always-on-dropout MLP), MultiHeadSelfAttention (pre-LN, fused qkv),
PositionwiseConvFeedForward (conv k=3/k=1 FFN), FFTBlock.

TPU-first notes: attention uses a single (B, H, T, T) einsum pair (MXU), masks
are applied with a large negative constant instead of -inf so padded query
rows stay finite (their outputs are zeroed afterwards, matching the
reference's masked_fill-to-0 of NaN rows).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

NEG_INF = -1e9


def _torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """Torch nn.Linear default: U(-1/sqrt(fan_in), +) with shape (in, out)."""
    bound = 1.0 / np.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear(features: int, use_bias: bool = True, name: str | None = None,
                 dtype=None, bias_init=nn.initializers.zeros) -> nn.Dense:
    """dtype: compute dtype (params stay f32 via param_dtype default);
    None = full f32, jnp.bfloat16 = mixed-precision matmuls on the MXU."""
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=_torch_linear_kernel_init,
        bias_init=bias_init,
        dtype=dtype,
        name=name,
    )


def conv1d_same(features: int, kernel_size: int, name: str | None = None,
                dtype=None) -> nn.Conv:
    """1-D conv over (B, T, C) with torch-style 'same' padding (k odd)."""
    return nn.Conv(
        features,
        (kernel_size,),
        padding=[((kernel_size - 1) // 2, (kernel_size - 1) // 2)],
        kernel_init=_torch_linear_kernel_init_conv,
        dtype=dtype,
        name=name,
    )


def _torch_linear_kernel_init_conv(key, shape, dtype=jnp.float32):
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Prenet(nn.Module):
    """MLP with ReLU+Dropout(0.5) after every hidden layer; optional output
    projection (reference sambert/__init__.py:32-49)."""

    prenet_units: Sequence[int]
    out_units: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for i, units in enumerate(self.prenet_units):
            x = torch_linear(units, name=f"fc_{i}")(x)
            x = jax.nn.relu(x)
            x = nn.Dropout(0.5, deterministic=deterministic)(x)
        if self.out_units:
            x = torch_linear(self.out_units, name="fc_out")(x)
        return x


def scaled_dot_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    temperature: float,
    mask: Optional[jnp.ndarray] = None,
    dropatt: float = 0.0,
    deterministic: bool = True,
    dropout_rng=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """q,k,v: (B, H, T, d); mask: (B, 1|H, Tq, Tk) True = disallowed.
    Softmax always runs in f32 (mixed-precision safe); the attention-weighted
    sum runs in v's dtype."""
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / temperature
    if mask is not None:
        attn = jnp.where(mask, NEG_INF, attn)
    attn = jax.nn.softmax(attn, axis=-1)
    if dropatt > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropatt, attn.shape)
        attn = attn * keep / (1.0 - dropatt)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)
    return out, attn


class MultiHeadSelfAttention(nn.Module):
    """Pre-LN multi-head self attention with fused qkv projection
    (reference sambert/__init__.py:52-106)."""

    n_head: int
    d_model: int
    d_head: int
    dropout: float = 0.1
    dropatt: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        B, T, d_in = x.shape
        residual = x
        h = nn.LayerNorm(epsilon=1e-6, name="layer_norm")(x)  # LN stays f32
        qkv = torch_linear(3 * self.n_head * self.d_head, name="w_qkv",
                           dtype=self.dtype)(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, T, self.n_head, self.d_head).transpose(0, 2, 1, 3)

        mask = attn_mask[:, None, :, :] if attn_mask is not None else None
        out, attn = scaled_dot_attention(
            heads(q), heads(k), heads(v), float(np.sqrt(self.d_head)), mask,
            self.dropatt, deterministic,
            self.make_rng("dropout") if (self.dropatt > 0 and not deterministic) else None,
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.n_head * self.d_head)
        out = torch_linear(self.d_model, name="fc", dtype=self.dtype)(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        if out.shape[-1] == residual.shape[-1]:
            out = (out + residual).astype(residual.dtype)
        return out, attn


class PositionwiseConvFeedForward(nn.Module):
    """Pre-LN conv FFN: conv(k=ks[0]) -> ReLU -> conv(k=ks[1]), residual
    (reference sambert/__init__.py:109-149)."""

    d_model: int
    d_inner: int
    kernel_sizes: Sequence[int] = (3, 1)
    dropout_inner: float = 0.1
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        residual = x
        h = nn.LayerNorm(epsilon=1e-6, name="layer_norm")(x)  # LN stays f32
        h = conv1d_same(self.d_inner, self.kernel_sizes[0], name="w_1",
                        dtype=self.dtype)(h)
        h = jax.nn.relu(h)
        if mask is not None:
            h = jnp.where(mask[..., None], 0.0, h).astype(h.dtype)
        h = nn.Dropout(self.dropout_inner, deterministic=deterministic)(h)
        h = conv1d_same(self.d_model, self.kernel_sizes[1], name="w_2",
                        dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return (h + residual).astype(residual.dtype)


class FFTBlock(nn.Module):
    """Self-attention + conv FFN block (reference sambert/__init__.py:152-184)."""

    d_model: int
    n_head: int
    d_head: int
    d_inner: int
    kernel_sizes: Sequence[int] = (3, 1)
    dropout: float = 0.1
    dropout_attn: float = 0.0
    dropout_relu: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        slf_attn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        out, attn = MultiHeadSelfAttention(
            self.n_head, self.d_model, self.d_head, self.dropout,
            self.dropout_attn, dtype=self.dtype, name="slf_attn",
        )(x, slf_attn_mask, deterministic)
        if mask is not None:
            out = jnp.where(mask[..., None], 0.0, out)
        out = PositionwiseConvFeedForward(
            self.d_model, self.d_inner, self.kernel_sizes,
            self.dropout_relu, self.dropout, dtype=self.dtype, name="pos_ffn",
        )(out, mask, deterministic)
        if mask is not None:
            out = jnp.where(mask[..., None], 0.0, out)
        return out, attn
