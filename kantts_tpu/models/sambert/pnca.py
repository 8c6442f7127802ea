"""PNCA (pseudo-non-causal attention) mel decoder.

Parity targets: /root/reference/kantts/models/sambert/__init__.py:187-348
(MultiHeadPNCAAttention, PNCABlock) and kantts_sambert.py:90-253,503-612
(HybridAttentionDecoder, MelPNCADecoder).

Each decoder step runs TWO banded attentions from the same queries:
- over the decoder's own history ``x``: causal band, keys j in
  [t - x_band_width, t];
- over the length-regulated encoder ``memory`` ``h``: lookahead band, keys j
  in [t, t + h_band_width].

TPU-first design:
- Training is one parallel teacher-forced pass: full (T, T) attention with the
  band masks — two einsum pairs per layer on the MXU.
- Inference replaces the reference's per-frame python loop + growing k/v
  concat (kantts_sambert.py:569-611, __init__.py:228-235) with a single
  ``lax.scan`` over a PREALLOCATED k/v cache (dynamic_update_slice per step).
  The h-side k/v are projected once for the whole memory before the scan.
- Band widths are traced values: they enter through comparisons in the masks,
  so one compiled program serves every band width.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from kantts_tpu.models.sambert.common import (
    NEG_INF,
    PositionwiseConvFeedForward,
    Prenet,
    torch_linear,
)


def pnca_band_masks(
    T: int,
    x_band_width: jnp.ndarray,
    h_band_width: jnp.ndarray,
    pad_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Tq, Tk) band masks (True = disallowed), broadcast over batch with the
    key-side padding mask merged in (reference get_pnca_attn_mask,
    kantts_sambert.py:135-166)."""
    q = jnp.arange(T)[:, None]
    k = jnp.arange(T)[None, :]
    x_mask = ~((k >= q - x_band_width) & (k <= q))
    h_mask = ~((k >= q) & (k <= q + h_band_width))
    if pad_mask is not None:
        x_mask = x_mask[None] | pad_mask[:, None, :]
        h_mask = h_mask[None] | pad_mask[:, None, :]
    else:
        x_mask = x_mask[None]
        h_mask = h_mask[None]
    return x_mask, h_mask


class MultiHeadPNCAAttention(nn.Module):
    """Dual-source multi-head attention (reference __init__.py:187-306)."""

    n_head: int
    d_model: int
    d_mem: int
    d_head: int
    dropout: float = 0.1
    dropatt: float = 0.0
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.layer_norm = nn.LayerNorm(epsilon=1e-6)  # LN stays f32
        self.w_x_qkv = torch_linear(3 * self.n_head * self.d_head,
                                    name="w_x_qkv", dtype=self.dtype)
        self.fc_x = torch_linear(self.d_model, name="fc_x", dtype=self.dtype)
        self.w_h_kv = torch_linear(2 * self.n_head * self.d_head,
                                   name="w_h_kv", dtype=self.dtype)
        self.fc_h = torch_linear(self.d_model, name="fc_h", dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)

    def _split_heads(self, t: jnp.ndarray) -> jnp.ndarray:
        B, T, _ = t.shape
        return t.reshape(B, T, self.n_head, self.d_head).transpose(0, 2, 1, 3)

    def _merge_heads(self, t: jnp.ndarray) -> jnp.ndarray:
        B, H, T, D = t.shape
        return t.transpose(0, 2, 1, 3).reshape(B, T, H * D)

    def compute_h_kv(self, memory: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """memory (B, T, d_mem) -> h_k, h_v each (B, H, T, d_head)."""
        h_kv = self.w_h_kv(memory)
        h_k, h_v = jnp.split(h_kv, 2, axis=-1)
        return self._split_heads(h_k), self._split_heads(h_v)

    def _attend(self, q, k, v, mask, deterministic):
        # softmax in f32 (mixed-precision safe); weighted sum in v's dtype
        temp = float(np.sqrt(self.d_head))
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / temp
        if mask is not None:
            attn = jnp.where(mask, NEG_INF, attn)
        attn = jax.nn.softmax(attn, axis=-1)
        if self.dropatt > 0.0 and not deterministic:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - self.dropatt, attn.shape
            )
            attn = attn * keep / (1.0 - self.dropatt)
        return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v), attn

    def __call__(
        self,
        x: jnp.ndarray,
        memory: jnp.ndarray,
        x_attn_mask: Optional[jnp.ndarray] = None,
        h_attn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """Parallel (teacher-forced) pass. Masks: (B|1, Tq, Tk) True=disallow."""
        residual = x
        h_k, h_v = self.compute_h_kv(memory)

        xn = self.layer_norm(x)
        qkv = self.w_x_qkv(xn)
        x_q, x_k, x_v = jnp.split(qkv, 3, axis=-1)
        x_q, x_k, x_v = map(self._split_heads, (x_q, x_k, x_v))

        xm = x_attn_mask[:, None] if x_attn_mask is not None else None
        hm = h_attn_mask[:, None] if h_attn_mask is not None else None
        out_x, attn_x = self._attend(x_q, x_k, x_v, xm, deterministic)
        out_h, attn_h = self._attend(x_q, h_k, h_v, hm, deterministic)

        out = self.fc_x(self._merge_heads(out_x)) + self.fc_h(self._merge_heads(out_h))
        out = self.drop(out, deterministic=deterministic)
        return (out + residual).astype(residual.dtype), attn_x, attn_h

    def step(
        self,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        cache_k: jnp.ndarray,
        cache_v: jnp.ndarray,
        h_k: jnp.ndarray,
        h_v: jnp.ndarray,
        x_band_width: jnp.ndarray,
        h_band_width: jnp.ndarray,
        mem_pad_mask: Optional[jnp.ndarray],
        deterministic: bool = True,
    ):
        """One incremental step. x_t: (B, 1, d_model); caches (B, H, T, d_head)
        (preallocated, rows >= t are zeros); h_k/h_v precomputed."""
        residual = x_t
        xn = self.layer_norm(x_t)
        qkv = self.w_x_qkv(xn)
        x_q, x_k, x_v = jnp.split(qkv, 3, axis=-1)
        x_q, x_k, x_v = map(self._split_heads, (x_q, x_k, x_v))  # (B,H,1,dh)

        cache_k = jax.lax.dynamic_update_slice_in_dim(
            cache_k, x_k.astype(cache_k.dtype), t, axis=2)
        cache_v = jax.lax.dynamic_update_slice_in_dim(
            cache_v, x_v.astype(cache_v.dtype), t, axis=2)

        T = cache_k.shape[2]
        j = jnp.arange(T)[None, None, None, :]
        x_mask = ~((j >= t - x_band_width) & (j <= t))
        h_mask = ~((j >= t) & (j <= t + h_band_width))
        if mem_pad_mask is not None:
            h_mask = h_mask | mem_pad_mask[:, None, None, :]

        out_x, attn_x = self._attend(x_q, cache_k, cache_v, x_mask, deterministic)
        out_h, attn_h = self._attend(x_q, h_k, h_v, h_mask, deterministic)
        out = self.fc_x(self._merge_heads(out_x)) + self.fc_h(self._merge_heads(out_h))
        out = self.drop(out, deterministic=deterministic)
        return ((out + residual).astype(residual.dtype), cache_k, cache_v,
                attn_x, attn_h)


class PNCABlock(nn.Module):
    """PNCA attention + pointwise conv FFN (kernel (1,1) per decoder config)
    (reference __init__.py:309-348)."""

    d_model: int
    d_mem: int
    n_head: int
    d_head: int
    d_inner: int
    kernel_sizes: Sequence[int] = (1, 1)
    dropout: float = 0.1
    dropout_attn: float = 0.0
    dropout_relu: float = 0.0
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.pnca_attn = MultiHeadPNCAAttention(
            self.n_head, self.d_model, self.d_mem, self.d_head,
            self.dropout, self.dropout_attn, dtype=self.dtype,
        )
        self.pos_ffn = PositionwiseConvFeedForward(
            self.d_model, self.d_inner, self.kernel_sizes,
            self.dropout_relu, self.dropout, dtype=self.dtype,
        )

    def __call__(self, x, memory, mask=None, x_attn_mask=None, h_attn_mask=None,
                 deterministic: bool = True):
        out, attn_x, attn_h = self.pnca_attn(
            x, memory, x_attn_mask, h_attn_mask, deterministic
        )
        if mask is not None:
            out = jnp.where(mask[..., None], 0.0, out)
        out = self.pos_ffn(out, mask, deterministic)
        if mask is not None:
            out = jnp.where(mask[..., None], 0.0, out)
        return out, attn_x, attn_h

    def step(self, x_t, t, cache_k, cache_v, h_k, h_v, x_band_width,
             h_band_width, mem_pad_mask, deterministic: bool = True):
        out, cache_k, cache_v, attn_x, attn_h = self.pnca_attn.step(
            x_t, t, cache_k, cache_v, h_k, h_v, x_band_width, h_band_width,
            mem_pad_mask, deterministic,
        )
        out = self.pos_ffn(out, None, deterministic)
        return out, cache_k, cache_v, attn_x, attn_h

    def compute_h_kv(self, memory):
        return self.pnca_attn.compute_h_kv(memory)


class HybridAttentionDecoder(nn.Module):
    """Prenet + memory concat + N PNCA blocks + LN + output projection
    (reference kantts_sambert.py:90-253)."""

    d_in: int
    prenet_units: Tuple[int, ...]
    n_layer: int
    d_model: int
    d_mem: int
    n_head: int
    d_head: int
    d_inner: int
    d_out: int
    dropout: float = 0.1
    dropout_attn: float = 0.0
    dropout_relu: float = 0.0
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.prenet = Prenet(tuple(self.prenet_units), self.d_model)
        self.dec_in_proj = torch_linear(self.d_model, dtype=self.dtype)
        self.pnca = [
            PNCABlock(
                self.d_model, self.d_mem, self.n_head, self.d_head, self.d_inner,
                (1, 1), self.dropout, self.dropout_attn, self.dropout_relu,
                dtype=self.dtype, name=f"pnca_{i}",
            )
            for i in range(self.n_layer)
        ]
        self.ln = nn.LayerNorm(epsilon=1e-6)  # final LN in f32
        self.dec_out_proj = torch_linear(self.d_out)  # output head in f32
        self.drop = nn.Dropout(self.dropout)

    def __call__(
        self,
        inputs: jnp.ndarray,
        memory: jnp.ndarray,
        x_band_width: jnp.ndarray,
        h_band_width: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_attns: bool = False,
    ):
        """Teacher-forced parallel pass. inputs: (B, T, d_in) shifted targets."""
        h = self.prenet(inputs, deterministic)
        h = jnp.concatenate([memory, h], axis=-1)
        h = self.dec_in_proj(h)
        if mask is not None:
            h = jnp.where(mask[..., None], 0.0, h)
        h = h * float(np.sqrt(self.d_model))
        h = self.drop(h, deterministic=deterministic)

        T = h.shape[1]
        x_attn_mask, h_attn_mask = pnca_band_masks(T, x_band_width, h_band_width, mask)

        attns_x, attns_h = [], []
        for layer in self.pnca:
            h, attn_x, attn_h = layer(
                h, memory, mask, x_attn_mask, h_attn_mask, deterministic
            )
            if return_attns:
                attns_x.append(attn_x)
                attns_h.append(attn_h)
        h = self.ln(h)
        return self.dec_out_proj(h), attns_x, attns_h

    def prepare_h_kv(self, memory: jnp.ndarray):
        """Project memory to per-layer h k/v once before incremental decode."""
        return [layer.compute_h_kv(memory) for layer in self.pnca]

    def step(
        self,
        t: jnp.ndarray,
        prev_frame: jnp.ndarray,
        memory_t: jnp.ndarray,
        h_kv: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
        caches: Tuple[jnp.ndarray, jnp.ndarray],
        x_band_width: jnp.ndarray,
        h_band_width: jnp.ndarray,
        mem_pad_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """One decode step. prev_frame: (B, 1, d_in); memory_t: (B, 1, d_mem);
        caches: (cache_k, cache_v) each (L, B, H, T, d_head)."""
        h = self.prenet(prev_frame, deterministic)
        h = jnp.concatenate([memory_t, h], axis=-1)
        h = self.dec_in_proj(h)
        h = h * float(np.sqrt(self.d_model))
        h = self.drop(h, deterministic=deterministic)

        cache_k, cache_v = caches
        new_k, new_v = [], []
        for i, layer in enumerate(self.pnca):
            h, ck, cv, _, _ = layer.step(
                h, t, cache_k[i], cache_v[i], h_kv[i][0], h_kv[i][1],
                x_band_width, h_band_width, mem_pad_mask, deterministic,
            )
            new_k.append(ck)
            new_v.append(cv)
        h = self.ln(h)
        out = self.dec_out_proj(h)
        return out, (jnp.stack(new_k), jnp.stack(new_v))


class MelPNCADecoder(nn.Module):
    """LFR mel decoder head over HybridAttentionDecoder
    (reference kantts_sambert.py:503-612)."""

    prenet_units: Tuple[int, ...]
    nb_layers: int
    nb_heads: int
    d_model: int
    d_inner: int
    d_mem: int
    d_mel: int
    r: int
    dropout: float = 0.1
    dropout_attn: float = 0.0
    dropout_relu: float = 0.0
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.mel_dec = HybridAttentionDecoder(
            d_in=self.d_mel,
            prenet_units=tuple(self.prenet_units),
            n_layer=self.nb_layers,
            d_model=self.d_model,
            d_mem=self.d_mem,
            n_head=self.nb_heads,
            d_head=self.d_model // self.nb_heads,
            d_inner=self.d_inner,
            d_out=self.d_mel * self.r,
            dropout=self.dropout,
            dropout_attn=self.dropout_attn,
            dropout_relu=self.dropout_relu,
            dtype=self.dtype,
        )

    def __call__(
        self,
        memory: jnp.ndarray,
        x_band_width: jnp.ndarray,
        h_band_width: jnp.ndarray,
        target: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_attns: bool = False,
    ):
        """Teacher-forced: target (B, T_frames, d_mel) at full frame rate;
        decoder consumes the LAST frame of each r-group, shifted right with a
        zero go-frame (reference kantts_sambert.py:556-567)."""
        B = memory.shape[0]
        last_frames = target[:, self.r - 1 :: self.r, :]
        go = jnp.zeros((B, 1, self.d_mel), dtype=target.dtype)
        inputs = jnp.concatenate([go, last_frames], axis=1)[:, :-1, :]
        return self.mel_dec(
            inputs, memory, x_band_width, h_band_width, mask,
            deterministic, return_attns,
        )

    # inference driver lives below as a plain function (pnca_decoder_infer);
    # these two methods are its apply targets
    def dec_prepare(self, memory):
        return self.mel_dec.prepare_h_kv(memory)

    def dec_step(self, t, prev_frame, memory_t, h_kv, caches, x_band_width,
                 h_band_width, mem_pad_mask):
        return self.mel_dec.step(
            t, prev_frame, memory_t, h_kv, caches, x_band_width, h_band_width,
            mem_pad_mask, deterministic=True,
        )


def pnca_decoder_infer(
    decoder: MelPNCADecoder,
    variables,
    memory: jnp.ndarray,
    x_band_width: jnp.ndarray,
    h_band_width: jnp.ndarray,
    mem_pad_mask: Optional[jnp.ndarray] = None,
    unroll: int = 12,
) -> jnp.ndarray:
    """Incremental decode as ONE lax.scan over memory steps.

    Replaces the reference's python frame loop (kantts_sambert.py:569-611).
    Returns (B, T, d_mel * r) decoder outputs. ``unroll`` amortizes per-step
    dispatch overhead — the per-step matmuls are tiny (d_model=128), so the
    scan is launch-bound, not FLOP-bound.
    """
    B, T, _ = memory.shape
    L = decoder.nb_layers
    H = decoder.nb_heads
    dh = decoder.d_model // H
    d_mel = decoder.d_mel

    h_kv = decoder.apply(variables, memory, method=MelPNCADecoder.dec_prepare)

    # KV caches live in the compute dtype: with bf16 mixed precision they
    # halve the per-step HBM traffic of the decode scan
    cache_dtype = decoder.dtype or memory.dtype
    cache_k = jnp.zeros((L, B, H, T, dh), dtype=cache_dtype)
    cache_v = jnp.zeros((L, B, H, T, dh), dtype=cache_dtype)
    go = jnp.zeros((B, 1, d_mel), dtype=memory.dtype)

    def body(carry, t):
        prev, caches = carry
        memory_t = jax.lax.dynamic_slice_in_dim(memory, t, 1, axis=1)
        out, caches = decoder.apply(
            variables, t, prev, memory_t, h_kv, caches,
            x_band_width, h_band_width, mem_pad_mask,
            method=MelPNCADecoder.dec_step,
        )
        new_prev = out[:, :, -d_mel:]
        return (new_prev, caches), out[:, 0, :]

    (_, _), outs = jax.lax.scan(body, (go, (cache_k, cache_v)), jnp.arange(T),
                                unroll=min(unroll, T))
    return jnp.swapaxes(outs, 0, 1)  # (B, T, d_mel * r)
