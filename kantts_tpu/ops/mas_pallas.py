"""Pallas TPU kernel for monotonic alignment search (MAS, width 1).

The MAS Viterbi is a long sequential DP over mel frames with a short vector
state — the worst case for a host round trip (the reference ships it to CPU
numba mid-forward, kantts_sambert.py:759-764). This kernel runs the forward
DP + backtrack entirely in VMEM, vectorizing GROUPS of batch items across the
VPU sublane axis (the time recursion is inherently sequential; the batch axis
is where the parallelism is). Grid = (B / group,); within a grid step all
``group`` items advance together.

Numerics/semantics match alignment.mas_width1 (tie -> take j-1; row 0 pinned
to column 0; rows/cols beyond out_len/in_len zero) — tested against both the
lax.scan version and the numpy DP.

Mosaic footgun encountered and worked around here: a dynamic-slice start of
the literal form ``i - 1`` faults (non-negativity unprovable); clamp with
``jnp.maximum(i - 1, 0)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _make_kernel(T_mel: int, T_text: int, G: int):
    def kernel(in_len_ref, out_len_ref, attn_ref, opt_ref, logp_ref, take_ref):
        """attn_ref/opt_ref: (1, T_mel, G, T_text) VMEM blocks;
        logp_ref: (G, T_text) scratch (previous DP row);
        take_ref: (T_mel, G, T_text) scratch (backpointers)."""
        grp = pl.program_id(0)

        # per-item lengths for this group: (G, 1)
        in_len = jnp.stack(
            [in_len_ref[grp * G + g] for g in range(G)]
        ).reshape(G, 1)
        out_len = jnp.stack(
            [out_len_ref[grp * G + g] for g in range(G)]
        ).reshape(G, 1)

        cols = jax.lax.broadcasted_iota(jnp.int32, (G, T_text), 1)
        col_valid = cols < in_len

        row0 = jnp.log(jnp.clip(attn_ref[0, 0], 1e-30, None))
        row0 = jnp.where((cols == 0) & col_valid, row0, NEG)
        logp_ref[...] = row0
        take_ref[0] = jnp.zeros((G, T_text), jnp.int8)

        # ---- forward DP over mel frames (vectorized over the group);
        # backpointers stored as int8 (4x less VMEM -> bigger groups)
        def dp_body(i, _):
            prev = logp_ref[...]  # (G, T_text)
            shifted = pltpu.roll(prev, 1, axis=1)
            shifted = jnp.where(cols == 0, NEG, shifted)
            take = (shifted >= prev).astype(jnp.int8)
            best = jnp.maximum(shifted, prev)
            row = jnp.log(jnp.clip(attn_ref[0, i], 1e-30, None))
            row = jnp.where(col_valid, row, NEG)
            logp_ref[...] = row + best
            take_ref[i] = take
            return 0

        jax.lax.fori_loop(1, T_mel, dp_body, 0)

        # ---- backtrack from (out_len-1, in_len-1) per item
        start_row = out_len - 1  # (G, 1)

        def bt_body(step, cur_col):
            i = T_mel - 1 - step
            active = i <= start_row  # (G, 1)
            onehot = ((cols == cur_col) & active & col_valid).astype(jnp.float32)
            opt_ref[0, i] = onehot
            take_row = take_ref[i].astype(jnp.int32)  # (G, T_text)
            tp = jnp.sum(jnp.where(cols == cur_col, take_row, 0), axis=1,
                         keepdims=True)
            move = jnp.where(active & (i > 0), tp, 0)
            return jnp.where(active, cur_col - move, cur_col)

        jax.lax.fori_loop(0, T_mel, bt_body, in_len - 1)

    return kernel


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def b_mas_pallas(attn: jnp.ndarray, in_lens: jnp.ndarray,
                 out_lens: jnp.ndarray, group: int = 16,
                 interpret: bool = False) -> jnp.ndarray:
    """Batched MAS on TPU via Pallas. attn: (B, 1, T_mel, T_text) soft
    attention -> same-shape hard 0/1 alignment. ``group`` batch items run
    vectorized per grid step (must divide the padded batch)."""
    B, _, T_mel, T_text = attn.shape
    G = min(group, B)
    pad_b = (-B) % G
    if pad_b:
        attn = jnp.pad(attn, ((0, pad_b), (0, 0), (0, 0), (0, 0)),
                       constant_values=1.0)
        in_lens = jnp.pad(in_lens, (0, pad_b), constant_values=1)
        out_lens = jnp.pad(out_lens, (0, pad_b), constant_values=1)
    Bp = B + pad_b

    # (groups, T_mel, G, T_text): group members sit on the sublane axis
    attn_g = attn[:, 0].reshape(Bp // G, G, T_mel, T_text).transpose(0, 2, 1, 3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Bp // G,),
        in_specs=[
            pl.BlockSpec((1, T_mel, G, T_text), lambda grp, *_: (grp, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T_mel, G, T_text),
                               lambda grp, *_: (grp, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((G, T_text), jnp.float32),
            pltpu.VMEM((T_mel, G, T_text), jnp.int8),
        ],
    )

    out = pl.pallas_call(
        _make_kernel(T_mel, T_text, G),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp // G, T_mel, G, T_text), jnp.float32),
        interpret=interpret,
    )(in_lens.astype(jnp.int32), out_lens.astype(jnp.int32), attn_g)

    out = out.transpose(0, 2, 1, 3).reshape(Bp, T_mel, T_text)[:B]
    return out[:, None]
