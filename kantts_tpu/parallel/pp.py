"""Pipeline parallelism (GPipe schedule) over a ``pipe`` mesh axis.

The reference has no pipeline parallelism at all — its only parallelism is
multi-process DDP (/root/reference/kantts/train/trainer.py:25-52). This
module goes beyond it for scaling DEEP SAM-BERT variants past one chip's
HBM: the FFT-block stack (sambert.py SelfAttentionEncoder — N identical
layers) is the natural pipeline target.

TPU-first design:

- per-layer params are STACKED on a leading axis and sharded over ``pipe``,
  so each device holds L/S contiguous layers in its own HBM;
- the classic GPipe microbatch schedule runs inside ONE shard_map program:
  at tick t, stage s applies its layers to microbatch (t - s) and hands the
  activation to stage s+1 with a single ``jax.lax.ppermute`` over ICI —
  point-to-point neighbor traffic, never an all-to-all;
- everything is ``lax.scan``'d, shape-static, and differentiable: jax.grad
  flows through ppermute/scan, so the same combinator serves training.

Semantics: ``pipeline_apply`` computes exactly what applying the L layers
sequentially computes (asserted in tests/test_pipeline_parallel.py down to
float tolerance); the schedule only changes WHERE each layer runs. The
bubble fraction is (S-1)/(M+S-1), so pick n_microbatches >= ~4x stages in
production. The final ``psum`` broadcast of the output is a convenience for
small models — at scale, consume the output on the last stage instead.

Composes with the rest of the parallelism stack: data parallelism
(parallel/mesh.py) shards the batch axis, tensor parallelism (parallel/tp.py)
shards attention/FFN kernels, and ``pipe`` shards layers. Expert parallelism
is N/A for this model family (no MoE layers in the reference).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

PIPE_AXIS = "pipe"


def make_pipe_mesh(n_pipe: int, devices=None) -> Mesh:
    """1-D mesh over the ``pipe`` axis. Stages should be ICI neighbors on
    real hardware (jax.devices() order already is on a TPU slice)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices[:n_pipe]), (PIPE_AXIS,))


def stack_layer_params(params: Any, prefix: str, n_layer: int) -> Any:
    """Stack ``params[f"{prefix}{i}"]`` for i in [0, n_layer) on a new
    leading axis — the layout ``pipeline_apply`` shards over ``pipe``.

    All layers must be structurally identical (true for the FFT stacks:
    sambert.py names them ``fft_0..fft_{N-1}`` with one shape)."""
    layers = [params[f"{prefix}{i}"] for i in range(n_layer)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def pipeline_apply(
    layer_fn: Callable[[Any, jnp.ndarray, Any], jnp.ndarray],
    stacked_params: Any,
    h: jnp.ndarray,
    n_microbatches: int,
    mesh: Mesh,
    extras: Any = None,
) -> jnp.ndarray:
    """GPipe-style pipelined application of L stacked layers.

    ``layer_fn(layer_params, h, extras) -> h`` is ONE layer's forward;
    ``stacked_params`` leaves are (L, ...); ``h`` is (B, ...) activations
    with B % n_microbatches == 0; ``extras`` is an optional pytree of
    per-sample side inputs (e.g. attention masks, leading axis B) that ride
    along with each microbatch — they are index-selected per stage rather
    than ppermuted (they are replicated inputs, so selection is free).

    Returns the same (B, ...) output as applying the L layers in sequence.
    """
    S = int(mesh.shape[PIPE_AXIS])
    leaves = jax.tree_util.tree_leaves(stacked_params)
    L = int(leaves[0].shape[0])
    if L % S:
        raise ValueError(f"{L} layers do not fold onto {S} pipeline stages")
    lps = L // S
    B = int(h.shape[0])
    M = int(n_microbatches)
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    mb = B // M

    def split(x):
        return x.reshape((M, mb) + x.shape[1:])

    h_all = split(h)
    ex_all = jax.tree_util.tree_map(split, extras)

    def fold(p):
        return p.reshape((S, lps) + p.shape[1:])

    params_f = jax.tree_util.tree_map(fold, stacked_params)
    pspec = jax.tree_util.tree_map(lambda _: P(PIPE_AXIS), params_f)

    @partial(jax.shard_map, mesh=mesh, in_specs=(pspec, P(), P()),
             out_specs=P(), check_vma=False)
    def run(params_shard, h_in_all, ex_in_all):
        # params_shard leaves: (1, lps, ...) — this stage's layers
        pstage = jax.tree_util.tree_map(lambda p: p[0], params_shard)
        stage = jax.lax.axis_index(PIPE_AXIS)
        is_first = stage == 0
        is_last = stage == S - 1

        def apply_stage(hc, ex):
            def body(hcur, pl):
                return layer_fn(pl, hcur, ex), None

            out, _ = jax.lax.scan(body, hc, pstage)
            return out

        def tick(carry, t):
            recv, outbuf = carry
            # stage s processes microbatch (t - s) at tick t
            mb_idx = jnp.clip(t - stage, 0, M - 1)
            x_t = jax.lax.dynamic_index_in_dim(
                h_in_all, mb_idx, 0, keepdims=False)
            h_cur = jnp.where(is_first, x_t, recv)
            ex_t = jax.tree_util.tree_map(
                lambda e: jax.lax.dynamic_index_in_dim(
                    e, mb_idx, 0, keepdims=False),
                ex_in_all)
            out = apply_stage(h_cur, ex_t)
            # hand the activation to the next stage (last stage's drops)
            sent = jax.lax.ppermute(
                out, PIPE_AXIS, [(i, i + 1) for i in range(S - 1)])
            # the last stage emits microbatch (t - (S-1)) when it is real
            oidx = jnp.clip(t - (S - 1), 0, M - 1)
            valid = jnp.logical_and(is_last, t >= S - 1)
            cur = jax.lax.dynamic_index_in_dim(outbuf, oidx, 0,
                                               keepdims=False)
            outbuf = jax.lax.dynamic_update_index_in_dim(
                outbuf, jnp.where(valid, out, cur), oidx, 0)
            return (sent, outbuf), None

        recv0 = jnp.zeros(h_in_all.shape[1:], h_in_all.dtype)
        outbuf0 = jnp.zeros_like(h_in_all)
        (_, outbuf), _ = jax.lax.scan(
            tick, (recv0, outbuf0), jnp.arange(M + S - 1))
        # broadcast the last stage's buffer to every device (demo-scale
        # convenience; at scale keep the output resident on the last stage)
        outbuf = jnp.where(is_last, outbuf, jnp.zeros_like(outbuf))
        return jax.lax.psum(outbuf, PIPE_AXIS)

    out = run(params_f, h_all, ex_all)
    return out.reshape((B,) + out.shape[2:])


def sambert_encoder_pipeline(
    enc_params: Any,
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    mesh: Mesh,
    n_microbatches: int,
    *,
    n_layer: int,
    d_model: int,
    n_head: int,
    d_inner: int,
    max_len: int,
) -> jnp.ndarray:
    """Pipeline-parallel SelfAttentionEncoder forward (deterministic),
    numerically identical to ``SelfAttentionEncoder.apply`` (sambert.py —
    scale + sinusoidal positions, N FFT blocks, final f32 LayerNorm;
    reference kantts_sambert.py:22-87). ``enc_params`` is the encoder's
    params subtree (``fft_0..fft_{N-1}`` + ``ln``)."""
    import flax.linen as nn

    from kantts_tpu.models.sambert.common import FFTBlock
    from kantts_tpu.models.sambert.positions import add_sinusoidal_position

    h = x * float(np.sqrt(d_model))
    h = add_sinusoidal_position(h, max_len)
    T = h.shape[1]
    slf_attn_mask = (
        jnp.broadcast_to(mask[:, None, :], (mask.shape[0], T, T))
        if mask is not None else None
    )
    block = FFTBlock(d_model, n_head, d_model // n_head, d_inner, (3, 1))

    def layer_fn(p, hc, ex):
        m, sm = ex
        out, _ = block.apply({"params": p}, hc, m, sm, deterministic=True)
        return out

    stacked = stack_layer_params(enc_params, "fft_", n_layer)
    h = pipeline_apply(layer_fn, stacked, h, n_microbatches, mesh,
                       extras=(mask, slf_attn_mask))
    return nn.LayerNorm(epsilon=1e-6).apply(
        {"params": enc_params["ln"]}, h.astype(jnp.float32))
