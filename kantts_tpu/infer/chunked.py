"""Chunked-batch vocoder inference: trade FLOPs for MXU occupancy at B=1.

Single-utterance copy synthesis is lane-underfill-bound on TPU: the
generator's late-stage channel counts (16-64) fill only a sliver of the
128-wide MXU/VPU lanes when batch is 1, so the chip runs at ~2.5% MFU while
B=8 of the same program reaches ~10% (PERFORMANCE.md batch-scaling sweep).

Because the production generators are CAUSAL (reference hifigan.py:59-60),
an utterance can be split along time into n_chunks windows of
(receptive_field + chunk) mel frames and synthesized as ONE batched call —
the batch dimension recovers the lane occupancy, and with full
receptive-field context each window's emitted region is bit-equal to the
full-utterance program (tests/test_chunked.py). The cost is recomputing the
context prefix of every window: FLOPs scale by (ctx + chunk) / chunk, which
the batch efficiency more than pays back (tools/bench_chunked.py measures
the sweet spot; n_chunks=8 at 400 frames ~2x faster than the plain program).

Everything is static: window starts, per-window emit offsets, and the
stitch are Python ints at trace time, so the whole path (window gather ->
batched generator -> stitch) is one XLA program per (T, n_chunks) pair.

Windows never see artificial LEFT frames: explicit zeros are not equivalent
to the causal convs' implicit padding (biases make zero inputs nonzero deep
in the stack — see infer/streaming.py), so early windows start at frame 0
and emit at a smaller offset instead. Right padding is harmless: a causal
stack provably never reads frames to the right of an emitted position.

NSF generators work too: the harmonic source (whose phase is a cumsum over
the WHOLE utterance, reference layers.py:253-259) is computed once on the
full input and windowed at sample rate alongside the mel, so the per-window
forwards see exactly the full program's excitation.
"""

from __future__ import annotations

import threading
import weakref
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from kantts_tpu.infer.streaming import causal_receptive_field_frames

_CHUNKED_CACHE: dict = {}  # (id(gen), T, n_chunks, ctx) -> (weakref, fn)
_CHUNKED_CACHE_LOCK = threading.RLock()


def _plan(T: int, n_chunks: int, ctx: int):
    """Static window plan: (starts, emit_offsets, chunk, window_frames)."""
    chunk = -(-T // n_chunks)  # ceil
    window = ctx + chunk
    starts, offsets = [], []
    for c in range(n_chunks):
        s = c * chunk
        ctx_start = max(0, s - ctx)
        starts.append(ctx_start)
        offsets.append(s - ctx_start)
    return starts, offsets, chunk, window


def _context_frames(generator, context_frames: Optional[int]) -> int:
    assert generator.causal, "chunked inference requires the causal generator"
    if context_frames is not None:
        return int(context_frames)
    ctx = causal_receptive_field_frames(
        generator.kernel_size, generator.upsample_scales,
        generator.resblock_kernel_sizes, generator.resblock_dilations)
    if generator.nsf_params is not None:
        # source_downs_i is a causal conv of kernel 2u at stride u over the
        # sample-rate excitation — at most 2 extra mel frames of left context
        # at any stage; pad the margin a little (cheap relative to ctx).
        ctx += 4
    return ctx


def chunked_apply(generator, variables, mel, rng, n_chunks: int,
                  context_frames: Optional[int] = None):
    """In-graph chunked forward: mel (1, T, C) -> wav (1, T*hop, out_ch).

    Traceable (call inside any jitted program — infer/e2e.py fuses it after
    the acoustic decode); everything about the plan is static Python ints.
    """
    ctx = _context_frames(generator, context_frames)
    T = int(mel.shape[1])
    starts, offsets, chunk, window = _plan(T, n_chunks, ctx)
    hop = int(np.prod(generator.upsample_scales))

    # Right-pad so every static window slice is in range; padded frames only
    # ever sit right of emitted positions.
    pad = starts[-1] + window - T
    m = jnp.pad(mel[0], [(0, pad), (0, 0)])
    windows = jnp.stack([
        jax.lax.dynamic_slice_in_dim(m, s, window, axis=0) for s in starts
    ])  # (n_chunks, window, C)
    if generator.nsf_params is not None:
        # The NSF source phase is a cumsum over the WHOLE utterance and the
        # noise draw is shape-dependent, so compute the excitation ONCE on
        # the full (1, T, C) input — identical to the unchunked program —
        # then window it at sample rate alongside the mel windows.
        exc = generator.apply(variables, mel, excitation_only=True,
                              rngs={"noise": rng})  # (1, T*hop, 1)
        e = jnp.pad(exc[0], [(0, pad * hop), (0, 0)])
        exc_windows = jnp.stack([
            jax.lax.dynamic_slice_in_dim(e, s * hop, window * hop, axis=0)
            for s in starts
        ])  # (n_chunks, window*hop, 1)
        y = generator.apply(variables, windows, excitation=exc_windows)
    else:
        y = generator.apply(variables, windows, rngs={"noise": rng})
    pieces = [
        jax.lax.dynamic_slice_in_dim(y[c], offsets[c] * hop, chunk * hop,
                                     axis=0)
        for c in range(n_chunks)
    ]
    return jnp.concatenate(pieces, axis=0)[None, : T * hop]


def make_chunked_infer(generator, T: int, n_chunks: int,
                       context_frames: Optional[int] = None):
    """Jitted (variables, mel(B=1,T,C), rng) -> wav(1, T*hop, out_ch),
    cached per (generator, T, n_chunks) with weakref eviction (same
    lifetime contract as infer/streaming.py)."""
    ctx = _context_frames(generator, context_frames)
    key = (id(generator), int(T), int(n_chunks), ctx)
    with _CHUNKED_CACHE_LOCK:
        entry = _CHUNKED_CACHE.get(key)
        if entry is not None and entry[0]() is generator:
            return entry[1]

        @jax.jit
        def fn(variables, mel, rng):
            return chunked_apply(generator, variables, mel, rng,
                                 n_chunks, ctx)

        def _evict(_ref, key=key):
            with _CHUNKED_CACHE_LOCK:
                _CHUNKED_CACHE.pop(key, None)

        _CHUNKED_CACHE[key] = (weakref.ref(generator, _evict), fn)
        return fn
