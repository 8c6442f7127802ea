"""Streaming (chunked) vocoder synthesis with bounded latency.

The HiFi-GAN generator in its production configs is CAUSAL (left-padded
convs, tail-trimmed transposed convs — reference hifigan.py:59-60), so the
waveform at frame t depends only on mel frames <= t. Chunked synthesis with
``context_frames`` of left context is therefore EXACT once the context covers
the receptive field: each chunk is computed as generator(mel[t0-ctx : t1])
and only the samples for [t0, t1) are emitted.

Latency = chunk_frames * hop / sr seconds; throughput stays on the jitted
path (one compiled program per (ctx + chunk) shape).

The reference has no streaming mode; this realizes what its causal design
was for.
"""

from __future__ import annotations

import threading
import weakref
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


_RUN_CACHE: dict = {}  # id(generator) -> (weakref, jitted fn)
# RLock: the weakref finalizer can fire at any point, including while this
# thread already holds the lock inside _run_window_fn
_RUN_CACHE_LOCK = threading.RLock()


def _run_window_fn(generator):
    """Per-generator jitted window program, cached at module level so every
    stream_synthesis call reuses one compiled program (a per-call jit
    closure would retrace each utterance — seconds of first-chunk latency).
    Keyed by id() and held through a weakref whose finalizer evicts the
    entry, so generators (and their compiled XLA programs) are released
    when the caller drops them — a strong reference would leak every
    generator ever streamed in a long-lived serving process. YAML-built
    modules carry list fields, so they are not hashable as jit static args
    (nor as WeakKeyDictionary keys)."""
    key = id(generator)
    with _RUN_CACHE_LOCK:
        entry = _RUN_CACHE.get(key)
        if entry is not None and entry[0]() is generator:
            return entry[1]

        @jax.jit
        def fn(variables, window, rng):
            return generator.apply(variables, window, rngs={"noise": rng})

        def _evict(_ref, key=key):
            with _RUN_CACHE_LOCK:
                _RUN_CACHE.pop(key, None)

        _RUN_CACHE[key] = (weakref.ref(generator, _evict), fn)
        return fn


def causal_receptive_field_frames(
    kernel_size: int,
    upsample_scales,
    resblock_kernel_sizes,
    resblock_dilations,
) -> int:
    """Upper bound of the generator's receptive field, in mel frames.

    Counted backwards through the stack: resblock dilated convs act at
    progressively upsampled rates, so their sample-domain extent shrinks when
    expressed in frames.
    """
    # frame-rate context from conv_pre
    frames = kernel_size - 1
    upsampled = 1
    for i, scale in enumerate(upsample_scales):
        upsampled *= scale
        # repeat-upsample conv (k=kernel_size) + resblocks at this rate
        samples = kernel_size - 1
        for k, dils in zip(resblock_kernel_sizes, resblock_dilations):
            for d in dils:
                samples += (k - 1) * d  # conv1 (dilated)
                samples += k - 1  # conv2
        frames += -(-samples // upsampled) + 1
    # conv_post at full rate
    frames += 1
    return frames


def stream_synthesis(
    generator,
    variables,
    mel: np.ndarray,
    chunk_frames: int = 50,
    context_frames: Optional[int] = None,
    rng: Optional[jax.Array] = None,
) -> Iterator[np.ndarray]:
    """Yield waveform chunks for a (T, C) mel, each ``chunk_frames`` long.

    ``context_frames`` defaults to the generator's receptive field (exactness
    guaranteed); smaller values trade accuracy at chunk boundaries for less
    recompute.
    """
    assert generator.causal, "streaming requires the causal generator"
    if context_frames is None:
        context_frames = causal_receptive_field_frames(
            generator.kernel_size, generator.upsample_scales,
            generator.resblock_kernel_sizes, generator.resblock_dilations,
        )
    hop = int(np.prod(generator.upsample_scales))
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    _run = _run_window_fn(generator)

    def run(window):
        return _run(variables, window, rng)

    T = mel.shape[0]
    window_frames = context_frames + chunk_frames
    for start in range(0, T, chunk_frames):
        end = min(start + chunk_frames, T)
        # NOTE: explicit zero frames are NOT equivalent to the causal convs'
        # implicit padding beyond the first layer (biases turn zero inputs
        # into nonzero deep activations), so windows must contain only REAL
        # frames on the left. Early chunks therefore start at frame 0; the
        # static window size is reached by RIGHT padding, which a causal
        # stack provably ignores.
        ctx_start = max(0, start - context_frames)
        window = mel[ctx_start:end]
        ctx = start - ctx_start
        pad = window_frames - window.shape[0]
        window = np.pad(window, [(0, pad), (0, 0)]).astype(np.float32)
        y = np.asarray(run(jnp.asarray(window[None])))[0]
        yield y[ctx * hop : (ctx + end - start) * hop, :]
