"""Streaming vocoder synthesis must reproduce the full-utterance output
exactly (the causal design's guarantee)."""

import jax
import jax.numpy as jnp
import numpy as np

from kantts_tpu.infer.streaming import (
    causal_receptive_field_frames,
    stream_synthesis,
)
from kantts_tpu.models.hifigan.generator import Generator

CFG = dict(
    in_channels=20, out_channels=1, channels=32, kernel_size=7,
    upsample_scales=(4, 4), upsample_kernal_sizes=(8, 8),
    resblock_kernel_sizes=(3, 7), resblock_dilations=((1, 3), (1, 3)),
    causal=True,
)


def test_stream_matches_full_synthesis():
    gen = Generator(**CFG)
    rng = np.random.RandomState(0)
    mel = rng.randn(57, 20).astype(np.float32)  # odd length: exercises tail
    params = gen.init(jax.random.PRNGKey(0), jnp.asarray(mel[None]))

    full = np.asarray(gen.apply(params, jnp.asarray(mel[None])))[0]

    chunks = list(stream_synthesis(gen, params, mel, chunk_frames=16))
    streamed = np.concatenate(chunks, axis=0)

    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, atol=1e-5)


def test_receptive_field_estimate_sane():
    rf = causal_receptive_field_frames(
        CFG["kernel_size"], CFG["upsample_scales"],
        CFG["resblock_kernel_sizes"], CFG["resblock_dilations"],
    )
    assert 5 < rf < 200


def test_stream_latency_chunks():
    gen = Generator(**CFG)
    rng = np.random.RandomState(1)
    mel = rng.randn(40, 20).astype(np.float32)
    params = gen.init(jax.random.PRNGKey(0), jnp.asarray(mel[None]))
    hop = 16
    chunks = list(stream_synthesis(gen, params, mel, chunk_frames=10))
    assert len(chunks) == 4
    assert all(c.shape[0] == 10 * hop for c in chunks)


def test_stream_jit_program_reused_across_calls():
    """Repeated stream_synthesis calls for one generator must reuse one
    jitted program (a per-call closure would retrace every utterance and
    blow up first-chunk latency)."""
    from kantts_tpu.infer import streaming as streaming_mod

    gen = Generator(**CFG)
    rng = np.random.RandomState(2)
    mel = rng.randn(32, 20).astype(np.float32)
    params = gen.init(jax.random.PRNGKey(0), jnp.asarray(mel[None]))

    list(stream_synthesis(gen, params, mel, chunk_frames=8))
    fn = streaming_mod._RUN_CACHE[id(gen)][1]
    n_traces = fn._cache_size()
    list(stream_synthesis(gen, params, mel, chunk_frames=8))
    assert streaming_mod._RUN_CACHE[id(gen)][1] is fn
    assert fn._cache_size() == n_traces
