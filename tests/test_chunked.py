"""Chunked-batch vocoder inference (infer/chunked.py) is exact vs the full
single-program forward, including the uneven-tail and short-context cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kantts_tpu.infer.chunked import make_chunked_infer
from kantts_tpu.models.hifigan.generator import Generator

GEN_CFG = dict(
    in_channels=20, out_channels=1, channels=32, kernel_size=7,
    upsample_scales=(5, 2, 2), upsample_kernal_sizes=(10, 4, 4),
    resblock_kernel_sizes=(3, 7), resblock_dilations=((1, 3), (1, 3)),
    causal=True,
)


@pytest.fixture(scope="module")
def gen_and_vars():
    gen = Generator(**GEN_CFG)
    variables = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 20)))
    return gen, variables


@pytest.mark.parametrize("T,n_chunks", [
    (37, 3),
    pytest.param(96, 4, marks=pytest.mark.slow),
    pytest.param(100, 8, marks=pytest.mark.slow),
])
def test_chunked_matches_full(gen_and_vars, T, n_chunks):
    gen, variables = gen_and_vars
    mel = jnp.asarray(
        np.random.RandomState(T).randn(1, T, 20).astype(np.float32))
    rng = jax.random.PRNGKey(1)
    full = gen.apply(variables, mel, rngs={"noise": rng})
    fn = make_chunked_infer(gen, T, n_chunks)
    chunked = fn(variables, mel, rng)
    assert chunked.shape == full.shape
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(full), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("T,n_chunks", [
    (37, 3),
    pytest.param(100, 8, marks=pytest.mark.slow),
])
def test_chunked_matches_full_nsf(T, n_chunks):
    """NSF generator: the harmonic source (whole-utterance phase cumsum +
    shape-dependent noise draw) is computed once and windowed, so chunked
    output must equal the full program exactly."""
    gen = Generator(**{**GEN_CFG, "in_channels": 22,
                       "nsf_params": {"nb_harmonics": 7,
                                      "sampling_rate": 16000}})
    rs = np.random.RandomState(7)
    mel = rs.randn(1, T, 22).astype(np.float32)
    mel[..., -2] = rs.uniform(80.0, 250.0, mel.shape[:2])  # f0
    mel[..., -1] = (rs.rand(*mel.shape[:2]) > 0.3).astype(np.float32)  # uv
    mel = jnp.asarray(mel)
    variables = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 22)))
    rng = jax.random.PRNGKey(1)
    full = gen.apply(variables, mel, rngs={"noise": rng})
    fn = make_chunked_infer(gen, T, n_chunks)
    chunked = fn(variables, mel, rng)
    assert chunked.shape == full.shape
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(full), atol=1e-5, rtol=1e-5)


def test_chunked_cache_reuse(gen_and_vars):
    gen, variables = gen_and_vars
    assert make_chunked_infer(gen, 96, 4) is make_chunked_infer(gen, 96, 4)
    assert make_chunked_infer(gen, 96, 4) is not make_chunked_infer(gen, 96, 8)


def test_chunked_rejects_noncausal():
    gen = Generator(**{**GEN_CFG, "causal": False})
    with pytest.raises(AssertionError):
        make_chunked_infer(gen, 96, 4)
