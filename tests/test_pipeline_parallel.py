"""Pipeline parallelism on the virtual 8-device CPU mesh.

The GPipe schedule must compute exactly what sequential layer application
computes — forward AND gradients (the combinator is used for training too).
Reference has no pipeline parallelism; the semantic oracle is the in-repo
SelfAttentionEncoder itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kantts_tpu.models.sambert.sambert import SelfAttentionEncoder
from kantts_tpu.parallel.pp import (
    make_pipe_mesh,
    pipeline_apply,
    sambert_encoder_pipeline,
    stack_layer_params,
)

ENC = dict(n_layer=4, d_model=16, n_head=2, d_head=8, d_inner=24,
           dropout=0.0, dropout_att=0.0, dropout_relu=0.0, max_len=64)


@pytest.fixture(scope="module")
def encoder_fixtures():
    enc = SelfAttentionEncoder(**ENC)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(8, 20, ENC["d_model"]).astype(np.float32))
    lengths = np.array([20, 17, 12, 20, 5, 20, 9, 14])
    mask = jnp.asarray(np.arange(20)[None, :] >= lengths[:, None])
    variables = enc.init({"params": jax.random.PRNGKey(0)}, x, mask)
    return enc, variables, x, mask


@pytest.mark.parametrize("n_pipe,n_micro", [(4, 4), (2, 8), (4, 1)])
def test_pipeline_encoder_matches_sequential(encoder_fixtures, n_pipe,
                                             n_micro):
    """Pipelined FFT-stack forward == the module's sequential forward,
    including masked rows, at several stage/microbatch splits."""
    enc, variables, x, mask = encoder_fixtures
    ref, _ = enc.apply(variables, x, mask)
    mesh = make_pipe_mesh(n_pipe)
    out = jax.jit(lambda p, xx, mm: sambert_encoder_pipeline(
        p, xx, mm, mesh, n_micro, n_layer=ENC["n_layer"],
        d_model=ENC["d_model"], n_head=ENC["n_head"],
        d_inner=ENC["d_inner"], max_len=ENC["max_len"],
    ))(variables["params"], x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_grads_match_sequential():
    """jax.grad through the pipelined program == grad through the
    sequential scan (training through the pipeline is exact)."""
    S, L, M, B, D = 4, 8, 4, 8, 6
    rs = np.random.RandomState(1)
    stacked = {
        "w": jnp.asarray(rs.randn(L, D, D).astype(np.float32) * 0.3),
        "b": jnp.asarray(rs.randn(L, D).astype(np.float32) * 0.1),
    }
    x = jnp.asarray(rs.randn(B, D).astype(np.float32))

    def layer_fn(p, h, _):
        return jnp.tanh(h @ p["w"] + p["b"])

    def seq_loss(params, xx):
        def body(h, pl):
            return layer_fn(pl, h, None), None

        out, _ = jax.lax.scan(body, xx, params)
        return jnp.sum(out ** 2)

    mesh = make_pipe_mesh(S)

    def pipe_loss(params, xx):
        out = pipeline_apply(layer_fn, params, xx, M, mesh)
        return jnp.sum(out ** 2)

    ref_val, ref_grad = jax.value_and_grad(seq_loss)(stacked, x)
    pipe_val, pipe_grad = jax.jit(jax.value_and_grad(pipe_loss))(stacked, x)
    np.testing.assert_allclose(float(pipe_val), float(ref_val), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5),
        pipe_grad, ref_grad)


def test_stack_layer_params_layout(encoder_fixtures):
    """Stacked leaves carry the layer axis first and preserve per-layer
    values in order."""
    _, variables, _, _ = encoder_fixtures
    params = variables["params"]
    stacked = stack_layer_params(params, "fft_", ENC["n_layer"])
    w = stacked["slf_attn"]["w_qkv"]["kernel"]
    assert w.shape[0] == ENC["n_layer"]
    for i in range(ENC["n_layer"]):
        np.testing.assert_array_equal(
            np.asarray(w[i]),
            np.asarray(params[f"fft_{i}"]["slf_attn"]["w_qkv"]["kernel"]))


def test_pipeline_rejects_bad_folds():
    mesh = make_pipe_mesh(4)
    stacked = {"w": jnp.zeros((6, 3, 3))}
    with pytest.raises(ValueError):
        pipeline_apply(lambda p, h, e: h, stacked, jnp.zeros((8, 3)), 4, mesh)
    stacked = {"w": jnp.zeros((8, 3, 3))}
    with pytest.raises(ValueError):
        pipeline_apply(lambda p, h, e: h, stacked, jnp.zeros((6, 3)), 4, mesh)
