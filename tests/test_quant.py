"""int8 W8A8 vocoder inference: same checkpoint, bounded numerical drift.

Generator(quant=True) quantizes the interior conv stacks (per-output-channel
weight scales, dynamic per-tensor activation scales, int32 accumulation);
conv_pre / conv_post / NSF source convs stay f32. Parameters are untouched —
the quantized module must init to the identical pytree so f32 checkpoints
serve directly. Quality on a trained model is measured by
tools/quant_report.py; here we guard the numerics and the contract.
"""

import jax
import jax.numpy as jnp
import numpy as np

from kantts_tpu.models.hifigan.generator import Generator

KW = dict(in_channels=80, out_channels=1, channels=32, kernel_size=7,
          upsample_scales=(4, 4), upsample_kernal_sizes=(8, 8),
          resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
          causal=True)


def _mel(B=2, T=50, C=80):
    return jnp.asarray(np.random.RandomState(0).randn(B, T, C)
                       .astype(np.float32))


def test_quant_params_identical_to_f32():
    mel = _mel()
    p32 = Generator(**KW).init(jax.random.PRNGKey(0), mel)
    p8 = Generator(**KW, quant=True).init(jax.random.PRNGKey(0), mel)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), p32, p8)


def test_quant_output_close_to_f32():
    mel = _mel()
    gen, genq = Generator(**KW), Generator(**KW, quant=True)
    params = gen.init(jax.random.PRNGKey(0), mel)
    y = np.asarray(jax.jit(gen.apply)(params, mel))
    yq = np.asarray(jax.jit(genq.apply)(params, mel))
    assert y.shape == yq.shape
    assert np.isfinite(yq).all()
    rel = np.linalg.norm(yq - y) / np.linalg.norm(y)
    corr = np.corrcoef(y.ravel(), yq.ravel())[0, 1]
    assert rel < 0.05, rel
    assert corr > 0.995, corr


def test_quant_nsf_generator_runs():
    kw = dict(KW, in_channels=82,
              nsf_params={"nb_harmonics": 4, "sampling_rate": 16000})
    gen = Generator(**kw)
    genq = Generator(**kw, quant=True)
    rng = np.random.RandomState(1)
    mel = np.concatenate([
        rng.randn(1, 40, 80).astype(np.float32),
        np.abs(rng.randn(1, 40, 1)).astype(np.float32) * 100 + 100,
        np.ones((1, 40, 1), dtype=np.float32),
    ], axis=-1)
    mel = jnp.asarray(mel)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    params = gen.init(rngs, mel)
    key = jax.random.PRNGKey(2)
    y = np.asarray(gen.apply(params, mel, rngs={"noise": key}))
    yq = np.asarray(genq.apply(params, mel, rngs={"noise": key}))
    assert y.shape == yq.shape and np.isfinite(yq).all()
    # same noise key -> the drift is quantization only
    rel = np.linalg.norm(yq - y) / np.linalg.norm(y)
    assert rel < 0.1, rel


def test_quant_batch_composition_invariant():
    """Per-example activation scales: an utterance quantizes identically
    alone and co-batched with louder traffic (the batching server's
    invariant; per-tensor scales would violate it)."""
    genq = Generator(**KW, quant=True)
    mel = _mel(B=1, T=50)
    params = Generator(**KW).init(jax.random.PRNGKey(0), mel)
    y_alone = np.asarray(genq.apply(params, mel))
    loud = 50.0 * _mel(B=1, T=50)
    y_batched = np.asarray(genq.apply(params, jnp.concatenate([mel, loud])))
    np.testing.assert_array_equal(y_alone[0], y_batched[0])


def test_static_quant_chunked_bit_exact():
    """Static calibrated scales make int8 quantization input-independent,
    so chunked-batch inference reproduces the full int8 program BIT-EXACTLY
    (int32 accumulation is order-exact) — the contract dynamic per-example
    scales cannot give (a window's amax differs from the utterance's)."""
    from kantts_tpu.infer.chunked import chunked_apply
    from kantts_tpu.models.hifigan.generator import calibrate_quant_scales

    mel = _mel(B=1, T=64)
    gen = Generator(**KW)
    params = gen.init(jax.random.PRNGKey(0), mel)["params"]

    gen_cal = Generator(**KW, quant=True, quant_static=True, calibrate=True)
    scales = calibrate_quant_scales(gen_cal, params, [mel])
    assert scales and all(
        float(v["s_x"]) > 0 for v in jax.tree_util.tree_leaves(
            scales, is_leaf=lambda x: isinstance(x, dict) and "s_x" in x))

    gen_q = Generator(**KW, quant=True, quant_static=True)
    variables = {"params": params, "quant": scales}
    full = np.asarray(jax.jit(gen_q.apply)(variables, mel))
    rng = jax.random.PRNGKey(0)
    chunked = np.asarray(jax.jit(
        lambda v, m, r: chunked_apply(gen_q, v, m, r, n_chunks=4)
    )(variables, mel, rng))
    assert full.shape == chunked.shape
    np.testing.assert_array_equal(chunked, full)

    # static-int8 stays close to f32 (quality guard, same bound as dynamic)
    y32 = np.asarray(jax.jit(gen.apply)({"params": params}, mel))
    rel = np.linalg.norm(full - y32) / np.linalg.norm(y32)
    assert rel < 0.05, rel
