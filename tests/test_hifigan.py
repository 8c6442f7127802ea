"""HiFi-GAN model tests: shapes, causality, weight-norm folding, PQMF
perfect reconstruction, discriminator output structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kantts_tpu.models.hifigan.discriminators import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    MultiSpecDiscriminator,
    dwt1d_db3,
)
from kantts_tpu.models.hifigan.generator import Generator
from kantts_tpu.models.hifigan.layers import WNConv1d, WNConvTranspose1d, fold_weight_norm
from kantts_tpu.models.pqmf import PQMF

CFG_16K = dict(
    in_channels=80,
    out_channels=1,
    channels=64,  # slim for tests (config uses 256)
    kernel_size=7,
    upsample_scales=(10, 5, 2, 2),
    upsample_kernal_sizes=(20, 10, 4, 4),
    resblock_kernel_sizes=(3, 7),
    resblock_dilations=((1, 3), (1, 3)),
)


@pytest.fixture(scope="module")
def mel():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randn(2, 20, 80).astype(np.float32))


@pytest.mark.slow
def test_generator_shape_causal(mel):
    gen = Generator(**CFG_16K, causal=True)
    params = gen.init(jax.random.PRNGKey(0), mel)
    y = gen.apply(params, mel)
    assert y.shape == (2, 20 * 200, 1)
    assert float(jnp.abs(y).max()) <= 1.0


def test_generator_shape_noncausal(mel):
    gen = Generator(**CFG_16K, causal=False)
    params = gen.init(jax.random.PRNGKey(0), mel)
    y = gen.apply(params, mel)
    assert y.shape == (2, 20 * 200, 1)


def test_generator_causality(mel):
    """With causal=True, changing a future mel frame must not change past output."""
    gen = Generator(**CFG_16K, causal=True)
    params = gen.init(jax.random.PRNGKey(0), mel)
    y1 = gen.apply(params, mel)
    mel2 = mel.at[:, 15:, :].add(10.0)
    y2 = gen.apply(params, mel2)
    # samples strictly before frame 15 * 200 must be identical
    np.testing.assert_allclose(
        np.asarray(y1[:, : 15 * 200 - 1]), np.asarray(y2[:, : 15 * 200 - 1]), atol=1e-5
    )
    assert not np.allclose(np.asarray(y1[:, 15 * 200 + 400 :]), np.asarray(y2[:, 15 * 200 + 400 :]))


def test_generator_nsf(mel):
    x = jnp.concatenate(
        [mel, 200.0 * jnp.ones((2, 20, 1)), jnp.ones((2, 20, 1))], axis=-1
    )
    gen = Generator(**{**CFG_16K, "in_channels": 82},
                    nsf_params={"nb_harmonics": 7, "sampling_rate": 16000})
    params = gen.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    y = gen.apply(params, x, rngs={"noise": jax.random.PRNGKey(2)})
    assert y.shape == (2, 20 * 200, 1)


def test_multiband_generator(mel):
    gen = Generator(**{**CFG_16K, "out_channels": 4})
    params = gen.init(jax.random.PRNGKey(0), mel)
    y = gen.apply(params, mel)
    assert y.shape == (2, 20 * 200, 4)
    pqmf = PQMF(subbands=4)
    full = pqmf.synthesis(y)
    assert full.shape == (2, 20 * 200 * 4, 1)


def test_fold_weight_norm_preserves_output(mel):
    gen = Generator(**CFG_16K)
    params = gen.init(jax.random.PRNGKey(0), mel)
    y1 = gen.apply(params, mel)
    folded = jax.tree_util.tree_map(lambda x: x, params)
    folded = {"params": fold_weight_norm(params["params"])}
    y2 = gen.apply(folded, mel)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_wnconv_matches_torch():
    """WNConv1d == torch weight_norm(nn.Conv1d) with transplanted weights."""
    import torch

    B, T, Cin, Cout, k = 2, 16, 3, 5, 3
    rng = np.random.RandomState(0)
    x = rng.randn(B, T, Cin).astype(np.float32)

    tconv = torch.nn.utils.weight_norm(torch.nn.Conv1d(Cin, Cout, k, padding=1))
    with torch.no_grad():
        ty = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)

    v = tconv.weight_v.detach().numpy()  # (out, in, k)
    g = tconv.weight_g.detach().numpy().reshape(-1)  # (out,)
    b = tconv.bias.detach().numpy()

    conv = WNConv1d(Cout, k, padding=1)
    params = {
        "params": {
            "kernel_v": jnp.asarray(v.transpose(2, 1, 0)),  # (k, in, out)
            "kernel_g": jnp.asarray(g),
            "bias": jnp.asarray(b),
        }
    }
    jy = np.asarray(conv.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(jy, ty, atol=1e-5)


def test_wnconvtranspose_matches_torch():
    import torch

    B, T, Cin, Cout, k, s = 2, 8, 3, 5, 8, 4
    rng = np.random.RandomState(0)
    x = rng.randn(B, T, Cin).astype(np.float32)

    tconv = torch.nn.utils.weight_norm(
        torch.nn.ConvTranspose1d(Cin, Cout, k, s, padding=(k - s) // 2)
    )
    with torch.no_grad():
        ty = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)

    v = tconv.weight_v.detach().numpy()  # (in, out, k)
    g = tconv.weight_g.detach().numpy().reshape(-1)  # (in,)
    b = tconv.bias.detach().numpy()

    conv = WNConvTranspose1d(Cout, k, stride=s, padding=(k - s) // 2)
    params = {
        "params": {
            "kernel_v": jnp.asarray(v.transpose(2, 1, 0)),  # (k, out, in)
            "kernel_g": jnp.asarray(g),
            "bias": jnp.asarray(b),
        }
    }
    jy = np.asarray(conv.apply(params, jnp.asarray(x)))
    assert jy.shape == ty.shape
    np.testing.assert_allclose(jy, ty, atol=1e-5)


def test_pqmf_near_perfect_reconstruction():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 4096, 1).astype(np.float32)) * 0.3
    pqmf = PQMF(subbands=4)
    bands = pqmf.analysis(x)
    assert bands.shape == (1, 1024, 4)
    recon = pqmf.synthesis(bands)
    assert recon.shape == x.shape
    # zero-lag near-perfect reconstruction (symmetric padding cancels delay)
    a = np.asarray(x[0, 100:-100, 0])
    b = np.asarray(recon[0, 100:-100, 0])
    err = np.mean((a - b) ** 2) / np.mean(a ** 2)
    assert err < 1e-4


def test_dwt_halves_length():
    x = jnp.ones((2, 100, 1))
    lo, hi = dwt1d_db3(x)
    assert lo.shape == hi.shape
    assert abs(lo.shape[1] - 50) <= 3
    # constant signal: hi-band ~ 0 in the interior
    assert float(jnp.abs(hi[:, 4:-4, :]).max()) < 1e-4


def test_mpd_outputs():
    wav = jnp.asarray(np.random.RandomState(0).randn(2, 4000, 1).astype(np.float32))
    mpd = MultiPeriodDiscriminator(discriminator_params={"channels": 8, "max_downsample_channels": 32})
    params = mpd.init(jax.random.PRNGKey(0), wav)
    outs, fmaps = mpd.apply(params, wav)
    assert len(outs) == 5 and len(fmaps) == 5
    assert all(f[-1].shape[0] == 2 for f in fmaps)
    assert len(fmaps[0]) == 6  # 5 conv layers + post


@pytest.mark.slow  # 18-37 s of XLA:CPU trace+compile on this 1-core box; equivalent coverage stays in the full tier
def test_msd_outputs_with_dwt_and_spectral_norm():
    wav = jnp.asarray(np.random.RandomState(0).randn(2, 4000, 1).astype(np.float32))
    msd = MultiScaleDiscriminator(
        discriminator_params={"channels": 16, "max_downsample_channels": 64,
                              "downsample_scales": [4, 4, 4, 4, 1]},
        follow_official_norm=True,
    )
    variables = msd.init(jax.random.PRNGKey(0), wav)
    outs, fmaps = msd.apply(variables, wav)
    assert len(outs) == 3
    assert "spectral" in variables  # first scale uses spectral norm
    # update_stats mutates the power-iteration vector
    _, mutated = msd.apply(variables, wav, True, mutable=["spectral"])
    assert "spectral" in mutated


def test_mspecd_outputs():
    wav = jnp.asarray(np.random.RandomState(0).randn(2, 4000, 1).astype(np.float32))
    msd = MultiSpecDiscriminator(discriminator_params={"channels": 8})
    params = msd.init(jax.random.PRNGKey(0), wav)
    outs, fmaps = msd.apply(params, wav)
    assert len(outs) == 3
    assert all(len(f) == 6 for f in fmaps)
