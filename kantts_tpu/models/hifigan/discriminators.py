"""HiFi-GAN discriminator families (Flax/linen, channels-last).

Parity targets: /root/reference/kantts/models/hifigan/hifigan.py:200-617 —
MultiPeriodDiscriminator (5 period discriminators, 1d->2d reshape),
MultiScaleDiscriminator (3 scale discriminators, DWT db3 inter-scale
downsampling + aux convs, optional spectral norm on the first),
MultiSpecDiscriminator (STFT-magnitude conv2d stacks at 3 resolutions).

The DWT is two fixed-coefficient strided convolutions (pure XLA) replacing the
reference's pytorch_wavelets dependency (hifigan.py:445-454).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from kantts_tpu.dsp.stft import hann_window, stft_magnitude
from kantts_tpu.models.hifigan.layers import (
    _kaiming_uniform_conv_init,
    _torch_conv_bias_init,
    get_activation,
    leaky_relu,
)

# ----------------------------------------------------------------- norm convs


class NormConv(nn.Module):
    """N-D convolution with weight norm or spectral norm.

    kernel param shape: (*kernel_size, in_ch, out_ch). Spectral norm keeps a
    power-iteration vector in the 'spectral' variable collection and updates
    it when ``update_stats`` is True (training).
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    padding: Sequence[Tuple[int, int]]
    groups: int = 1
    use_bias: bool = True
    norm: str = "weight"  # "weight" | "spectral" | "none"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_stats: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kshape = tuple(self.kernel_size) + (in_ch // self.groups, self.features)
        v = self.param("kernel_v", _kaiming_uniform_conv_init_nd, kshape)

        if self.norm == "weight":
            g = self.param(
                "kernel_g",
                lambda key, shape: jnp.linalg.norm(v.reshape(-1, self.features), axis=0),
                (self.features,),
            )
            axes = tuple(range(v.ndim - 1))
            norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True) + 1e-12)
            w = (g / norm) * v
        elif self.norm == "spectral":
            w_mat = jnp.moveaxis(v, -1, 0).reshape(self.features, -1)
            u_var = self.variable(
                "spectral", "u",
                lambda: jax.random.normal(
                    self.make_rng("params") if self.has_rng("params")
                    else jax.random.PRNGKey(0),
                    (self.features,),
                ),
            )
            u = u_var.value
            # one power iteration
            vvec = w_mat.T @ u
            vvec = vvec / (jnp.linalg.norm(vvec) + 1e-12)
            u_new = w_mat @ vvec
            u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
            sigma = u_new @ (w_mat @ vvec)
            if update_stats and not self.is_initializing():
                u_var.value = jax.lax.stop_gradient(u_new)
            w = v / jax.lax.stop_gradient(sigma)
        else:
            w = v

        nd = len(self.kernel_size)
        dn = {1: ("NHC", "HIO", "NHC"), 2: ("NHWC", "HWIO", "NHWC")}[nd]
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w.astype(self.dtype),
            window_strides=tuple(self.strides),
            padding=list(self.padding),
            dimension_numbers=dn,
            feature_group_count=self.groups,
        )
        if self.use_bias:
            fan_in = int(np.prod(self.kernel_size)) * (in_ch // self.groups)
            b = self.param("bias", _torch_conv_bias_init(fan_in), (self.features,))
            y = y + b.astype(self.dtype)
        return y


def _kaiming_uniform_conv_init_nd(key, shape, dtype=jnp.float32):
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


# ------------------------------------------------------------------ DWT (db3)

# Daubechies-3 decomposition low-pass filter (standard coefficients).
_DB3_DEC_LO = np.array(
    [
        0.035226291882100656,
        -0.08544127388224149,
        -0.13501102001039084,
        0.4598775021193313,
        0.8068915093133388,
        0.3326705529509569,
    ],
    dtype=np.float64,
)
# High-pass via quadrature mirror: hi[k] = (-1)^k lo[N-1-k]
_DB3_DEC_HI = np.array(
    [(-1) ** k * _DB3_DEC_LO[len(_DB3_DEC_LO) - 1 - k] for k in range(len(_DB3_DEC_LO))],
    dtype=np.float64,
)


def dwt1d_db3(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-level db3 DWT of (B, T, 1) -> (lo, hi), each (B, ~T/2, 1).

    Implemented as two fixed-coefficient strided convolutions (zero-padded
    analysis filterbank) — the XLA-native replacement for pytorch_wavelets
    DWT1DForward(wave='db3', J=1) at reference hifigan.py:447.
    """
    L = len(_DB3_DEC_LO)
    # analysis correlates with the time-reversed filter
    lo = jnp.asarray(_DB3_DEC_LO[::-1].copy(), dtype=x.dtype)[:, None, None]
    hi = jnp.asarray(_DB3_DEC_HI[::-1].copy(), dtype=x.dtype)[:, None, None]
    pad = [(L - 1, L - 1)]

    def conv(sig, filt):
        return jax.lax.conv_general_dilated(
            sig, filt, window_strides=(2,), padding=pad,
            dimension_numbers=("NHC", "HIO", "NHC"),
        )

    return conv(x, lo), conv(x, hi)


# ---------------------------------------------------------------------- MPD


class PeriodDiscriminator(nn.Module):
    """One period discriminator (reference hifigan.py:200-267)."""

    period: int = 3
    in_channels: int = 1
    out_channels: int = 1
    kernel_sizes: Sequence[int] = (5, 3)
    channels: int = 32
    downsample_scales: Sequence[int] = (3, 3, 3, 3, 1)
    max_downsample_channels: int = 1024
    bias: bool = True
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Optional[dict] = None
    use_spectral_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_stats: bool = False):
        """x: (B, T, 1) -> (score (B, n), fmap list)."""
        act = get_activation(
            self.nonlinear_activation,
            self.nonlinear_activation_params or {"negative_slope": 0.1},
        )
        norm = "spectral" if self.use_spectral_norm else "weight"
        B, T, C = x.shape
        p = self.period
        if T % p != 0:
            n_pad = p - (T % p)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            T = T + n_pad
        x = x.reshape(B, T // p, p, C)  # (B, H, W=period, C)

        fmap = []
        k0 = self.kernel_sizes[0]
        in_chs, out_chs = self.in_channels, self.channels
        for i, scale in enumerate(self.downsample_scales):
            x = NormConv(
                out_chs, (k0, 1), (scale, 1), [((k0 - 1) // 2, (k0 - 1) // 2), (0, 0)],
                use_bias=True, norm=norm, dtype=self.dtype, name=f"convs_{i}",
            )(x, update_stats)
            x = act(x)
            fmap.append(x)
            in_chs = out_chs
            out_chs = min(out_chs * 4, self.max_downsample_channels)

        k1 = self.kernel_sizes[1]
        x = NormConv(
            self.out_channels, (k1 - 1, 1), (1, 1),
            [((k1 - 1) // 2, (k1 - 1) // 2), (0, 0)],
            use_bias=True, norm="none", dtype=self.dtype, name="conv_post",
        )(x, update_stats)
        fmap.append(x)
        return x.reshape(B, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    discriminator_params: Optional[dict] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray, update_stats: bool = False):
        params = dict(self.discriminator_params or {})
        outs, fmaps = [], []
        for i, period in enumerate(self.periods):
            score, fmap = PeriodDiscriminator(
                period=period, dtype=self.dtype, name=f"discriminators_{i}",
                **params,
            )(y, update_stats)
            outs.append(score)
            fmaps.append(fmap)
        return outs, fmaps


# ---------------------------------------------------------------------- MSD


class ScaleDiscriminator(nn.Module):
    """One scale discriminator (reference hifigan.py:305-407)."""

    in_channels: int = 1
    out_channels: int = 1
    kernel_sizes: Sequence[int] = (15, 41, 5, 3)
    channels: int = 128
    max_downsample_channels: int = 1024
    max_groups: int = 16
    bias: bool = True
    downsample_scales: Sequence[int] = (2, 2, 4, 4, 1)
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Optional[dict] = None
    use_spectral_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_stats: bool = False):
        assert len(self.kernel_sizes) == 4
        act = get_activation(
            self.nonlinear_activation,
            self.nonlinear_activation_params or {"negative_slope": 0.1},
        )
        norm = "spectral" if self.use_spectral_norm else "weight"
        k0, k1, k2, k3 = self.kernel_sizes
        fmap = []

        x = NormConv(
            self.channels, (k0,), (1,), [((k0 - 1) // 2, (k0 - 1) // 2)],
            use_bias=self.bias, norm=norm, dtype=self.dtype, name="convs_0",
        )(x, update_stats)
        x = act(x)
        fmap.append(x)

        in_chs = self.channels
        out_chs = self.channels
        groups = 4
        layer = 1
        for scale in self.downsample_scales:
            x = NormConv(
                out_chs, (k1,), (scale,), [((k1 - 1) // 2, (k1 - 1) // 2)],
                groups=groups, use_bias=self.bias, norm=norm, dtype=self.dtype,
                name=f"convs_{layer}",
            )(x, update_stats)
            x = act(x)
            fmap.append(x)
            in_chs = out_chs
            out_chs = min(in_chs * 2, self.max_downsample_channels)
            groups = min(groups * 4, self.max_groups)
            layer += 1

        out_chs = min(in_chs * 2, self.max_downsample_channels)
        x = NormConv(
            out_chs, (k2,), (1,), [((k2 - 1) // 2, (k2 - 1) // 2)],
            use_bias=self.bias, norm=norm, dtype=self.dtype, name=f"convs_{layer}",
        )(x, update_stats)
        x = act(x)
        fmap.append(x)

        x = NormConv(
            self.out_channels, (k3,), (1,), [((k3 - 1) // 2, (k3 - 1) // 2)],
            use_bias=self.bias, norm=norm, dtype=self.dtype, name="conv_post",
        )(x, update_stats)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class MultiScaleDiscriminator(nn.Module):
    """3 scale discriminators with DWT inter-scale downsampling
    (reference hifigan.py:410-478)."""

    scales: int = 3
    downsample_pooling: str = "DWT"
    downsample_pooling_params: Optional[dict] = None
    discriminator_params: Optional[dict] = None
    follow_official_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray, update_stats: bool = False):
        params = dict(self.discriminator_params or {})
        outs, fmaps = [], []
        for i in range(self.scales):
            p = dict(params)
            if self.follow_official_norm:
                p["use_spectral_norm"] = i == 0
            if i != 0:
                if self.downsample_pooling == "DWT":
                    yl, yh = dwt1d_db3(y)
                    y = jnp.concatenate([yl, yh], axis=-1)
                    y = NormConv(
                        1, (15,), (1,), [(7, 7)], use_bias=True, norm="weight",
                        dtype=self.dtype, name=f"aux_convs_{i - 1}",
                    )(y, update_stats)
                    y = leaky_relu(y, 0.1)
                else:
                    y = nn.avg_pool(y, (4,), strides=(2,), padding=[(2, 2)])
            score, fmap = ScaleDiscriminator(
                dtype=self.dtype, name=f"discriminators_{i}", **p
            )(y, update_stats)
            outs.append(score)
            fmaps.append(fmap)
        return outs, fmaps


# --------------------------------------------------------------------- MSpecD


class SpecDiscriminator(nn.Module):
    """STFT-magnitude conv2d discriminator (reference hifigan.py:481-580)."""

    channels: int = 32
    init_kernel: int = 15
    kernel_size: int = 11
    stride: int = 2
    use_spectral_norm: bool = False
    fft_size: int = 1024
    shift_size: int = 120
    win_length: int = 600
    window: str = "hann_window"
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Optional[dict] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jnp.ndarray, update_stats: bool = False):
        """wav: (B, T, 1) -> (score, fmap)."""
        act = get_activation(
            self.nonlinear_activation,
            self.nonlinear_activation_params or {"negative_slope": 0.1},
        )
        norm = "spectral" if self.use_spectral_norm else "weight"
        x = wav[..., 0]
        mag = stft_magnitude(
            jax.lax.stop_gradient(x), self.fft_size, self.shift_size,
            self.win_length, jnp.asarray(hann_window(self.win_length)),
        )  # (B, frames, freq)
        # reference treats freq as channels over a (frames, 1) spatial grid
        x = mag[:, :, None, :]  # (B, frames, 1, freq)

        fmap = []
        ik = self.init_kernel
        x = NormConv(
            self.channels, (ik, 1), (1, 1),
            [((ik - 1) // 2, (ik - 1) // 2), ((ik - 1) // 2, (ik - 1) // 2)],
            norm=norm, dtype=self.dtype, name="convs_0",
        )(x, update_stats)
        x = act(x)
        fmap.append(x)

        for i in range(3):
            ks = self.kernel_size
            x = NormConv(
                self.channels, (ks, 1), (self.stride, 1),
                [((ks - 1) // 2, (ks - 1) // 2), ((ks - 1) // 2, (ks - 1) // 2)],
                norm=norm, dtype=self.dtype, name=f"convs_{i + 1}",
            )(x, update_stats)
            x = act(x)
            fmap.append(x)

        x = NormConv(
            self.channels, (5, 1), (1, 1), [(2, 2), (2, 2)],
            norm=norm, dtype=self.dtype, name="convs_4",
        )(x, update_stats)
        x = act(x)
        fmap.append(x)

        x = NormConv(
            1, (3, 1), (1, 1), [(1, 1), (0, 0)],
            norm=norm, dtype=self.dtype, name="conv_post",
        )(x, update_stats)
        fmap.append(x)
        return x[..., 0, :], fmap


class MultiSpecDiscriminator(nn.Module):
    fft_sizes: Sequence[int] = (1024, 2048, 512)
    hop_sizes: Sequence[int] = (120, 240, 50)
    win_lengths: Sequence[int] = (600, 1200, 240)
    discriminator_params: Optional[dict] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray, update_stats: bool = False):
        params = dict(self.discriminator_params or {})
        params.pop("kernel_sizes", None)  # reference passes but ctor ignores
        outs, fmaps = [], []
        for i, (fft, hop, win) in enumerate(
            zip(self.fft_sizes, self.hop_sizes, self.win_lengths)
        ):
            score, fmap = SpecDiscriminator(
                fft_size=fft, shift_size=hop, win_length=win,
                dtype=self.dtype, name=f"discriminators_{i}", **params,
            )(y, update_stats)
            outs.append(score)
            fmaps.append(fmap)
        return outs, fmaps
