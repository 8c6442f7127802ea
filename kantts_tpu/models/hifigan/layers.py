"""HiFi-GAN conv primitives (Flax/linen, channels-last, XLA-native).

Parity targets: /root/reference/kantts/models/hifigan/layers.py —
weight-normed Conv1d / CausalConv1d (left pad), ConvTranspose1d /
CausalConvTranspose1d (tail trim), ResidualBlock (dilated pairs), and the NSF
SourceModule (harmonic sine excitation).

TPU-first design notes:
- Layout is (B, T, C): feature-last keeps the channel dim in XLA lanes and
  maps conv contractions onto the MXU.
- Weight norm is an explicit reparametrization w = g * v/||v|| computed per
  call (XLA fuses the normalize into the conv weights). ``fold_weight_norm``
  folds g into v for export — the analogue of ``remove_weight_norm``
  (reference hifigan.py:184-197); the module math is unchanged so the fold is
  exactly representation-neutral.
- Causality is a padding choice, not a different op: left-pad (k-1)*dilation
  for causal convs; trim the tail (k-s) for causal transposed convs.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.1) -> jnp.ndarray:
    return jnp.where(x >= 0, x, negative_slope * x)


def get_activation(name: str, params: dict | None) -> Callable[[jnp.ndarray], jnp.ndarray]:
    params = params or {}
    if name == "LeakyReLU":
        slope = params.get("negative_slope", 0.01)
        return lambda x: leaky_relu(x, slope)
    if name == "ReLU":
        return jax.nn.relu
    if name == "Tanh":
        return jnp.tanh
    raise ValueError(f"Unsupported activation: {name}")


def _quantize_sym(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Symmetric int8 quantization: round(x/scale) clipped to [-127, 127]."""
    return jnp.clip(jnp.round(x / scale), -127.0, 127.0).astype(jnp.int8)


def _act_scale(x: jnp.ndarray) -> jnp.ndarray:
    """Dynamic PER-EXAMPLE activation scale ((B,1,1) amax/127) — one cheap
    reduction per conv call. Per-example (not per-tensor) so that batch
    composition cannot change any item's quantization: an utterance served
    at B=1 and the same utterance co-batched with louder traffic quantize
    identically (the invariant the batching server documents)."""
    return jnp.maximum(
        jnp.max(jnp.abs(x), axis=(1, 2), keepdims=True), 1e-12) / 127.0


class _StaticScaleMixin:
    """Static calibrated activation scales for int8 (PTQ).

    Dynamic per-example scales depend on each example's content, which
    breaks the chunked-batch bit-exactness contract (a window of an
    utterance has a different amax than the whole utterance). With a
    STATIC per-tensor scale — recorded over calibration data into the
    ``quant`` variable collection — quantization is input-independent, so
    a chunked window reproduces the full program bit-for-bit (int32
    accumulation is order-exact, unlike f32). Calibration: apply with
    ``calibrate=True`` and ``mutable=["quant"]``; the conv runs in f32
    (downstream layers see reference activations) while recording the
    running amax."""

    def _static_or_dynamic_scale(self, x):
        if self.calibrate:
            s_var = self.variable("quant", "s_x", lambda: jnp.zeros(()))
            s_var.value = jnp.maximum(s_var.value,
                                      jnp.max(jnp.abs(x)) / 127.0)
            return None  # caller runs the f32 path while calibrating
        if self.quant_static:
            s_var = self.variable("quant", "s_x", lambda: jnp.zeros(()))
            return jnp.maximum(s_var.value, 1e-12)
        return _act_scale(x)


def _kaiming_uniform_conv_init(key, shape, dtype=jnp.float32):
    """Torch Conv default init: kaiming_uniform(a=sqrt(5)) == U(-b, b) with
    b = sqrt(1 / fan_in); shape is (k, in, out) so fan_in = k * in."""
    fan_in = shape[0] * shape[1]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_conv_bias_init(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class WNConv1d(nn.Module, _StaticScaleMixin):
    """Weight-normalized 1-D convolution over (B, T, C_in) -> (B, T', C_out).

    ``causal=False``: symmetric 'same'-style padding of ``padding`` frames.
    ``causal=True``: left-pad (kernel-1)*dilation (reference CausalConv1d,
    layers.py:82-88).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    causal: bool = False
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32
    quant: bool = False  # serving-time int8 W8A8 on the same f32 params
    quant_static: bool = False  # static calibrated act scales (see mixin)
    calibrate: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        k = self.kernel_size
        v = self.param(
            "kernel_v",
            _kaiming_uniform_conv_init,
            (k, in_ch // self.groups, self.features),
        )
        if self.use_weight_norm:
            g = self.param(
                "kernel_g",
                lambda key, shape: jnp.linalg.norm(
                    v.reshape(-1, self.features), axis=0
                ),
                (self.features,),
            )
            norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True) + 1e-12)
            w = (g[None, None, :] / norm) * v
        else:
            w = v

        if self.causal:
            pad = (k - 1) * self.dilation
            pads = [(pad, 0)]
        else:
            pads = [(self.padding, self.padding)]

        s_x = self._static_or_dynamic_scale(x) if self.quant else None
        if self.quant and s_x is not None:
            # int8 conv on the MXU: per-output-channel weight scales
            # (axes k, in), dynamic per-example or static calibrated
            # activation scale; accumulate in int32 and rescale. Zero
            # padding quantizes to exact zero, so causal/same padding
            # semantics are unchanged.
            s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1)), 1e-12) / 127.0
            y = jax.lax.conv_general_dilated(
                _quantize_sym(x, s_x),
                _quantize_sym(w, s_w[None, None, :]),
                window_strides=(self.stride,),
                padding=pads,
                rhs_dilation=(self.dilation,),
                dimension_numbers=("NHC", "HIO", "NHC"),
                feature_group_count=self.groups,
                preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * (s_x * s_w[None, None, :])
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                w.astype(self.dtype),
                window_strides=(self.stride,),
                padding=pads,
                rhs_dilation=(self.dilation,),
                dimension_numbers=("NHC", "HIO", "NHC"),
                feature_group_count=self.groups,
            )
        if self.use_bias:
            b = self.param("bias", _torch_conv_bias_init(k * in_ch // self.groups),
                           (self.features,))
            y = y + b.astype(self.dtype)
        return y


class WNConvTranspose1d(nn.Module, _StaticScaleMixin):
    """Weight-normalized transposed 1-D convolution (B, T, C) -> (B, T*s, C').

    Non-causal: torch-style padding ``(kernel-stride)//2`` trimmed from both
    ends. Causal: trim ``kernel-stride`` from the tail (reference
    CausalConvTranspose1d, layers.py:153-161). Both yield T*stride outputs for
    the config family used here (kernel = 2*stride).
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    causal: bool = False
    use_bias: bool = True
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32
    quant: bool = False  # serving-time int8 W8A8 on the same f32 params
    quant_static: bool = False  # static calibrated act scales (see mixin)
    calibrate: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        k = self.kernel_size
        # kernel stored (k, out, in) so that fan_in (= k*out/groups... torch
        # convtranspose fan_in is out_ch * k) matches torch's initializer.
        v = self.param("kernel_v", _kaiming_uniform_conv_init, (k, self.features, in_ch))
        if self.use_weight_norm:
            # torch weight_norm(dim=0) on ConvTranspose1d normalizes per
            # *input* channel (weight shape (in, out, k)); here that's axis -1.
            g = self.param(
                "kernel_g",
                lambda key, shape: jnp.linalg.norm(v.reshape(-1, in_ch), axis=0),
                (in_ch,),
            )
            norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True) + 1e-12)
            w = (g[None, None, :] / norm) * v
        else:
            w = v

        s_x = self._static_or_dynamic_scale(x) if self.quant else None
        if self.quant and s_x is not None:
            # kernel layout is (k, out, in): per-output-channel scales over
            # axes (k, in) = (0, 2)
            s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 2)), 1e-12) / 127.0
            y = jax.lax.conv_transpose(
                _quantize_sym(x, s_x),
                _quantize_sym(w, s_w[None, :, None]),
                strides=(self.stride,),
                padding="VALID",
                dimension_numbers=("NHC", "HIO", "NHC"),
                transpose_kernel=True,
                preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * (s_x * s_w[None, None, :])
        else:
            y = jax.lax.conv_transpose(
                x.astype(self.dtype),
                w.astype(self.dtype),
                strides=(self.stride,),
                padding="VALID",
                dimension_numbers=("NHC", "HIO", "NHC"),
                transpose_kernel=True,
            )
        # VALID length = (T-1)*stride + k = T*stride + (k-stride)
        if self.causal:
            y = y[:, : x.shape[1] * self.stride, :]  # trim tail (k - stride)
        else:
            p = self.padding
            y = y[:, p : y.shape[1] - p, :]
        if self.use_bias:
            b = self.param("bias", _torch_conv_bias_init(k * self.features), (self.features,))
            y = y + b.astype(self.dtype)
        return y


class ResidualBlock(nn.Module):
    """MRF residual block: len(dilation) pairs of (dilated conv, conv)
    with pre-activations (reference layers.py:168-227)."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3, 5)
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: dict | None = None
    causal: bool = False
    dtype: jnp.dtype = jnp.float32
    quant: bool = False
    quant_static: bool = False
    calibrate: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = get_activation(
            self.nonlinear_activation,
            self.nonlinear_activation_params or {"negative_slope": 0.1},
        )
        k = self.kernel_size
        for i, d in enumerate(self.dilation):
            xt = act(x)
            xt = WNConv1d(
                self.channels, k, padding=(k * d - d) // 2, dilation=d,
                causal=self.causal, dtype=self.dtype, quant=self.quant,
                quant_static=self.quant_static, calibrate=self.calibrate,
                name=f"convs1_{i}",
            )(xt)
            xt = act(xt)
            xt = WNConv1d(
                self.channels, k, padding=(k - 1) // 2, dilation=1,
                causal=self.causal, dtype=self.dtype, quant=self.quant,
                quant_static=self.quant_static, calibrate=self.calibrate,
                name=f"convs2_{i}",
            )(xt)
            x = xt + x
        return x


class SourceModule(nn.Module):
    """NSF harmonic-plus-noise excitation source (reference layers.py:229-290).

    pitch, uv: (B, T_frame, 1) at frame rate -> excitation (B, T_sample, 1).
    Randomness (harmonic init phase, gaussian noise) comes from the 'noise'
    PRNG collection — explicit key threading instead of global RNG.
    """

    nb_harmonics: int
    upsample_ratio: int
    sampling_rate: int
    alpha: float = 0.1
    sigma: float = 0.003
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pitch: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
        B, T, _ = pitch.shape
        H = self.nb_harmonics + 1
        up = self.upsample_ratio

        # nearest upsample to sample rate
        pitch_s = jnp.repeat(pitch, up, axis=1)  # (B, T*up, 1)
        uv_s = jnp.repeat(uv, up, axis=1)

        harmonics = jnp.arange(1, H + 1, dtype=pitch_s.dtype)[None, None, :]
        f_mat = pitch_s * harmonics / self.sampling_rate  # (B, T*up, H)
        theta = 2.0 * jnp.pi * (jnp.cumsum(f_mat, axis=1) % 1.0)

        key_phase = self.make_rng("noise")
        key_noise = self.make_rng("noise")
        phase = jax.random.uniform(
            key_phase, (B, 1, H), minval=-jnp.pi, maxval=jnp.pi
        )
        phase = phase.at[:, :, 0].set(0.0)
        noise = self.sigma * jax.random.normal(key_noise, f_mat.shape)

        e_voice = self.alpha * jnp.sin(theta + phase) + noise
        e_unvoice = self.alpha / 3.0 / self.sigma * noise
        e = e_voice * uv_s + e_unvoice * (1.0 - uv_s)
        e = jax.lax.stop_gradient(e)

        out = WNConv1d(1, 1, dtype=self.dtype, name="ffn")(e)
        return jnp.tanh(out)


def fold_weight_norm(params):
    """Fold every (kernel_v, kernel_g) pair into a plain kernel_v with g = the
    per-channel norm of the folded kernel — the export analogue of
    ``remove_weight_norm``. Output params evaluate identically."""

    def fold(tree):
        if isinstance(tree, dict):
            if "kernel_v" in tree and "kernel_g" in tree:
                v = tree["kernel_v"]
                g = tree["kernel_g"]
                norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True) + 1e-12)
                w = (g[None, None, :] / norm) * v  # g is on the last kernel axis
                new = dict(tree)
                new["kernel_v"] = w
                new["kernel_g"] = jnp.linalg.norm(w.reshape(-1, w.shape[-1]), axis=0)
                return new
            return {k: fold(v) for k, v in tree.items()}
        return tree

    return fold(params)
