"""HiFi-GAN generator (Flax/linen), TPU-native.

Parity target: /root/reference/kantts/models/hifigan/hifigan.py:22-197.
Architecture per upsample stage i:
  x = sin(x) + x                                (hifigan.py:157)
  rep = conv(leaky(nearest_upsample(x)))        dual-path repeat upsample
  up  = deconv(leaky(x))                        transposed-conv upsample
  x   = rep + up[:rep_len] (+ NSF excitation)   (hifigan.py:162-168)
  x   = mean_j resblock_j(x)                    MRF (hifigan.py:170-176)
then leaky_relu (default 0.01 slope) -> conv_post -> tanh.

Layout is (B, T, C) throughout; the whole forward is one XLA program — the
per-stage python loop unrolls at trace time (static num_upsamples).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from kantts_tpu.models.hifigan.layers import (
    ResidualBlock,
    SourceModule,
    WNConv1d,
    WNConvTranspose1d,
    get_activation,
    leaky_relu,
)


class Generator(nn.Module):
    in_channels: int = 80
    out_channels: int = 1
    channels: int = 512
    kernel_size: int = 7
    upsample_scales: Sequence[int] = (8, 8, 2, 2)
    upsample_kernal_sizes: Sequence[int] = (16, 16, 4, 4)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilations: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    repeat_upsample: bool = True
    bias: bool = True
    causal: bool = True
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Optional[dict] = None
    use_weight_norm: bool = True
    nsf_params: Optional[dict] = None
    dtype: jnp.dtype = jnp.float32
    # serving-time int8 W8A8 on the interior conv stacks (same f32
    # checkpoint; conv_pre / conv_post / NSF source convs stay f32 — the
    # standard edge-layer exemption). int8 runs the MXU at 2x the bf16 rate
    # and halves weight/activation HBM traffic; quality cost is measured by
    # tools/quant_report.py, not assumed.
    quant: bool = False
    quant_static: bool = False  # static calibrated act scales (PTQ; enables
    # bit-exact chunked-batch inference under int8 — see layers.py mixin)
    calibrate: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, excitation: Optional[jnp.ndarray] = None,
                 excitation_only: bool = False) -> jnp.ndarray:
        """x: (B, T, in_channels) mel (NSF: last 2 channels = f0, uv).

        Returns (B, T * prod(upsample_scales), out_channels) in [-1, 1].

        NSF escape hatches for windowed inference (infer/chunked.py): the
        harmonic source phase is a cumsum over the WHOLE utterance, so a
        windowed forward must not recompute it per window.
        ``excitation_only=True`` returns the SourceModule output
        (B, T*hop, 1) and nothing else; ``excitation=`` injects a
        precomputed (already windowed) source in place of the SourceModule
        call — no 'noise' rng needed in that case.
        """
        assert self.kernel_size % 2 == 1, "Kernel size must be odd number."
        act = get_activation(
            self.nonlinear_activation,
            self.nonlinear_activation_params or {"negative_slope": 0.1},
        )
        nsf_enable = self.nsf_params is not None
        num_upsamples = len(self.upsample_scales)
        k = self.kernel_size

        if nsf_enable:
            mel = x[:, :, :-2]
            pitch = x[:, :, -2:-1]
            uv = x[:, :, -1:]
            if excitation is None:
                excitation = SourceModule(
                    nb_harmonics=self.nsf_params["nb_harmonics"],
                    upsample_ratio=int(np.prod(self.upsample_scales)),
                    sampling_rate=self.nsf_params["sampling_rate"],
                    dtype=self.dtype,
                    name="source_module",
                )(pitch, uv)
            if excitation_only:
                return excitation
            # stage i sees excitation downsampled by prod(scales[i+1:])
            downsample_rates = [1] + list(self.upsample_scales[::-1][:-1])
            downsample_cum = np.cumprod(downsample_rates)[::-1]
        else:
            assert excitation is None and not excitation_only, \
                "excitation paths are NSF-only"
            mel = x

        h = WNConv1d(
            self.channels, k, padding=(k - 1) // 2, causal=self.causal,
            use_bias=self.bias, use_weight_norm=self.use_weight_norm,
            dtype=self.dtype, name="conv_pre",
        )(mel)

        for i, (scale, up_k) in enumerate(
            zip(self.upsample_scales, self.upsample_kernal_sizes)
        ):
            ch = self.channels // (2 ** (i + 1))
            h = jnp.sin(h) + h

            rep = jnp.repeat(h, scale, axis=1)
            rep = act(rep)
            rep = WNConv1d(
                ch, k, padding=(k - 1) // 2, causal=self.causal,
                use_bias=self.bias, use_weight_norm=self.use_weight_norm,
                dtype=self.dtype, quant=self.quant,
                quant_static=self.quant_static, calibrate=self.calibrate,
                name=f"repeat_upsamples_{i}",
            )(rep)

            up = act(h)
            up = WNConvTranspose1d(
                ch, up_k, stride=scale, padding=(up_k - scale) // 2,
                causal=self.causal, use_weight_norm=self.use_weight_norm,
                dtype=self.dtype, quant=self.quant,
                quant_static=self.quant_static, calibrate=self.calibrate,
                name=f"transpose_upsamples_{i}",
            )(up)

            if nsf_enable:
                u = int(downsample_cum[i])
                if u == 1:
                    e = WNConv1d(ch, 1, dtype=self.dtype,
                                 name=f"source_downs_{i}")(excitation)
                else:
                    e = WNConv1d(
                        ch, u * 2, stride=u, padding=u // 2, causal=self.causal,
                        dtype=self.dtype, name=f"source_downs_{i}",
                    )(excitation)
                h = rep + e[:, : rep.shape[1], :] + up[:, : rep.shape[1], :]
            else:
                h = rep + up[:, : rep.shape[1], :]

            acc = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilations)
            ):
                out = ResidualBlock(
                    channels=ch, kernel_size=rk, dilation=tuple(rd),
                    nonlinear_activation=self.nonlinear_activation,
                    nonlinear_activation_params=self.nonlinear_activation_params,
                    causal=self.causal, dtype=self.dtype, quant=self.quant,
                quant_static=self.quant_static, calibrate=self.calibrate,
                    name=f"conv_blocks_{i}_{j}",
                )(h)
                acc = out if acc is None else acc + out
            h = acc / len(self.resblock_kernel_sizes)

        h = leaky_relu(h, 0.01)  # F.leaky_relu default slope (hifigan.py:178)
        h = WNConv1d(
            self.out_channels, k, padding=(k - 1) // 2, causal=self.causal,
            use_bias=self.bias, use_weight_norm=self.use_weight_norm,
            dtype=self.dtype, name="conv_post",
        )(h)
        return jnp.tanh(h)


def calibrate_quant_scales(generator, params, mels, rng=None):
    """Record static int8 activation scales (PTQ) over calibration mels.

    ``generator`` must be constructed with ``quant=True, quant_static=True,
    calibrate=True`` (math runs in f32 during calibration; only amax is
    recorded). Returns the ``quant`` variable collection to pass alongside
    params at inference: ``gen.apply({"params": p, "quant": scales}, mel)``
    with a generator built with ``quant=True, quant_static=True``.

    Static scales make int8 quantization input-independent, which restores
    the chunked-batch bit-exactness contract that dynamic per-example
    scales break (infer/chunked.py)."""
    import jax as _jax

    rng = rng if rng is not None else _jax.random.PRNGKey(0)
    # jit: eager flax apply dispatches one op at a time, which is
    # pathological on a relay-attached device (one RPC per op); one
    # compiled program per calibration shape instead
    run = _jax.jit(lambda v, m: generator.apply(
        v, m, mutable=["quant"], rngs={"noise": rng})[1]["quant"])
    qvars = None
    for mel in mels:
        variables = {"params": params}
        if qvars is not None:
            variables["quant"] = qvars
        qvars = run(variables, mel)
    return qvars
