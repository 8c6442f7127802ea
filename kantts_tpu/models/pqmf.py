"""Pseudo-QMF multiband analysis/synthesis filterbank (pure XLA).

Parity target: /root/reference/kantts/models/pqmf.py:13-148 — Kaiser-window
prototype filter (taps=62, cutoff 0.142, beta 9.0 tuned for 4 subbands),
cosine modulation, analysis as strided conv and synthesis as transposed conv.
Filters are fixed (non-trainable) numpy constants; both transforms are
jittable and fuse into the surrounding vocoder graph.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal.windows import kaiser


def design_prototype_filter(taps: int = 62, cutoff_ratio: float = 0.142,
                            beta: float = 9.0) -> np.ndarray:
    """Kaiser-window lowpass prototype h(n), length taps+1."""
    assert taps % 2 == 0, "The number of taps must be even."
    assert 0.0 < cutoff_ratio < 1.0
    omega_c = np.pi * cutoff_ratio
    n = np.arange(taps + 1) - 0.5 * taps
    with np.errstate(invalid="ignore"):
        h_i = np.sin(omega_c * n) / (np.pi * n)
    h_i[taps // 2] = cutoff_ratio  # sinc limit at n=0
    return h_i * kaiser(taps + 1, beta)


@lru_cache(maxsize=None)
def _pqmf_filters(subbands: int, taps: int, cutoff_ratio: float, beta: float
                  ) -> Tuple[np.ndarray, np.ndarray]:
    h_proto = design_prototype_filter(taps, cutoff_ratio, beta)
    n = np.arange(taps + 1)
    h_analysis = np.zeros((subbands, taps + 1))
    h_synthesis = np.zeros((subbands, taps + 1))
    for k in range(subbands):
        phase = (2 * k + 1) * (np.pi / (2 * subbands)) * (n - taps / 2)
        h_analysis[k] = 2 * h_proto * np.cos(phase + (-1) ** k * np.pi / 4)
        h_synthesis[k] = 2 * h_proto * np.cos(phase - (-1) ** k * np.pi / 4)
    return h_analysis.astype(np.float32), h_synthesis.astype(np.float32)


class PQMF:
    """Analysis: (B, T, 1) -> (B, T//subbands, subbands);
    Synthesis: (B, T//subbands, subbands) -> (B, T, 1)."""

    def __init__(self, subbands: int = 4, taps: int = 62,
                 cutoff_ratio: float = 0.142, beta: float = 9.0):
        self.subbands = subbands
        self.taps = taps
        h_analysis, h_synthesis = _pqmf_filters(subbands, taps, cutoff_ratio, beta)
        # analysis: correlation with h_analysis[k] -> kernel (taps+1, 1, subbands)
        self.analysis_kernel = jnp.asarray(h_analysis.T[:, None, :])
        # synthesis: correlation of upsampled bands with h_synthesis
        self.synthesis_kernel = jnp.asarray(h_synthesis.T[:, :, None])
        self.pad = taps // 2

    def analysis(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.pad(x, ((0, 0), (self.pad, self.pad), (0, 0)))
        y = jax.lax.conv_general_dilated(
            x, self.analysis_kernel, window_strides=(1,), padding=[(0, 0)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        return y[:, :: self.subbands, :]

    def synthesis(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, S = x.shape
        # zero-stuff upsample by subbands, scaled (reference pqmf.py:145-147)
        up = jnp.zeros((B, T * S, S), dtype=x.dtype)
        up = up.at[:, :: S, :].set(x * S)
        up = jnp.pad(up, ((0, 0), (self.pad, self.pad), (0, 0)))
        return jax.lax.conv_general_dilated(
            up, self.synthesis_kernel, window_strides=(1,), padding=[(0, 0)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
