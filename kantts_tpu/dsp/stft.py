"""Batched STFT on TPU via XLA (framing gather + rFFT).

Parity targets:
- librosa 0.9.2 ``stft`` (reference preprocess, core/dsp.py:8-9): hann window
  (periodic) of win_length zero-padded to n_fft centered, center=True,
  pad_mode='reflect'.
- ``torch.stft`` as used by the reference training path
  (utils/audio_torch.py:8-31 magnitude with clamp 1e-7; MelSpectrogram with
  pad_mode='constant').

TPU-first: everything is shape-static and jittable; the frame gather lowers to
an XLA gather which fuses with the rFFT. No data-dependent shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window — matches torch.hann_window / scipy fftbins=True."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


def pad_center(window: np.ndarray, size: int) -> np.ndarray:
    """Zero-pad a window to ``size``, centered (librosa util.pad_center)."""
    n = len(window)
    lpad = (size - n) // 2
    return np.pad(window, (lpad, size - n - lpad))


def _frame(x: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """(..., T) -> (..., num_frames, frame_length) by strided gather."""
    num_frames = 1 + (x.shape[-1] - frame_length) // hop_length
    idx = (
        hop_length * jnp.arange(num_frames)[:, None]
        + jnp.arange(frame_length)[None, :]
    )
    return x[..., idx]


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "center", "pad_mode"))
def stft_complex(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    window: jnp.ndarray | None = None,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Complex STFT: (..., T) -> (..., num_frames, n_fft // 2 + 1)."""
    win_length = win_length or n_fft
    if window is None:
        window = jnp.asarray(pad_center(hann_window(win_length), n_fft))
    else:
        window = jnp.asarray(window)
        if window.shape[-1] < n_fft:
            lpad = (n_fft - window.shape[-1]) // 2
            window = jnp.pad(window, (lpad, n_fft - window.shape[-1] - lpad))
    if center:
        pad = n_fft // 2
        pad_widths = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, pad_widths, mode=pad_mode)
    frames = _frame(x, n_fft, hop_length) * window
    return jnp.fft.rfft(frames, n=n_fft, axis=-1)


def stft_magnitude(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    window: jnp.ndarray | None = None,
    center: bool = True,
    pad_mode: str = "reflect",
    min_power: float = 1e-7,
) -> jnp.ndarray:
    """Magnitude spectrogram sqrt(clamp(re^2+im^2, min_power)).

    ``min_power=1e-7`` mirrors reference utils/audio_torch.py:31 (keeps the
    log-magnitude losses finite and gives a smooth gradient at zero power).
    """
    spec = stft_complex(x, n_fft, hop_length, win_length, window, center, pad_mode)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return jnp.sqrt(jnp.clip(power, min_power, None))


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "length"))
def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    window: jnp.ndarray | None = None,
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse STFT with overlap-add and window-square normalization.

    spec: (..., num_frames, n_fft // 2 + 1) complex -> (..., T). Assumes the
    forward used center=True padding of n_fft//2 (which is trimmed here).
    """
    win_length = win_length or n_fft
    if window is None:
        window_np = pad_center(hann_window(win_length), n_fft)
    else:
        window_np = pad_center(np.asarray(window), n_fft)
    window = jnp.asarray(window_np)

    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window
    num_frames = frames.shape[-2]
    total = n_fft + hop_length * (num_frames - 1)

    batch_shape = frames.shape[:-2]
    frames2d = frames.reshape((-1, num_frames, n_fft))

    def overlap_add(fr):
        out = jnp.zeros((total,), dtype=fr.dtype)
        idx = hop_length * jnp.arange(num_frames)[:, None] + jnp.arange(n_fft)[None, :]
        return out.at[idx.reshape(-1)].add(fr.reshape(-1))

    y = jax.vmap(overlap_add)(frames2d)

    wsq = jnp.zeros((total,), dtype=frames.dtype)
    idx = hop_length * jnp.arange(num_frames)[:, None] + jnp.arange(n_fft)[None, :]
    wsq = wsq.at[idx.reshape(-1)].add(jnp.tile(window ** 2, (num_frames,)))
    y = y / jnp.where(wsq > 1e-10, wsq, 1.0)

    pad = n_fft // 2
    y = y[:, pad:]
    if length is not None:
        y = y[:, :length]
    else:
        y = y[:, : total - 2 * pad]
    return y.reshape(batch_shape + y.shape[-1:])
