"""Griffin-Lim phase reconstruction + spectrogram/mel inversion (JAX).

Parity target: /root/reference/kantts/preprocess/audio_processor/core/dsp.py
:88-100 (griffin-lim), :103-132 (linear spectrogram round trip),
:204-237 (inv_mel_spectrogram). Used for copy-synthesis debugging without a
vocoder. The iteration is a lax.fori_loop over STFT/iSTFT pairs — fully
jittable, runs batched on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from kantts_tpu.dsp.mel import (
    amp_to_db,
    db_to_amp,
    denormalize_db,
    mel_filterbank,
    normalize_db,
)
from kantts_tpu.dsp.stft import hann_window, istft, pad_center, stft_complex


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "n_iter"))
def griffin_lim(
    magnitude: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    n_iter: int = 60,
    seed: int = 0,
) -> jnp.ndarray:
    """magnitude: (..., frames, n_fft//2+1) -> waveform (..., T).

    Random initial phase, then n_iter projections (reference core/dsp.py:88-100).
    """
    key = jax.random.PRNGKey(seed)
    angles = jax.random.uniform(key, magnitude.shape, minval=0.0, maxval=2 * np.pi)
    spec = magnitude * jnp.exp(1j * angles)

    def body(_, spec):
        y = istft(spec, n_fft, hop_length, win_length)
        re = stft_complex(y, n_fft, hop_length, win_length, center=True,
                          pad_mode="reflect")
        re = re[..., : magnitude.shape[-2], :]
        phase = re / jnp.maximum(jnp.abs(re), 1e-10)
        return magnitude * phase

    spec = jax.lax.fori_loop(0, n_iter, body, spec)
    return istft(spec, n_fft, hop_length, win_length)


def inv_spectrogram(
    spec_db_norm: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    max_norm: float = 1.0,
    min_level_db: float = -100.0,
    ref_level_db: float = 20.0,
    symmetric: bool = False,
    power: float = 1.5,
    n_iter: int = 60,
) -> jnp.ndarray:
    """Invert a normalized linear spectrogram (reference core/dsp.py:118-132)."""
    S = db_to_amp(denormalize_db(spec_db_norm, max_norm, min_level_db, symmetric)
                  + ref_level_db)
    return griffin_lim(S ** power, n_fft, hop_length, win_length, n_iter)


def inv_mel_spectrogram(
    mel_norm: jnp.ndarray,
    sample_rate: int,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    n_mels: int = 80,
    max_norm: float = 1.0,
    min_level_db: float = -100.0,
    ref_level_db: float = 20.0,
    fmin: float = 50.0,
    fmax: float = 8000.0,
    symmetric: bool = False,
    power: float = 1.5,
    n_iter: int = 60,
) -> jnp.ndarray:
    """Invert a normalized mel spectrogram (reference core/dsp.py:204-237):
    de-normalize, pseudo-invert the mel filterbank, then Griffin-Lim."""
    mel_basis = mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax)
    inv_basis = jnp.asarray(np.linalg.pinv(mel_basis))
    D = db_to_amp(denormalize_db(mel_norm, max_norm, min_level_db, symmetric)
                  + ref_level_db)
    S = jnp.maximum(1e-10, D @ inv_basis.T)
    return griffin_lim(S ** power, n_fft, hop_length, win_length, n_iter)


def spectrogram(
    wav: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    max_norm: float = 1.0,
    min_level_db: float = -100.0,
    ref_level_db: float = 20.0,
    symmetric: bool = False,
) -> jnp.ndarray:
    """Normalized linear magnitude spectrogram (reference core/dsp.py:103-115)."""
    window = jnp.asarray(pad_center(hann_window(win_length), n_fft))
    spec = stft_complex(wav, n_fft, hop_length, win_length, window,
                        center=True, pad_mode="reflect")
    S = amp_to_db(jnp.abs(spec)) - ref_level_db
    return normalize_db(S, max_norm, min_level_db, symmetric)
