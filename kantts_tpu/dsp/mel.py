"""Mel spectrogram front-ends (JAX/XLA), matching the reference bit-for-bit.

Two distinct normalization flavors exist in the reference and both are kept:

1. **Feature extraction** flavor (preprocess, core/dsp.py:165-201):
   ``_amp_to_db(mel) - ref_level_db`` then ``_normalize`` into [0, max_norm]
   (asymmetric) or [-max_norm, max_norm] (symmetric). This is what training
   mel *targets* are built from.

2. **Loss** flavor (utils/audio_torch.py:86-186 MelSpectrogram +
   spectral_normalize_torch:42-63): amp clamp 1e-10, 20*log10(clamp 1e-5),
   ref 20 dB, min_level -100 dB, norm_abs_value 4.0, symmetric -> [-4, 4].
   Used by MelSpectrogramLoss in HiFi-GAN training.

The mel filterbank reproduces librosa.filters.mel defaults (slaney scale,
slaney area normalization) from the formulas — librosa itself is not a
dependency of this framework.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from kantts_tpu.dsp.stft import hann_window, pad_center, stft_complex

# --------------------------------------------------------------------- filters


def _hz_to_mel_slaney(freq):
    freq = np.asanyarray(freq, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = freq >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz_slaney(mels):
    mels = np.asanyarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(
        log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs
    )
    return freqs


@lru_cache(maxsize=None)
def mel_filterbank(
    sr: int, n_fft: int, n_mels: int = 80, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, n_fft//2+1)."""
    if fmax is None:
        fmax = float(sr) / 2
    fftfreqs = np.linspace(0, float(sr) / 2, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2)
    mel_f = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))

    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------- db / norm


def amp_to_db(x: jnp.ndarray, clip_val: float = 1e-5) -> jnp.ndarray:
    """20*log10(max(clip_val, x)) — reference core/dsp.py:20-21."""
    return 20.0 * jnp.log10(jnp.maximum(clip_val, x))


def db_to_amp(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.power(10.0, x * 0.05)


def normalize_db(
    S: jnp.ndarray,
    max_norm: float = 1.0,
    min_level_db: float = -100.0,
    symmetric: bool = False,
) -> jnp.ndarray:
    """dB -> normalized range; reference core/dsp.py:66-74."""
    if symmetric:
        return jnp.clip(
            (2 * max_norm) * ((S - min_level_db) / (-min_level_db)) - max_norm,
            -max_norm,
            max_norm,
        )
    return jnp.clip(max_norm * ((S - min_level_db) / (-min_level_db)), 0, max_norm)


def denormalize_db(
    D: jnp.ndarray,
    max_norm: float = 1.0,
    min_level_db: float = -100.0,
    symmetric: bool = False,
) -> jnp.ndarray:
    if symmetric:
        return (
            (jnp.clip(D, -max_norm, max_norm) + max_norm)
            * -min_level_db
            / (2 * max_norm)
        ) + min_level_db
    return (jnp.clip(D, 0, max_norm) * -min_level_db / max_norm) + min_level_db


# ------------------------------------------------------- feature-extraction


class MelSpectrogramExtractor:
    """Preprocess-flavor mel extractor (librosa-compatible STFT, reflect pad).

    Returns (num_frames, n_mels), normalized to [0, max_norm] by default —
    the exact transform training mel targets are built with
    (reference core/dsp.py:165-201).
    """

    def __init__(
        self,
        sampling_rate: int,
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
    ):
        self.sampling_rate = sampling_rate
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length
        self.max_norm = max_norm
        self.min_level_db = min_level_db
        self.ref_level_db = ref_level_db
        self.symmetric = symmetric
        self.melmat = jnp.asarray(mel_filterbank(sampling_rate, n_fft, n_mels, fmin, fmax))
        self.window = jnp.asarray(pad_center(hann_window(win_length), n_fft))
        self._fn = jax.jit(self._transform)

    def _transform(self, x: jnp.ndarray) -> jnp.ndarray:
        spec = stft_complex(
            x, self.n_fft, self.hop_length, self.win_length, self.window,
            center=True, pad_mode="reflect",
        )
        mag = jnp.abs(spec)  # (..., frames, freq)
        mel = mag @ self.melmat.T
        S = amp_to_db(mel) - self.ref_level_db
        return normalize_db(S, self.max_norm, self.min_level_db, self.symmetric)

    def __call__(self, wav: np.ndarray) -> np.ndarray:
        """wav (T,) or batched (..., T) -> mel (..., frames, n_mels)."""
        return np.asarray(self._fn(jnp.asarray(wav, dtype=jnp.float32)))


# ----------------------------------------------------------------- loss mel


class LossMelSpectrogram:
    """Loss-flavor mel (reference utils/audio_torch.py MelSpectrogram parity).

    Jittable: returns (..., n_mels, frames) like the reference (it transposes
    at the end), normalized into [-4, 4] via spectral_normalize.
    """

    def __init__(
        self,
        fs: int = 22050,
        fft_size: int = 1024,
        hop_size: int = 256,
        win_length: int | None = None,
        window: str = "hann",
        num_mels: int = 80,
        fmin: float | None = 80.0,
        fmax: float | None = 7600.0,
        center: bool = True,
        eps: float = 1e-10,
        log_base: float | None = 10.0,
        min_level_db: float = -100.0,
        ref_level_db: float = 20.0,
        norm_abs_value: float = 4.0,
        symmetric: bool = True,
    ):
        del log_base  # the reference normalizes in dB before its log path
        if window != "hann":
            raise ValueError(f"{window} window is not implemented")
        self.fft_size = fft_size
        self.hop_size = hop_size
        self.win_length = win_length or fft_size
        self.center = center
        self.eps = eps
        self.min_level_db = min_level_db
        self.ref_level_db = ref_level_db
        self.norm_abs_value = norm_abs_value
        self.symmetric = symmetric
        fmin = 0.0 if fmin is None else fmin
        fmax = float(fs) / 2 if fmax is None else fmax
        self.melmat = jnp.asarray(mel_filterbank(fs, fft_size, num_mels, fmin, fmax))
        self.window = jnp.asarray(pad_center(hann_window(self.win_length), fft_size))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x (B, T) or (B, 1, T) -> mel (B, n_mels, frames)."""
        if x.ndim == 3:
            x = x.reshape((-1, x.shape[-1]))
        spec = stft_complex(
            x, self.fft_size, self.hop_size, self.win_length, self.window,
            center=self.center, pad_mode="constant",
        )
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
        amp = jnp.sqrt(jnp.clip(power, self.eps, None))
        mel = jnp.clip(amp @ self.melmat.T, self.eps, None)
        out = amp_to_db(mel) - self.ref_level_db
        out = normalize_db(out, self.norm_abs_value, self.min_level_db, self.symmetric)
        return jnp.swapaxes(out, -1, -2)


# --------------------------------------------------------------- full helper


@partial(jax.jit, static_argnames=(
    "sampling_rate", "n_fft", "hop_length", "win_length", "n_mels",
    "max_norm", "min_level_db", "ref_level_db", "fmin", "fmax", "symmetric",
))
def melspectrogram(
    wav: jnp.ndarray,
    sampling_rate: int,
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
) -> jnp.ndarray:
    """Functional preprocess-flavor mel: (..., T) -> (..., frames, n_mels)."""
    melmat = jnp.asarray(mel_filterbank(sampling_rate, n_fft, n_mels, fmin, fmax))
    window = jnp.asarray(pad_center(hann_window(win_length), n_fft))
    spec = stft_complex(
        wav, n_fft, hop_length, win_length, window, center=True, pad_mode="reflect"
    )
    mel = jnp.abs(spec) @ melmat.T
    S = amp_to_db(mel) - ref_level_db
    return normalize_db(S, max_norm, min_level_db, symmetric)
