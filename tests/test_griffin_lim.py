"""Griffin-Lim inversion tests: spectrogram round trip recovers a sine."""

import jax.numpy as jnp
import numpy as np

from kantts_tpu.dsp.griffin_lim import (
    griffin_lim,
    inv_mel_spectrogram,
    spectrogram,
)
from kantts_tpu.dsp.mel import melspectrogram
from kantts_tpu.dsp.stft import hann_window, pad_center, stft_complex


def test_griffin_lim_recovers_sine():
    sr, n_fft, hop, win = 16000, 1024, 256, 1024
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 500 * t)).astype(np.float32)
    window = jnp.asarray(pad_center(hann_window(win), n_fft))
    mag = jnp.abs(stft_complex(jnp.asarray(x), n_fft, hop, win, window))
    y = np.asarray(griffin_lim(mag, n_fft, hop, win, n_iter=32)).reshape(-1)
    # the reconstruction must be dominated by the same 500 Hz component
    spec_y = np.abs(np.fft.rfft(y[2000:10000]))
    freqs = np.fft.rfftfreq(8000, 1 / sr)
    peak = freqs[np.argmax(spec_y)]
    assert abs(peak - 500) < 10


def test_inv_mel_spectrogram_shape_and_energy():
    sr = 16000
    t = np.arange(sr) / sr
    x = (0.4 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    mel = melspectrogram(jnp.asarray(x), sr, 1024, 256, 1024, 80,
                         fmin=50.0, fmax=8000.0)
    y = np.asarray(inv_mel_spectrogram(mel, sr, 1024, 256, 1024, 80,
                                       fmin=50.0, fmax=8000.0, n_iter=16))
    y = y.reshape(-1)
    assert len(y) > sr // 2
    assert np.isfinite(y).all()
    # energy concentrated near 300 Hz
    spec_y = np.abs(np.fft.rfft(y[2000:10000]))
    freqs = np.fft.rfftfreq(8000, 1 / sr)
    peak = freqs[np.argmax(spec_y)]
    assert abs(peak - 300) < 20


def test_spectrogram_normalized_range():
    x = jnp.asarray(np.random.RandomState(0).randn(4000).astype(np.float32) * 0.2)
    S = np.asarray(spectrogram(x, 1024, 256, 1024))
    assert S.min() >= 0.0 and S.max() <= 1.0
