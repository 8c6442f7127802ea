"""MCD metric tests: identity gives 0; distortion grows with perturbation;
DTW tolerates time offsets."""

import numpy as np

from kantts_tpu.utils.metrics import (
    dtw_path,
    mcd_between_wavs,
    mel_cepstral_distortion,
)

SR = 16000


def _wav(freq, n_sec=0.6, noise=0.0, seed=0):
    t = np.arange(int(SR * n_sec)) / SR
    rng = np.random.RandomState(seed)
    return (0.5 * np.sin(2 * np.pi * freq * t)
            + noise * rng.randn(len(t))).astype(np.float32)


def test_mcd_identity_zero():
    x = _wav(220)
    assert mcd_between_wavs(x, x, SR) < 1e-6


def test_mcd_orders_distortion():
    clean = _wav(220)
    slightly = _wav(220, noise=0.01, seed=1)
    heavily = _wav(220, noise=0.2, seed=2)
    m1 = mcd_between_wavs(clean, slightly, SR)
    m2 = mcd_between_wavs(clean, heavily, SR)
    assert 0 < m1 < m2


def test_dtw_improves_on_offset():
    from kantts_tpu.utils.metrics import mel_cepstral_distortion as mcd
    import jax.numpy as jnp
    from kantts_tpu.dsp.mel import mel_filterbank
    from kantts_tpu.dsp.stft import stft_magnitude

    a = _wav(300, n_sec=0.5)
    b = np.concatenate([np.zeros(1600, dtype=np.float32), a])  # 0.1 s shift
    fb = mel_filterbank(SR, 1024, 80, 50.0, 8000.0)

    def log_mel(w):
        mag = np.asarray(stft_magnitude(jnp.asarray(w), 1024, 256, 1024))
        return np.log(np.maximum(mag @ fb.T, 1e-8))

    la, lb = log_mel(a), log_mel(b)
    aligned = mcd(la, lb, use_dtw=True)
    naive = mcd(la, lb, use_dtw=False)
    # DTW must recover most of the offset-induced distortion
    assert aligned < naive * 0.6


def test_dtw_path_monotonic():
    cost = np.random.RandomState(0).rand(10, 14)
    pi, pj = dtw_path(cost)
    assert pi[0] == 0 and pj[0] == 0
    assert pi[-1] == 9 and pj[-1] == 13
    assert (np.diff(pi) >= 0).all() and (np.diff(pj) >= 0).all()


def test_mcd_different_content_large():
    a = _wav(150)
    b = _wav(600)
    assert mcd_between_wavs(a, b, SR) > 2.0
