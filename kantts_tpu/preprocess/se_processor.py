"""Speaker-embedding extraction: Kaldi fbank -> D-TDNN x-vector -> 192-d
embedding per utterance + corpus average se.npy.

Parity target: /root/reference/kantts/preprocess/se_processor/ —
se_processor.py:18-87 (pipeline), D_TDNN.py:10-160 (CNN head + dense TDNN
with SE pooling blocks + stats pooling), layers.py (TDNN/DenseTDNN/Transit/
Dense layers, PoolingBlock SE gating).

The reference runs this model only with EXTERNAL pretrained weights
(``se.model``, a torch state dict). Accordingly the network here is a pure
JAX function over a converted numpy parameter dict whose keys mirror the
torch state_dict — torch checkpoints load directly (torch is used only to
deserialize the file). Kaldi fbank (torchaudio.compliance.kaldi.fbank
defaults: 25 ms povey windows, 10 ms shift, snip edges, dc removal, 0.97
preemphasis, HTK mel from 20 Hz) is implemented in numpy.
"""

from __future__ import annotations

import logging
import os
from glob import glob
from typing import Dict

import numpy as np

from kantts_tpu.utils.audio import read_wav

# ----------------------------------------------------------------- fbank


def _povey_window(n: int) -> np.ndarray:
    return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / (n - 1))) ** 0.85


def kaldi_fbank(wav: np.ndarray, sample_rate: int = 16000,
                num_mel_bins: int = 80, frame_length_ms: float = 25.0,
                frame_shift_ms: float = 10.0, preemph: float = 0.97,
                low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    """Log mel filterbank, Kaldi conventions. Returns (frames, num_mel_bins)."""
    frame_len = int(sample_rate * frame_length_ms / 1000)
    frame_shift = int(sample_rate * frame_shift_ms / 1000)
    if len(wav) < frame_len:
        return np.zeros((0, num_mel_bins), dtype=np.float32)
    n_frames = 1 + (len(wav) - frame_len) // frame_shift
    idx = (np.arange(n_frames)[:, None] * frame_shift
           + np.arange(frame_len)[None, :])
    frames = wav[idx].astype(np.float64)

    frames = frames - frames.mean(axis=1, keepdims=True)  # remove DC
    pre = np.empty_like(frames)
    pre[:, 1:] = frames[:, 1:] - preemph * frames[:, :-1]
    pre[:, 0] = frames[:, 0] - preemph * frames[:, 0]
    pre *= _povey_window(frame_len)[None, :]

    n_fft = 1
    while n_fft < frame_len:
        n_fft *= 2
    spec = np.fft.rfft(pre, n=n_fft, axis=1)
    power = (spec.real ** 2 + spec.imag ** 2)

    # HTK mel triangular banks without area normalization (Kaldi style)
    if high_freq <= 0:
        high_freq = sample_rate / 2 + high_freq
    mel = lambda f: 1127.0 * np.log(1.0 + f / 700.0)  # noqa: E731
    mel_lo, mel_hi = mel(low_freq), mel(high_freq)
    centers = np.linspace(mel_lo, mel_hi, num_mel_bins + 2)
    fft_freqs = np.arange(n_fft // 2 + 1) * sample_rate / n_fft
    fft_mels = mel(fft_freqs)
    weights = np.zeros((num_mel_bins, n_fft // 2 + 1))
    for b in range(num_mel_bins):
        left, center, right = centers[b], centers[b + 1], centers[b + 2]
        up = (fft_mels - left) / (center - left)
        down = (right - fft_mels) / (right - center)
        weights[b] = np.clip(np.minimum(up, down), 0.0, None)

    fbank = power @ weights.T
    return np.log(np.maximum(fbank, np.finfo(np.float64).eps)).astype(np.float32)


# -------------------------------------------------------------- D-TDNN net


def _bn(x, p, prefix, eps=1e-5):
    """Inference-mode BatchNorm over the channel axis (axis 1)."""
    mean = p[f"{prefix}.running_mean"]
    var = p[f"{prefix}.running_var"]
    shape = (1, -1) + (1,) * (x.ndim - 2)
    y = (x - mean.reshape(shape)) / np.sqrt(var.reshape(shape) + eps)
    if f"{prefix}.weight" in p:
        y = y * p[f"{prefix}.weight"].reshape(shape) + p[f"{prefix}.bias"].reshape(shape)
    return y


def _conv1d(x, p, prefix, stride=1, padding=0, dilation=1):
    """x: (B, C, T); torch weight (out, in, k)."""
    import jax
    import jax.numpy as jnp

    w = jnp.asarray(p[f"{prefix}.weight"])
    y = jax.lax.conv_general_dilated(
        jnp.asarray(x), w, window_strides=(stride,), padding=[(padding, padding)],
        rhs_dilation=(dilation,), dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if f"{prefix}.bias" in p:
        y = y + jnp.asarray(p[f"{prefix}.bias"])[None, :, None]
    return np.asarray(y)


def _conv2d(x, p, prefix, stride=(1, 1), padding=1):
    import jax
    import jax.numpy as jnp

    w = jnp.asarray(p[f"{prefix}.weight"])  # (out, in, kh, kw)
    y = jax.lax.conv_general_dilated(
        jnp.asarray(x), w, window_strides=stride,
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if f"{prefix}.bias" in p:
        y = y + jnp.asarray(p[f"{prefix}.bias"])[None, :, None, None]
    return np.asarray(y)


def _relu(x):
    return np.maximum(x, 0.0)


def _basic_block(x, p, prefix, stride):
    out = _relu(_bn(_conv2d(x, p, f"{prefix}.conv1", (stride, 1), 1),
                    p, f"{prefix}.bn1"))
    out = _bn(_conv2d(out, p, f"{prefix}.conv2", (1, 1), 1), p, f"{prefix}.bn2")
    if f"{prefix}.shortcut.0.weight" in p:
        short = _bn(_conv2d(x, p, f"{prefix}.shortcut.0", (stride, 1), 0),
                    p, f"{prefix}.shortcut.1")
    else:
        short = x
    return _relu(out + short)


def _cnn_head(x, p):
    """x: (B, F, T) -> (B, 32*(F//8), T) (reference D_TDNN.py:47-79)."""
    x = x[:, None]  # (B, 1, F, T)
    x = _relu(_bn(_conv2d(x, p, "head.conv1", (1, 1), 1), p, "head.bn1"))
    for i, stride in enumerate([2, 1]):
        x = _basic_block(x, p, f"head.layer1.{i}", stride)
    for i, stride in enumerate([2, 1]):
        x = _basic_block(x, p, f"head.layer2.{i}", stride)
    x = _relu(_bn(_conv2d(x, p, "head.conv2", (2, 1), 1), p, "head.bn2"))
    B, C, F, T = x.shape
    return x.reshape(B, C * F, T)


def _seg_pooling(x, seg_len=100):
    """Segment max pooling broadcast back to frame rate (layers.py:237-241)."""
    B, C, T = x.shape
    n_seg = -(-T // seg_len)
    pad = n_seg * seg_len - T
    xp = np.pad(x, ((0, 0), (0, 0), (0, pad)), constant_values=-np.inf)
    seg_max = xp.reshape(B, C, n_seg, seg_len).max(axis=-1)
    out = np.repeat(seg_max, seg_len, axis=-1)[:, :, :T]
    return out


def _pooling_block(x, p, prefix, kernel_size, dilation):
    """SE-gated TDNN conv (layers.py:213-241)."""
    padding = (kernel_size - 1) // 2 * dilation
    y = _conv1d(x, p, f"{prefix}.linear_stem", 1, padding, dilation)
    s = x.mean(-1, keepdims=True) + _seg_pooling(x)
    s = _relu(_conv1d(s, p, f"{prefix}.linear1"))
    s = 1.0 / (1.0 + np.exp(-_conv1d(s, p, f"{prefix}.linear2")))
    return y * s


def _se_dense_layer(x, p, prefix, kernel_size, dilation):
    h = _relu(_bn(x, p, f"{prefix}.nonlinear1.batchnorm"))
    h = _conv1d(h, p, f"{prefix}.linear1")
    h = _relu(_bn(h, p, f"{prefix}.nonlinear2.batchnorm"))
    return _pooling_block(h, p, f"{prefix}.se", kernel_size, dilation)


def dtdnn_embed(params: Dict[str, np.ndarray], feat: np.ndarray) -> np.ndarray:
    """feat: (B, T, 80) mean-normalized fbank -> (B, 192) embedding
    (reference D_TDNN.py:142-160 forward)."""
    x = np.transpose(feat, (0, 2, 1))  # (B, F, T)
    x = _cnn_head(x, params)

    # tdnn: conv k5 s2 pad 2 + bn + relu
    x = _conv1d(x, params, "xvector.tdnn.linear", 2, 2, 1)
    x = _relu(_bn(x, params, "xvector.tdnn.nonlinear.batchnorm"))

    for bi, (num_layers, ksize, dil) in enumerate(
        zip((12, 24, 16), (3, 3, 3), (1, 2, 3)), start=1
    ):
        for li in range(1, num_layers + 1):
            y = _se_dense_layer(x, params, f"xvector.block{bi}.tdnnd{li}",
                                ksize, dil)
            x = np.concatenate([x, y], axis=1)
        x = _relu(_bn(x, params, f"xvector.transit{bi}.nonlinear.batchnorm"))
        x = _conv1d(x, params, f"xvector.transit{bi}.linear")

    x = _relu(_bn(x, params, "bn"))

    # stats pooling: mean + unbiased std over time
    mean = x.mean(-1)
    std = x.std(-1, ddof=1)
    stats = np.concatenate([mean, std], axis=-1)[:, :, None]

    out = _conv1d(stats, params, "xvector.dense.linear")
    out = _bn(out, params, "xvector.dense.nonlinear.batchnorm")
    return out[:, :, 0]


def load_se_model(path: str) -> Dict[str, np.ndarray]:
    """Load a reference ``se.model`` torch state dict into numpy."""
    import torch

    state = torch.load(path, map_location="cpu")
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in state.items()
            if hasattr(v, "detach")}


class SpeakerEmbeddingProcessor:
    """(reference se_processor.py:18-87)."""

    def __init__(self, sample_rate: int = 16000):
        self.sample_rate = sample_rate
        self.min_wav_length = sample_rate * 30 * 10 / 1000

    def process(self, src_voice_dir: str, se_model: str) -> None:
        logging.info("[SpeakerEmbeddingProcessor] started")
        params = load_se_model(se_model)

        wav_dir = os.path.join(src_voice_dir, "wav")
        se_dir = os.path.join(src_voice_dir, "se")
        os.makedirs(se_dir, exist_ok=True)

        se_list = []
        for wav_file in sorted(glob(os.path.join(wav_dir, "*.wav"))):
            basename = os.path.splitext(os.path.basename(wav_file))[0]
            sr, wav = read_wav(wav_file)
            assert sr == 16000, "SE extractor expects 16 kHz audio"
            if len(wav) < self.min_wav_length:
                continue
            feat = kaldi_fbank(wav, sr, num_mel_bins=80)
            feat = feat - feat.mean(axis=0, keepdims=True)
            emb = dtdnn_embed(params, feat[None])  # (1, 192)
            np.save(os.path.join(se_dir, basename + ".npy"), emb)
            se_list.append(emb)

        se_average = np.mean(np.concatenate(se_list, axis=0), axis=0,
                             keepdims=True)
        np.save(os.path.join(se_dir, "se.npy"), se_average)
        logging.info("[SpeakerEmbeddingProcessor] done")
