"""Eval-artifact plots: spectrograms, alignments, waveforms
(parity: /root/reference/kantts/utils/plot.py:10-33 and the GAN trainer's
waveform dumps, trainer.py:334-385)."""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def plot_spectrogram(spec: np.ndarray, path: str) -> None:
    """spec: (frames, n_mels)."""
    fig, ax = plt.subplots(figsize=(10, 4))
    im = ax.imshow(np.asarray(spec).T, aspect="auto", origin="lower",
                   interpolation="none")
    fig.colorbar(im, ax=ax)
    plt.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def plot_alignment(alignment: np.ndarray, path: str, info: str | None = None) -> None:
    """alignment: (T_out, T_in)."""
    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.imshow(np.asarray(alignment).T, aspect="auto", origin="lower",
                   interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("Decoder timestep" + (f"\n\n{info}" if info else ""))
    ax.set_ylabel("Encoder timestep")
    plt.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def plot_waveform(wav: np.ndarray, path: str, sample_rate: int = 16000) -> None:
    fig, ax = plt.subplots(figsize=(10, 2.5))
    t = np.arange(len(wav)) / sample_rate
    ax.plot(t, np.asarray(wav), linewidth=0.5)
    ax.set_xlabel("seconds")
    plt.tight_layout()
    fig.savefig(path)
    plt.close(fig)
