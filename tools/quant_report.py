"""int8 quantization quality report: f32 vs int8-W8A8 vocoder outputs.

Trains the tiny HiFi-GAN on the synthetic sine corpus (the e2e recipe),
then synthesizes every corpus mel with the SAME checkpoint in f32 and in
int8 (interior convs quantized, Generator(quant=True)) and reports:
- waveform SNR of int8 against the f32 output,
- log-mel spectral L1 of each against the ground-truth audio (shows the
  quantization error relative to the model's own error).

Usage: [JAX_PLATFORMS=cpu] python tools/quant_report.py [train_steps]
Prints one JSON line.
"""

from __future__ import annotations

import glob
import json
import os
import pathlib
import sys
import tempfile

import numpy as np
import yaml

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))


def main(train_steps=300):
    import jax
    import jax.numpy as jnp

    from test_e2e import HIFIGAN_TINY, HOP, SR
    from kantts_tpu.bin.infer_hifigan import load_model
    from kantts_tpu.bin.train_hifigan import train as train_voc
    from kantts_tpu.dsp.mel import MelSpectrogramExtractor
    from kantts_tpu.utils.audio import save_wav

    root = pathlib.Path(tempfile.mkdtemp(prefix="quant_corpus_"))
    for sub in ["wav", "mel", "duration", "f0", "energy", "frame_f0",
                "frame_uv"]:
        (root / sub).mkdir()
    extractor = MelSpectrogramExtractor(SR, n_fft=2048, hop_length=HOP,
                                        win_length=1000, n_mels=80,
                                        fmin=0.0, fmax=8000.0)
    rng = np.random.RandomState(0)
    lines, wavs = [], {}
    for i in range(12):
        n_sec = 0.4 + 0.05 * (i % 4)
        t = np.arange(int(SR * n_sec)) / SR
        wav = (0.4 * np.sin(2 * np.pi * (150 + 20 * i) * t)
               + 0.05 * rng.randn(len(t))).astype(np.float32)
        utt = f"utt{i:03d}"
        wavs[utt] = wav
        save_wav(wav, str(root / "wav" / f"{utt}.wav"), SR)
        mel = extractor(wav)
        np.save(root / "mel" / f"{utt}.npy", mel)
        lines.append(f"{utt}\tx")
    (root / "raw_metafile.txt").write_text("\n".join(lines) + "\n")
    (root / "audio_config.yaml").write_text(yaml.safe_dump({
        "audio_config": {"sampling_rate": SR, "hop_length": HOP,
                         "win_length": 1000, "n_fft": 2048, "n_mels": 80,
                         "fmin": 0.0, "fmax": 8000.0,
                         "norm_type": "mean_std", "max_norm": 1.0,
                         "symmetric": False, "min_level_db": -100.0,
                         "ref_level_db": 20}}))

    stage = pathlib.Path(tempfile.mkdtemp(prefix="quant_stage_"))
    cfg = dict(HIFIGAN_TINY)
    cfg["train_max_steps"] = train_steps
    cfg["save_interval_steps"] = max(2, train_steps // 4)
    (stage / "model.yaml").write_text(yaml.safe_dump(cfg))
    train_voc(str(stage / "model.yaml"), str(root), str(stage),
              data_parallel=False)
    ckpt = sorted(glob.glob(str(stage / "ckpt" / "*.ckpt")))[-1]

    outputs = {}
    for tag, quant in [("f32", False), ("int8", True)]:
        model, variables, _, _ = load_model(ckpt, quant=quant)
        fn = jax.jit(lambda v, m, model=model: model.apply(v, m))
        outs = {}
        for utt, wav in wavs.items():
            mel = np.load(root / "mel" / f"{utt}.npy")
            y = np.asarray(fn(variables,
                              jnp.asarray(mel.astype(np.float32)[None])))
            outs[utt] = y[0, :, 0]
        outputs[tag] = outs

    def logmel(w):
        m = extractor(w.astype(np.float32))
        return m

    snrs, d_f32, d_int8, d_pair = [], [], [], []
    for utt, wav in wavs.items():
        y32, y8 = outputs["f32"][utt], outputs["int8"][utt]
        n = min(len(y32), len(wav))
        noise = np.mean((y8 - y32) ** 2) + 1e-12
        snrs.append(10 * np.log10(np.mean(y32 ** 2) / noise))
        m_gt, m32, m8 = logmel(wav[:n]), logmel(y32[:n]), logmel(y8[:n])
        d_f32.append(float(np.mean(np.abs(m32 - m_gt))))
        d_int8.append(float(np.mean(np.abs(m8 - m_gt))))
        d_pair.append(float(np.mean(np.abs(m8 - m32))))

    report = {
        "metric": "vocoder_int8_quality",
        "train_steps": train_steps,
        "int8_vs_f32_snr_db": round(float(np.mean(snrs)), 2),
        "mel_l1_f32_vs_target": round(float(np.mean(d_f32)), 4),
        "mel_l1_int8_vs_target": round(float(np.mean(d_int8)), 4),
        "mel_l1_int8_vs_f32": round(float(np.mean(d_pair)), 4),
        "quant_error_fraction_of_model_error": round(
            float(np.mean(d_pair) / max(np.mean(d_f32), 1e-9)), 3),
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
