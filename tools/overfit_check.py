"""Training sanity: overfit small models on a synthetic sine corpus and
report the loss trajectory. Run on the attached accelerator.

Usage: python tools/overfit_check.py [steps]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np
import yaml


def main(steps=300):
    # reuse the e2e test corpus builder
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from tests.test_e2e import HIFIGAN_TINY, SAMBERT_TINY, SR, corpus  # noqa
    from tests.test_e2e import make_symbols  # noqa
    import tests.test_e2e as e2e

    from kantts_tpu.dsp.mel import MelSpectrogramExtractor
    from kantts_tpu.utils.audio import save_wav

    root = tempfile.mkdtemp(prefix="overfit_corpus_")
    root = type("P", (), {})  # build corpus manually (no pytest fixtures)
    import pathlib

    root = pathlib.Path(tempfile.mkdtemp(prefix="overfit_corpus_"))
    for sub in ["wav", "mel", "duration", "f0", "energy", "frame_f0",
                "frame_uv"]:
        (root / sub).mkdir()
    extractor = MelSpectrogramExtractor(SR, n_fft=2048, hop_length=200,
                                        win_length=1000, n_mels=80,
                                        fmin=0.0, fmax=8000.0)
    rng = np.random.RandomState(0)
    lines = []
    N_SYM = 8
    for i in range(12):
        n_sec = 0.4 + 0.05 * (i % 4)
        t = np.arange(int(SR * n_sec)) / SR
        wav = (0.4 * np.sin(2 * np.pi * (150 + 20 * i) * t)
               + 0.05 * rng.randn(len(t))).astype(np.float32)
        utt = f"utt{i:03d}"
        save_wav(wav, str(root / "wav" / f"{utt}.wav"), SR)
        mel = extractor(wav)
        frames = mel.shape[0]
        np.save(root / "mel" / f"{utt}.npy", mel)
        dur = np.full(N_SYM, frames // N_SYM, dtype=np.int64)
        dur[-1] += frames - dur.sum()
        np.save(root / "duration" / f"{utt}.npy", dur)
        np.save(root / "f0" / f"{utt}.npy", rng.rand(N_SYM).astype(np.float32) + 0.5)
        np.save(root / "energy" / f"{utt}.npy", rng.rand(N_SYM).astype(np.float32) + 0.5)
        np.save(root / "frame_f0" / f"{utt}.npy", rng.randn(frames).astype(np.float32) * 0.1)
        np.save(root / "frame_uv" / f"{utt}.npy", np.ones(frames, dtype=np.float32))
        lines.append(f"{utt}\t{make_symbols()}")
    (root / "raw_metafile.txt").write_text("\n".join(lines) + "\n")
    np.savetxt(root / "f0" / "f0_mean.txt", np.asarray([150.0]))
    np.savetxt(root / "f0" / "f0_std.txt", np.asarray([30.0]))
    (root / "audio_config.yaml").write_text(yaml.safe_dump({
        "audio_config": {"sampling_rate": SR, "hop_length": 200,
                         "win_length": 1000, "n_fft": 2048, "n_mels": 80,
                         "fmin": 0.0, "fmax": 8000.0}}))

    import pathlib

    stage = pathlib.Path(tempfile.mkdtemp(prefix="overfit_stage_"))

    # ---- SAM-BERT
    cfg = dict(SAMBERT_TINY)
    cfg["train_max_steps"] = steps
    cfg["save_interval_steps"] = steps
    cfg["log_interval_steps"] = max(steps // 6, 1)
    cfg["eval_interval_steps"] = 10 ** 9
    cfg_path = stage / "sambert.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    from kantts_tpu.bin.train_sambert import train as train_am

    print(f"=== SAM-BERT overfit ({steps} steps) ===")
    train_am(str(cfg_path), str(root), str(stage / "am"), data_parallel=False)

    # ---- HiFi-GAN
    cfg = dict(HIFIGAN_TINY)
    cfg["train_max_steps"] = steps
    cfg["save_interval_steps"] = steps
    cfg["log_interval_steps"] = max(steps // 6, 1)
    cfg["eval_interval_steps"] = 10 ** 9
    cfg_path = stage / "hifigan.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    from kantts_tpu.bin.train_hifigan import train as train_voc

    print(f"=== HiFi-GAN overfit ({steps} steps) ===")
    train_voc(str(cfg_path), str(root), str(stage / "voc"),
              data_parallel=False)
    print("stage dir:", stage)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
