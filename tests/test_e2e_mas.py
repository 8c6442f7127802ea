"""MAS-mode training through the full CLI path: corpus WITHOUT duration
labels -> beta-binomial priors + in-graph alignment learning."""

import glob

import numpy as np
import pytest
import yaml

from kantts_tpu.dsp.mel import MelSpectrogramExtractor
from kantts_tpu.utils.audio import save_wav

pytestmark = pytest.mark.slow
from tests.test_e2e import SAMBERT_TINY, SR, make_symbols

HOP = 200


@pytest.fixture(scope="module")
def mas_corpus(tmp_path_factory):
    """Like the e2e corpus but with NO duration/ dir and FRAME-level f0/energy
    (the MAS data contract, reference dataset.py:498-520,566-569)."""
    root = tmp_path_factory.mktemp("mas_corpus")
    for sub in ["wav", "mel", "f0", "energy", "frame_f0", "frame_uv"]:
        (root / sub).mkdir()
    extractor = MelSpectrogramExtractor(SR, n_fft=2048, hop_length=HOP,
                                        win_length=1000, n_mels=80,
                                        fmin=0.0, fmax=8000.0)
    rng = np.random.RandomState(0)
    lines = []
    for i in range(12):
        t = np.arange(int(SR * (0.4 + 0.05 * (i % 3)))) / SR
        wav = (0.4 * np.sin(2 * np.pi * (160 + 15 * i) * t)
               + 0.03 * rng.randn(len(t))).astype(np.float32)
        utt = f"utt{i:03d}"
        save_wav(wav, str(root / "wav" / f"{utt}.wav"), SR)
        mel = extractor(wav)
        frames = mel.shape[0]
        np.save(root / "mel" / f"{utt}.npy", mel)
        # frame-level prosody targets (no durations to average over)
        np.save(root / "f0" / f"{utt}.npy",
                np.abs(rng.randn(frames)).astype(np.float32))
        np.save(root / "energy" / f"{utt}.npy",
                np.abs(rng.randn(frames)).astype(np.float32))
        np.save(root / "frame_f0" / f"{utt}.npy",
                rng.randn(frames).astype(np.float32) * 0.1)
        np.save(root / "frame_uv" / f"{utt}.npy",
                np.ones(frames, dtype=np.float32))
        lines.append(f"{utt}\t{make_symbols()}")
    (root / "raw_metafile.txt").write_text("\n".join(lines) + "\n")
    (root / "audio_config.yaml").write_text(yaml.safe_dump({
        "audio_config": {"sampling_rate": SR, "hop_length": HOP,
                         "win_length": 1000, "n_fft": 2048, "n_mels": 80}}))
    return root


def test_train_sambert_mas(mas_corpus, tmp_path):
    from kantts_tpu.bin.train_sambert import train

    stage = tmp_path / "am_mas"
    stage.mkdir()
    cfg = yaml.safe_load(yaml.safe_dump(SAMBERT_TINY))
    cfg["Model"]["KanTtsSAMBERT"]["params"]["MAS"] = True
    cfg["Loss"]["AttentionCTCLoss"] = {"enable": True}
    cfg["Loss"]["AttentionBinarizationLoss"] = {
        "enable": True, "params": {"start_epoch": 0, "warmup_epoch": 10}
    }
    cfg["train_max_steps"] = 4
    cfg["save_interval_steps"] = 2
    cfg_path = stage / "model.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    train(str(cfg_path), str(mas_corpus), str(stage), data_parallel=False)
    assert glob.glob(str(stage / "ckpt" / "*.ckpt"))


def test_train_sambert_mas_scheduled_sampling(mas_corpus, tmp_path):
    """Scheduled sampling (two-pass decode mixing the model's own coarse
    frames into the teacher-forced prev-mel input) trains end-to-end with
    finite losses; exposure-bias mitigation for the TF->free-running gap."""
    from kantts_tpu.bin.train_sambert import train

    stage = tmp_path / "am_mas_ss"
    stage.mkdir()
    cfg = yaml.safe_load(yaml.safe_dump(SAMBERT_TINY))
    params = cfg["Model"]["KanTtsSAMBERT"]["params"]
    params["MAS"] = True
    params["scheduled_sampling_prob"] = 0.5
    params["scheduled_sampling_ramp_steps"] = 2
    cfg["Loss"]["AttentionCTCLoss"] = {"enable": True}
    cfg["Loss"]["AttentionBinarizationLoss"] = {
        "enable": True, "params": {"start_epoch": 0, "warmup_epoch": 10}
    }
    cfg["train_max_steps"] = 4
    cfg["save_interval_steps"] = 2
    cfg_path = stage / "model.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    train(str(cfg_path), str(mas_corpus), str(stage), data_parallel=False)
    assert glob.glob(str(stage / "ckpt" / "*.ckpt"))
    log = (stage / "stdout.log").read_text()
    assert "nan" not in log.lower().split("totalloss")[-1][:40]
