"""FP dataset glue: fprm/fpadd metafiles -> labels + insertion plan in the
collate -> one training step through the FP model path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from kantts_tpu.data.dataset import AMDataset
from kantts_tpu.dsp.mel import MelSpectrogramExtractor
from kantts_tpu.utils.audio import save_wav

pytestmark = pytest.mark.slow
from tests.test_e2e import SAMBERT_TINY, SR

HOP = 200

BASE_TOKENS = [
    "{n_c$tone3$s_begin$word_begin$emotion_neutral$F7}",
    "{i_c$tone3$s_end$word_end$emotion_neutral$F7}",
    "{h_c$tone3$s_begin$word_begin$emotion_neutral$F7}",
    "{ao_c$tone3$s_end$word_end$emotion_neutral$F7}",
]
FILLER = [
    "{ga$tone5$s_begin$word_begin$emotion_disgust$F7}",
    "{a_c$tone5$s_end$word_end$emotion_disgust$F7}",
    "{#3$tone_none$s_none$word_none$emotion_disgust$F7}",
]


@pytest.fixture(scope="module")
def fp_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("fp_corpus")
    for sub in ["wav", "mel", "duration", "f0", "energy", "frame_f0",
                "frame_uv"]:
        (root / sub).mkdir()
    extractor = MelSpectrogramExtractor(SR, n_fft=2048, hop_length=HOP,
                                        win_length=1000, n_mels=80,
                                        fmin=0.0, fmax=8000.0)
    rng = np.random.RandomState(0)
    fprm_lines, fpadd_lines = [], []
    for i in range(4):
        utt = f"utt{i:03d}"
        t = np.arange(int(SR * 0.5)) / SR
        wav = (0.4 * np.sin(2 * np.pi * (180 + 10 * i) * t)).astype(np.float32)
        save_wav(wav, str(root / "wav" / f"{utt}.wav"), SR)
        mel = extractor(wav)
        frames = mel.shape[0]
        np.save(root / "mel" / f"{utt}.npy", mel)

        # fpadd: filler inserted before the second syllable pair
        fpadd_tokens = BASE_TOKENS[:2] + FILLER + BASE_TOKENS[2:]
        fprm_lines.append(f"{utt}\t{' '.join(BASE_TOKENS)}")
        fpadd_lines.append(f"{utt}\t{' '.join(fpadd_tokens)}")

        n_aug = len(fpadd_tokens)  # augmented token count
        dur = np.full(n_aug, frames // n_aug, dtype=np.int64)
        dur[-1] += frames - dur.sum()
        np.save(root / "duration" / f"{utt}.npy", dur)
        np.save(root / "f0" / f"{utt}.npy",
                np.abs(rng.randn(n_aug)).astype(np.float32))
        np.save(root / "energy" / f"{utt}.npy",
                np.abs(rng.randn(n_aug)).astype(np.float32))
        np.save(root / "frame_f0" / f"{utt}.npy",
                rng.randn(frames).astype(np.float32) * 0.1)
        np.save(root / "frame_uv" / f"{utt}.npy",
                np.ones(frames, dtype=np.float32))

    (root / "am_fprm_train.lst").write_text("\n".join(fprm_lines) + "\n")
    (root / "am_fpadd_train.lst").write_text("\n".join(fpadd_lines) + "\n")
    return root


def make_fp_config():
    cfg = yaml.safe_load(yaml.safe_dump(SAMBERT_TINY))
    cfg["Model"]["KanTtsSAMBERT"]["params"]["FP"] = True
    cfg["Loss"]["FpCELoss"] = {"enable": True,
                               "params": {"loss_type": "ce",
                                          "weight": [1, 4, 4, 8]}}
    return cfg


def test_fp_collate_and_train_step(fp_corpus):
    config = make_fp_config()
    dataset = AMDataset(config, str(fp_corpus / "am_fprm_train.lst"),
                        str(fp_corpus), input_bucket=8)
    config["Model"]["KanTtsSAMBERT"]["params"].update(
        dataset.ling_unit.get_unit_size()
    )
    batch = dataset.collate_fn([dataset[i] for i in range(4)])

    assert "fp_label" in batch and "fp_plan" in batch
    src_idx, f_cls, f_ph, inter = batch["fp_plan"]
    # labels: one filler per utterance -> some nonzero classes
    assert (batch["fp_label"] > 0).any()
    assert (inter > batch["valid_input_lengths"]).all()
    # durations padded to the plan length
    assert batch["durations"].shape[1] == src_idx.shape[1]

    # one FP train step end to end
    from kantts_tpu.losses import criterion_builder
    from kantts_tpu.models.builder import model_builder
    from kantts_tpu.train.states import TrainState
    from kantts_tpu.train.steps import make_sambert_step

    built = model_builder(config)
    criterion = criterion_builder(config)
    step = make_sambert_step(built["model"], criterion, built["tx"],
                             with_mas=False, fp_enable=True,
                             fp_dict_lings=dataset.fp_dict_lings)
    state, metrics = step(built["state"], batch, jax.random.PRNGKey(0),
                          jnp.asarray(0))
    assert np.isfinite(float(metrics["TotalLoss"]))
    assert np.isfinite(float(metrics["fp_loss"]))
