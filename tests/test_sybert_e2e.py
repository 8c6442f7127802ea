"""Textsy-BERT training CLI end-to-end on a synthetic symbol corpus, plus
encoder warm-start into SAM-BERT (the --resume_bert_path flow)."""

import glob

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow

SYBERT_TINY = {
    "model_type": "sybert",
    "Model": {
        "KanTtsTextsyBERT": {
            "params": dict(
                max_len=64, embedding_dim=32, encoder_num_layers=1,
                encoder_num_heads=2, encoder_num_units=16,
                encoder_ffn_inner_dim=32, encoder_dropout=0.1,
                encoder_attention_dropout=0.1, encoder_relu_dropout=0.1,
                encoder_projection_units=8, mask_ratio=0.3,
            ),
            "optimizer": {"type": "Adam", "params": {"lr": 1e-4}},
            "scheduler": {"type": "NoamLR", "params": {"warmup_steps": 100}},
        }
    },
    "linguistic_unit": {
        "cleaners": "english_cleaners",
        "lfeat_type_list": "sy,tone,syllable_flag,word_segment,"
                           "emo_category,speaker_category",
        "speaker_list": "F7",
    },
    "Loss": {"SeqCELoss": {"enable": True, "params": {"loss_type": "ce"}}},
    "batch_size": 2,
    "allow_cache": True,
    "grad_norm": 1.0,
    "train_max_steps": 4,
    "save_interval_steps": 2,
    "eval_interval_steps": 100,
    "log_interval_steps": 2,
}


@pytest.fixture(scope="module")
def text_corpus(tmp_path_factory):
    from tests.test_e2e import make_symbols

    root = tmp_path_factory.mktemp("sybert_corpus")
    lines = [f"utt{i:03d}\t{make_symbols()}" for i in range(10)]
    (root / "raw_metafile.txt").write_text("\n".join(lines) + "\n")
    (root / "audio_config.yaml").write_text(yaml.safe_dump({"audio_config": {}}))
    return root


def test_train_sybert_and_warm_start(text_corpus, tmp_path):
    from kantts_tpu.bin.train_sybert import train

    stage = tmp_path / "sybert_stage"
    stage.mkdir()
    cfg_path = stage / "model.yaml"
    cfg_path.write_text(yaml.safe_dump(SYBERT_TINY))
    train(str(cfg_path), str(text_corpus), str(stage), data_parallel=False)
    ckpts = sorted(glob.glob(str(stage / "ckpt" / "*.ckpt")))
    assert ckpts

    # warm-start a SAM-BERT text encoder from the sybert checkpoint
    import jax
    import jax.numpy as jnp

    from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT
    from kantts_tpu.train.trainer import load_sambert_encoder_from_sybert
    from tests.test_sambert import TINY

    cfg = dict(TINY)
    cfg.update(embedding_dim=32, encoder_num_layers=1, encoder_num_heads=2,
               encoder_num_units=16, encoder_ffn_inner_dim=32,
               encoder_projection_units=8, sy=147, tone=10, syllable_flag=8,
               word_segment=8)
    model = KanTtsSAMBERT(cfg)
    B, T_in, T_mel = 1, 8, 12
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((B, T_in, 4), jnp.int32), jnp.zeros((B, T_in), jnp.int32),
        jnp.zeros((B, T_in), jnp.int32), jnp.asarray([T_in]),
        jnp.asarray([T_mel]), jnp.zeros((B, T_mel, 10)),
        duration_targets=jnp.full((B, T_in), 1.5),
        pitch_targets=jnp.zeros((B, T_in)),
        energy_targets=jnp.zeros((B, T_in)), deterministic=False,
    )
    warm = load_sambert_encoder_from_sybert(variables["params"], ckpts[-1])
    # shared encoder weights copied (embeddings + fft blocks), others unchanged
    orig = variables["params"]["text_encoder"]["sy_emb"]["embedding"]
    new = warm["text_encoder"]["sy_emb"]["embedding"]
    assert not np.allclose(np.asarray(orig), np.asarray(new))
    np.testing.assert_allclose(
        np.asarray(warm["mel_postnet"]["fc"]["kernel"]),
        np.asarray(variables["params"]["mel_postnet"]["fc"]["kernel"]),
    )
