"""End-to-end smoke test on a synthetic sine corpus:
preprocess features -> train SAM-BERT + HiFi-GAN a few steps (full CLI train
functions) -> acoustic inference -> vocoder inference -> concatenated wav.

This is the copy-synthesis-style integration check SURVEY.md §4 calls for.
"""

import glob
import os

import numpy as np
import pytest
import yaml

from kantts_tpu.dsp.mel import MelSpectrogramExtractor
from kantts_tpu.utils.audio import save_wav

pytestmark = pytest.mark.slow

SR = 16000
HOP = 200
N_SYM = 8

PHONES = ["n_c", "i_c", "h_c", "ao_c", "sh_c", "in_c", "j_c", "ie_c"]


def make_symbols():
    toks = []
    for i, p in enumerate(PHONES):
        flag = "s_begin" if i % 2 == 0 else "s_end"
        ws = "word_begin" if i % 2 == 0 else "word_end"
        toks.append(f"{{{p}$tone3${flag}${ws}$emotion_neutral$F7}}")
    return " ".join(toks)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    for sub in ["wav", "mel", "duration", "f0", "energy", "frame_f0", "frame_uv"]:
        (root / sub).mkdir()

    extractor = MelSpectrogramExtractor(SR, n_fft=2048, hop_length=HOP,
                                        win_length=1000, n_mels=80,
                                        fmin=0.0, fmax=8000.0)
    rng = np.random.RandomState(0)
    lines = []
    for i in range(12):
        n_sec = 0.4 + 0.05 * (i % 4)
        t = np.arange(int(SR * n_sec)) / SR
        freq = 150 + 20 * i
        wav = (0.4 * np.sin(2 * np.pi * freq * t)
               + 0.05 * rng.randn(len(t))).astype(np.float32)
        utt = f"utt{i:03d}"
        save_wav(wav, str(root / "wav" / f"{utt}.wav"), SR)
        mel = extractor(wav)
        frames = mel.shape[0]
        np.save(root / "mel" / f"{utt}.npy", mel)

        dur = np.full(N_SYM, frames // N_SYM, dtype=np.int64)
        dur[-1] += frames - dur.sum()
        np.save(root / "duration" / f"{utt}.npy", dur)
        np.save(root / "f0" / f"{utt}.npy",
                rng.rand(N_SYM).astype(np.float32) + 0.5)
        np.save(root / "energy" / f"{utt}.npy",
                rng.rand(N_SYM).astype(np.float32) + 0.5)
        np.save(root / "frame_f0" / f"{utt}.npy",
                rng.randn(frames).astype(np.float32) * 0.1)
        np.save(root / "frame_uv" / f"{utt}.npy",
                np.ones(frames, dtype=np.float32))
        lines.append(f"{utt}\t{make_symbols()}")

    (root / "raw_metafile.txt").write_text("\n".join(lines) + "\n")
    np.savetxt(root / "f0" / "f0_mean.txt", np.asarray([150.0]))
    np.savetxt(root / "f0" / "f0_std.txt", np.asarray([30.0]))

    audio_config = {
        "audio_config": {
            "sampling_rate": SR, "hop_length": HOP, "win_length": 1000,
            "n_fft": 2048, "n_mels": 80, "fmin": 0.0, "fmax": 8000.0,
            "norm_type": "mean_std", "max_norm": 1.0, "symmetric": False,
            "min_level_db": -100.0, "ref_level_db": 20,
        }
    }
    (root / "audio_config.yaml").write_text(yaml.safe_dump(audio_config))
    return root


SAMBERT_TINY = {
    "model_type": "sambert",
    "Model": {
        "KanTtsSAMBERT": {
            "params": dict(
                max_len=64, embedding_dim=32, encoder_num_layers=1,
                encoder_num_heads=2, encoder_num_units=16,
                encoder_ffn_inner_dim=32, encoder_dropout=0.1,
                encoder_attention_dropout=0.1, encoder_relu_dropout=0.1,
                encoder_projection_units=8, speaker_units=8, emotion_units=8,
                predictor_filter_size=5, predictor_fsmn_num_layers=1,
                predictor_num_memory_units=16, predictor_ffn_inner_dim=16,
                predictor_dropout=0.1, predictor_shift=0,
                predictor_lstm_units=8, dur_pred_prenet_units=[8, 8],
                dur_pred_lstm_units=8, decoder_prenet_units=[16, 16],
                decoder_num_layers=1, decoder_num_heads=2,
                decoder_num_units=16, decoder_ffn_inner_dim=32,
                decoder_dropout=0.1, decoder_attention_dropout=0.1,
                decoder_relu_dropout=0.1, outputs_per_step=3, num_mels=80,
                postnet_filter_size=5, postnet_fsmn_num_layers=1,
                postnet_num_memory_units=16, postnet_ffn_inner_dim=16,
                postnet_dropout=0.1, postnet_shift=1, postnet_lstm_units=8,
                # de-saturate the relu'd duration head so the 4-step-trained
                # fixture predicts nonzero durations at inference (the
                # documented short-corpus footgun, PERFORMANCE.md)
                dur_pred_bias_init=1.0,
            ),
            "optimizer": {"type": "Adam",
                          "params": {"lr": 1e-3, "betas": [0.9, 0.98],
                                     "eps": 1e-9}},
            "scheduler": {"type": "NoamLR", "params": {"warmup_steps": 100}},
        }
    },
    "linguistic_unit": {
        "cleaners": "english_cleaners",
        "lfeat_type_list": "sy,tone,syllable_flag,word_segment,"
                           "emo_category,speaker_category",
        "speaker_list": "F7",
    },
    "Loss": {
        "MelReconLoss": {"enable": True, "params": {"loss_type": "mae"}},
        "ProsodyReconLoss": {"enable": True, "params": {"loss_type": "mae"}},
    },
    "batch_size": 2,
    "allow_cache": True,
    "grad_norm": 1.0,
    "train_max_steps": 4,
    "save_interval_steps": 2,
    "eval_interval_steps": 100,
    "log_interval_steps": 2,
}

HIFIGAN_TINY = {
    "model_type": "hifigan",
    "Model": {
        "Generator": {
            "params": {
                "in_channels": 80, "out_channels": 1, "channels": 16,
                "kernel_size": 7, "upsample_scales": [10, 5, 2, 2],
                "upsample_kernal_sizes": [20, 10, 4, 4],
                "resblock_kernel_sizes": [3], "resblock_dilations": [[1, 3]],
                "bias": True, "causal": True,
                "nonlinear_activation": "LeakyReLU",
                "nonlinear_activation_params": {"negative_slope": 0.1},
                "use_weight_norm": True,
            },
            "optimizer": {"type": "Adam",
                          "params": {"lr": 2e-4, "betas": [0.5, 0.9]}},
            "scheduler": {"type": "MultiStepLR",
                          "params": {"gamma": 0.5, "milestones": [100]}},
        },
        "MultiScaleDiscriminator": {
            "params": {
                "scales": 2, "downsample_pooling": "DWT",
                "discriminator_params": {
                    "channels": 16, "max_downsample_channels": 32,
                    "max_groups": 4, "downsample_scales": [2, 2, 1],
                },
                "follow_official_norm": True,
            },
            "optimizer": {"type": "Adam", "params": {"lr": 2e-4}},
            "scheduler": {"type": "MultiStepLR",
                          "params": {"gamma": 0.5, "milestones": [100]}},
        },
        "MultiPeriodDiscriminator": {
            "params": {
                "periods": [2, 3],
                "discriminator_params": {
                    "channels": 4, "max_downsample_channels": 8,
                    "downsample_scales": [3, 3, 1],
                },
            },
            "optimizer": {"type": "Adam", "params": {"lr": 2e-4}},
            "scheduler": {"type": "MultiStepLR",
                          "params": {"gamma": 0.5, "milestones": [100]}},
        },
    },
    "Loss": {
        "generator_adv_loss": {"enable": True,
                               "params": {"average_by_discriminators": False}},
        "discriminator_adv_loss": {"enable": True,
                                   "params": {"average_by_discriminators": False}},
        "mel_loss": {"enable": True, "weights": 45.0,
                     "params": {"fs": SR, "fft_size": 2048, "hop_size": HOP,
                                "win_length": 1000, "window": "hann",
                                "num_mels": 80, "fmin": 0, "fmax": 8000,
                                "log_base": None}},
        "feat_match_loss": {"enable": True, "weights": 2.0,
                            "params": {"average_by_discriminators": False,
                                       "average_by_layers": False}},
    },
    "batch_size": 2,
    "batch_max_steps": 1600,
    "allow_cache": True,
    "generator_grad_norm": -1,
    "discriminator_grad_norm": -1,
    "generator_train_start_steps": 1,
    "discriminator_train_start_steps": 0,
    "train_max_steps": 4,
    "save_interval_steps": 2,
    "eval_interval_steps": 100,
    "log_interval_steps": 2,
}


@pytest.fixture(scope="module")
def trained_sambert(corpus, tmp_path_factory):
    from kantts_tpu.bin.train_sambert import train

    stage = tmp_path_factory.mktemp("sambert_stage")
    cfg_path = stage / "model.yaml"
    cfg_path.write_text(yaml.safe_dump(SAMBERT_TINY))
    train(str(cfg_path), str(corpus), str(stage), data_parallel=False)
    ckpts = glob.glob(str(stage / "ckpt" / "*.ckpt"))
    assert ckpts, "no sambert checkpoint written"
    return stage, sorted(ckpts)[-1]


@pytest.fixture(scope="module")
def trained_hifigan(corpus, tmp_path_factory):
    from kantts_tpu.bin.train_hifigan import train

    stage = tmp_path_factory.mktemp("hifigan_stage")
    cfg_path = stage / "model.yaml"
    cfg_path.write_text(yaml.safe_dump(HIFIGAN_TINY))
    train(str(cfg_path), str(corpus), str(stage), data_parallel=False)
    ckpts = glob.glob(str(stage / "ckpt" / "*.ckpt"))
    assert ckpts, "no hifigan checkpoint written"
    return stage, sorted(ckpts)[-1]


def test_sambert_training_runs(trained_sambert):
    stage, ckpt = trained_sambert
    assert os.path.exists(os.path.join(stage, "config.yaml"))


def test_hifigan_training_runs(trained_hifigan):
    stage, ckpt = trained_hifigan
    assert os.path.exists(os.path.join(stage, "config.yaml"))


def test_full_text_to_wav(trained_sambert, trained_hifigan, tmp_path):
    from kantts_tpu.bin.text_to_wav import text_to_wav

    _, am_ckpt = trained_sambert
    _, voc_ckpt = trained_hifigan

    symbols_file = tmp_path / "symbols.lst"
    symbols_file.write_text(f"demo_0\t{make_symbols()}\n"
                            f"demo_1\t{make_symbols()}\n")
    out_dir = tmp_path / "tts_out"
    # chunked=2 routes the vocoder through the chunked-batch path, covering
    # the --chunked CLI pass-through (waveform-identical for this causal
    # non-NSF generator; the other e2e tests cover the default path).
    text_to_wav(str(out_dir), am_ckpt, voc_ckpt,
                symbols_file=str(symbols_file), chunked=2)

    res = glob.glob(str(out_dir / "res_wavs" / "*.wav"))
    assert len(res) == 1  # demo_0 + demo_1 concatenated into "demo"
    from kantts_tpu.utils.audio import read_wav

    sr, wav = read_wav(res[0])
    assert sr == SR
    assert len(wav) > SR * 0.3  # non-trivial audio came out
    assert np.isfinite(wav).all()


def test_text_to_wav_raw_pinyin(trained_sambert, trained_hifigan, tmp_path):
    """Raw tone-numbered pinyin through the in-tree front-end — no plugin,
    no symbols file (the ttsfrd-capability replacement)."""
    from kantts_tpu.bin.text_to_wav import text_to_wav

    _, am_ckpt = trained_sambert
    _, voc_ckpt = trained_hifigan

    txt = tmp_path / "input.txt"
    txt.write_text("ni3 hao3。 shi4jie4\n")
    out_dir = tmp_path / "tts_raw_out"
    text_to_wav(str(out_dir), am_ckpt, voc_ckpt, text_file=str(txt))

    res = glob.glob(str(out_dir / "res_wavs" / "*.wav"))
    assert len(res) == 1  # both sub-sentences concatenated into one group
    from kantts_tpu.utils.audio import read_wav

    sr, wav = read_wav(res[0])
    assert sr == SR and np.isfinite(wav).all() and len(wav) > 0


def test_text_to_wav_hanzi_lexicon(trained_sambert, trained_hifigan, tmp_path):
    """Raw HANZI through --frontend lexicon:readings.tsv — the user-lexicon
    replacement for the reference's closed-source ttsfrd hanzi path
    (reference text_to_wav.py:97-107)."""
    from kantts_tpu.bin.text_to_wav import text_to_wav

    _, am_ckpt = trained_sambert
    _, voc_ckpt = trained_hifigan

    lexicon = tmp_path / "readings.tsv"
    lexicon.write_text(
        "你\tni3\n好\thao3\n你好\tni3hao3\n世\tshi4\n界\tjie4\n"
        "世界\tshi4jie4\n吗\tma5\n", encoding="utf-8")
    txt = tmp_path / "hanzi.txt"
    txt.write_text("你好吗。 世界\n", encoding="utf-8")
    out_dir = tmp_path / "tts_hanzi_out"
    text_to_wav(str(out_dir), am_ckpt, voc_ckpt, text_file=str(txt),
                frontend=f"lexicon:{lexicon}")

    res = glob.glob(str(out_dir / "res_wavs" / "*.wav"))
    assert len(res) == 1
    from kantts_tpu.utils.audio import read_wav

    sr, wav = read_wav(res[0])
    assert sr == SR and np.isfinite(wav).all() and len(wav) > 0


def test_text_to_wav_hanzi(trained_sambert, trained_hifigan, tmp_path):
    """Raw HANZI with ZERO user data: the built-in core lexicon
    (resources/lexicon/zh_core.tsv) is the default front-end — the full
    in-tree replacement for the reference's closed-source ttsfrd hanzi
    path (reference text_to_wav.py:97-107)."""
    from kantts_tpu.bin.text_to_wav import text_to_wav

    _, am_ckpt = trained_sambert
    _, voc_ckpt = trained_hifigan

    txt = tmp_path / "hanzi.txt"
    txt.write_text("今天天气很好。 我们去公园散步吧\n", encoding="utf-8")
    out_dir = tmp_path / "tts_hanzi_builtin_out"
    text_to_wav(str(out_dir), am_ckpt, voc_ckpt, text_file=str(txt))

    res = glob.glob(str(out_dir / "res_wavs" / "*.wav"))
    assert len(res) == 1
    from kantts_tpu.utils.audio import read_wav

    sr, wav = read_wav(res[0])
    assert sr == SR and np.isfinite(wav).all() and len(wav) > 0


def test_stream_tts(trained_sambert, trained_hifigan, tmp_path):
    """Streaming pipeline: chunks are sample-exact vs whole-utterance
    synthesis, first-chunk latency is reported."""
    from kantts_tpu.bin.stream_tts import StreamingTTS, stream_tts

    _, am_ckpt = trained_sambert
    _, voc_ckpt = trained_hifigan

    txt = tmp_path / "input.txt"
    txt.write_text("ni3 hao3\n")
    out_dir = tmp_path / "stream_out"
    report = stream_tts(str(out_dir), am_ckpt, voc_ckpt, text_file=str(txt),
                        chunk_seconds=0.1)
    assert len(report) == 1
    assert report[0]["first_chunk_latency_s"] > 0
    assert os.path.exists(out_dir / "0_0.wav")

    # exactness: streamed chunks == one-shot synthesis of the same mel
    import jax
    import jax.numpy as jnp

    from kantts_tpu.bin.infer_sambert import am_synthesis
    from kantts_tpu.infer.streaming import stream_synthesis

    tts = StreamingTTS(am_ckpt, voc_ckpt)
    _, mel, _, _, _ = am_synthesis(make_symbols(), tts.am_model,
                                   tts.am_variables, tts.ling_unit)
    chunks = np.concatenate(list(
        stream_synthesis(tts.voc_model, tts.voc_variables, mel,
                         chunk_frames=8)
    ))
    full = np.asarray(tts.voc_model.apply(
        tts.voc_variables, jnp.asarray(mel[None]),
        rngs={"noise": jax.random.PRNGKey(0)},
    ))[0]
    np.testing.assert_allclose(chunks, full, atol=2e-5)


def test_hifigan_resume_weights_only(trained_hifigan, corpus, tmp_path):
    """Fine-tune-style resume: weights restored, steps reset (reference
    train_hifigan.py:167 restore_training_state=False)."""
    from kantts_tpu.bin.train_hifigan import train

    stage, ckpt = trained_hifigan
    stage2 = tmp_path / "voc_resume"
    stage2.mkdir()
    cfg = dict(HIFIGAN_TINY)
    cfg["train_max_steps"] = 3
    cfg["save_interval_steps"] = 2
    cfg_path = stage2 / "model.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    train(str(cfg_path), str(corpus), str(stage2), resume_path=ckpt,
          data_parallel=False)
    assert glob.glob(str(stage2 / "ckpt" / "*.ckpt"))


def test_hifigan_resume_training_state(trained_hifigan, corpus, tmp_path):
    """True resume (--resume_training_state): the step counter continues
    from the checkpoint instead of restarting at 1 — the contract the
    segmented sustained-training harness (tools/bench_sustained.py)
    depends on."""
    import re

    from kantts_tpu.bin.train_hifigan import train

    stage, ckpt = trained_hifigan
    at = int(re.search(r"checkpoint[_-](\d+)\.ckpt$", ckpt).group(1))
    stage2 = tmp_path / "voc_true_resume"
    stage2.mkdir()
    cfg = dict(HIFIGAN_TINY)
    cfg["train_max_steps"] = at + 2
    cfg["save_interval_steps"] = 1
    cfg_path = stage2 / "model.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    train(str(cfg_path), str(corpus), str(stage2), resume_path=ckpt,
          data_parallel=False, resume_training_state=True)
    steps = sorted(
        int(re.search(r"checkpoint[_-](\d+)\.ckpt$", p).group(1))
        for p in glob.glob(str(stage2 / "ckpt" / "*.ckpt")))
    assert steps, "no checkpoints written"
    # continued past the resume point and never restarted from step 1
    assert steps[-1] == at + 2
    assert steps[0] > at


def test_sambert_resume(trained_sambert, corpus, tmp_path):
    """Checkpoint round-trip: resume restores steps and params, continues
    from the NEXT step (no re-training of the checkpointed one), and ends
    exactly at the extended train_max_steps with its boundary save."""
    import re

    from kantts_tpu.bin.train_sambert import train

    stage, ckpt = trained_sambert
    at = int(re.search(r"checkpoint[_-](\d+)\.ckpt$", ckpt).group(1))
    stage2 = tmp_path / "resume_stage"
    stage2.mkdir()
    cfg = dict(SAMBERT_TINY)
    cfg["train_max_steps"] = at + 2
    cfg["save_interval_steps"] = 1
    cfg_path = stage2 / "model.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    train(str(cfg_path), str(corpus), str(stage2), resume_path=ckpt,
          data_parallel=False)
    steps = sorted(
        int(re.search(r"checkpoint[_-](\d+)\.ckpt$", p).group(1))
        for p in glob.glob(str(stage2 / "ckpt" / "*.ckpt")))
    assert steps and steps[0] > at and steps[-1] == at + 2

def test_exported_serving_artifact(trained_sambert, trained_hifigan, tmp_path):
    """jax.export serving artifact: export -> reload -> synthesize, and the
    deserialized StableHLO program is waveform-identical to the live fused
    program (infer/exported.py; deployment parity with the reference's
    modelscope pipeline around text_to_wav)."""
    import jax

    from kantts_tpu.bin.infer_hifigan import load_model
    from kantts_tpu.bin.infer_sambert import load_am_checkpoint
    from kantts_tpu.infer.e2e import make_fused_infer
    from kantts_tpu.infer.exported import (
        ExportedTTS,
        encode_symbol_inputs,
        export_fused_tts,
    )

    _, am_ckpt = trained_sambert
    _, voc_ckpt = trained_hifigan
    art = tmp_path / "artifact"
    # cpu-only lowering keeps the test fast; production default is (cpu, tpu)
    meta = export_fused_tts(am_ckpt, voc_ckpt, str(art), max_input_len=32,
                            max_output_len=48, platforms=("cpu",))
    for fname in ("program.jaxexp", "weights.msgpack", "config.yaml",
                  "meta.json"):
        assert (art / fname).exists()
    assert meta["hop_total"] == HOP and meta["sampling_rate"] == SR

    tts = ExportedTTS(str(art))
    sym = make_symbols()
    wav, n_frames = tts.synthesize(sym)
    assert 0 < n_frames <= 48
    assert wav.shape == (n_frames * HOP,)
    assert np.isfinite(wav).all()

    # the artifact is the program: identical output to the live fused path
    am, am_vars, ling_unit, _ = load_am_checkpoint(am_ckpt)
    gen, voc_vars, _, _ = load_model(voc_ckpt)
    fn = make_fused_infer(am, gen, 48)
    ling, emo, spk, lengths = encode_symbol_inputs(ling_unit, sym, 32, 4)
    wav_ref, n_ref = fn(am_vars, voc_vars, ling, emo, spk, lengths,
                        jax.random.PRNGKey(0))
    assert int(np.asarray(n_ref)[0]) == n_frames
    np.testing.assert_allclose(wav, np.asarray(wav_ref)[0, : len(wav), 0],
                               atol=1e-5)

    # int8 artifact: same checkpoint, bounded drift vs the f32 artifact
    art8 = tmp_path / "artifact_int8"
    export_fused_tts(am_ckpt, voc_ckpt, str(art8), max_input_len=32,
                     max_output_len=48, platforms=("cpu",), int8=True)
    wav8, n8 = ExportedTTS(str(art8)).synthesize(sym)
    assert n8 == n_frames and np.isfinite(wav8).all()
    rel = np.linalg.norm(wav8 - wav) / max(np.linalg.norm(wav), 1e-9)
    assert rel < 0.05, rel

def test_hifigan_batched_infer_matches_single(trained_hifigan, tmp_path):
    """Cross-utterance batched vocoder synthesis (--batch) writes the same
    wavs as the per-utterance path: batch items never interact in the conv
    stacks and end-padding is identical, so batching is exact (causal and
    non-causal alike — this guards the grouping/padding/slicing logic)."""
    from kantts_tpu.bin.infer_hifigan import hifigan_infer

    _, voc_ckpt = trained_hifigan
    rng = np.random.RandomState(0)
    mel_dir = tmp_path / "mels"
    mel_dir.mkdir()
    for i, frames in enumerate([30, 45, 60]):
        np.save(mel_dir / f"m{i}.npy",
                rng.randn(frames, 80).astype(np.float32))

    out1 = tmp_path / "single"
    outb = tmp_path / "batched"
    hifigan_infer(str(mel_dir), voc_ckpt, str(out1))
    hifigan_infer(str(mel_dir), voc_ckpt, str(outb), batch=2)

    from kantts_tpu.utils.audio import read_wav

    for i in range(3):
        sr1, w1 = read_wav(str(out1 / f"m{i}.wav"))
        srb, wb = read_wav(str(outb / f"m{i}.wav"))
        assert sr1 == srb and len(w1) == len(wb)
        np.testing.assert_allclose(wb, w1, atol=2e-4)
