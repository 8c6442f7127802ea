"""Preprocess subsystem tests: text front-end metafile round trip with the
symbol codec, FP augmentation, audio feature pipeline, full process_data."""

import os

import numpy as np
import pytest
import yaml

from kantts_tpu.preprocess.audio_utils import (
    average_by_duration,
    get_pitch,
    interp_f0,
    parse_interval_file,
    smooth,
    trim_silence,
)
from kantts_tpu.preprocess.script_convertor import (
    TextScriptConvertor,
    format_prosody,
)
from kantts_tpu.text.ling_unit import KanTtsLinguisticUnit
from kantts_tpu.utils.audio import save_wav

SR = 16000


def write_prosody(path, fp=False):
    lines = [
        "utt001\t你好#2世界",
        "\tni3 hao3 shi4 jie4",
        "utt002\t这是#1测试#3句子",
        "\tzhe4 shi4 / ce4 shi4 / jv4 zi5",
    ]
    path.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return path


def test_script_convertor_metafile_roundtrip(tmp_path):
    prosody = write_prosody(tmp_path / "prosody.txt")
    tsc = TextScriptConvertor("PinYin", "EnUS", None, "F7")
    xml_path = tmp_path / "Script.xml"
    meta_path = tmp_path / "raw_metafile.txt"
    tsc.process(str(prosody), str(xml_path), str(meta_path))

    assert xml_path.exists()
    lines = meta_path.read_text(encoding="utf-8").strip().split("\n")
    assert len(lines) == 2
    utt, symbols = lines[0].split("\t")
    assert utt == "utt001"
    # first utterance: ni(2 phones) hao(2) + #2 + shi(2) jie(2) + #4
    toks = symbols.split(" ")
    assert len(toks) == 10
    assert toks[0].startswith("{n_c$tone3$s_begin$word_begin")
    assert toks[4] == "{#2$tone_none$s_none$word_none$emotion_neutral$F7}"
    assert toks[-1] == "{#4$tone_none$s_none$word_none$emotion_neutral$F7}"

    # every emitted metafile line must be encodable by the symbol codec
    config = {
        "linguistic_unit": {
            "cleaners": "english_cleaners",
            "lfeat_type_list": "sy,tone,syllable_flag,word_segment,"
                               "emo_category,speaker_category",
            "speaker_list": "F7",
        },
    }
    lu = KanTtsLinguisticUnit(config)
    for line in lines:
        _, sym = line.split("\t")
        arrays = lu.encode_symbol_sequence(sym)
        n = len(sym.split(" ")) + 1  # + EOS
        for arr in arrays:
            assert len(arr) == n


def test_script_convertor_erhua_and_neutral_tone(tmp_path):
    prosody = tmp_path / "prosody.txt"
    prosody.write_text("utt001\t这儿#4\n\tzher4\n", encoding="utf-8")
    tsc = TextScriptConvertor("PinYin", "EnUS", None, "F7")
    meta = tmp_path / "meta.txt"
    tsc.process(str(prosody), str(tmp_path / "s.xml"), str(meta))
    lines = meta.read_text(encoding="utf-8").strip().split("\n")
    assert len(lines) == 1
    syms = lines[0].split("\t")[1]
    # erhua syllable maps to zh_c + er_c with the 儿 char absorbed
    assert "{zh_c$tone4" in syms and "er_c$tone4" in syms


def test_byte_mode_metafile(tmp_path):
    text = tmp_path / "text.txt"
    text.write_text("utt1\tHi!\nutt2\t好\n", encoding="utf-8")
    out = tmp_path / "meta.txt"
    TextScriptConvertor.turn_text_into_bytes(str(text), str(out), "F7")
    lines = out.read_text().strip().split("\n")
    toks = lines[0].split("\t")[1].split(" ")
    assert toks[0] == "{72$emotion_neutral$F7}"  # 'H'
    assert toks[1] == "{105$emotion_neutral$F7}"  # 'i'
    assert toks[2] == "{33$emotion_neutral$F7}"  # '!'
    # utf-8 multi-byte char -> 3 byte tokens + appended '.' (46)
    toks2 = lines[1].split("\t")[1].split(" ")
    assert len(toks2) == 4


def test_format_prosody_break_rewriting(tmp_path):
    p = tmp_path / "p.txt"
    p.write_text("utt1\tword1, word2. word3\n\tpron line\n", encoding="utf-8")
    lines = format_prosody(str(p))
    assert "#1" in lines[0] or "#2" in lines[0]
    assert "," not in lines[0].split("\t")[1]


def test_interp_and_smooth():
    f0 = np.array([0, 0, 100, 0, 200, 0], dtype=np.float32)
    out = interp_f0(f0.copy())
    assert out[0] == 100 and out[3] == 150 and out[5] == 200
    sm = smooth(np.ones(10, dtype=np.float64), 5)
    np.testing.assert_allclose(sm.reshape(-1), 1.0, rtol=1e-6)


def test_trim_silence():
    sig = np.concatenate([
        np.zeros(4000), 0.5 * np.sin(2 * np.pi * 220 * np.arange(8000) / SR),
        np.zeros(4000),
    ]).astype(np.float32)
    trimmed = trim_silence(sig, 40, 200, 1000)
    assert len(trimmed) < len(sig)
    assert np.abs(trimmed).max() > 0.4


def test_parse_interval_file(tmp_path):
    lines = ["header"] * 12 + [
        "0.0", "0.1", '"sil"',
        "0.1", "0.35", '"n_c"',
        "0.35", "0.6", '"i_c"',
    ]
    path = tmp_path / "utt.interval"
    path.write_text("\n".join(lines) + "\n")
    durs, phones = parse_interval_file(str(path), SR, 200)
    assert phones == ["sil", "n_c", "i_c"]
    np.testing.assert_array_equal(durs, [8, 20, 20])


def test_average_by_duration():
    x = np.array([1.0, 2.0, 0.0, 4.0, 6.0, 0.0])
    durs = np.array([3, 2, 1])
    out = average_by_duration(x, durs)
    np.testing.assert_allclose(out, [1.5, 5.0, 0.0])


def test_get_pitch_on_sine():
    t = np.arange(SR) / SR
    x = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    result = get_pitch(x, SR, 200)
    assert result is not None
    f0, uv, f0uv = result
    voiced = f0uv[f0uv > 0]
    assert abs(np.median(voiced) - 220) < 10


@pytest.mark.slow
def test_process_data_end_to_end(tmp_path):
    from kantts_tpu.bin.process_data import process_data

    voice_in = tmp_path / "voice"
    (voice_in / "wav").mkdir(parents=True)
    (voice_in / "prosody").mkdir()
    rng = np.random.RandomState(0)
    prosody_lines = []
    for i in range(6):
        utt = f"utt{i:03d}"
        t = np.arange(int(SR * 0.6)) / SR
        wav = 0.4 * np.sin(2 * np.pi * (180 + 10 * i) * t) + 0.02 * rng.randn(len(t))
        save_wav(wav.astype(np.float32), str(voice_in / "wav" / f"{utt}.wav"), SR)
        prosody_lines.append(f"{utt}\t你好#2世界")
        prosody_lines.append("\tni3 hao3 shi4 jie4")
    (voice_in / "prosody" / "prosody.txt").write_text(
        "\n".join(prosody_lines) + "\n", encoding="utf-8"
    )

    audio_cfg = tmp_path / "audio_config.yaml"
    audio_cfg.write_text(yaml.safe_dump({
        "audio_config": {
            "wav_normalize": True, "trim_silence": True,
            "trim_silence_threshold_db": 60, "preemphasize": False,
            "sampling_rate": SR, "hop_length": 200, "win_length": 1000,
            "n_fft": 2048, "n_mels": 80, "fmin": 0.0, "fmax": 8000.0,
            "phone_level_feature": True, "norm_type": "mean_std",
            "max_norm": 1.0, "symmetric": False, "min_level_db": -100.0,
            "ref_level_db": 20, "num_workers": 4,
        }
    }))

    out_dir = tmp_path / "out"
    process_data(str(voice_in), str(out_dir), str(audio_cfg), "F7", "PinYin")

    for sub in ["wav", "mel", "f0", "frame_f0", "frame_uv", "energy"]:
        files = os.listdir(out_dir / sub)
        assert any(f.endswith(".npy") or f.endswith(".wav") for f in files), sub
    assert (out_dir / "raw_metafile.txt").exists()
    assert (out_dir / "train.lst").exists()
    assert (out_dir / "am_train.lst").exists()
    # mel and frame features are frame-aligned
    mel = np.load(out_dir / "mel" / "utt000.npy")
    f0 = np.load(out_dir / "frame_f0" / "utt000.npy")
    assert mel.shape[1] == 80
    assert abs(mel.shape[0] - len(f0)) <= 1
