"""Symbol codec tests: vocab sizes and encode/decode round trips must match
the reference contract (vocab ids feed embedding tables)."""

import numpy as np
import pytest

from kantts_tpu.text.ling_unit import KanTtsLinguisticUnit, get_fpdict


def make_config(extra_params=None, language="PinYin"):
    params = {"max_len": 800}
    params.update(extra_params or {})
    return {
        "linguistic_unit": {
            "cleaners": "english_cleaners",
            "lfeat_type_list": "sy,tone,syllable_flag,word_segment,emo_category,speaker_category",
            "speaker_list": "F7",
            "language": language,
        },
        "Model": {"KanTtsSAMBERT": {"params": params}},
    }


def test_unit_sizes_pinyin():
    lu = KanTtsLinguisticUnit(make_config())
    sizes = lu.get_unit_size()
    # PinYin PhoneSet has 140 phones + #1..#4 breaks + 3 specials
    assert sizes["sy"] == 147
    # tonelist: 1,"",4,2,3,5,0 -> 7 entries + 3 specials
    assert sizes["tone"] == 10
    assert sizes["syllable_flag"] == 5 + 3
    assert sizes["word_segment"] == 5 + 3
    assert sizes["emotion"] == 33 + 3
    assert sizes["speaker"] == 1 + 3


def test_encode_symbol_sequence_shape_and_eos():
    lu = KanTtsLinguisticUnit(make_config())
    seq = "{n_c$tone3$s_begin$word_begin$emotion_neutral$F7} {i_c$tone3$s_end$word_end$emotion_neutral$F7}"
    arrays = lu.encode_symbol_sequence(seq)
    assert len(arrays) == 6
    for i, arr in enumerate(arrays):
        assert arr.dtype == np.int32
        assert len(arr) == 3  # 2 symbols + EOS
        lfeat = lu.lfeat_type_list[i]
        assert arr[-1] == lu.eos_id(lfeat)


def test_encode_decode_roundtrip():
    lu = KanTtsLinguisticUnit(make_config())
    seq = "{n_c$tone3$s_begin$word_begin$emotion_neutral$F7} {#3$tone_none$s_none$word_none$emotion_neutral$F7}"
    arrays = lu.encode_symbol_sequence(seq)
    decoded = lu.decode_symbol_sequence(arrays)
    assert decoded[0] == "sy:n_c #3 ~"
    assert decoded[1] == "tone:tone3 tone_none ~"
    assert decoded[4].startswith("emo_category:emotion_neutral")


def test_unknown_symbol_raises():
    lu = KanTtsLinguisticUnit(make_config())
    with pytest.raises(KeyError):
        lu.encode_symbol_sequence("{x$toneQ$s_begin$word_begin$emotion_neutral$F7}")


def test_byte_mode():
    cfg = make_config()
    cfg["linguistic_unit"]["lfeat_type_list"] = "byte_index,emo_category,speaker_category"
    lu = KanTtsLinguisticUnit(cfg)
    assert lu.using_byte()
    assert lu.get_unit_size()["byte_index"] == 256 + 3
    arrays = lu.encode_symbol_sequence(
        "{72$emotion_neutral$F7} {105$emotion_neutral$F7}"
    )
    assert arrays[0][0] == 72 and arrays[0][1] == 105
    assert arrays[0][-1] == lu.eos_id("byte_index")


def test_all_languages_load():
    for lang in ["PinYin", "ZhHK", "WuuShanghai", "Sichuan"]:
        lu = KanTtsLinguisticUnit(make_config(language=lang))
        sizes = lu.get_unit_size()
        assert sizes["sy"] > 10
        assert sizes["tone"] > 3


def test_fpdict():
    fp = get_fpdict(make_config(extra_params={"FP": True}))
    assert set(fp.keys()) == {1, 2, 3}
    for arr in fp.values():
        assert arr.shape == (3, 4)
        assert arr.dtype == np.int32
