"""In-tree pinyin raw-text front-end: symbol-format parity with the
script-convertor emission rules, break/punctuation handling, error
feedback. (Reference capability: ttsfrd raw-text synthesis,
/root/reference/kantts/bin/text_to_wav.py:97-107.)"""

import pytest

from kantts_tpu.text.ling_unit import KanTtsLinguisticUnit
from kantts_tpu.text.pinyin_frontend import line_to_items, text_to_symbols


def _symbols(line):
    seqs = text_to_symbols([line])[0]
    return [s.split(" ") for s in seqs]


def test_single_word_symbols():
    (toks,) = _symbols("ni3")
    # one CV syllable word + sentence-final break
    assert toks == [
        "{n_c$tone3$s_begin$word_begin$emotion_neutral$F7}",
        "{i_c$tone3$s_end$word_end$emotion_neutral$F7}",
        "{#4$tone_none$s_none$word_none$emotion_neutral$F7}",
    ]


def test_multi_syllable_word_and_default_breaks():
    (toks,) = _symbols("ni3hao3 ma5")
    text = " ".join(toks)
    # inter-word #1, final #4
    assert "{#1$tone_none$s_none$word_none$emotion_neutral$F7}" in text
    assert text.endswith("{#4$tone_none$s_none$word_none$emotion_neutral$F7}")
    # two-syllable word: begin/middle/end word flags per syllable position
    assert "{n_c$tone3$s_begin$word_begin$emotion_neutral$F7}" in text
    assert "{h_c$tone3$s_begin$word_middle$emotion_neutral$F7}" in text
    assert "{ao_c$tone3$s_end$word_end$emotion_neutral$F7}" in text
    # neutral tone 5 on the particle
    assert "{m_c$tone5$s_begin$word_begin$emotion_neutral$F7}" in text


def test_explicit_breaks_and_phrase_punctuation():
    (toks,) = _symbols("ni3 #2 hao3，shi4")
    text = " ".join(toks)
    assert "{#2$tone_none" in text
    assert "{#3$tone_none" in text  # comma -> phrase break


def test_sentence_split_on_stops():
    parts = _symbols("ni3 hao3。 shi4 jie4！")
    assert len(parts) == 2
    assert all(p[-1].startswith("{#4$") for p in parts)


def test_v_umlaut_and_missing_tone():
    (toks,) = _symbols("nv3 lv")
    text = " ".join(toks)
    assert "{v_c$tone3" in text
    assert "{v_c$tone5" in text  # missing tone defaults to neutral


def test_erhua_syllable():
    (toks,) = _symbols("huar1")
    assert "{uar_c$tone1" in " ".join(toks)


def test_unknown_syllable_errors():
    with pytest.raises(ValueError, match="unknown pinyin"):
        text_to_symbols(["blorp3"])
    with pytest.raises(ValueError, match="unparseable"):
        text_to_symbols(["ni3 @@@"])


def test_speaker_tagging():
    seqs = text_to_symbols(["ni3"], speaker="F99")[0]
    assert "$F99}" in seqs[0]


def test_symbols_encode_through_ling_unit():
    """The emitted sequences must round-trip through the linguistic unit the
    acoustic model consumes."""
    config = {
        "linguistic_unit": {
            "cleaners": "english_cleaners",
            "lfeat_type_list": "sy,tone,syllable_flag,word_segment,"
                               "emo_category,speaker_category",
            "speaker_list": "F7",
        }
    }
    lu = KanTtsLinguisticUnit(config)
    for seqs in text_to_symbols(["ni3hao3 shi4 jie4，zhong1guo2。"]):
        for seq in seqs:
            tracks = lu.encode_symbol_sequence(seq)
            # sy track: no UNK-collapse to padding; EOS appended
            assert len(tracks[0]) == len(seq.split(" ")) + 1


def test_item_structure():
    items = line_to_items("ni3hao3 ma5")
    assert len(items) == 1
    assert [w.break_text for w in items[0].spoken_words] == ["1", "4"]
    assert len(items[0].spoken_words[0].syllables) == 2


def test_u_umlaut_standard_spelling_folds_to_v():
    """Standard pinyin writes u-umlaut as "u" after j/q/x/y; the reference's
    py2phone map keys it as "v" (qv/jv/xv/yv). The front-end folds the
    spelling so standard input synthesizes without the keyboard convention."""
    for std, v_form in [("qu4", "qv4"), ("yuan2", "yvan2"), ("xue2", "xve2"),
                        ("jun1", "jvn1"), ("yu3", "yv3")]:
        assert _symbols(std) == _symbols(v_form), std
    # "u" after other initials is a true u and must NOT fold
    (toks,) = _symbols("bu4")
    assert "{u_c$tone4" in " ".join(toks)
