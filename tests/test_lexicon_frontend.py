"""User-lexicon hanzi front-end: TSV parsing, jieba/greedy segmentation,
hanzi->pinyin->symbol conversion, actionable coverage errors.
(Reference capability: ttsfrd raw-hanzi synthesis,
/root/reference/kantts/bin/text_to_wav.py:97-107 — replaced here by a
user-fillable lexicon boundary since ttsfrd is closed-source.)"""

import pytest

from kantts_tpu.text.lexicon_frontend import (
    LexiconFrontend,
    _greedy_segments,
    load_lexicon,
    make_frontend,
)
from kantts_tpu.text.pinyin_frontend import text_to_symbols as pinyin_symbols

TOY_LEXICON = """\
# 20-character toy lexicon
你\tni3
好\thao3
你好\tni3 hao3
世\tshi4
界\tjie4
世界\tshi4jie4
我\two3
们\tmen5
爱\tai4
中\tzhong1
国\tguo2
中国\tzhong1guo2
天\ttian1
气\tqi4
很\then3
冷\tleng3
吗\tma5
是\tshi4
的\tde5
人\tren2
"""


@pytest.fixture()
def lexicon_path(tmp_path):
    p = tmp_path / "readings.tsv"
    p.write_text(TOY_LEXICON, encoding="utf-8")
    return str(p)


def test_load_lexicon(lexicon_path):
    lex = load_lexicon(lexicon_path)
    assert lex["你好"] == "ni3hao3"  # internal spaces stripped
    assert lex["世界"] == "shi4jie4"
    assert len(lex) == 20


def test_load_lexicon_errors(tmp_path):
    bad = tmp_path / "bad.tsv"
    bad.write_text("好\n", encoding="utf-8")
    with pytest.raises(ValueError, match="expected"):
        load_lexicon(str(bad))
    empty = tmp_path / "empty.tsv"
    empty.write_text("# nothing\n", encoding="utf-8")
    with pytest.raises(ValueError, match="no entries"):
        load_lexicon(str(empty))


def test_hanzi_matches_equivalent_pinyin(lexicon_path):
    fe = make_frontend(lexicon_path)
    got = fe.text_to_symbols(["你好，世界。"])
    # third-tone sandhi: ni3 hao3 surfaces as ni2 hao3
    want = pinyin_symbols(["ni2hao3，shi4jie4。"])
    assert got == want
    # sanity: non-trivial output with phrase break + sentence-final break
    text = got[0][0]
    assert "{#3$tone_none" in text
    assert text.endswith("{#4$tone_none$s_none$word_none$emotion_neutral$F7}")


def test_multi_word_sentence_and_segmentation(lexicon_path):
    fe = make_frontend(lexicon_path)
    # "我们爱中国" must use the 中国 multi-char entry (word-level reading),
    # not per-char fallback — both give the same pinyin here, but the
    # segmentation shows up in word boundaries (#word flags)
    line = fe.hanzi_to_pinyin_line("我们爱中国")
    assert "zhong1guo2" in line.split()  # one word, not two


def test_mixed_hanzi_pinyin_and_breaks(lexicon_path):
    fe = make_frontend(lexicon_path)
    # jieba segments 天气 as ONE word; its per-char readings merge into one
    # prosodic word (tian1qi4), like a native multi-char lexicon entry would
    got = fe.text_to_symbols(["天气 #2 hen3 leng3 吗？"])
    want = pinyin_symbols(["tian1qi4 #2 hen3 leng3 ma5？"])
    assert got == want


def test_missing_reading_is_actionable(lexicon_path):
    # use_builtin=False: the pure user-lexicon path must surface gaps
    fe = LexiconFrontend(lexicon_path, use_builtin=False)
    with pytest.raises(ValueError, match="no reading for '猫'"):
        fe.text_to_symbols(["猫很好"])
    # the built-in overlay closes the same gap with zero user data
    assert make_frontend(lexicon_path).text_to_symbols(["猫很好。"])


def test_greedy_fallback_segmentation():
    lex = {"你": "ni3", "好": "hao3", "你好": "ni3hao3", "吗": "ma5"}
    assert _greedy_segments("你好吗", lex) == ["你好", "吗"]
    assert _greedy_segments("好你好", lex) == ["好", "你好"]


def test_greedy_path_without_jieba(lexicon_path, monkeypatch):
    fe = make_frontend(lexicon_path)
    fe._jieba = None  # force the fallback
    got = fe.text_to_symbols(["你好世界。"])
    want = pinyin_symbols(["ni2hao3 shi4jie4。"])
    assert got == want


# ---------------------------------------------------------------- built-in

def test_builtin_lexicon_is_valid_and_conflict_free():
    """Every entry of the in-tree core lexicon must resolve through the
    PinYin syllable inventory, and the file must not silently redefine a
    word (authoring-error guard)."""
    import collections
    import re

    from kantts_tpu.text.lexicon_frontend import BUILTIN_LEXICON
    from kantts_tpu.text.pinyin_frontend import pinyin_to_syllables

    readings = collections.defaultdict(set)
    with open(BUILTIN_LEXICON, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            word, py = line.split("\t")
            readings[word].add(py)
            assert re.fullmatch(r"[\u3400-\u4dbf\u4e00-\u9fff\uf900-\ufaff]+",
                                word), f"non-hanzi key {word!r}"
            pinyin_to_syllables(py)  # raises on any invalid syllable
    conflicts = {w: ps for w, ps in readings.items() if len(ps) > 1}
    assert not conflicts, conflicts
    assert len(readings) >= 2000


def test_builtin_frontend_handles_raw_hanzi_with_no_user_data():
    fe = make_frontend()
    got = fe.text_to_symbols(["今天天气很好。"])
    assert got and got[0]
    # polyphone disambiguation via multi-char entries
    assert "yin2hang2" in fe.hanzi_to_pinyin_line("银行")
    assert "xing2" in fe.hanzi_to_pinyin_line("行走")


def test_tone_sandhi():
    from kantts_tpu.text.lexicon_frontend import apply_tone_sandhi

    assert apply_tone_sandhi("ni3hao3") == "ni2hao3"
    assert apply_tone_sandhi("zhan3lan3guan3") == "zhan2lan2guan3"
    assert apply_tone_sandhi("bu4shi4") == "bu2shi4"
    assert apply_tone_sandhi("bu4hao3") == "bu4hao3"
    assert apply_tone_sandhi("yi1ge4") == "yi2ge4"
    assert apply_tone_sandhi("yi1tian1") == "yi4tian1"
    assert apply_tone_sandhi("yi1") == "yi1"       # word-final: unchanged
    assert apply_tone_sandhi("di4yi1") == "di4yi1"  # ordinal-final
    assert apply_tone_sandhi("ma5") == "ma5"
