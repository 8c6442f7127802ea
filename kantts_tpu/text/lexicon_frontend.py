"""User-lexicon hanzi front-end: raw Chinese text -> symbol sequences.

The reference synthesizes arbitrary hanzi via the closed-source ``ttsfrd``
engine (/root/reference/kantts/bin/text_to_wav.py:97-107,
utils/ling_unit/__init__.py:20-40), which has no portable source and no
offline replacement in this environment (no pypinyin; jieba ships no
readings). This module makes the residual boundary user-fillable: supply a
plain hanzi->pinyin TSV lexicon and hanzi input synthesizes end-to-end —
``text_to_wav --frontend lexicon:my.tsv``.

Lexicon format (UTF-8, one entry per line)::

    你好\tni3 hao3
    世界\tshi4jie4      # spaces inside the pinyin are optional
    好\thao3
    # comments and blank lines are ignored

Multi-character entries double as segmentation hints: segmentation prefers
jieba (installed here; every multi-char lexicon word is registered via
``jieba.add_word`` so user vocabulary wins), with a deterministic greedy
longest-match fallback when jieba is unavailable. Each segment must resolve
through the lexicon — as a whole word or character-by-character; anything
else raises with the exact missing characters, so coverage gaps surface as
actionable errors rather than silent drops.

Non-hanzi syntax is shared with the pinyin front-end
(text/pinyin_frontend.py): ``#1``-``#4`` breaks, phrase punctuation
(``，,、；;：:`` -> #3), sentence stops (``。.！!？?``), and inline
tone-numbered pinyin all pass through, so mixed hanzi/pinyin input works.
"""

from __future__ import annotations

import logging
import re
from typing import Dict, List

from kantts_tpu.text import pinyin_frontend

_HANZI = re.compile(r"[㐀-䶿一-鿿豈-﫿]+")
_COMMENT = re.compile(r"\s+#.*$")


def load_lexicon(path: str) -> Dict[str, str]:
    """TSV -> {hanzi word: concatenated tone-numbered pinyin}."""
    lexicon: Dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for lineno, raw in enumerate(f, 1):
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            parts = re.split(r"\t|\s{2,}", line, maxsplit=1)
            if len(parts) != 2:
                # single-space separated "word pinyin..." form
                parts = line.split(None, 1)
            if len(parts) != 2:
                raise ValueError(
                    f"{path}:{lineno}: expected 'hanzi<TAB>pinyin', got {raw!r}")
            word, pinyin = parts[0].strip(), _COMMENT.sub("", parts[1]).strip()
            pinyin = pinyin.replace(" ", "").lower()
            if not word or not pinyin:
                raise ValueError(f"{path}:{lineno}: empty field in {raw!r}")
            if word in lexicon and lexicon[word] != pinyin:
                logging.warning("lexicon %s:%d: %r redefined %r -> %r",
                                path, lineno, word, lexicon[word], pinyin)
            lexicon[word] = pinyin
    if not lexicon:
        raise ValueError(f"lexicon {path} contains no entries")
    return lexicon


def _jieba_tokenizer(lexicon: Dict[str, str]):
    """A dedicated jieba Tokenizer seeded with the user lexicon, or None."""
    try:
        import jieba
    except ImportError:  # pragma: no cover - jieba is baked into this image
        return None
    tok = jieba.Tokenizer()
    for word in lexicon:
        if len(word) > 1:
            # high freq so user vocabulary beats jieba's default dictionary
            tok.add_word(word, freq=10_000_000)
    return tok


def _greedy_segments(text: str, lexicon: Dict[str, str]) -> List[str]:
    """Deterministic longest-match segmentation over the lexicon keys."""
    max_len = max(len(w) for w in lexicon)
    out, i = [], 0
    while i < len(text):
        for ln in range(min(max_len, len(text) - i), 0, -1):
            if text[i : i + ln] in lexicon:
                out.append(text[i : i + ln])
                i += ln
                break
        else:
            out.append(text[i])  # unknown char: surfaces in _segment_to_pinyin
            i += 1
    return out


class LexiconFrontend:
    """Callable front-end bound to one lexicon file."""

    def __init__(self, lexicon_path: str):
        self.lexicon = load_lexicon(lexicon_path)
        self._jieba = _jieba_tokenizer(self.lexicon)

    def _segment(self, hanzi: str) -> List[str]:
        if self._jieba is not None:
            # HMM off: never invent out-of-lexicon multi-char words
            return [s for s in self._jieba.cut(hanzi, HMM=False) if s.strip()]
        return _greedy_segments(hanzi, self.lexicon)

    def _segment_to_pinyin(self, segment: str) -> str:
        if segment in self.lexicon:
            return self.lexicon[segment]
        missing = [c for c in segment if c not in self.lexicon]
        if missing:
            raise ValueError(
                f"lexicon has no reading for {''.join(missing)!r} "
                f"(in segment {segment!r}); add entries to the lexicon TSV")
        return "".join(self.lexicon[c] for c in segment)

    def hanzi_to_pinyin_line(self, line: str) -> str:
        """Replace each hanzi run with space-separated pinyin words (one per
        segment), leaving the pinyin front-end's syntax untouched."""

        def repl(m: re.Match) -> str:
            words = [self._segment_to_pinyin(s) for s in self._segment(m.group(0))]
            return " " + " ".join(words) + " "

        return _HANZI.sub(repl, line).strip()

    def text_to_symbols(self, texts: List[str], speaker: str = "F7",
                        lang: str = "PinYin") -> List[List[str]]:
        pinyin_lines = [self.hanzi_to_pinyin_line(line) for line in texts]
        return pinyin_frontend.text_to_symbols(pinyin_lines, speaker=speaker,
                                               lang=lang)


def make_frontend(lexicon_path: str) -> LexiconFrontend:
    return LexiconFrontend(lexicon_path)
