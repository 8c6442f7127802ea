"""End-to-end text-to-wav: symbols -> SAM-BERT mels -> HiFi-GAN wavs ->
silence-gapped concatenation.

CLI parity: /root/reference/kantts/bin/text_to_wav.py:30-117. The reference's
raw-text front-end is the closed-source ``ttsfrd`` binary wheel
(utils/ling_unit/__init__.py:20-40) which cannot be ported; this build
covers raw text with a layered front-end boundary:
- default: the in-tree pinyin front-end (text/pinyin_frontend.py) —
  tone-numbered pinyin lines synthesize with no plugin;
- ``--frontend``: a python module path exposing
  ``text_to_symbols(texts: list[str], speaker: str, lang: str) -> list[str]``
  (ttsfrd users can wrap their engine behind this hook, e.g. for hanzi);
- ``--symbols_file``: precomputed symbol sequences (the metafile format).

Sentence wavs are joined with 0.28 s inter-sentence silence and a 0.05 s tail
(reference text_to_wav.py:30-70).
"""

from __future__ import annotations

import argparse
import glob
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from kantts_tpu.bin.infer_hifigan import hifigan_infer
from kantts_tpu.bin.infer_sambert import am_infer
from kantts_tpu.utils.audio import read_wav, save_wav

logging.basicConfig(
    format="%(asctime)s, %(levelname)-4s [%(filename)s:%(lineno)d] %(message)s",
    datefmt="%Y-%m-%d:%H:%M:%S",
    level=logging.INFO,
)


def concat_process(chunk_wav_dir, output_dir, sampling_rate=None,
                   gap_seconds=0.28, tail_seconds=0.05):
    """Join per-sentence wavs (utt ids like ``name_0, name_1, ...``) into one
    wav per utterance group (reference text_to_wav.py:30-70)."""
    wav_files = sorted(glob.glob(os.path.join(chunk_wav_dir, "*.wav")))
    groups = {}
    for path in wav_files:
        stem = os.path.splitext(os.path.basename(path))[0]
        if stem.endswith("_mel"):  # am_infer names features {utt}_mel.npy
            stem = stem[: -len("_mel")]
        if "_" in stem and stem.rsplit("_", 1)[1].isdigit():
            group, index = stem.rsplit("_", 1)
            groups.setdefault(group, []).append((int(index), path))
        else:
            groups.setdefault(stem, []).append((0, path))

    os.makedirs(output_dir, exist_ok=True)
    for group, parts in groups.items():
        parts.sort()
        pieces = []
        sr = sampling_rate
        for i, (_, path) in enumerate(parts):
            this_sr, wav = read_wav(path)
            sr = sr or this_sr
            pieces.append(wav)
            if i != len(parts) - 1:
                pieces.append(np.zeros(int(gap_seconds * sr), dtype=np.float32))
        pieces.append(np.zeros(int(tail_seconds * sr), dtype=np.float32))
        out = np.concatenate(pieces)
        save_wav(out, os.path.join(output_dir, f"{group}.wav"), sr)
        logging.info("Wrote %s.wav (%.2fs)", group, len(out) / sr)


def text_to_wav(output_dir, am_ckpt, voc_ckpt, text_file=None,
                symbols_file=None, frontend=None, speaker="F7", lang="PinYin",
                se_file=None, chunked=0, am_batch=1, voc_batch=1):
    os.makedirs(output_dir, exist_ok=True)
    symbols_path = os.path.join(output_dir, "symbols.lst")

    if symbols_file is not None:
        symbols_path = symbols_file
    else:
        if frontend is None:
            # in-tree raw-text path: hanzi AND tone-numbered pinyin, via the
            # built-in core lexicon (text/lexicon_frontend.py; the
            # reference's ttsfrd engine is closed-source and not portable).
            # ``--frontend lexicon:readings.tsv`` overlays a user lexicon;
            # ``--frontend pinyin`` is the bare pinyin-only g2p; any other
            # value is a custom g2p module path.
            logging.info("Using the in-tree hanzi+pinyin front-end (built-in "
                         "core lexicon); pass --frontend to customize.")
        from kantts_tpu.serve.service import resolve_frontend
        fe = resolve_frontend(frontend)
        with open(text_file, encoding="utf-8") as f:
            texts = [line.strip() for line in f if line.strip()]
        symbol_seqs = fe.text_to_symbols(texts, speaker=speaker, lang=lang)
        with open(symbols_path, "w", encoding="utf-8") as f:
            for i, seqs in enumerate(symbol_seqs):
                # a text may split into several sub-sentences
                if isinstance(seqs, str):
                    seqs = [seqs]
                for j, seq in enumerate(seqs):
                    f.write(f"{i}_{j}\t{seq}\n")

    am_infer(symbols_path, am_ckpt, output_dir, se_file=se_file,
             batch=am_batch)
    feat_dir = os.path.join(output_dir, "feat")
    chunk_dir = os.path.join(output_dir, "wav_chunks")
    mel_list = os.path.join(output_dir, "mel.lst")
    with open(mel_list, "w") as f:
        for mel in sorted(glob.glob(os.path.join(feat_dir, "*_mel.npy"))):
            f.write(mel + "\n")
    hifigan_infer(mel_list, voc_ckpt, chunk_dir, chunked=chunked,
                  batch=voc_batch)
    concat_process(chunk_dir, os.path.join(output_dir, "res_wavs"))


def main():
    parser = argparse.ArgumentParser(description="text/symbols -> wav")
    parser.add_argument("--txt", type=str, default=None, help="raw text file")
    parser.add_argument("--symbols_file", type=str, default=None,
                        help="precomputed symbol sequences (utt\\tsymbols)")
    parser.add_argument("--frontend", type=str, default=None,
                        help="default: built-in hanzi+pinyin front-end; "
                             "'lexicon:readings.tsv' overlays a user "
                             "hanzi->pinyin lexicon; 'pinyin' = bare pinyin "
                             "g2p; else a module exposing text_to_symbols()")
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--am_ckpt", type=str, required=True)
    parser.add_argument("--voc_ckpt", type=str, required=True)
    parser.add_argument("--speaker", type=str, default="F7")
    parser.add_argument("--lang", type=str, default="PinYin")
    parser.add_argument("--se_file", type=str, default=None)
    parser.add_argument("--chunked", type=int, default=0, metavar="N",
                        help="chunked-batch vocoder synthesis (see "
                             "infer_hifigan --chunked)")
    parser.add_argument("--am_batch", type=int, default=1, metavar="B",
                        help="batched acoustic inference: utterances per "
                             "jitted call (see infer_sambert --batch)")
    parser.add_argument("--voc_batch", type=int, default=1, metavar="B",
                        help="cross-utterance batched vocoder synthesis "
                             "(see infer_hifigan --batch)")
    args = parser.parse_args()
    text_to_wav(args.output_dir, args.am_ckpt, args.voc_ckpt, args.txt,
                args.symbols_file, args.frontend, args.speaker, args.lang,
                args.se_file, chunked=args.chunked, am_batch=args.am_batch,
                voc_batch=args.voc_batch)


if __name__ == "__main__":
    main()
