"""Streaming text-to-wav: symbols/pinyin -> mel -> fixed-latency waveform
chunks, with first-chunk latency reporting.

Beyond-reference capability: the reference's causal HiFi-GAN configs exist
for streaming deployment but it ships no streaming mode (its inference is
whole-utterance, /root/reference/kantts/bin/infer_hifigan.py:92-133). Here
the acoustic forward is one jitted program (~tens of ms) and the causal
vocoder emits exact chunks (infer/streaming.py), so audio starts after
  first_chunk_latency = t_acoustic + t_vocoder(chunk)
instead of after whole-utterance synthesis.

CLI: kantts-stream-tts --txt in.txt --am_ckpt ... --voc_ckpt ...
     [--chunk_seconds 0.3] [--output_dir out]
"""

from __future__ import annotations

import argparse
import importlib
import json
import logging
import os
import sys
import time
from typing import Iterator, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from kantts_tpu.bin.infer_hifigan import load_model as load_voc_checkpoint
from kantts_tpu.bin.infer_sambert import am_synthesis, load_am_checkpoint
from kantts_tpu.infer.streaming import stream_synthesis
from kantts_tpu.utils.audio import save_wav

logging.basicConfig(
    format="%(asctime)s, %(levelname)-4s [%(filename)s:%(lineno)d] %(message)s",
    datefmt="%Y-%m-%d:%H:%M:%S",
    level=logging.INFO,
)


class StreamingTTS:
    """Loaded pipeline; synthesize() yields waveform chunks as they become
    available."""

    def __init__(self, am_ckpt: str, voc_ckpt: str, am_config=None,
                 voc_config=None):
        (self.am_model, self.am_variables, self.ling_unit,
         self.am_config) = load_am_checkpoint(am_ckpt, am_config)
        (self.voc_model, self.voc_variables, pqmf,
         self.voc_config) = load_voc_checkpoint(voc_ckpt, voc_config)
        if pqmf is not None:
            raise ValueError("streaming synthesis supports single-band "
                             "causal generators (PQMF multiband is "
                             "whole-utterance only)")
        if not self.voc_model.causal:
            raise ValueError("streaming synthesis requires a causal "
                             "generator config (hifigan_v1_*)")
        self.sampling_rate = (self.voc_config.get("audio_config", {})
                              .get("sampling_rate", 16000))
        self.hop = int(np.prod(self.voc_model.upsample_scales))

    def synthesize(self, symbol_seq: str, chunk_frames: int = 24
                   ) -> Iterator[np.ndarray]:
        """Yield (chunk_samples, 1) float32 waveform chunks for one
        sentence's symbol sequence."""
        _, mel, _, _, _ = am_synthesis(symbol_seq, self.am_model,
                                       self.am_variables, self.ling_unit)
        yield from stream_synthesis(self.voc_model, self.voc_variables, mel,
                                    chunk_frames=chunk_frames)

    def warmup(self, symbol_seq: str, chunk_frames: int = 24) -> None:
        """Compile both programs so first-chunk latency excludes tracing."""
        for _ in self.synthesize(symbol_seq, chunk_frames):
            pass


def stream_tts(output_dir, am_ckpt, voc_ckpt, text_file=None,
               symbols_file=None, frontend=None, speaker="F7", lang="PinYin",
               chunk_seconds=0.3, warmup=True):
    os.makedirs(output_dir, exist_ok=True)
    tts = StreamingTTS(am_ckpt, voc_ckpt)
    frame_seconds = tts.hop / tts.sampling_rate
    chunk_frames = max(1, int(round(chunk_seconds / frame_seconds)))

    if symbols_file is not None:
        seqs = []
        with open(symbols_file, encoding="utf-8") as f:
            for line in f:
                parts = line.strip().split("\t")
                if len(parts) == 2:
                    seqs.append((parts[0], parts[1]))
    else:
        fe = importlib.import_module(frontend or
                                     "kantts_tpu.text.pinyin_frontend")
        with open(text_file, encoding="utf-8") as f:
            texts = [line.strip() for line in f if line.strip()]
        seqs = [
            (f"{i}_{j}", seq)
            for i, subs in enumerate(fe.text_to_symbols(texts, speaker=speaker,
                                                        lang=lang))
            for j, seq in enumerate([subs] if isinstance(subs, str) else subs)
        ]
    if not seqs:
        raise ValueError("no sentences to synthesize")

    if warmup:
        tts.warmup(seqs[0][1], chunk_frames)

    report = []
    for utt_id, seq in seqs:
        t0 = time.perf_counter()
        chunks = []
        first_latency = None
        for chunk in tts.synthesize(seq, chunk_frames):
            if first_latency is None:
                first_latency = time.perf_counter() - t0
            chunks.append(chunk)
        total = time.perf_counter() - t0
        wav = np.concatenate(chunks)[:, 0]
        audio_s = len(wav) / tts.sampling_rate
        save_wav(wav, os.path.join(output_dir, f"{utt_id}.wav"),
                 tts.sampling_rate)
        report.append({"utt": utt_id, "audio_seconds": round(audio_s, 3),
                       "first_chunk_latency_s": round(first_latency, 4),
                       "rtf": round(total / audio_s, 4)})
        logging.info("%s: %.2fs audio, first chunk in %.1f ms, RTF %.4f",
                     utt_id, audio_s, first_latency * 1e3, total / audio_s)

    with open(os.path.join(output_dir, "streaming_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    return report


def main():
    parser = argparse.ArgumentParser(description="streaming text/symbols -> wav")
    parser.add_argument("--txt", type=str, default=None)
    parser.add_argument("--symbols_file", type=str, default=None)
    parser.add_argument("--frontend", type=str, default=None)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--am_ckpt", type=str, required=True)
    parser.add_argument("--voc_ckpt", type=str, required=True)
    parser.add_argument("--speaker", type=str, default="F7")
    parser.add_argument("--lang", type=str, default="PinYin")
    parser.add_argument("--chunk_seconds", type=float, default=0.3)
    parser.add_argument("--no_warmup", action="store_true")
    args = parser.parse_args()
    stream_tts(args.output_dir, args.am_ckpt, args.voc_ckpt, args.txt,
               args.symbols_file, args.frontend, args.speaker, args.lang,
               args.chunk_seconds, warmup=not args.no_warmup)


if __name__ == "__main__":
    main()
