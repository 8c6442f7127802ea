"""Online TTS serving with dynamic micro-batching.

The reference's end-to-end path is a batch CLI (reference
kantts/bin/text_to_wav.py:73-117): files in, files out, one utterance at a
time. This module serves the same capability online — concurrent requests
are coalesced by a single coordinator thread into batched jitted calls, so
production traffic rides the vocoder/AM batch-efficiency curve
(PERFORMANCE.md: vocoder MFU 2.5% at B=1 -> 27% at B=64) instead of paying
B=1 economics per request.

Design (TPU-first):
- ONE coordinator thread owns the device; requests enqueue utterances and
  block on an event. No lock contention on the hot path, no multi-threaded
  jit dispatch.
- The coordinator drains the queue up to ``max_batch`` utterances, waiting
  at most ``max_wait_ms`` after the first arrival — classic dynamic
  batching: latency-bounded, throughput-opportunistic.
- Batched programs have STATIC shapes: symbol lengths pad to
  ``input_bucket`` multiples, the batch dim pads to ``max_batch``
  (repeat-last), mel frames pad to ``frame_bucket`` multiples — a handful
  of compiled programs serve any traffic mix, and per-item PNCA band widths
  guarantee batch composition cannot change any utterance's audio
  (tests/test_batched_infer.py).
- Results are bit-identical to the offline CLI pipeline at the same
  buckets (tests/test_serve.py).

Text requests run the same layered front-end as the CLI (default in-tree
pinyin g2p; ``lexicon:readings.tsv``; any module exposing
``text_to_symbols``), and multi-sub-sentence requests are joined with the
reference's 0.28 s gaps / 0.05 s tail (reference text_to_wav.py:30-70).
"""

from __future__ import annotations

import collections
import importlib
import logging
import os
import queue
import threading
import time
from typing import List, Optional, Tuple

import numpy as np


def resolve_frontend(frontend: Optional[str]):
    """The CLI's front-end resolution (bin/text_to_wav.py): None/"lexicon"
    -> the in-tree hanzi+pinyin front-end (built-in core lexicon,
    text/lexicon_frontend.py; pure-pinyin input passes through unchanged),
    ``lexicon:path`` -> built-in overlaid with a user lexicon TSV,
    ``pinyin`` -> the bare pinyin-only g2p, otherwise a module path
    exposing ``text_to_symbols(texts, speaker, lang)``."""
    if frontend is None or frontend == "lexicon":
        from kantts_tpu.text.lexicon_frontend import make_frontend

        return make_frontend()
    if frontend == "pinyin":
        from kantts_tpu.text import pinyin_frontend

        return pinyin_frontend
    if frontend.startswith("lexicon:"):
        from kantts_tpu.text.lexicon_frontend import make_frontend

        return make_frontend(frontend[len("lexicon:"):])
    return importlib.import_module(frontend)


class _Utterance:
    __slots__ = ("symbols", "mel_only", "mel", "wav", "error")

    def __init__(self, symbols: str, mel_only: bool = False):
        self.symbols = symbols
        self.mel_only = mel_only  # streaming: vocoding happens chunk-wise
        self.mel: Optional[np.ndarray] = None
        self.wav: Optional[np.ndarray] = None
        self.error: Optional[BaseException] = None


class _Request:
    __slots__ = ("utts", "remaining", "event", "lock")

    def __init__(self, utts: List[_Utterance]):
        self.utts = utts
        self.remaining = len(utts)
        self.event = threading.Event()
        self.lock = threading.Lock()

    def utterance_done(self):
        with self.lock:
            self.remaining -= 1
            if self.remaining == 0:
                self.event.set()


_SHUTDOWN = object()


class TTSService:
    """Dynamic-batching text-to-speech service over one device.

    Construct either from live models (tests, embedding) or from trained
    checkpoints (``from_checkpoints`` — the deployment path). ``synthesize``
    is thread-safe and blocking; run it from as many request threads as the
    traffic needs (e.g. serve/server.py's ThreadingHTTPServer handlers).
    """

    def __init__(self, am_model, am_variables, ling_unit, generator,
                 voc_variables, sample_rate: int, pqmf=None,
                 frontend=None, speaker: str = "F7", lang: str = "PinYin",
                 se: Optional[np.ndarray] = None, nsf_denorm=None,
                 max_batch: int = 8, max_wait_ms: float = 20.0,
                 input_bucket: int = 32, frame_bucket: int = 100,
                 frames_per_symbol: int = 24, gap_seconds: float = 0.28,
                 tail_seconds: float = 0.05):
        import jax

        self.am_model = am_model
        self.am_variables = am_variables
        self.ling_unit = ling_unit
        self.generator = generator
        self.voc_variables = voc_variables
        self.sample_rate = int(sample_rate)
        self.pqmf = pqmf
        self.frontend = (frontend if frontend is None or hasattr(
            frontend, "text_to_symbols") else resolve_frontend(frontend))
        self.speaker = speaker
        self.lang = lang
        self.se = se
        self.nsf_denorm = nsf_denorm  # callable (T, C) mel -> mel, host-side
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.input_bucket = int(input_bucket)
        self.frame_bucket = int(frame_bucket)
        self.frames_per_symbol = int(frames_per_symbol)
        self.gap_seconds = float(gap_seconds)
        self.tail_seconds = float(tail_seconds)

        rng = jax.random.PRNGKey(0)

        @jax.jit
        def _vocode(voc_vars, mel):
            y = generator.apply(voc_vars, mel, rngs={"noise": rng})
            if pqmf is not None:
                y = pqmf.synthesis(y)
            return y

        self._vocode_fn = _vocode

        self._queue: "queue.Queue" = queue.Queue()
        # serializes {closed-check + enqueue} against close()'s
        # {set closed + sentinel}: without it a request could slip its items
        # in AFTER the shutdown sentinel and wait forever
        self._submit_lock = threading.Lock()
        self._stats_lock = threading.Lock()
        self.stats = {"requests": 0, "utterances": 0, "batches": 0,
                      "errors": 0, "audio_seconds": 0.0}
        self._latencies = collections.deque(maxlen=512)  # rolling window
        self._closed = False
        self._thread = threading.Thread(target=self._coordinator,
                                        name="kantts-serve-batcher",
                                        daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------ API

    @classmethod
    def from_checkpoints(cls, am_ckpt: str, voc_ckpt: str,
                         frontend: Optional[str] = None,
                         se_file: Optional[str] = None, int8: bool = False,
                         **kwargs):
        """Load both stages the way the inference CLIs do (bin/
        infer_sambert.py, bin/infer_hifigan.py: config.yaml two levels up,
        msgpack payloads, weight norm folded for serving). ``int8`` serves
        the vocoder with int8 W8A8 interior convs (same checkpoint)."""
        from kantts_tpu.bin.infer_hifigan import load_model
        from kantts_tpu.bin.infer_sambert import denorm_f0, load_am_checkpoint

        am_model, am_variables, ling_unit, am_cfg = load_am_checkpoint(am_ckpt)
        generator, voc_variables, pqmf, voc_cfg = load_model(voc_ckpt,
                                                             quant=int8)
        sample_rate = voc_cfg["audio_config"]["sampling_rate"]

        params_cfg = am_cfg["Model"]["KanTtsSAMBERT"]["params"]
        se = np.load(se_file) if params_cfg.get("SE", False) and se_file else None

        nsf_denorm = None
        if params_cfg.get("NSF", False):
            norm_type = params_cfg.get("nsf_norm_type", "mean_std")
            if norm_type == "mean_std":
                f0_feature = np.load(os.path.join(
                    os.path.dirname(os.path.dirname(am_ckpt)), "mvn.npy"))
            else:
                f0_feature = [params_cfg.get("nsf_f0_global_maximum", 730.0),
                              params_cfg.get("nsf_f0_global_minimum", 30.0)]

            def nsf_denorm(mel, _nt=norm_type, _ff=f0_feature):
                # denormalize f0 + binarize uv between the stages, exactly as
                # the offline pipeline does (bin/infer_sambert.py:40-56 +
                # bin/infer_hifigan.py binarize) — denorm_f0 already leaves
                # uv strictly binarized
                return denorm_f0(mel.copy(), norm_type=_nt, f0_feature=_ff)

        return cls(am_model, am_variables, ling_unit, generator,
                   voc_variables, sample_rate, pqmf=pqmf, frontend=frontend,
                   se=se, nsf_denorm=nsf_denorm, **kwargs)

    def synthesize(self, text: str, timeout: Optional[float] = None,
                   speaker: Optional[str] = None,
                   lang: Optional[str] = None) -> Tuple[int, np.ndarray]:
        """Raw text -> (sample_rate, float32 waveform). Blocks until the
        coordinator has synthesized every sub-sentence; sub-sentence wavs
        are joined with the reference's silence gaps. ``speaker``/``lang``
        override the service defaults per request (the CLI's --speaker/
        --lang, reference text_to_wav.py:97-107); an unknown speaker fails
        validation with a clean error."""
        return self.synthesize_symbols(
            self._text_to_seqs(text, speaker, lang), timeout=timeout)

    def _text_to_seqs(self, text: str, speaker: Optional[str],
                      lang: Optional[str]) -> List[str]:
        fe = self.frontend if self.frontend is not None else resolve_frontend(None)
        seqs = fe.text_to_symbols([text], speaker=speaker or self.speaker,
                                  lang=lang or self.lang)[0]
        return [seqs] if isinstance(seqs, str) else list(seqs)

    def synthesize_symbols(self, symbol_seqs: List[str],
                           timeout: Optional[float] = None
                           ) -> Tuple[int, np.ndarray]:
        """Pre-encoded symbol sequences (the metafile format) -> waveform."""
        self._validate(symbol_seqs)
        t0 = time.monotonic()
        req = _Request([_Utterance(s) for s in symbol_seqs])
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("TTSService is closed")
            for utt in req.utts:
                self._queue.put((req, utt))
        if not req.event.wait(timeout):
            raise TimeoutError(f"synthesis timed out after {timeout}s")
        self._latencies.append(time.monotonic() - t0)
        errors = [u.error for u in req.utts if u.error is not None]
        if errors:
            raise errors[0]

        sr = self.sample_rate
        pieces = []
        for i, utt in enumerate(req.utts):
            pieces.append(utt.wav)
            if i != len(req.utts) - 1:
                pieces.append(np.zeros(int(self.gap_seconds * sr),
                                       dtype=np.float32))
        pieces.append(np.zeros(int(self.tail_seconds * sr), dtype=np.float32))
        wav = np.concatenate(pieces)
        with self._stats_lock:
            self.stats["requests"] += 1
            self.stats["audio_seconds"] += len(wav) / sr
        return sr, wav

    def stream(self, text: str, chunk_seconds: float = 0.3,
               timeout: Optional[float] = None,
               speaker: Optional[str] = None, lang: Optional[str] = None):
        """Raw text -> iterator of (chunk_samples, 1) float32 waveform
        chunks (exact fixed-latency streaming, infer/streaming.py). The
        acoustic forward still rides the coordinator — a streamed request's
        mel can batch with concurrent traffic, and sub-sentence i streams
        while sub-sentence i+1 is being synthesized. Causal single-band
        non-NSF generators only (the same contract as kantts-stream-tts)."""
        if self.pqmf is not None:
            raise ValueError("streaming supports single-band generators "
                             "(PQMF multiband is whole-utterance only)")
        if not getattr(self.generator, "causal", False):
            raise ValueError("streaming requires a causal generator config")
        if self.nsf_denorm is not None:
            raise ValueError("streaming does not support NSF checkpoints "
                             "(the harmonic source phase is a whole-"
                             "utterance cumsum)")
        if getattr(self.generator, "quant", False):
            raise ValueError("streaming does not support --int8: dynamic "
                             "per-example activation scales differ between "
                             "a streaming window and the full utterance, "
                             "breaking chunk-boundary exactness")
        if self._closed:
            raise RuntimeError("TTSService is closed")
        seqs = self._text_to_seqs(text, speaker, lang)
        self._validate(seqs)

        from kantts_tpu.infer.streaming import stream_synthesis

        hop = int(np.prod(self.generator.upsample_scales))
        chunk_frames = max(1, int(round(
            chunk_seconds * self.sample_rate / hop)))
        # one request per sub-sentence so each becomes streamable the moment
        # its own mel is ready
        reqs = []
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("TTSService is closed")
            for s in seqs:
                req = _Request([_Utterance(s, mel_only=True)])
                self._queue.put((req, req.utts[0]))
                reqs.append(req)

        def chunks():
            sr = self.sample_rate
            total = 0.0
            for i, req in enumerate(reqs):
                if not req.event.wait(timeout):
                    raise TimeoutError(
                        f"synthesis timed out after {timeout}s")
                utt = req.utts[0]
                if utt.error is not None:
                    raise utt.error
                for chunk in stream_synthesis(self.generator,
                                              self.voc_variables, utt.mel,
                                              chunk_frames=chunk_frames):
                    total += chunk.shape[0] / sr
                    yield chunk
                pad = (self.gap_seconds if i != len(reqs) - 1
                       else self.tail_seconds)
                total += pad
                yield np.zeros((int(pad * sr), 1), dtype=np.float32)
            with self._stats_lock:
                self.stats["requests"] += 1
                self.stats["audio_seconds"] += total

        return chunks()

    def _validate(self, symbol_seqs: List[str]):
        """Caller-thread validation: a malformed utterance rejects THIS
        request with a clean error instead of poisoning a whole coordinator
        batch. Unknown symbols raise here — the O(tokens) python encode is
        deliberately paid a second time on the request thread (it would
        otherwise run, and fail, on the single coordinator thread where it
        serializes against all traffic); lengths beyond the model's static
        position tables (config max_len, reference
        configs/sambert_16k.yaml:8) are refused the way the reference's
        front-end sentence splitting avoids them."""
        if self._closed:
            raise RuntimeError("TTSService is closed")
        if not symbol_seqs:
            raise ValueError("empty request")
        max_syms = int(self.am_model.config.get("max_len", 800))
        for seq in symbol_seqs:
            n = len(self.ling_unit.encode_symbol_sequence(seq)[0]) - 1
            if n < 1:
                raise ValueError("empty utterance in request")
            if n > max_syms:
                raise ValueError(
                    f"utterance has {n} symbols, over the model's max_len "
                    f"{max_syms}; split the text into shorter sentences")

    def stats_snapshot(self) -> dict:
        """Counters plus rolling latency percentiles over the last 512
        requests (served by GET /healthz)."""
        with self._stats_lock:
            snap = dict(self.stats)
            lats = list(self._latencies)
        if lats:
            snap["latency_p50_ms"] = round(
                float(np.percentile(lats, 50)) * 1e3, 1)
            snap["latency_p95_ms"] = round(
                float(np.percentile(lats, 95)) * 1e3, 1)
        return snap

    def warmup(self, text: str, timeout: Optional[float] = None) -> float:
        """Synthesize ``text`` once and discard the audio — compiles the
        acoustic + vocoder programs for that bucket so the first live
        request pays milliseconds, not the cold jit. Returns the wall
        seconds spent. Call before exposing the port, or per-bucket with
        representative sentence lengths."""
        t0 = time.monotonic()
        self.synthesize(text, timeout=timeout)
        dt = time.monotonic() - t0
        with self._stats_lock:  # warmup is not traffic
            self.stats["requests"] -= 1
            if self._latencies:  # nor is its compile time a latency sample
                self._latencies.pop()
        return dt

    def close(self):
        """Stop the coordinator; pending requests finish first (they are
        ahead of the sentinel in the queue)."""
        with self._submit_lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(_SHUTDOWN)
        self._thread.join(timeout=60.0)

    # ---------------------------------------------------------- coordinator

    def _coordinator(self):
        while True:
            item = self._queue.get()
            if item is _SHUTDOWN:
                return
            group = [item]
            deadline = time.monotonic() + self.max_wait_s
            while len(group) < self.max_batch:
                remaining = deadline - time.monotonic()
                try:
                    if remaining > 0:
                        nxt = self._queue.get(timeout=remaining)
                    else:  # window closed: take only what is already queued
                        nxt = self._queue.get_nowait()
                except queue.Empty:
                    break
                if nxt is _SHUTDOWN:
                    self._run_batch(group)
                    return
                group.append(nxt)
            self._run_batch(group)

    def _run_batch(self, group):
        utts = [utt for _, utt in group]
        try:
            mels = self._acoustic_batch([u.symbols for u in utts])
            for utt, mel in zip(utts, mels):
                utt.mel = mel
            # streaming (mel_only) utterances are vocoded chunk-wise by the
            # caller — running them through the batched vocoder here would
            # synthesize the whole waveform just to throw it away and delay
            # the first streamed chunk by a full-utterance vocode
            need_wav = [u for u in utts if not u.mel_only]
            if need_wav:
                wavs = self._vocode_batch([u.mel for u in need_wav])
                for utt, wav in zip(need_wav, wavs):
                    utt.wav = wav
        except BaseException as e:  # propagate to every waiter in the batch
            logging.exception("serve batch failed")
            with self._stats_lock:
                self.stats["errors"] += 1
            for utt in utts:
                utt.error = e
        finally:
            with self._stats_lock:
                self.stats["batches"] += 1
                self.stats["utterances"] += len(utts)
            for req, utt in group:
                req.utterance_done()

    def _acoustic_batch(self, symbol_seqs: List[str]) -> List[np.ndarray]:
        from kantts_tpu.bin.infer_sambert import am_synthesis_batch

        results = am_synthesis_batch(
            symbol_seqs, self.am_model, self.am_variables, self.ling_unit,
            se=self.se, input_bucket=self.input_bucket,
            frames_per_symbol=self.frames_per_symbol,
            batch_pad_to=self.max_batch)
        mels = [post for _, post, _, _, _ in results]
        if self.nsf_denorm is not None:
            mels = [self.nsf_denorm(m) for m in mels]
        return mels

    def _vocode_batch(self, mels: List[np.ndarray]) -> List[np.ndarray]:
        import jax.numpy as jnp

        L = int(np.ceil(max(m.shape[0] for m in mels) / self.frame_bucket)
                * self.frame_bucket)
        n_mels = mels[0].shape[1]
        mel_in = np.stack(
            [np.pad(m, [(0, L - m.shape[0]), (0, 0)]).astype(np.float32)
             for m in mels]
            + [np.zeros((L, n_mels), dtype=np.float32)]
            * (self.max_batch - len(mels)))
        y = np.asarray(self._vocode_fn(self.voc_variables, jnp.asarray(mel_in)))
        hop = y.shape[1] // L
        return [y[i, : m.shape[0] * hop, 0] for i, m in enumerate(mels)]
