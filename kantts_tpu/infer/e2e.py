"""Fused text-to-wav inference: acoustic decode + vocoder in ONE XLA program.

The reference pipeline (bin/text_to_wav.py:97-117) is file-mediated: SAM-BERT
writes mel npy files, HiFi-GAN reads them back. The CLI here keeps that
contract for parity, but on TPU the right shape is a single compiled program:
symbol ids in, waveform out — the mel tensor never leaves HBM, there is no
host round trip between the models, and XLA overlaps the postnet epilogue
with the vocoder prologue.

Usage:
    fn = make_fused_infer(am_model, generator, max_output_len=576)
    wav, n_valid_frames = fn(am_variables, voc_variables,
                             ling, emo, spk, lengths, rng)

``wav`` is (B, max_output_len * hop_total, 1); the valid prefix per item is
``n_valid_frames[i] * hop_total`` samples. Results are identical to running
the two jitted programs back to back (tests/test_fused_e2e.py); the win is
latency (tools/bench_e2e.py measures both paths).
"""

from __future__ import annotations

import threading
import weakref

import jax


_FUSED_CACHE: dict = {}  # (id(am), id(gen), max_len) -> (refs, jitted fn)
_FUSED_CACHE_LOCK = threading.RLock()


def make_fused_infer(am_model, generator, max_output_len: int,
                     n_chunks: int = 0):
    """One jitted program per (am_model, generator, max_output_len,
    n_chunks), cached at module level with weakref eviction (same lifetime
    contract as infer/streaming.py — entries die with their models).

    ``n_chunks > 0`` routes the vocoder epilogue through the chunked-batch
    path (infer/chunked.py): the decoded mel is split into n causal-context
    windows synthesized as one batch inside the SAME program — identical
    waveform, better MXU occupancy (causal non-NSF fullband only)."""
    key = (id(am_model), id(generator), int(max_output_len), int(n_chunks))
    with _FUSED_CACHE_LOCK:
        entry = _FUSED_CACHE.get(key)
        if entry is not None and all(r() is not None for r in entry[0]):
            return entry[1]

        from kantts_tpu.models.sambert.sambert import sambert_infer

        if n_chunks:
            from kantts_tpu.infer.chunked import chunked_apply

        @jax.jit
        def fn(am_variables, voc_variables, ling, emo, spk, lengths, rng):
            res = sambert_infer(am_model, am_variables, ling, emo, spk,
                                lengths, max_output_len)
            if n_chunks:
                wav = chunked_apply(generator, voc_variables,
                                    res["postnet_outputs"], rng, n_chunks)
            else:
                wav = generator.apply(voc_variables, res["postnet_outputs"],
                                      rngs={"noise": rng})
            return wav, res["LR_length_rounded"]

        def _evict(_ref, key=key):
            with _FUSED_CACHE_LOCK:
                _FUSED_CACHE.pop(key, None)

        refs = (weakref.ref(am_model, _evict), weakref.ref(generator, _evict))
        _FUSED_CACHE[key] = (refs, fn)
        return fn
