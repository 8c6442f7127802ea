"""Tracing/profiling utilities (SURVEY.md §5.1 — the reference has none
beyond the vocoder RTF log; this build exposes the JAX profiler plus timing
helpers as first-class tooling)."""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator, Optional

import jax


def start_profiler_server(port: int = 9999) -> None:
    """Start the profiler server for TensorBoard's profile plugin /
    xprof capture."""
    jax.profiler.start_server(port)
    logging.info("jax profiler server listening on :%d", port)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace for a code region into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(name: str, results: Optional[dict] = None) -> Iterator[None]:
    """Wall-clock a region, synchronizing outstanding device work after."""
    t0 = time.perf_counter()
    yield
    elapsed = time.perf_counter() - t0
    if results is not None:
        results[name] = elapsed
    logging.info("[timed] %s: %.4fs", name, elapsed)


def rtf_report(audio_seconds: float, wall_seconds: float, name: str = "synthesis"
               ) -> dict:
    """Real-time-factor report (parity with the reference's RTF log,
    infer_hifigan.py:132-139)."""
    rtf = wall_seconds / max(audio_seconds, 1e-9)
    report = {
        "name": name,
        "audio_seconds": audio_seconds,
        "wall_seconds": wall_seconds,
        "rtf": rtf,
        "x_realtime": 1.0 / max(rtf, 1e-12),
    }
    logging.info("[RTF] %s: %.2fs audio in %.3fs -> RTF %.5f (%.1fx realtime)",
                 name, audio_seconds, wall_seconds, rtf, report["x_realtime"])
    return report
