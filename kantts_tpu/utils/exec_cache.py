"""Persistent XLA compilation cache wiring.

On a remote-compile TPU service every process re-pays program compilation
— measured on this box (round 5): ~10 minutes for the SAM-BERT train step
per resumed training segment, which is exactly the gap between the 15.5
steps/s isolated step time and the ~2.2 steps/s sustained series. JAX's
client-side persistent compilation cache (``jax_compilation_cache_dir``)
DOES intercept before the remote service (verified: a second process
compiles the same program in ~0.1 s vs ~2 s cold), but nothing in the
training stack ever enabled it. :func:`enable` turns it on process-wide;
the package ``__init__`` calls it so every CLI, test, and library user
gets cross-process compile reuse for free.

Keep plain ``jax.jit`` everywhere rather than AOT
(``lowered.compile()``/serialize_executable): jit dispatch rides the C++
fastpath with async pipelining (~0 ms per call), while calling a
deserialized AOT executable goes through a slow python dispatch path
(measured ~240 ms per call on this box — worse than the compile time it
saves at steady state). bench.py keeps its own serialized-executable
cache for the one case jit caching can't cover (guaranteeing the primary
metric under compile-weather deadlines).

No reference counterpart — the reference's torch runtime has no
compilation step at all; this is TPU-runtime infrastructure.
"""

from __future__ import annotations

import os

_DONE = False


def enable(cache_dir: str | None = None) -> None:
    """Enable the persistent XLA compilation cache (idempotent).

    Priority for the directory: explicit arg > ``KANTTS_COMPILE_CACHE``
    env > ``<repo>/.jax_compile_cache`` (shared with bench.py). Set
    ``KANTTS_COMPILE_CACHE=0`` to disable entirely.
    """
    global _DONE
    if _DONE:
        return
    env = os.environ.get("KANTTS_COMPILE_CACHE")
    if env == "0":
        _DONE = True
        return
    if cache_dir is None:
        cache_dir = env or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_compile_cache")
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        _DONE = True
    except Exception:
        pass
