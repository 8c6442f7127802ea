"""The driver-facing bench.py contract: EXACTLY ONE JSON line on stdout and
rc=0 even when secondary metrics fail to compile.

Round-3 regression: a secondary's failed prep propagated out of the drain
loop and crashed the run before the final emit. Here the failure is injected
via KANTTS_BENCH_FAULT and the whole contract is asserted end-to-end in a
subprocess on the CPU backend (small shapes; no TPU required).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


FAULT_ALL_SECONDARIES = "train,train_mas,gan_train,sambert,hifigan_f32"


def _run_bench(extra_env):
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        KANTTS_BENCH_ITERS="2",
        KANTTS_BENCH_FRAMES="40",
        KANTTS_BENCH_CHUNKS="0",
        **extra_env,
    )
    # keep the subprocess's exec cache out of the repo-level TPU cache
    env.setdefault("KANTTS_BENCH_CACHE", "/tmp/kantts_bench_cache_test")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, proc.stdout
    return json.loads(lines[0])


@pytest.mark.slow
def test_bench_line_survives_secondary_prep_failure():
    result = _run_bench({"KANTTS_BENCH_FAULT": FAULT_ALL_SECONDARIES})
    assert result["metric"] == "hifigan16k_copy_synthesis_xrt"
    assert result["value"] > 0
    extra = result["extra"]
    for name in ("train", "train_mas", "gan_train", "sambert", "hifigan_f32"):
        assert "injected fault" in extra[name + "_error"]


@pytest.mark.slow
def test_bench_degraded_plain_fallback_when_chunked_primary_dies():
    """Round-4 regression guard: if the chunked primary program never
    materializes, the plain single-window program must be measured and
    reported (flagged degraded) instead of the run emitting nothing."""
    result = _run_bench({
        "KANTTS_BENCH_FAULT": "primary_chunked," + FAULT_ALL_SECONDARIES,
    })
    assert result["metric"] == "hifigan16k_copy_synthesis_xrt"
    assert result["value"] > 0
    assert "degraded_mode" in result
    assert "injected fault" in result["extra"]["primary_chunked_error"]
