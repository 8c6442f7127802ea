"""Serving benchmark: the dynamic-batching server under concurrent load.

Measures what a deployment actually sees — request latency percentiles and
aggregate throughput of kantts_tpu.serve.TTSService at production model
sizes (sambert_16k + hifigan_v1_16k, random init; serving speed does not
depend on weight values) — and quantifies the dynamic-batching win by
sweeping the service's max_batch.

    python tools/bench_serve.py [n_requests] [concurrency]
    KANTTS_SERVE_BATCHES=1,8 python tools/bench_serve.py 64 16

Timing is honest through this environment's relay: every request ends in a
host fetch of the waveform (np.asarray inside the service), which is the
completion barrier. Compiles are excluded by a warmup request per bucket.

Output: one JSON line per max_batch setting on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEXTS = [
    "ni3 hao3 shi4 jie4",
    "jin1 tian1 tian1 qi4 zhen1 hao3",
    "wo3 men5 qu4 gong1 yuan2 san4 bu4",
    "zhe4 shi4 yi2 ge4 ce4 shi4 ju4 zi5",
    "huan1 ying2 shi3 yong4 yu3 yin1 he2 cheng2",
    "qing3 shao1 deng3 yi2 xia4",
]


def _enable_compile_cache():
    from bench import _enable_compile_cache as enable

    enable()


def build_service(max_batch: int, max_wait_ms: float):
    import jax
    import jax.numpy as jnp
    import yaml

    from __graft_entry__ import _hifigan_16k
    from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT
    from kantts_tpu.serve import TTSService
    from kantts_tpu.text.ling_unit import KanTtsLinguisticUnit

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    full = yaml.safe_load(
        open(os.path.join(root, "kantts_tpu/configs/sambert_16k.yaml")))
    lu = KanTtsLinguisticUnit(full)
    cfg = full["Model"]["KanTtsSAMBERT"]["params"]
    cfg.update(lu.get_unit_size())
    # serving speed is weight-independent EXCEPT through predicted durations
    # (they set how much mel the vocoder sees); at random init the relu'd
    # duration head predicts ~zero and every utterance collapses to 3
    # frames. Bias-init the head so exp(bias)-1 ~ 8 frames/phone — realistic
    # utterance lengths without needing a trained checkpoint.
    cfg["dur_pred_bias_init"] = float(os.environ.get("KANTTS_SERVE_DUR_BIAS",
                                                     "2.2"))
    tiny = os.environ.get("KANTTS_SERVE_TINY") == "1"  # CPU smoke mode
    if tiny:
        sys.path.insert(0, os.path.join(root, "tests"))
        from test_sambert import TINY

        cfg = dict(TINY, num_mels=80)
        cfg.update(lu.get_unit_size())
    am = KanTtsSAMBERT(cfg)

    rng = np.random.RandomState(0)
    B, T_in, T_mel = 1, 8, 24
    am_vars = am.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(rng.randint(0, 5, (B, T_in, 4)), dtype=jnp.int32),
        jnp.asarray(rng.randint(0, 4, (B, T_in)), dtype=jnp.int32),
        jnp.asarray(rng.randint(0, 2, (B, T_in)), dtype=jnp.int32),
        jnp.asarray([T_in]), jnp.asarray([T_mel]),
        jnp.zeros((B, T_mel, 80)),
        duration_targets=jnp.full((B, T_in), 3.0),
        pitch_targets=jnp.zeros((B, T_in)),
        energy_targets=jnp.zeros((B, T_in)), deterministic=False,
    )

    if tiny:
        from kantts_tpu.models.hifigan.generator import Generator

        gen = Generator(in_channels=80, out_channels=1, channels=16,
                        kernel_size=7, upsample_scales=(4, 4),
                        upsample_kernal_sizes=(8, 8),
                        resblock_kernel_sizes=(3,),
                        resblock_dilations=((1, 3),), causal=True)
    else:
        gen = _hifigan_16k(dtype=jnp.bfloat16,
                           quant=os.environ.get("KANTTS_SERVE_INT8") == "1")
    voc_vars = gen.init(jax.random.PRNGKey(2), jnp.zeros((1, 100, 80)))

    return TTSService(am, am_vars, lu, gen, voc_vars, sample_rate=16000,
                      max_batch=max_batch, max_wait_ms=max_wait_ms)


def run_load(service, n_requests: int, concurrency: int):
    latencies = []
    lat_lock = threading.Lock()
    work = list(range(n_requests))
    work_lock = threading.Lock()
    errors = []

    def worker():
        while True:
            with work_lock:
                if not work:
                    return
                i = work.pop()
            t0 = time.perf_counter()
            try:
                sr, wav = service.synthesize(TEXTS[i % len(TEXTS)],
                                             timeout=600)
            except BaseException as e:
                errors.append(repr(e))
                return
            dt = time.perf_counter() - t0
            with lat_lock:
                latencies.append((dt, len(wav) / sr))

    t_start = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    if errors:
        raise RuntimeError(f"{len(errors)} requests failed: {errors[:3]}")
    lats = np.asarray([d for d, _ in latencies])
    audio = sum(a for _, a in latencies)
    return {
        "requests": len(latencies),
        "concurrency": concurrency,
        "wall_s": round(wall, 3),
        "requests_per_s": round(len(latencies) / wall, 2),
        "audio_seconds_per_s": round(audio / wall, 1),
        "latency_p50_ms": round(float(np.percentile(lats, 50)) * 1e3, 1),
        "latency_p95_ms": round(float(np.percentile(lats, 95)) * 1e3, 1),
        "batches": service.stats["batches"],
        "utterances": service.stats["utterances"],
    }


def run_stream_load(service, n_requests: int, concurrency: int):
    """Concurrent /tts/stream-style load: first-byte latency = time to the
    first PCM chunk, total = last chunk; the acoustic forward still batches
    with concurrent traffic through the coordinator."""
    rows = []
    lock = threading.Lock()
    work = list(range(n_requests))
    errors = []

    def worker():
        while True:
            with lock:
                if not work:
                    return
                i = work.pop()
            t0 = time.perf_counter()
            first = None
            n_samp = 0
            try:
                for chunk in service.stream(TEXTS[i % len(TEXTS)]):
                    if first is None:
                        first = time.perf_counter() - t0
                    n_samp += len(chunk)
            except BaseException as e:
                errors.append(repr(e))
                return
            total = time.perf_counter() - t0
            with lock:
                rows.append((first, total, n_samp / service.sample_rate))

    t_start = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    if errors:
        raise RuntimeError(f"{len(errors)} stream requests failed: {errors[:3]}")
    fb = np.asarray([f for f, _, _ in rows])
    tt = np.asarray([t for _, t, _ in rows])
    audio = sum(a for _, _, a in rows)
    return {
        "requests": len(rows),
        "concurrency": concurrency,
        "wall_s": round(wall, 3),
        "audio_seconds_per_s": round(audio / wall, 1),
        "first_byte_p50_ms": round(float(np.percentile(fb, 50)) * 1e3, 1),
        "first_byte_p95_ms": round(float(np.percentile(fb, 95)) * 1e3, 1),
        "total_p50_ms": round(float(np.percentile(tt, 50)) * 1e3, 1),
        "total_p95_ms": round(float(np.percentile(tt, 95)) * 1e3, 1),
    }


def main():
    _enable_compile_cache()
    stream_mode = "--stream" in sys.argv
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_requests = int(argv[0]) if len(argv) > 0 else 48
    concurrency = int(argv[1]) if len(argv) > 1 else 12
    batches = [int(b) for b in os.environ.get(
        "KANTTS_SERVE_BATCHES", "1,8").split(",")]
    wait_ms = float(os.environ.get("KANTTS_SERVE_WAIT_MS", "20"))

    for max_batch in batches:
        service = build_service(max_batch, wait_ms)
        try:
            # warmup: compile every program (all TEXTS share one symbol
            # bucket by construction; one request per distinct text warms
            # the front-end caches too)
            for t in TEXTS[: max(2, min(len(TEXTS), max_batch))]:
                service.synthesize(t, timeout=3600)
            if stream_mode:
                for _c in service.stream(TEXTS[0]):
                    pass  # compile the chunked vocoder programs
            base = dict(service.stats)
            if stream_mode:
                res = run_stream_load(service, n_requests, concurrency)
                res["batches"] = service.stats["batches"] - base["batches"]
                print(json.dumps({"metric": "serve_streaming",
                                  "max_batch": max_batch,
                                  "max_wait_ms": wait_ms, **res}), flush=True)
            else:
                res = run_load(service, n_requests, concurrency)
                res["batches"] -= base["batches"]
                res["utterances"] -= base["utterances"]
                print(json.dumps({"metric": "serve_dynamic_batching",
                                  "max_batch": max_batch,
                                  "max_wait_ms": wait_ms, **res}), flush=True)
        finally:
            service.close()


if __name__ == "__main__":
    main()
