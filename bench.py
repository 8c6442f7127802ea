"""Benchmark on one TPU chip. Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline", "extra": {...}}.

The primary metric is HiFi-GAN 16 kHz copy-synthesis throughput (the
BASELINE.json north-star is >=10x realtime per chip; the reference publishes
no numbers — see BASELINE.md). The default run ALSO measures the f32 vocoder
(the reference's numerical default), SAM-BERT acoustic inference (mel
frames/sec), and the SAM-BERT train step (mel frames/sec trained), reported
under "extra" in the same JSON line. Every metric carries roofline
accounting: FLOPs from XLA cost analysis, achieved TFLOP/s, and ``mfu``
against the chip's bf16 matmul peak (KANTTS_CHIP_PEAK_TFLOPS, default 197
for v5e).

Set KANTTS_BENCH_TARGET=hifigan|sambert|train to run a single target (the
chosen one becomes the primary metric, no extras). KANTTS_BENCH_TIN=800
KANTTS_BENCH_MAXLEN=4800 runs SAM-BERT at the reference's max_len bucket
(long-input mode). tools/bench_scaling.py sweeps the batch dimension.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_T0 = time.perf_counter()


def _honor_jax_platforms_env():
    """This box's sitecustomize pre-imports jax and pins the axon (TPU
    relay) backend in jax.config, which silently overrides a caller's
    JAX_PLATFORMS=cpu — the bench contract tests run in subprocesses on
    the CPU backend and would otherwise land on the TPU. Re-assert the
    env var's platform choice at the config level before any device use."""
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    try:
        import jax

        jax.config.update("jax_platforms", want)
    except Exception:
        pass


def _enable_compile_cache():
    """Persistent XLA compilation cache: repeat bench runs skip the ~minutes
    of compile time that otherwise dominate wall-clock."""
    try:
        import jax

        cache_dir = os.environ.get(
            "KANTTS_BENCH_CACHE",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_compile_cache"),
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def _chip_peak_tflops(dtype_name: str) -> float:
    """Matmul peak used for MFU accounting. Default: v5e bf16 peak (197
    TFLOP/s). f32 matmuls lower to bf16x3 passes on the MXU (~1/4-1/6 of
    bf16 peak); we still normalize f32 MFU against the bf16 peak so the two
    numbers are on one scale — override with KANTTS_CHIP_PEAK_TFLOPS.
    int8 runs the MXU at 2x the bf16 rate (v5e: 394 TOPS), so int8 rows
    normalize against that peak (KANTTS_CHIP_PEAK_TFLOPS_INT8)."""
    if "int8" in dtype_name:
        return float(os.environ.get("KANTTS_CHIP_PEAK_TFLOPS_INT8", "394"))
    return float(os.environ.get("KANTTS_CHIP_PEAK_TFLOPS", "197"))


def _cost_flops(jitted_fn, *args):
    """FLOPs of the compiled program via XLA cost analysis (None if the
    backend does not expose it)."""
    try:
        ca = jitted_fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def _exec_cache_dir():
    d = os.path.join(
        os.environ.get(
            "KANTTS_BENCH_CACHE",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_compile_cache"),
        ),
        "exec",
    )
    os.makedirs(d, exist_ok=True)
    return d


def _aot(jitted_fn, *args, tag=None):
    """AOT-compile a jitted function for the given args; returns
    (compiled_executable, flops_or_None). Compilation happens on the remote
    compile service; the persistent XLA *source* cache does not apply there,
    so with ``tag`` set the COMPILED EXECUTABLE itself is persisted
    (jax.experimental.serialize_executable) keyed on a hash of the lowered
    StableHLO + jax/jaxlib versions + device kind — a repeat bench run (and
    the driver's run after a warming run this session) skips remote
    compilation entirely. Round-4 lesson: losing the primary metric to
    compile weather loses the whole round's perf evidence."""
    import hashlib
    import pickle

    import jax

    lowered = jitted_fn.lower(*args)
    path = None
    if tag is not None and jax.devices()[0].platform == "cpu":
        # XLA:CPU AOT deserialization trips machine-feature checks even on
        # the same host (observed SIGILL-risk load failures); the exec cache
        # exists for the TPU remote-compile service, where local compiles
        # are the expensive thing. CPU compiles locally and fast — skip.
        tag = None
    if tag is not None:
        try:
            dev = jax.devices()[0]
            key_src = "\x00".join([
                lowered.as_text(), jax.__version__,
                getattr(jax, "jaxlib", jax).__version__, dev.device_kind,
                dev.platform, str(jax.process_count()),
            ])
            key = hashlib.sha256(key_src.encode()).hexdigest()[:24]
            path = os.path.join(_exec_cache_dir(), f"{tag}-{key}.pkl")
            if os.path.exists(path):
                from jax.experimental import serialize_executable as se

                with open(path, "rb") as f:
                    payload, in_tree, out_tree, flops = pickle.load(f)
                compiled = se.deserialize_and_load(payload, in_tree, out_tree)
                print(f"exec cache HIT: {tag}", file=sys.stderr, flush=True)
                return compiled, flops
        except Exception as e:
            print(f"exec cache read failed ({tag}): {e!r}",
                  file=sys.stderr, flush=True)
            path = None if path is None else path

    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca["flops"])
    except Exception:
        flops = None
    if path is not None:
        try:
            from jax.experimental import serialize_executable as se

            payload, in_tree, out_tree = se.serialize(compiled)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump((payload, in_tree, out_tree, flops), f)
            os.replace(tmp, path)
        except Exception as e:
            print(f"exec cache write failed ({tag}): {e!r}",
                  file=sys.stderr, flush=True)
    return compiled, flops


# Serializes device EXECUTION (init transfers, warmup, timing loops) while
# compiles overlap freely; measurements stay honest on the single chip.
import threading as _threading  # noqa: E402

_DEVICE_LOCK = _threading.Lock()


def _mfu_fields(flops, seconds_per_call, dtype_name):
    if flops is None or seconds_per_call <= 0:
        return {}
    tflops = flops / seconds_per_call / 1e12
    peak = _chip_peak_tflops(dtype_name)
    return {"gflops_per_call": round(flops / 1e9, 1),
            "achieved_tflops": round(tflops, 2),
            "mfu": round(tflops / peak, 4),
            "peak_tflops_used": peak}


def prep_hifigan(dtype_name=None, chunks=None):
    """Build + AOT-compile the vocoder program (thread-safe; no timing)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _hifigan_16k

    if dtype_name is None:
        dtype_name = os.environ.get("KANTTS_BENCH_DTYPE", "bfloat16")
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]
    quant = os.environ.get("KANTTS_BENCH_QUANT") == "1"  # int8 W8A8 variant

    sample_rate, hop = 16000, 200
    frames = int(os.environ.get("KANTTS_BENCH_FRAMES", "400"))  # 5 s audio
    batch = int(os.environ.get("KANTTS_BENCH_BATCH", "1"))

    # At batch=1, default to the chunked-batch path (infer/chunked.py):
    # 8 causal-context windows synthesized as one batch — identical waveform,
    # 1.76x faster than the plain program (tools/bench_chunked.py sweep).
    # KANTTS_BENCH_CHUNKS=0 restores the plain single-program measurement.
    if chunks is None:
        chunks = int(os.environ.get("KANTTS_BENCH_CHUNKS",
                                    "8" if batch == 1 else "0"))
    if quant and chunks:
        # chunked windowing is a bit-exactness contract; int8's dynamic
        # per-example scales break it, so the int8 bench measures the
        # plain whole-utterance program
        print("int8: forcing KANTTS_BENCH_CHUNKS=0", file=sys.stderr)
        chunks = 0

    gen = _hifigan_16k(dtype=dtype, quant=quant)
    mel = jnp.asarray(
        np.random.RandomState(0).randn(batch, frames, 80).astype(np.float32)
    )
    params = gen.init(jax.random.PRNGKey(0), mel)

    if chunks:
        from kantts_tpu.infer.chunked import make_chunked_infer

        run = make_chunked_infer(gen, frames, chunks)
        rng = jax.random.PRNGKey(0)
        apply_fn = lambda p, m: run(p, m, rng)  # noqa: E731
    else:
        apply_fn = lambda p, m: gen.apply(p, m)  # noqa: E731

    # each iteration's input depends on the previous output (scalar feedback)
    # so iterations cannot be elided or overlapped — honest serial throughput
    fwd = jax.jit(
        lambda p, m, c: (lambda y: (y, c + jnp.sum(y[:, -1, 0])))(
            apply_fn(p, m + c * 1e-9)
        )
    )
    carry = jnp.asarray(0.0, dtype=jnp.float32)
    tag = (f"hifigan-{dtype_name}{'-int8' if quant else ''}"
           f"-b{batch}-f{frames}-c{chunks}")
    compiled, flops = _aot(fwd, params, mel, carry, tag=tag)
    return dict(fn=compiled, params=params, mel=mel, carry=carry,
                flops=flops, dtype_name=dtype_name, quant=quant,
                chunks=chunks, batch=batch, frames=frames, hop=hop,
                sample_rate=sample_rate)


def measure_hifigan(prep):
    """Timing loops for a prepped vocoder program (device-exclusive)."""
    fwd, params, mel = prep["fn"], prep["params"], prep["mel"]
    carry = prep["carry"]
    batch, frames, hop = prep["batch"], prep["frames"], prep["hop"]
    n_iter = int(os.environ.get("KANTTS_BENCH_ITERS", "50"))
    with _DEVICE_LOCK:
        y, carry = fwd(params, mel, carry)  # warmup
        assert y.shape == (batch, frames * hop, 1)
        _ = float(carry)  # host fetch = the only reliable completion barrier
        best_dt = None
        for _trial in range(3):
            t0 = time.perf_counter()
            for _ in range(n_iter):
                y, carry = fwd(params, mel, carry)
            _ = float(carry)
            dt = time.perf_counter() - t0
            best_dt = dt if best_dt is None else min(best_dt, dt)

    audio_seconds = n_iter * batch * frames * hop / prep["sample_rate"]
    xrt = audio_seconds / best_dt
    tag = prep["dtype_name"] + ("+int8" if prep["quant"] else "")
    return {
        "metric": "hifigan16k_copy_synthesis_xrt",
        "value": round(xrt, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(xrt / 10.0, 3),
        "dtype": tag,
        "chunks": prep["chunks"],
        **_mfu_fields(prep["flops"], best_dt / n_iter, tag),
    }


def bench_hifigan(dtype_name=None):
    return measure_hifigan(prep_hifigan(dtype_name))


def prep_sambert():
    import jax
    import jax.numpy as jnp
    import yaml

    from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT, sambert_infer

    cfg = yaml.safe_load(
        open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "kantts_tpu/configs/sambert_16k.yaml"))
    )["Model"]["KanTtsSAMBERT"]["params"]
    cfg.update(sy=147, tone=10, syllable_flag=8, word_segment=8, emotion=36,
               speaker=4)
    if os.environ.get("KANTTS_SAMBERT_DTYPE") == "bfloat16":
        cfg["compute_dtype"] = "bfloat16"
    model = KanTtsSAMBERT(cfg)
    rng = np.random.RandomState(0)
    B = int(os.environ.get("KANTTS_BENCH_BATCH", "1"))
    # long-input mode: KANTTS_BENCH_TIN=800 KANTTS_BENCH_MAXLEN=4800 runs the
    # reference's max_len bucket (configs/sambert_16k.yaml:8) in ONE compiled
    # program — static shapes mean no recompile storm at the big bucket
    T_in = int(os.environ.get("KANTTS_BENCH_TIN", "96"))
    MAXLEN = int(os.environ.get("KANTTS_BENCH_MAXLEN", "576"))
    batch = dict(
        ling=jnp.asarray(rng.randint(0, 5, (B, T_in, 4)), dtype=jnp.int32),
        emo=jnp.asarray(rng.randint(0, 4, (B, T_in)), dtype=jnp.int32),
        spk=jnp.asarray(rng.randint(0, 2, (B, T_in)), dtype=jnp.int32),
        lengths=jnp.asarray([T_in] * B),
    )
    T_mel = 24
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["ling"], batch["emo"], batch["spk"], batch["lengths"],
        jnp.asarray([T_mel] * B), jnp.zeros((B, T_mel, 80)),
        duration_targets=jnp.full((B, T_in), T_mel / T_in),
        pitch_targets=jnp.zeros((B, T_in)),
        energy_targets=jnp.zeros((B, T_in)), deterministic=False,
    )
    fn = jax.jit(lambda v, l, e, s, ln: sambert_infer(model, v, l, e, s, ln,
                                                      MAXLEN))
    args = (variables, batch["ling"], batch["emo"], batch["spk"],
            batch["lengths"])
    compiled, flops = _aot(fn, *args,
                           tag=f"sambert-{B}x{T_in}x{MAXLEN}")
    dtype_name = ("bfloat16" if os.environ.get("KANTTS_SAMBERT_DTYPE")
                  == "bfloat16" else "float32")
    return dict(fn=compiled, args=args, flops=flops, B=B, T_in=T_in,
                MAXLEN=MAXLEN, dtype_name=dtype_name)


def measure_sambert(prep):
    fn, args = prep["fn"], prep["args"]
    B, MAXLEN = prep["B"], prep["MAXLEN"]
    n_iter = 10
    with _DEVICE_LOCK:
        res = fn(*args)  # warmup
        _ = float(res["postnet_outputs"].sum())
        best_dt = None
        for _trial in range(3):
            t0 = time.perf_counter()
            for _ in range(n_iter):
                res = fn(*args)
            _ = float(res["postnet_outputs"].sum())
            dt = (time.perf_counter() - t0) / n_iter
            best_dt = dt if best_dt is None else min(best_dt, dt)

    frames_per_s = B * MAXLEN / best_dt
    return {
        "metric": "sambert16k_infer_mel_frames_per_s",
        "value": round(frames_per_s, 1),
        "unit": "mel_frames_per_sec_per_chip",
        # vs the 10x-realtime north star expressed in frames (80 frames/s * 10)
        "vs_baseline": round(frames_per_s / 800.0, 3),
        "dtype": prep["dtype_name"],
        "t_in": prep["T_in"],
        "max_output_len": MAXLEN,
        **_mfu_fields(prep["flops"], best_dt, prep["dtype_name"]),
    }


def bench_sambert():
    return measure_sambert(prep_sambert())


def prep_train_step(mas: bool = False):
    """SAM-BERT full training step (fwd+bwd+Adam) at the production batch
    geometry; reference anchor: 1M steps of kantts/bin/train_sambert.py.
    With ``mas=True``, the flagship MAS variant (sambert_16k_MAS.yaml):
    in-graph Viterbi binarization + CTC/KL alignment losses, frame-level
    prosody targets, beta-binomial attention prior, no duration targets."""
    import jax
    import jax.numpy as jnp
    import yaml

    from kantts_tpu.losses import criterion_builder
    from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT
    from kantts_tpu.train.optim import optimizer_builder
    from kantts_tpu.train.states import TrainState
    from kantts_tpu.train.steps import make_sambert_step

    cfg_name = "sambert_16k_MAS.yaml" if mas else "sambert_16k.yaml"
    full = yaml.safe_load(
        open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "kantts_tpu/configs", cfg_name))
    )
    cfg = full["Model"]["KanTtsSAMBERT"]["params"]
    cfg.update(sy=147, tone=10, syllable_flag=8, word_segment=8, emotion=36,
               speaker=4)
    model = KanTtsSAMBERT(cfg)
    rng = np.random.RandomState(0)
    B, T_in, T_mel = 32, 96, 576
    batch = {
        "input_lings": jnp.asarray(rng.randint(0, 5, (B, T_in, 4)), dtype=jnp.int32),
        "input_emotions": jnp.asarray(rng.randint(0, 4, (B, T_in)), dtype=jnp.int32),
        "input_speakers": jnp.asarray(rng.randint(0, 2, (B, T_in)), dtype=jnp.int32),
        "valid_input_lengths": jnp.asarray([T_in] * B),
        "valid_output_lengths": jnp.asarray([T_mel] * B),
        "mel_targets": jnp.asarray(rng.randn(B, T_mel, 80).astype(np.float32)),
    }
    if mas:
        # frame-level prosody targets + normalized attention prior
        # (reference dataset contract for the MAS path)
        prior = np.abs(rng.randn(B, T_mel, T_in)).astype(np.float32) + 0.1
        prior /= prior.sum(axis=2, keepdims=True)
        batch.update(
            pitch_contours=jnp.asarray(np.abs(rng.randn(B, T_mel)).astype(np.float32)),
            energy_contours=jnp.asarray(np.abs(rng.randn(B, T_mel)).astype(np.float32)),
            attn_priors=jnp.asarray(prior),
        )
    else:
        dur = np.full((B, T_in), T_mel // T_in, dtype=np.float32)
        dur[:, -1] += T_mel - dur[0].sum()
        batch.update(
            pitch_contours=jnp.asarray(np.abs(rng.randn(B, T_in)).astype(np.float32)),
            energy_contours=jnp.asarray(np.abs(rng.randn(B, T_in)).astype(np.float32)),
            durations=jnp.asarray(dur),
        )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_lings"], batch["input_emotions"], batch["input_speakers"],
        batch["valid_input_lengths"], batch["valid_output_lengths"],
        batch["mel_targets"], duration_targets=batch.get("durations"),
        pitch_targets=batch["pitch_contours"],
        energy_targets=batch["energy_contours"],
        attn_priors=batch.get("attn_priors"), deterministic=False,
    )
    criterion = criterion_builder(full)
    tx, _ = optimizer_builder(
        full["Model"]["KanTtsSAMBERT"]["optimizer"],
        full["Model"]["KanTtsSAMBERT"]["scheduler"], full.get("grad_norm"),
    )
    state = TrainState(variables["params"], tx.init(variables["params"]),
                       jnp.asarray(0, dtype=jnp.int32))
    step = make_sambert_step(model, criterion, tx, mas, False)
    import jax as _jax

    compiled, train_flops = _aot(step, state, batch, _jax.random.PRNGKey(0),
                                 jnp.asarray(0),
                                 tag="train-mas" if mas else "train")
    return dict(fn=compiled, state=state, batch=batch, flops=train_flops,
                B=B, T_mel=T_mel, mas=mas)


def measure_train_step(prep):
    import jax
    import jax.numpy as jnp

    step, state, batch = prep["fn"], prep["state"], prep["batch"]
    B, T_mel, mas = prep["B"], prep["T_mel"], prep["mas"]
    n_iter = 20
    with _DEVICE_LOCK:
        state, metrics = step(state, batch, jax.random.PRNGKey(0),
                              jnp.asarray(0))
        _ = float(metrics["TotalLoss"])
        best_dt = None
        for _trial in range(2):
            t0 = time.perf_counter()
            for i in range(n_iter):
                state, metrics = step(state, batch, jax.random.PRNGKey(i),
                                      jnp.asarray(0))
            _ = float(metrics["TotalLoss"])
            dt = (time.perf_counter() - t0) / n_iter
            best_dt = dt if best_dt is None else min(best_dt, dt)

    frames_per_s = B * T_mel / best_dt
    return {
        "metric": ("sambert16k_mas_train_step_mel_frames_per_s" if mas
                   else "sambert16k_train_step_mel_frames_per_s"),
        "value": round(frames_per_s, 0),
        "unit": "mel_frames_per_sec_per_chip",
        # reference's 1M-step schedule at this rate, vs its multi-day GPU runs;
        # normalize against one training day (=11.6 steps/s for 1M steps/day)
        "vs_baseline": round((1.0 / best_dt) / 11.574, 3),
        "dtype": "float32",
        **_mfu_fields(prep["flops"], best_dt, "float32"),
    }


def bench_train_step(mas: bool = False):
    return measure_train_step(prep_train_step(mas))


def prep_gan_train_step():
    """HiFi-GAN v1 full adversarial training step — generator + MSD(+DWT) +
    MPD forward/backward and BOTH Adam updates in one jitted program — at
    the production batch geometry (16 x 9600-sample crops, hop 200);
    reference anchor: 2.5M steps of kantts/bin/train_hifigan.py
    (hifigan_v1_16k.yaml:201)."""
    import jax
    import jax.numpy as jnp
    import yaml

    from kantts_tpu.losses import criterion_builder
    from kantts_tpu.models.builder import model_builder
    from kantts_tpu.train.steps import make_gan_step

    full = yaml.safe_load(
        open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "kantts_tpu/configs/hifigan_v1_16k.yaml"))
    )
    built = model_builder(full)
    criterion = criterion_builder(full)
    step = make_gan_step(
        built["generator"], built["discriminators"], criterion,
        built["gen_tx"], built["disc_txs"], pqmf=built["pqmf"],
        train_generator=True, include_adversarial=True,
    )
    B = int(os.environ.get("KANTTS_BENCH_GAN_B", full["batch_size"]))
    T = int(os.environ.get("KANTTS_BENCH_GAN_T", full["batch_max_steps"]))
    hop = 200  # 16 kHz corpus hop (audio_config.yaml merged at train time)
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(B, T, 1).astype(np.float32) * 0.1)
    mel = jnp.asarray(rng.randn(B, T // hop, 80).astype(np.float32))
    state = built["state"]
    compiled, flops = _aot(step, state, wav, mel, jax.random.PRNGKey(0),
                           tag=f"gantrain-{B}x{T}")
    return dict(fn=compiled, state=state, wav=wav, mel=mel, flops=flops,
                B=B, T=T)


def measure_gan_train_step(prep):
    import jax

    step, state = prep["fn"], prep["state"]
    wav, mel, B, T = prep["wav"], prep["mel"], prep["B"], prep["T"]
    n_iter = int(os.environ.get("KANTTS_BENCH_ITERS", "20"))
    with _DEVICE_LOCK:
        state, metrics = step(state, wav, mel, jax.random.PRNGKey(0))
        _ = float(metrics["generator_loss"])
        best_dt = None
        for _trial in range(2):
            t0 = time.perf_counter()
            for i in range(n_iter):
                state, metrics = step(state, wav, mel, jax.random.PRNGKey(i))
            _ = float(metrics["generator_loss"])
            dt = (time.perf_counter() - t0) / n_iter
            best_dt = dt if best_dt is None else min(best_dt, dt)

    audio_s_per_s = B * T / 16000.0 / best_dt
    return {
        "metric": "hifigan16k_gan_train_step_audio_s_per_s",
        "value": round(audio_s_per_s, 2),
        "unit": "trained_audio_seconds_per_sec_per_chip",
        # reference's 2.5M-step schedule at this rate vs one training day
        # (=28.9 steps/s for 2.5M steps/day)
        "vs_baseline": round((1.0 / best_dt) / 28.935, 3),
        "dtype": "float32",
        **_mfu_fields(prep["flops"], best_dt, "float32"),
    }


def bench_gan_train_step():
    return measure_gan_train_step(prep_gan_train_step())


def _preflight_device_probe():
    """Fail fast (and honestly) if the device never answers. This box's TPU
    is reached through a relay that can wedge in a way that blocks backend
    discovery indefinitely — in that state every metric call would hang the
    harness. A daemon watchdog hard-exits with a diagnostic instead; a
    non-zero exit is recordable evidence, a hang is not."""
    import threading

    probe_s = float(os.environ.get("KANTTS_BENCH_PROBE_S", "60"))
    done = threading.Event()

    def watchdog():
        if not done.wait(probe_s):
            print(json.dumps({
                "error": "device probe timed out",
                "detail": f"jax.devices() unresponsive after {probe_s:.0f}s "
                          "(TPU relay wedged?); no measurement possible",
            }), file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()
    import jax

    n = len(jax.devices())
    done.set()
    print(f"device probe ok: {n} device(s)", file=sys.stderr, flush=True)


# Shared snapshot for the hard-deadline watchdog: main() updates it after
# every completed metric; the watchdog emits it and exits 0 if the run is
# about to outlive the driver's external timeout (round-3 lesson: an rc=124
# kill between the last metric and the final print loses the whole line).
_SNAPSHOT = {"result": None, "extra": {}}
_EMIT_LOCK = None  # created in main() (threading import is deferred)


def _emit_final_once():
    """Print the one-line JSON contract exactly once (main or watchdog)."""
    with _EMIT_LOCK:
        if _SNAPSHOT.get("emitted"):
            return False
        _SNAPSHOT["emitted"] = True
    result = dict(_SNAPSHOT["result"])
    result["extra"] = dict(_SNAPSHOT["extra"])
    print(json.dumps(result), flush=True)
    return True


def _start_hard_deadline_watchdog():
    """Guarantee a clean exit 0 with whatever metrics completed, well before
    the driver's external timeout. Only fires once the primary metric exists
    (without it there is nothing honest to report — the probe watchdog
    already covers total device wedge with exit 3)."""
    import threading

    hard_s = float(os.environ.get("KANTTS_BENCH_HARD_S", "1380"))

    def watchdog():
        while True:
            left = hard_s - (time.perf_counter() - _T0)
            if left <= 0:
                break
            time.sleep(min(left, 5.0))
        if _SNAPSHOT["result"] is None:
            # Last resort (round-4 lesson: NEVER emit nothing): promote a
            # completed secondary metric to the line rather than exit empty.
            promoted = _promote_extra_to_primary()
            if not promoted:
                print(json.dumps({"error": "hard deadline hit before any "
                                           "metric completed"}),
                      file=sys.stderr, flush=True)
                os._exit(3)
        _SNAPSHOT["extra"]["hard_deadline_hit"] = (
            f"emitted at {hard_s:.0f}s with completed metrics only")
        if _emit_final_once():
            print("hard deadline: emitted snapshot, exit 0",
                  file=sys.stderr, flush=True)
        os._exit(0)

    threading.Thread(target=watchdog, daemon=True).start()


def _promote_extra_to_primary():
    """If the primary vocoder metric never materialized but some secondary
    did, report that secondary as the line's metric (flagged degraded) —
    partial evidence beats none."""
    extra = _SNAPSHOT["extra"]
    for key, val in list(extra.items()):
        if isinstance(val, dict) and "value" in val and "unit" in val:
            result = {"metric": key, **val,
                      "degraded": "primary metric unavailable; promoted "
                                  "completed secondary"}
            extra.pop(key)
            _SNAPSHOT["result"] = result
            return True
    return False


def main():
    global _EMIT_LOCK
    import threading

    _EMIT_LOCK = threading.Lock()
    _honor_jax_platforms_env()
    _enable_compile_cache()
    _preflight_device_probe()
    _start_hard_deadline_watchdog()
    target = os.environ.get("KANTTS_BENCH_TARGET", "")
    benches = {"hifigan": bench_hifigan, "sambert": bench_sambert,
               "train": bench_train_step,
               "train_mas": lambda: bench_train_step(mas=True),
               "gan_train": bench_gan_train_step}
    if target:
        print(json.dumps(benches[target]()))
        return
    # default: all of them; primary metric = hifigan, others under "extra".
    # stdout carries EXACTLY ONE JSON line (the module contract); progress
    # snapshots go to stderr so a killed run still leaves evidence.
    #
    # Round-4 regression and its fix: launching all six AOT compiles
    # concurrently starved the PRIMARY's compile past the watchdog and the
    # round recorded zero perf evidence. The primary now gets the compile
    # service to itself first (with a degraded-mode plain-program fallback
    # racing it if it is slow, and the exec cache skipping remote compiles
    # entirely on repeat runs); secondaries are only submitted once the
    # primary measurement is snapshotted. The hard watchdog guarantees the
    # final line + exit 0 inside the driver's timeout, promoting a completed
    # secondary if the primary somehow never lands.
    from concurrent.futures import ThreadPoolExecutor
    from concurrent.futures import TimeoutError as FuturesTimeout

    budget_s = float(os.environ.get("KANTTS_BENCH_BUDGET_S", "1260"))
    # KANTTS_BENCH_FAULT=name[,name...]: make those jobs' prep raise — drives
    # the failed-secondary-compile path without needing a real compile failure
    faults = set(filter(None, os.environ.get("KANTTS_BENCH_FAULT",
                                             "").split(",")))

    def _maybe_fault(name, prep):
        if name in faults:
            def prep():
                raise RuntimeError(f"injected fault for {name} "
                                   "(KANTTS_BENCH_FAULT)")
        return prep

    extra = _SNAPSHOT["extra"]

    # ---- Phase 1: the primary, alone -------------------------------------
    # The chunked-8 program (the headline) compiles with the service to
    # itself. If it is slow past a soft budget, the plain single-window
    # program races it as a degraded-mode fallback; the first measurement
    # to land is snapshotted so the watchdog always has a line. A chunked
    # compile still pending when phase 1 ends is carried into phase 2 and
    # upgrades the snapshot opportunistically when it lands.
    primary_pool = ThreadPoolExecutor(max_workers=2)
    fut_chunked = primary_pool.submit(
        _maybe_fault("primary_chunked", prep_hifigan))
    soft_s = float(os.environ.get("KANTTS_BENCH_PRIMARY_SOFT_S", "420"))
    fut_plain = None
    plain_result = None
    deadline = _T0 + budget_s

    def _try_measure(fut, label):
        """Measure a finished prep future; returns result or None."""
        try:
            prep = fut.result(timeout=0)
        except Exception as e:
            extra[label + "_error"] = repr(e)
            return None
        try:
            return measure_hifigan(prep)
        except Exception as e:
            extra[label + "_error"] = repr(e)
            return None

    def _upgrade_to_chunked():
        """If the chunked compile finished, measure it and (re)snapshot.
        Returns True when the chunked future needs no further polling."""
        nonlocal fut_chunked
        if fut_chunked is None:
            return True
        if not fut_chunked.done():
            return False
        r = _try_measure(fut_chunked, "primary_chunked")
        fut_chunked = None
        if r is not None:
            if plain_result is not None:
                extra["hifigan_plain_fallback"] = {
                    k: v for k, v in plain_result.items() if k != "metric"}
            _SNAPSHOT["result"] = r
            print(json.dumps(r), file=sys.stderr, flush=True)
        return True

    while _SNAPSHOT["result"] is None and time.perf_counter() < deadline:
        if _upgrade_to_chunked() and _SNAPSHOT["result"] is not None:
            break
        if fut_plain is not None and fut_plain.done() and plain_result is None:
            plain_result = _try_measure(fut_plain, "primary_plain")
            if plain_result is not None:
                # snapshot immediately so the watchdog always has a line;
                # a later chunked finish upgrades it (phase 2 keeps polling)
                _SNAPSHOT["result"] = dict(plain_result,
                                           degraded_mode="plain program "
                                           "(chunked compile slow/failed)")
                print(json.dumps(_SNAPSHOT["result"]), file=sys.stderr,
                      flush=True)
                break
            if fut_chunked is None:
                break  # both programs failed — fall through to secondaries
        if (fut_plain is None
                and (time.perf_counter() - _T0 > soft_s
                     or fut_chunked is None)):
            print(f"primary chunked compile slow (> {soft_s:.0f}s) or "
                  "failed: racing plain program", file=sys.stderr, flush=True)
            fut_plain = primary_pool.submit(
                _maybe_fault("primary_plain", lambda: prep_hifigan(chunks=0)))
        time.sleep(1.0)

    # ---- Phase 2: secondaries, concurrently ------------------------------
    jobs = [
        ("train", prep_train_step, measure_train_step, None),
        ("train_mas", lambda: prep_train_step(mas=True), measure_train_step,
         None),
        ("gan_train", prep_gan_train_step, measure_gan_train_step, None),
        ("hifigan_f32", lambda: prep_hifigan("float32"), measure_hifigan,
         "_f32"),
        ("sambert", prep_sambert, measure_sambert, None),
    ]
    pool = ThreadPoolExecutor(max_workers=len(jobs))
    futures = {name: pool.submit(_maybe_fault(name, prep))
               for name, prep, _, _ in jobs}

    def run_one(name, measure, suffix):
        try:
            prep = futures[name].result(timeout=1.0)
        except FuturesTimeout:
            return False
        except Exception as e:  # a secondary's failed compile must not kill the line
            extra[name + "_error"] = repr(e)
            return True
        try:
            r = measure(prep)
        except Exception as e:  # never let a secondary bench kill the line
            extra[name + "_error"] = repr(e)
            return True
        key = r["metric"] + (suffix or "")
        extra[key] = {k: v for k, v in r.items() if k != "metric"}
        snap = dict(_SNAPSHOT["result"] or {"metric": None})
        print(json.dumps({**snap, "extra": dict(extra)}),
              file=sys.stderr, flush=True)
        return True

    pending = {name: (measure, suffix) for name, _, measure, suffix in jobs}
    while ((pending or fut_chunked is not None)
           and time.perf_counter() - _T0 < budget_s):
        had_chunked = fut_chunked is not None
        _upgrade_to_chunked()
        progressed = had_chunked and fut_chunked is None
        for name in list(pending):
            if futures[name].done():
                measure, suffix = pending.pop(name)
                run_one(name, measure, suffix)
                progressed = True
        if not progressed:
            time.sleep(2.0)
    for name in pending:
        extra[name + "_skipped"] = "compile did not finish in budget"
    if _SNAPSHOT["result"] is None and not _promote_extra_to_primary():
        print(json.dumps({"error": "no metric completed inside the budget"}),
              file=sys.stderr, flush=True)
        os._exit(3)
    _emit_final_once()
    os._exit(0)  # don't wait for abandoned compile threads


if __name__ == "__main__":
    main()
