"""Dynamic-batching TTS service: results identical to the offline pipeline,
concurrent requests coalesce into batched calls, HTTP round trip works.

The batching guarantee rests on the already-tested invariants that batch
composition cannot change any item's output (tests/test_batched_infer.py for
the AM's per-item band widths; the vocoder's convs never mix batch items) —
here we assert the end product: a service under concurrent load produces the
same audio as sequential requests, in fewer device calls.
"""

import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kantts_tpu.models.hifigan.generator import Generator
from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT
from kantts_tpu.serve import TTSService, make_http_server, wav_bytes
from kantts_tpu.serve.server import parse_wav_bytes
from kantts_tpu.text.ling_unit import KanTtsLinguisticUnit
from tests.test_sambert import TINY

LING_CONFIG = {
    "linguistic_unit": {
        "cleaners": "english_cleaners",
        "lfeat_type_list": "sy,tone,syllable_flag,word_segment,"
                           "emo_category,speaker_category",
        "speaker_list": "F7",
        "language": "PinYin",
    },
    "Model": {"KanTtsSAMBERT": {"params": {"max_len": 800}}},
}

TEXTS = ["ni3 hao3", "shi4 jie4", "zhong1 guo2", "tian1 qi4 hao3",
         "wo3 men5", "xie4 xie5"]


def _build_service(**kwargs):
    ling_unit = KanTtsLinguisticUnit(LING_CONFIG)
    cfg = dict(TINY)
    cfg.update(ling_unit.get_unit_size())
    am = KanTtsSAMBERT(cfg)

    rng = np.random.RandomState(0)
    B, T_in, T_out = 1, 8, 24
    am_vars = am.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        inputs_ling=jnp.asarray(rng.randint(0, 5, (B, T_in, 4)),
                                dtype=jnp.int32),
        inputs_emotion=jnp.asarray(rng.randint(0, 4, (B, T_in)),
                                   dtype=jnp.int32),
        inputs_speaker=jnp.asarray(rng.randint(0, 2, (B, T_in)),
                                   dtype=jnp.int32),
        input_lengths=jnp.asarray([T_in]),
        output_lengths=jnp.asarray([T_out]),
        mel_targets=jnp.zeros((B, T_out, cfg["num_mels"])),
        duration_targets=jnp.asarray(np.full((B, T_in), 3.0,
                                             dtype=np.float32)),
        pitch_targets=jnp.zeros((B, T_in)),
        energy_targets=jnp.zeros((B, T_in)),
        deterministic=False,
    )

    gen = Generator(
        in_channels=cfg["num_mels"], out_channels=1, channels=16,
        kernel_size=7, upsample_scales=(4, 4), upsample_kernal_sizes=(8, 8),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),), causal=True,
    )
    voc_vars = gen.init(jax.random.PRNGKey(2),
                        jnp.zeros((1, 16, cfg["num_mels"])))

    defaults = dict(sample_rate=16000, input_bucket=8, frame_bucket=16,
                    frames_per_symbol=6, max_batch=4, max_wait_ms=30.0)
    defaults.update(kwargs)
    return TTSService(am, am_vars, ling_unit, gen, voc_vars, **defaults)


@pytest.mark.slow  # 18-37 s of XLA:CPU trace+compile on this 1-core box; equivalent coverage stays in the full tier
def test_service_matches_offline_pipeline():
    """One request through the service == the CLI-equivalent manual path
    (AM batch synthesis + bucket-padded vocoder + tail silence)."""
    from kantts_tpu.bin.infer_sambert import am_synthesis_batch

    service = _build_service()
    try:
        # the default front-end is the in-tree pinyin g2p
        import kantts_tpu.text.pinyin_frontend as fe

        fe_seqs = fe.text_to_symbols([TEXTS[0]])[0]
        sr, wav = service.synthesize(TEXTS[0])
        assert sr == 16000

        # manual: the exact offline pipeline at the service's buckets
        outs = am_synthesis_batch(
            fe_seqs, service.am_model, service.am_variables,
            service.ling_unit, input_bucket=8, frames_per_symbol=6,
            batch_pad_to=4)
        pieces = []
        for i, (_, mel, _, _, _) in enumerate(outs):
            L = int(np.ceil(mel.shape[0] / 16) * 16)
            mel_in = np.pad(mel, [(0, L - mel.shape[0]), (0, 0)]).astype(
                np.float32)[None]
            y = np.asarray(service.generator.apply(
                service.voc_variables, jnp.asarray(mel_in),
                rngs={"noise": jax.random.PRNGKey(0)}))
            hop = y.shape[1] // L
            pieces.append(y[0, : mel.shape[0] * hop, 0])
            if i != len(outs) - 1:
                pieces.append(np.zeros(int(0.28 * sr), dtype=np.float32))
        pieces.append(np.zeros(int(0.05 * sr), dtype=np.float32))
        expected = np.concatenate(pieces)

        assert wav.shape == expected.shape
        np.testing.assert_allclose(wav, expected, atol=1e-4)
        assert service.stats["requests"] == 1
    finally:
        service.close()


@pytest.mark.slow
def test_concurrent_requests_batch_and_match():
    """N concurrent requests produce the same audio as sequential requests,
    in strictly fewer coordinator batches than utterances."""
    service = _build_service(max_batch=4, max_wait_ms=150.0)
    try:
        # sequential reference pass
        sequential = {t: service.synthesize(t)[1] for t in TEXTS}
        base_batches = service.stats["batches"]

        results, errors = {}, []

        def worker(text):
            try:
                results[text] = service.synthesize(text, timeout=120)[1]
            except BaseException as e:  # surface in the main thread
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(t,)) for t in TEXTS]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=180)
        assert not errors
        assert len(results) == len(TEXTS)
        for t in TEXTS:
            np.testing.assert_allclose(results[t], sequential[t], atol=1e-4)

        # coalescing actually happened: 6 utterances in < 6 batches
        assert service.stats["batches"] - base_batches < len(TEXTS)
        assert service.stats["utterances"] >= 2 * len(TEXTS)
    finally:
        service.close()


@pytest.mark.slow
def test_http_roundtrip():
    service = _build_service()
    httpd = make_http_server(service, "127.0.0.1", 0)
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/tts",
            data=('{"text": "%s"}' % TEXTS[0]).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            assert resp.headers["Content-Type"] == "audio/wav"
            body = resp.read()
        sr, wav = parse_wav_bytes(body)
        assert sr == 16000

        sr2, expected = service.synthesize(TEXTS[0])
        # the HTTP body is the PCM16 quantization of the same waveform
        assert body == wav_bytes(expected, sr2)

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as resp:
            import json

            health = json.loads(resp.read())
        assert health["ok"] and health["requests"] >= 1

        # bad requests: missing text key / non-object JSON -> 400, not 500
        for body in (b'{"nope": 1}', b'"just a string"'):
            bad = urllib.request.Request(
                f"http://127.0.0.1:{port}/tts", data=body,
                headers={"Content-Type": "application/json"})
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(bad, timeout=30)
            assert exc.value.code == 400, body
    finally:
        httpd.shutdown()
        service.close()


def test_request_validation_rejects_on_caller_thread():
    """Malformed or oversized utterances reject the offending request with a
    clean error on the caller thread — they never reach the coordinator, so
    no co-batched request can be poisoned."""
    service = _build_service()
    try:
        with pytest.raises(ValueError, match="empty"):
            service.synthesize_symbols([])
        with pytest.raises(Exception):  # unknown symbol -> codec error
            service.synthesize_symbols(["{not_a_symbol$tone9$x$y$z$w}"])
        # over max_len: build a symbol string longer than the tiny max_len
        sym = "{n_c$tone3$s_begin$word_begin$emotion_neutral$F7}"
        too_long = " ".join([sym] * (service.am_model.config["max_len"] + 1))
        with pytest.raises(ValueError, match="max_len"):
            service.synthesize_symbols([too_long])
        assert service.stats["batches"] == 0  # nothing reached the device
        # the service still works afterwards
        sr, wav = service.synthesize(TEXTS[0])
        assert len(wav) > 0
    finally:
        service.close()


@pytest.mark.slow
def test_stream_matches_synthesize():
    """The streamed chunk sequence concatenates to exactly the whole-request
    waveform (same gaps, same tail), in more than one chunk."""
    service = _build_service()
    try:
        text = "ni3 hao3。 shi4 jie4"  # two sub-sentences
        sr, expected = service.synthesize(text)
        chunks = list(service.stream(text, chunk_seconds=0.01))
        assert len(chunks) > 3
        wav = np.concatenate([c[:, 0] for c in chunks])
        assert wav.shape == expected.shape
        np.testing.assert_allclose(wav, expected, atol=1e-4)
    finally:
        service.close()


@pytest.mark.slow
def test_http_stream_roundtrip():
    service = _build_service()
    httpd = make_http_server(service, "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        sr, expected = service.synthesize(TEXTS[0])
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/tts/stream",
            data=('{"text": "%s"}' % TEXTS[0]).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            assert resp.headers["X-Audio-Format"] == "pcm_s16le"
            assert int(resp.headers["X-Sample-Rate"]) == sr
            body = resp.read()  # urllib re-assembles the chunked transfer
        pcm = np.frombuffer(body, dtype="<i2").astype(np.float32) / 32767.0
        assert pcm.shape == expected.shape
        np.testing.assert_allclose(
            pcm, np.clip(expected, -1, 1), atol=1.0 / 32767.0)

        # request errors before the stream starts still map to 400
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/tts/stream",
            data=b'{"text": "blorp9 zzz"}',
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(bad, timeout=30)
        assert exc.value.code == 400
    finally:
        httpd.shutdown()
        service.close()


def test_stream_rejects_int8_and_skips_batched_vocode():
    """int8 + streaming is refused (window scales break chunk exactness),
    and streamed utterances never run the whole-utterance batched vocoder."""
    from kantts_tpu.models.hifigan.generator import Generator as Gen

    service = _build_service()
    try:
        calls = []
        inner = service._vocode_fn
        service._vocode_fn = lambda v, m: (calls.append(1) or inner(v, m))

        chunks = list(service.stream(TEXTS[0], chunk_seconds=0.05))
        assert chunks and not calls  # mel-only: batched vocoder never ran

        service.generator = Gen(
            in_channels=10, out_channels=1, channels=16, kernel_size=7,
            upsample_scales=(4, 4), upsample_kernal_sizes=(8, 8),
            resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
            causal=True, quant=True)
        with pytest.raises(ValueError, match="int8"):
            service.stream(TEXTS[0])
    finally:
        service.close()


def test_warmup_compiles_without_counting_traffic():
    service = _build_service()
    try:
        dt = service.warmup(TEXTS[0])
        assert dt > 0
        assert service.stats["requests"] == 0  # warmup is not traffic
        assert service.stats["batches"] >= 1   # but it did run the programs
        sr, wav = service.synthesize(TEXTS[0])
        assert len(wav) > 0 and service.stats["requests"] == 1
    finally:
        service.close()


def test_per_request_speaker_and_lang():
    """speaker/lang override per request (the CLI's --speaker/--lang); an
    unknown speaker rejects with an actionable error, not a device fault."""
    service = _build_service()
    try:
        sr, wav = service.synthesize(TEXTS[0], speaker="F7")
        assert len(wav) > 0
        with pytest.raises(KeyError, match="speaker"):
            service.synthesize(TEXTS[0], speaker="F99")
    finally:
        service.close()


def test_healthz_latency_percentiles():
    service = _build_service()
    try:
        service.warmup(TEXTS[0])
        snap0 = service.stats_snapshot()
        assert "latency_p50_ms" not in snap0  # warmup samples excluded
        for t in TEXTS[:3]:
            service.synthesize(t)
        snap = service.stats_snapshot()
        assert snap["requests"] == 3
        assert 0 < snap["latency_p50_ms"] <= snap["latency_p95_ms"]
    finally:
        service.close()
