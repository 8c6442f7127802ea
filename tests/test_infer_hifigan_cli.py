"""infer_hifigan CLI: plain vs --chunked N produce identical wavs."""

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from kantts_tpu.bin.infer_hifigan import hifigan_infer
from kantts_tpu.models.hifigan.generator import Generator

CFG = dict(
    in_channels=20, out_channels=1, channels=32, kernel_size=7,
    upsample_scales=[5, 2, 2], upsample_kernal_sizes=[10, 4, 4],
    resblock_kernel_sizes=[3, 7], resblock_dilations=[[1, 3], [1, 3]],
    causal=True,
)


def test_chunked_cli_matches_plain(tmp_path):
    gen = Generator(**{k: tuple(v) if isinstance(v, list) else v
                       for k, v in CFG.items()})
    variables = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 20)))
    ckpt = tmp_path / "ckpt_0.msgpack"
    ckpt.write_bytes(serialization.msgpack_serialize(
        {"model": {"generator": variables["params"]}}))
    config = {"Model": {"Generator": {"params": dict(CFG)}},
              "audio_config": {"sampling_rate": 16000}}

    mel_dir = tmp_path / "mels"
    mel_dir.mkdir()
    rng = np.random.RandomState(0)
    np.save(mel_dir / "utt1.npy", rng.randn(73, 20).astype(np.float32))
    np.save(mel_dir / "utt2.npy", rng.randn(120, 20).astype(np.float32))

    from scipy.io import wavfile

    out_plain, out_chunked = tmp_path / "plain", tmp_path / "chunked"
    hifigan_infer(str(mel_dir), str(ckpt), str(out_plain), config=config)
    hifigan_infer(str(mel_dir), str(ckpt), str(out_chunked), config=config,
                  chunked=4)
    for utt in ("utt1", "utt2"):
        sr1, w1 = wavfile.read(out_plain / f"{utt}.wav")
        sr2, w2 = wavfile.read(out_chunked / f"{utt}.wav")
        assert sr1 == sr2 == 16000
        # PCM16 quantization absorbs float roundoff; allow 1 LSB
        assert w1.shape == w2.shape
        assert int(np.abs(w1.astype(np.int32) - w2.astype(np.int32)).max()) <= 1


def test_int8_cli_close_to_f32(tmp_path):
    """--int8 serves the same checkpoint with bounded numerical drift."""
    gen = Generator(**{k: tuple(v) if isinstance(v, list) else v
                       for k, v in CFG.items()})
    variables = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 20)))
    ckpt = tmp_path / "ckpt_0.msgpack"
    ckpt.write_bytes(serialization.msgpack_serialize(
        {"model": {"generator": variables["params"]}}))
    config = {"Model": {"Generator": {"params": dict(CFG)}},
              "audio_config": {"sampling_rate": 16000}}

    mel_dir = tmp_path / "mels"
    mel_dir.mkdir()
    np.save(mel_dir / "utt1.npy",
            np.random.RandomState(0).randn(73, 20).astype(np.float32))

    from scipy.io import wavfile

    out_f32, out_int8 = tmp_path / "f32", tmp_path / "int8"
    hifigan_infer(str(mel_dir), str(ckpt), str(out_f32), config=config)
    hifigan_infer(str(mel_dir), str(ckpt), str(out_int8), config=config,
                  int8=True)
    _, w1 = wavfile.read(out_f32 / "utt1.wav")
    _, w2 = wavfile.read(out_int8 / "utt1.wav")
    a, b = w1.astype(np.float64), w2.astype(np.float64)
    assert a.shape == b.shape
    rel = np.linalg.norm(b - a) / max(np.linalg.norm(a), 1e-9)
    assert rel < 0.05, rel
    assert np.corrcoef(a, b)[0, 1] > 0.995
