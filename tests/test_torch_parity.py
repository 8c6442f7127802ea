"""Numerical parity against the reference torch implementation.

The reference models (read-only at /root/reference) are imported as test
oracles with lightweight stubs for their unavailable binary deps (numba,
pytorch_wavelets, librosa). Random reference weights are converted via
kantts_tpu.utils.torch_convert and both stacks must produce the same outputs
— this validates every layer's numerics end-to-end.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


def _install_stubs():
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (lambda f: f)
        numba.prange = range
        sys.modules["numba"] = numba
    if "pytorch_wavelets" not in sys.modules:
        pw = types.ModuleType("pytorch_wavelets")

        class _DWT1DForward:  # only instantiated by MSD with DWT pooling
            def __init__(self, *a, **k):
                pass

        pw.DWT1DForward = _DWT1DForward
        sys.modules["pytorch_wavelets"] = pw
    if "librosa" not in sys.modules:
        from kantts_tpu.dsp.mel import mel_filterbank

        librosa = types.ModuleType("librosa")
        filters = types.ModuleType("librosa.filters")

        def mel(sr, n_fft, n_mels=128, fmin=0.0, fmax=None, **kwargs):
            return mel_filterbank(sr, n_fft, n_mels, fmin, fmax)

        filters.mel = mel
        librosa.filters = filters
        sys.modules["librosa"] = librosa
        sys.modules["librosa.filters"] = filters
    import scipy.signal

    if not hasattr(scipy.signal, "kaiser"):  # removed in modern scipy
        scipy.signal.kaiser = scipy.signal.windows.kaiser
    for name in ("ttsfrd", "unidecode", "inflect", "sox", "pysptk"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "unidecode":
                mod.unidecode = lambda s: s
            if name == "inflect":
                mod.engine = lambda: None
            sys.modules[name] = mod
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


TINY_CFG = dict(
    max_len=64,
    embedding_dim=48,
    encoder_num_layers=2,
    encoder_num_heads=2,
    encoder_num_units=16,
    encoder_ffn_inner_dim=32,
    encoder_dropout=0.0,
    encoder_attention_dropout=0.0,
    encoder_relu_dropout=0.0,
    encoder_projection_units=8,
    speaker_units=8,
    emotion_units=8,
    predictor_filter_size=5,
    predictor_fsmn_num_layers=2,
    predictor_num_memory_units=16,
    predictor_ffn_inner_dim=16,
    predictor_dropout=0.0,
    predictor_shift=0,
    predictor_lstm_units=8,
    dur_pred_prenet_units=[8, 8],
    dur_pred_lstm_units=8,
    decoder_prenet_units=[16, 16],
    decoder_num_layers=2,
    decoder_num_heads=2,
    decoder_num_units=16,
    decoder_ffn_inner_dim=32,
    decoder_dropout=0.0,
    decoder_attention_dropout=0.0,
    decoder_relu_dropout=0.0,
    outputs_per_step=3,
    num_mels=10,
    postnet_filter_size=5,
    postnet_fsmn_num_layers=2,
    postnet_num_memory_units=16,
    postnet_ffn_inner_dim=16,
    postnet_dropout=0.0,
    postnet_shift=1,
    postnet_lstm_units=8,
    sy=20,
    tone=6,
    syllable_flag=8,
    word_segment=8,
    emotion=5,
    speaker=3,
)


def test_sambert_forward_matches_reference():
    _install_stubs()
    import torch
    from kantts.models.sambert.kantts_sambert import KanTtsSAMBERT as TorchSambert

    from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT
    from kantts_tpu.utils.torch_convert import convert_sambert

    torch.manual_seed(0)
    tmodel = TorchSambert(TINY_CFG)
    tmodel.eval()

    rng = np.random.RandomState(0)
    B, T_in, T_mel = 2, 10, 24
    inputs_ling = rng.randint(0, 5, (B, T_in, 4)).astype(np.int64)
    inputs_emotion = rng.randint(0, 4, (B, T_in)).astype(np.int64)
    inputs_speaker = rng.randint(0, 2, (B, T_in)).astype(np.int64)
    input_lengths = np.array([10, 8])
    output_lengths = np.array([24, 18])
    mel_targets = rng.randn(B, T_mel, 10).astype(np.float32)
    dur = np.zeros((B, T_in), dtype=np.int64)
    dur[0, :10] = [3, 2, 3, 2, 3, 2, 3, 2, 2, 2]
    dur[1, :8] = [3, 2, 3, 2, 3, 2, 2, 1]
    dur[1, 8] = 24 - 18  # padding stashed on EOS slot
    pitch = np.abs(rng.randn(B, T_in)).astype(np.float32)
    energy = np.abs(rng.randn(B, T_in)).astype(np.float32)

    with torch.no_grad():
        tres = tmodel(
            torch.from_numpy(inputs_ling),
            torch.from_numpy(inputs_emotion),
            torch.from_numpy(inputs_speaker),
            torch.from_numpy(input_lengths),
            output_lengths=torch.from_numpy(output_lengths),
            mel_targets=torch.from_numpy(mel_targets),
            duration_targets=torch.from_numpy(dur),
            pitch_targets=torch.from_numpy(pitch),
            energy_targets=torch.from_numpy(energy),
        )

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_sambert(sd, TINY_CFG)

    jmodel = KanTtsSAMBERT(TINY_CFG)
    jres = jmodel.apply(
        {"params": params},
        jnp.asarray(inputs_ling, dtype=jnp.int32),
        jnp.asarray(inputs_emotion, dtype=jnp.int32),
        jnp.asarray(inputs_speaker, dtype=jnp.int32),
        jnp.asarray(input_lengths),
        jnp.asarray(output_lengths),
        jnp.asarray(mel_targets),
        duration_targets=jnp.asarray(dur.astype(np.float32)),
        pitch_targets=jnp.asarray(pitch),
        energy_targets=jnp.asarray(energy),
        deterministic=True,
    )

    np.testing.assert_allclose(
        np.asarray(jres["log_duration_predictions"]),
        tres["log_duration_predictions"].numpy(), atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(jres["pitch_predictions"]),
        tres["pitch_predictions"].numpy(), atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(jres["dec_outputs"]), tres["dec_outputs"].numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(jres["postnet_outputs"]), tres["postnet_outputs"].numpy(),
        atol=2e-4,
    )
    assert int(jres["x_band_width"]) == int(tres["x_band_width"])


@pytest.mark.parametrize("causal", [True, False])
def test_hifigan_generator_matches_reference(causal):
    _install_stubs()
    import torch
    from kantts.models.hifigan.hifigan import Generator as TorchGenerator

    from kantts_tpu.models.hifigan.generator import Generator
    from kantts_tpu.utils.torch_convert import convert_hifigan_generator

    cfg = dict(
        in_channels=12,
        out_channels=1,
        channels=16,
        kernel_size=7,
        upsample_scales=(4, 4),
        upsample_kernal_sizes=(8, 8),
        resblock_kernel_sizes=(3, 5),
        resblock_dilations=((1, 3), (1, 3)),
        causal=causal,
    )
    torch.manual_seed(0)
    tmodel = TorchGenerator(**{**cfg,
                               "upsample_scales": list(cfg["upsample_scales"]),
                               "upsample_kernal_sizes": list(cfg["upsample_kernal_sizes"]),
                               "resblock_kernel_sizes": list(cfg["resblock_kernel_sizes"]),
                               "resblock_dilations": [list(d) for d in cfg["resblock_dilations"]]})
    tmodel.eval()

    rng = np.random.RandomState(0)
    mel = rng.randn(2, 11, 12).astype(np.float32)
    with torch.no_grad():
        ty = tmodel(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_hifigan_generator(sd, {
        "upsample_scales": cfg["upsample_scales"],
        "resblock_kernel_sizes": cfg["resblock_kernel_sizes"],
        "resblock_dilations": cfg["resblock_dilations"],
    })

    jmodel = Generator(**cfg)
    jy = np.asarray(jmodel.apply({"params": params}, jnp.asarray(mel)))
    jy = jy.transpose(0, 2, 1)

    assert jy.shape == ty.shape
    np.testing.assert_allclose(jy, ty, atol=1e-5)
