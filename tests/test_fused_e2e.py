"""Fused AM+vocoder program == the two-program pipeline, and the cache
returns one compiled program per (models, max_len)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kantts_tpu.infer.e2e import make_fused_infer
from kantts_tpu.models.hifigan.generator import Generator
from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT, sambert_infer
from tests.test_sambert import TINY


def _am_fixtures():
    model = KanTtsSAMBERT(TINY)
    rng = np.random.RandomState(0)
    B, T_in = 1, 8
    batch = dict(
        inputs_ling=jnp.asarray(rng.randint(0, 5, (B, T_in, 4)), dtype=jnp.int32),
        inputs_emotion=jnp.asarray(rng.randint(0, 4, (B, T_in)), dtype=jnp.int32),
        inputs_speaker=jnp.asarray(rng.randint(0, 2, (B, T_in)), dtype=jnp.int32),
        input_lengths=jnp.asarray([8]),
        output_lengths=jnp.asarray([24]),
        mel_targets=jnp.zeros((B, 24, 10)),
        duration_targets=jnp.asarray(np.full((B, T_in), 3.0, dtype=np.float32)),
        pitch_targets=jnp.zeros((B, T_in)),
        energy_targets=jnp.zeros((B, T_in)),
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, deterministic=False,
    )
    return model, variables, batch


@pytest.mark.slow
def test_fused_matches_two_program_pipeline():
    am, am_vars, batch = _am_fixtures()
    gen = Generator(
        in_channels=TINY["num_mels"], out_channels=1, channels=16,
        kernel_size=7, upsample_scales=(4, 4), upsample_kernal_sizes=(8, 8),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),), causal=True,
    )
    max_len = 48
    mel_dummy = jnp.zeros((1, max_len, TINY["num_mels"]))
    voc_vars = gen.init(jax.random.PRNGKey(2), mel_dummy)

    res = sambert_infer(am, am_vars, batch["inputs_ling"],
                        batch["inputs_emotion"], batch["inputs_speaker"],
                        batch["input_lengths"], max_len)
    wav_ref = gen.apply(voc_vars, res["postnet_outputs"])

    fn = make_fused_infer(am, gen, max_len)
    wav, n_frames = fn(am_vars, voc_vars, batch["inputs_ling"],
                       batch["inputs_emotion"], batch["inputs_speaker"],
                       batch["input_lengths"], jax.random.PRNGKey(0))
    assert wav.shape == (1, max_len * 16, 1)
    assert int(n_frames[0]) == int(res["LR_length_rounded"][0])
    np.testing.assert_allclose(np.asarray(wav), np.asarray(wav_ref), atol=1e-5)

    # cache: same models + max_len -> the SAME jitted fn object
    assert make_fused_infer(am, gen, max_len) is fn
    assert make_fused_infer(am, gen, max_len * 2) is not fn

    # chunked vocoder epilogue inside the fused program: same waveform
    fn_c = make_fused_infer(am, gen, max_len, n_chunks=4)
    assert fn_c is not fn
    wav_c, n_frames_c = fn_c(am_vars, voc_vars, batch["inputs_ling"],
                             batch["inputs_emotion"], batch["inputs_speaker"],
                             batch["input_lengths"], jax.random.PRNGKey(0))
    assert int(n_frames_c[0]) == int(n_frames[0])
    np.testing.assert_allclose(np.asarray(wav_c), np.asarray(wav),
                               atol=1e-5, rtol=1e-5)
