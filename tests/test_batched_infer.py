"""Batched acoustic inference == per-utterance inference.

Per-item PNCA band widths (sambert.py sambert_infer) mean each utterance in
a batch decodes under exactly the attention mask its own B=1 run would use —
batch composition must not change synthesis output. The reference only ever
infers at B=1 (reference infer_sambert.py:156-227), so B=1 IS the parity
semantics; this guards the batched throughput path against drift from it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT, sambert_infer
from tests.test_sambert import TINY


@pytest.mark.slow
def test_batched_infer_matches_single():
    model = KanTtsSAMBERT(TINY)
    rng = np.random.RandomState(0)
    B, T_in, T_out = 3, 8, 24
    lengths = np.asarray([8, 5, 3], dtype=np.int32)

    batch = dict(
        inputs_ling=jnp.asarray(rng.randint(0, 5, (B, T_in, 4)),
                                dtype=jnp.int32),
        inputs_emotion=jnp.asarray(rng.randint(0, 4, (B, T_in)),
                                   dtype=jnp.int32),
        inputs_speaker=jnp.asarray(rng.randint(0, 2, (B, T_in)),
                                   dtype=jnp.int32),
        input_lengths=jnp.asarray(lengths),
        output_lengths=jnp.asarray([T_out] * B),
        mel_targets=jnp.zeros((B, T_out, TINY["num_mels"])),
        duration_targets=jnp.asarray(np.full((B, T_in), 3.0,
                                             dtype=np.float32)),
        pitch_targets=jnp.zeros((B, T_in)),
        energy_targets=jnp.zeros((B, T_in)),
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, deterministic=False,
    )

    res_b = sambert_infer(model, variables, batch["inputs_ling"],
                          batch["inputs_emotion"], batch["inputs_speaker"],
                          batch["input_lengths"], T_out)
    assert np.asarray(res_b["x_band_width"]).shape == (B,)

    for i in range(B):
        res_1 = sambert_infer(
            model, variables,
            batch["inputs_ling"][i : i + 1],
            batch["inputs_emotion"][i : i + 1],
            batch["inputs_speaker"][i : i + 1],
            batch["input_lengths"][i : i + 1], T_out)
        # the batched item's band width is its own B=1 width
        assert int(np.asarray(res_b["x_band_width"])[i]) == int(
            np.asarray(res_1["x_band_width"]))
        valid_b = int(np.asarray(res_b["LR_length_rounded"])[i])
        valid_1 = int(np.asarray(res_1["LR_length_rounded"])[0])
        assert valid_b == valid_1
        n = int(lengths[i])
        np.testing.assert_allclose(
            np.asarray(res_b["log_duration_predictions"])[i, :n],
            np.asarray(res_1["log_duration_predictions"])[0, :n], atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(res_b["postnet_outputs"])[i, :valid_b],
            np.asarray(res_1["postnet_outputs"])[0, :valid_1],
            atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(res_b["pitch_predictions"])[i, :n],
            np.asarray(res_1["pitch_predictions"])[0, :n], atol=1e-5)
