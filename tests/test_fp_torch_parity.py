"""FP (filled-pause) training-forward parity against the torch reference.

The FP subsystem's splice semantics are oracle-tested (tests/test_fp.py);
this test closes the remaining gap by running the ACTUAL reference model
(reference kantts_sambert.py:766-860 insert_fp + FP_predictor) and ours
from identical converted weights on the same FP-labeled batch and comparing
every output: filler-class predictions, the spliced sequence's prosody
predictions, and the teacher-forced mels. Differences anywhere in the FP
path (filler encoding, wraparound extension, splice order, inter-length
masking) would surface here.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_torch_parity import TINY_CFG, _install_stubs

pytestmark = pytest.mark.slow


def test_fp_train_forward_matches_reference():
    _install_stubs()
    import torch
    from kantts.models.sambert.kantts_sambert import KanTtsSAMBERT as TorchSambert

    from kantts_tpu.models.sambert.fp import build_fp_insertion_plan
    from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT
    from kantts_tpu.utils.torch_convert import convert_sambert

    cfg = dict(TINY_CFG, FP=True)
    torch.manual_seed(0)
    tmodel = TorchSambert(cfg)
    tmodel.eval()

    rng = np.random.RandomState(0)
    B, T_in, T_mel = 2, 8, 24
    fp_dict_lings = rng.randint(0, 5, (3, 3, 4)).astype(np.int64)
    tmodel.fp_dict = {k: torch.from_numpy(fp_dict_lings[k - 1]).long()
                      .unsqueeze(0) for k in (1, 2, 3)}

    fp_label = np.zeros((B, T_in), dtype=np.int64)
    fp_label[0, 2] = 1
    fp_label[1, 1] = 2
    fp_label[1, 4] = 3
    lengths = np.array([8, 7], dtype=np.int64)

    # host-side insertion plan (our in-graph splice's input); L is the padded
    # extended budget, inter the true extended lengths (the reference's
    # inter_lengths)
    src, f_cls, f_ph, inter, L = build_fp_insertion_plan(
        fp_label.astype(np.int32), lengths.astype(np.int32), out_len=16)
    t_ext = int(max(inter))  # torch pads text_hid exactly to max(inter)

    dur = np.zeros((B, L), dtype=np.float32)
    for b in range(B):
        n = int(inter[b])
        dur[b, :n] = 2
        dur[b, n - 1] += T_mel - dur[b].sum()

    inputs_ling = rng.randint(0, 5, (B, T_in, 4)).astype(np.int64)
    inputs_emotion = rng.randint(0, 4, (B, T_in)).astype(np.int64)
    inputs_speaker = rng.randint(0, 2, (B, T_in)).astype(np.int64)
    output_lengths = np.array([T_mel, T_mel - 4], dtype=np.int64)
    mel_targets = rng.randn(B, T_mel, TINY_CFG["num_mels"]).astype(np.float32)
    pitch = np.abs(rng.randn(B, L)).astype(np.float32)
    energy = np.abs(rng.randn(B, L)).astype(np.float32)
    for b in range(B):  # collate zero-pads prosody targets past inter_length;
        pitch[b, inter[b]:] = 0.0  # the k=9 embedding convs see the padding,
        energy[b, inter[b]:] = 0.0  # so nonzero junk there is out-of-contract

    with torch.no_grad():
        tres = tmodel(
            torch.from_numpy(inputs_ling),
            torch.from_numpy(inputs_emotion),
            torch.from_numpy(inputs_speaker),
            torch.from_numpy(lengths),
            output_lengths=torch.from_numpy(output_lengths),
            mel_targets=torch.from_numpy(mel_targets),
            duration_targets=torch.from_numpy(dur[:, :t_ext]),
            pitch_targets=torch.from_numpy(pitch[:, :t_ext]),
            energy_targets=torch.from_numpy(energy[:, :t_ext]),
            fp_label=torch.from_numpy(fp_label),
        )

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_sambert(sd, cfg)
    jmodel = KanTtsSAMBERT(cfg)
    jres = jmodel.apply(
        {"params": params},
        jnp.asarray(inputs_ling, dtype=jnp.int32),
        jnp.asarray(inputs_emotion, dtype=jnp.int32),
        jnp.asarray(inputs_speaker, dtype=jnp.int32),
        jnp.asarray(lengths, dtype=jnp.int32),
        output_lengths=jnp.asarray(output_lengths, dtype=jnp.int32),
        mel_targets=jnp.asarray(mel_targets),
        duration_targets=jnp.asarray(dur),
        pitch_targets=jnp.asarray(pitch),
        energy_targets=jnp.asarray(energy),
        fp_label=jnp.asarray(fp_label, dtype=jnp.int32),
        fp_plan=(jnp.asarray(src), jnp.asarray(f_cls), jnp.asarray(f_ph),
                 jnp.asarray(inter)),
        fp_dict_lings=jnp.asarray(fp_dict_lings, dtype=jnp.int32),
        deterministic=True,
    )

    # filler-class predictions (pre-splice grid)
    np.testing.assert_allclose(
        np.asarray(jres["fp_predictions"]),
        tres["fp_predictions"].numpy(), atol=2e-5)

    # prosody predictions on the spliced sequence, per-item valid prefix
    for b in range(B):
        n = int(inter[b])
        for key in ("log_duration_predictions", "pitch_predictions",
                    "energy_predictions"):
            np.testing.assert_allclose(
                np.asarray(jres[key])[b, :n], tres[key].numpy()[b, :n],
                atol=2e-4, err_msg=f"{key}[{b}]")

    # teacher-forced mels on the output grid, per-item valid prefix
    for b in range(B):
        m = int(output_lengths[b])
        np.testing.assert_allclose(
            np.asarray(jres["dec_outputs"])[b, :m],
            tres["dec_outputs"].numpy()[b, :m], atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(jres["postnet_outputs"])[b, :m],
            tres["postnet_outputs"].numpy()[b, :m], atol=2e-4)
