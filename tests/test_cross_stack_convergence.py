"""Cross-stack training convergence regression: kantts_tpu must track the
torch reference's loss trajectory from identical init on the same data, and
the trained outputs must agree in MCD (the BASELINE.json quality metric).
Covers the plain SAM-BERT path, the MAS path (reference's modern flagship —
numba Viterbi vs our in-graph scan kernel), and the HiFi-GAN adversarial
loop (per-D optimizers, fm no-grad pass, regenerated-fake trick).
Full-length evidence lives in tools/cross_stack_parity*.json and
tools/cross_stack_gan_parity.json; these tests re-run reduced versions so
regressions in losses/optimizer/model numerics are caught in CI."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_training_trajectories_and_mcd_agree():
    from kantts_tpu.utils.metrics import mel_cepstral_distortion
    from tests.test_torch_parity import _install_stubs
    from tools.cross_stack_parity import make_corpus, train_jax, train_torch

    _install_stubs()
    n_steps = 150
    batch = make_corpus(mas=False)
    sd0, traj_t, post_tf_t, _, _ = train_torch(batch, n_steps, mas=False)
    traj_j, post_tf_j, _, _, _ = train_jax(batch, sd0, n_steps, mas=False)

    # identical starting loss (same init, same loss semantics)
    first = min(traj_t)
    assert abs(traj_t[first]["TotalLoss"] - traj_j[first]["TotalLoss"]) < 0.02

    # trajectories track within 10% at every logged step
    for step in traj_t:
        tt, tj = traj_t[step]["TotalLoss"], traj_j[step]["TotalLoss"]
        assert abs(tt - tj) / tt < 0.10, (step, tt, tj)

    # trained teacher-forced outputs agree across stacks
    mcd = np.mean([
        mel_cepstral_distortion(post_tf_t[i], post_tf_j[i], use_dtw=False)
        for i in range(post_tf_t.shape[0])
    ])
    assert mcd < 2.5, f"cross-stack MCD too high: {mcd:.3f} dB"


def test_mas_training_trajectories_agree():
    """MAS path: torch runs the reference's Viterbi binarization + CTC/KL
    losses, JAX the in-graph scan kernel; both from identical init."""
    from kantts_tpu.utils.metrics import mel_cepstral_distortion
    from tests.test_torch_parity import _install_stubs
    from tools.cross_stack_parity import make_corpus, train_jax, train_torch

    _install_stubs()
    n_steps = 100
    batch = make_corpus(mas=True)
    sd0, traj_t, post_tf_t, _, dur_t = train_torch(batch, n_steps, mas=True)
    traj_j, post_tf_j, _, _, dur_j = train_jax(batch, sd0, n_steps, mas=True)

    first = min(traj_t)
    assert abs(traj_t[first]["TotalLoss"] - traj_j[first]["TotalLoss"]) < 0.15

    # mel loss (what MAS feeds) tracks within 10%; total within 15% (hard
    # Viterbi tie-breaks differ under float noise, shifting dur/CTC slightly)
    for step in traj_t:
        mt, mj = traj_t[step]["mel_loss"], traj_j[step]["mel_loss"]
        assert abs(mt - mj) / mt < 0.10, (step, mt, mj)
        tt, tj = traj_t[step]["TotalLoss"], traj_j[step]["TotalLoss"]
        assert abs(tt - tj) / tt < 0.15, (step, tt, tj)

    # alignment agreement: hard MAS durations within 1 frame/phone on average
    assert float(np.mean(np.abs(dur_t - dur_j))) < 1.0

    mcd = np.mean([
        mel_cepstral_distortion(post_tf_t[i], post_tf_j[i], use_dtw=False)
        for i in range(post_tf_t.shape[0])
    ])
    assert mcd < 5.0, f"cross-stack MAS MCD too high: {mcd:.3f} dB"


def test_fp_training_trajectories_agree():
    """FP (filled-pause) path: fp-labeled splice training tracks the torch
    reference from identical init — the reference's python per-item
    insert_fp vs our host plan + in-graph gather, plus the FpCELoss
    double-softmax semantics (CrossEntropyLoss applied to the
    FP_Predictor's softmax OUTPUT, reference loss.py:100 — this test guards
    the exact reproduction of that quirk)."""
    from kantts_tpu.utils.metrics import mel_cepstral_distortion
    from tests.test_torch_parity import _install_stubs
    from tools.cross_stack_parity import make_corpus, train_jax, train_torch

    _install_stubs()
    n_steps = 60
    batch = make_corpus(mas=False, fp=True)
    sd0, traj_t, post_tf_t, _, _ = train_torch(batch, n_steps, mas=False,
                                               fp=True)
    traj_j, post_tf_j, _, _, _ = train_jax(batch, sd0, n_steps, mas=False,
                                           fp=True)

    first = min(traj_t)
    assert abs(traj_t[first]["TotalLoss"] - traj_j[first]["TotalLoss"]) < 0.02
    assert abs(traj_t[first]["fp_loss"] - traj_j[first]["fp_loss"]) < 0.01

    for step in traj_t:
        tt, tj = traj_t[step]["TotalLoss"], traj_j[step]["TotalLoss"]
        assert abs(tt - tj) / tt < 0.10, (step, tt, tj)
        ft, fj = traj_t[step]["fp_loss"], traj_j[step]["fp_loss"]
        assert abs(ft - fj) / max(ft, 1e-9) < 0.10, (step, ft, fj)

    mcd = np.mean([
        mel_cepstral_distortion(post_tf_t[i], post_tf_j[i], use_dtw=False)
        for i in range(post_tf_t.shape[0])
    ])
    assert mcd < 2.5, f"cross-stack FP MCD too high: {mcd:.3f} dB"


def test_gan_adversarial_trajectories_agree():
    """HiFi-GAN adversarial loop: G/D losses from identical init (incl.
    converted discriminators) must track the reference's trajectory, and the
    generated audio must agree in log-mel distance."""
    from tests.test_torch_parity import _install_stubs
    from tools.cross_stack_gan_parity import (
        make_corpus,
        mel_distance,
        train_jax,
        train_torch,
    )

    _install_stubs()
    n_steps = 40
    wav, mel = make_corpus()
    sd, traj_t, y_t = train_torch(wav, mel, n_steps)
    traj_j, y_j = train_jax(wav, mel, sd, n_steps)

    for step in traj_t:
        gt, gj = traj_t[step]["gen_loss"], traj_j[step]["gen_loss"]
        dt, dj = traj_t[step]["disc_loss"], traj_j[step]["disc_loss"]
        assert abs(gt - gj) / abs(gt) < 0.05, (step, gt, gj)
        assert abs(dt - dj) / abs(dt) < 0.05, (step, dt, dj)

    # generated audio agrees across stacks far more than either matches the
    # target at this step count
    xstack = mel_distance(y_t, y_j)
    t_tgt = mel_distance(y_t, wav)
    assert xstack < 0.2 * t_tgt, (xstack, t_tgt)


@pytest.mark.slow
def test_sybert_training_trajectories_agree():
    """Textsy-BERT masked-LM training tracks the torch reference from
    identical init — including the reference's 1/sy_vocab loss scaling
    before backward (reference trainer.py:1171), which changes gradient
    magnitudes and how the grad clip bites. (The reference model itself is
    broken at HEAD — its encoder returns 3 values, its sybert forward
    unpacks 2 — so the harness restores the intended forward; see
    tools/cross_stack_sybert_parity.py.)"""
    import tools.cross_stack_sybert_parity as x

    batches = x.make_batches()
    sd0, traj_t, preds_t = x.train_torch(batches)
    traj_j, preds_j = x.train_jax(batches, sd0)
    for (s, lt, _), (_, lj, _) in zip(traj_t, traj_j):
        assert abs(lj - lt) / max(lt, 1e-9) < 0.05, (s, lt, lj)
    mask = batches[0]["bert_masks"] > 0
    assert (preds_t[mask] == preds_j[mask]).mean() > 0.95
