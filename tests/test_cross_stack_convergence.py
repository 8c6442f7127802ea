"""Cross-stack training convergence regression: kantts_tpu must track the
torch reference's loss trajectory from identical init on the same data, and
the trained outputs must agree in MCD (the BASELINE.json quality metric).
Full 600-step evidence lives in tools/cross_stack_parity.json; this test
re-runs a reduced version so regressions in losses/optimizer/model numerics
are caught in CI."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_training_trajectories_and_mcd_agree():
    from kantts_tpu.utils.metrics import mel_cepstral_distortion
    from tests.test_torch_parity import _install_stubs
    from tools.cross_stack_parity import make_corpus, train_jax, train_torch

    _install_stubs()
    n_steps = 150
    batch = make_corpus()
    sd0, traj_t, post_tf_t, _ = train_torch(batch, n_steps)
    traj_j, post_tf_j, _, _ = train_jax(batch, sd0, n_steps)

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
