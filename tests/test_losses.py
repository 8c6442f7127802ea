"""Loss library tests: masked reductions, torch CTC parity, builder contract."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from kantts_tpu.losses import (
    AttentionBinarizationLoss,
    AttentionCTCLoss,
    DiscriminatorAdversarialLoss,
    FeatureMatchLoss,
    GeneratorAdversarialLoss,
    MelReconLoss,
    MultiResolutionSTFTLoss,
    ProsodyReconLoss,
    SeqCELoss,
    criterion_builder,
)
from kantts_tpu.train.schedulers import multistep_lr, noam_lr


def test_mel_recon_loss_mask_invariance():
    rng = np.random.RandomState(0)
    tgt = rng.randn(2, 10, 4).astype(np.float32)
    dec = rng.randn(2, 10, 4).astype(np.float32)
    lengths = jnp.asarray([10, 6])
    crit = MelReconLoss("mae")
    l1, l2 = crit(lengths, jnp.asarray(tgt), jnp.asarray(dec), jnp.asarray(dec))
    # corrupting the padded region must not change the loss
    dec2 = dec.copy()
    dec2[1, 6:] += 100.0
    l1b, _ = crit(lengths, jnp.asarray(tgt), jnp.asarray(dec2), jnp.asarray(dec2))
    np.testing.assert_allclose(float(l1), float(l1b), rtol=1e-6)
    # manual check
    valid = np.zeros((2, 10, 1)); valid[0, :, 0] = 1; valid[1, :6, 0] = 1
    expected = (np.abs(tgt - dec) * valid).sum() / (16 * 4)
    np.testing.assert_allclose(float(l1), expected, rtol=1e-5)


def test_prosody_recon_loss():
    lengths = jnp.asarray([3, 2])
    dur_t = jnp.asarray([[1.0, 2.0, 3.0], [2.0, 2.0, 0.0]])
    zero = jnp.zeros((2, 3))
    crit = ProsodyReconLoss("mae")
    dur_l, pitch_l, energy_l = crit(lengths, dur_t, zero, zero, zero, zero, zero)
    expected = (np.abs(np.log(np.array([2, 3, 4, 3, 3]))).sum()) / 5
    np.testing.assert_allclose(float(dur_l), expected, rtol=1e-5)
    assert float(pitch_l) == 0.0


def test_adversarial_losses():
    g = GeneratorAdversarialLoss(average_by_discriminators=False)
    outs = [jnp.zeros((2, 5)), jnp.ones((2, 5))]
    np.testing.assert_allclose(float(g(outs)), 1.0)  # (0-1)^2 + (1-1)^2
    d = DiscriminatorAdversarialLoss(average_by_discriminators=False)
    real, fake = d([jnp.zeros((2, 5))], [jnp.ones((2, 5))])
    np.testing.assert_allclose(float(real), 0.0)
    np.testing.assert_allclose(float(fake), 0.0)
    real, fake = d([jnp.ones((2, 5))], [jnp.zeros((2, 5))])
    np.testing.assert_allclose(float(real), 1.0)
    np.testing.assert_allclose(float(fake), 1.0)

    gh = GeneratorAdversarialLoss(loss_type="hinge")
    np.testing.assert_allclose(float(gh(jnp.full((2, 2), 3.0))), -3.0)


def test_feature_match_loss():
    f_real = [[jnp.zeros((2, 3))], [jnp.zeros((2, 3))]]
    f_fake = [[jnp.ones((2, 3))], [jnp.full((2, 3), 2.0)]]
    crit = FeatureMatchLoss(average_by_layers=False, average_by_discriminators=False)
    np.testing.assert_allclose(float(crit(f_fake, f_real)), 3.0)


def test_multires_stft_loss_zero_for_identical():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 2000).astype(np.float32))
    crit = MultiResolutionSTFTLoss(fft_sizes=(256,), hop_sizes=(64,), win_lengths=(128,))
    sc, mag = crit(x, x)
    assert float(sc) < 1e-6 and float(mag) < 1e-6


def test_seq_ce_loss():
    logits = jnp.asarray([[[10.0, 0.0], [0.0, 10.0]]])
    targets = jnp.asarray([[0, 0]])
    masks = jnp.asarray([[1.0, 1.0]])
    crit = SeqCELoss()
    loss, err = crit(logits, targets, masks)
    assert float(err) == 0.5
    assert float(loss) > 0


def test_attention_binarization_warmup():
    hard = jnp.ones((1, 1, 4, 3))
    soft = jnp.full((1, 1, 4, 3), 0.5)
    crit = AttentionBinarizationLoss(start_epoch=2, warmup_epoch=10)
    assert float(crit(0, hard, soft)) == 0.0
    l7 = float(crit(7, hard, soft))
    l12 = float(crit(12, hard, soft))
    np.testing.assert_allclose(l7, -np.log(0.5) * 0.5, rtol=1e-5)
    np.testing.assert_allclose(l12, -np.log(0.5), rtol=1e-5)


def test_attention_ctc_matches_torch():
    rng = np.random.RandomState(0)
    B, T_mel, T_text = 2, 12, 5
    attn_logprob = rng.randn(B, 1, T_mel, T_text).astype(np.float32)
    in_lens = np.array([5, 3])
    out_lens = np.array([12, 9])

    ours = float(AttentionCTCLoss()(
        jnp.asarray(attn_logprob), jnp.asarray(in_lens), jnp.asarray(out_lens)
    ))

    # torch reference computation (per-sample, as reference loss.py:488-508)
    t = torch.from_numpy(attn_logprob)
    padded = torch.nn.functional.pad(t, (1, 0), value=-1.0)
    ctc = torch.nn.CTCLoss(zero_infinity=True)
    total = 0.0
    for b in range(B):
        target_seq = torch.arange(1, in_lens[b] + 1).unsqueeze(0)
        curr = padded[b].permute(1, 0, 2)[: out_lens[b], :, : in_lens[b] + 1]
        curr = torch.nn.functional.log_softmax(curr[None], dim=3)[0]
        total += ctc(
            curr, target_seq,
            input_lengths=torch.tensor([out_lens[b]]),
            target_lengths=torch.tensor([in_lens[b]]),
        )
    expected = float(total / B)
    np.testing.assert_allclose(ours, expected, rtol=1e-4)


def test_criterion_builder():
    config = {
        "Loss": {
            "generator_adv_loss": {"enable": True,
                                   "params": {"average_by_discriminators": False},
                                   "weights": 1.0},
            "discriminator_adv_loss": {"enable": True,
                                       "params": {"average_by_discriminators": False}},
            "stft_loss": {"enable": False},
            "mel_loss": {"enable": True,
                         "params": {"fs": 16000, "fft_size": 2048, "hop_size": 200,
                                    "win_length": 1000, "window": "hann",
                                    "num_mels": 80, "fmin": 0, "fmax": 8000,
                                    "log_base": None},
                         "weights": 45.0},
            "feat_match_loss": {"enable": True, "weights": 2.0},
        }
    }
    crit = criterion_builder(config)
    assert set(crit) == {"generator_adv_loss", "discriminator_adv_loss",
                         "mel_loss", "feat_match_loss"}
    assert crit["mel_loss"].weights == 45.0
    assert crit["feat_match_loss"].weights == 2.0


def test_noam_schedule_matches_reference_formula():
    sched = noam_lr(0.001, 4000)
    for step in [0, 1, 100, 4000, 100000]:
        last_epoch = max(1, step)
        expected = 0.001 * (4000 ** 0.5 * min(last_epoch ** -0.5,
                                              last_epoch * 4000 ** -1.5))
        np.testing.assert_allclose(float(sched(jnp.asarray(step))), expected,
                                   rtol=1e-6)


def test_multistep_schedule():
    sched = multistep_lr(2e-4, [200000, 400000], 0.5)
    np.testing.assert_allclose(float(sched(jnp.asarray(0))), 2e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(jnp.asarray(200000))), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(jnp.asarray(500000))), 5e-5, rtol=1e-6)
