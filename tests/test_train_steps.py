"""Train-step smoke tests: one jitted step updates params, losses are finite
and decrease over a few steps on a fixed batch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kantts_tpu.losses import criterion_builder
from kantts_tpu.models.hifigan.discriminators import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)
from kantts_tpu.models.hifigan.generator import Generator
from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT
from kantts_tpu.train.optim import optimizer_builder
from kantts_tpu.train.states import GanTrainState, TrainState
from kantts_tpu.train.steps import make_gan_step, make_sambert_step, make_sybert_step
from tests.test_sambert import TINY

GEN_CFG = dict(
    in_channels=20, out_channels=1, channels=32, kernel_size=7,
    upsample_scales=(4, 4), upsample_kernal_sizes=(8, 8),
    resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
)

LOSS_CFG = {
    "Loss": {
        "generator_adv_loss": {"enable": True,
                               "params": {"average_by_discriminators": False},
                               "weights": 1.0},
        "discriminator_adv_loss": {"enable": True,
                                   "params": {"average_by_discriminators": False},
                                   "weights": 1.0},
        "mel_loss": {"enable": True,
                     "params": {"fs": 1600, "fft_size": 256, "hop_size": 64,
                                "win_length": 128, "window": "hann",
                                "num_mels": 20, "fmin": 0, "fmax": 800,
                                "log_base": None},
                     "weights": 45.0},
        "feat_match_loss": {"enable": True,
                            "params": {"average_by_discriminators": False,
                                       "average_by_layers": False},
                            "weights": 2.0},
    }
}


def build_gan():
    gen = Generator(**GEN_CFG, causal=True)
    discs = {
        "MultiScaleDiscriminator": MultiScaleDiscriminator(
            discriminator_params={"channels": 16, "max_downsample_channels": 32,
                                  "max_groups": 4,
                                  "downsample_scales": [2, 2, 1]},
            follow_official_norm=True,
        ),
        "MultiPeriodDiscriminator": MultiPeriodDiscriminator(
            periods=(2, 3),
            discriminator_params={"channels": 4, "max_downsample_channels": 8,
                                  "downsample_scales": [3, 3, 1]},
        ),
    }
    return gen, discs


@pytest.mark.slow
def test_gan_train_step():
    rng = np.random.RandomState(0)
    B, frames = 2, 8
    mel = jnp.asarray(rng.randn(B, frames, 20).astype(np.float32))
    wav = jnp.asarray(0.3 * rng.randn(B, frames * 16, 1).astype(np.float32))

    gen, discs = build_gan()
    criterion = criterion_builder(LOSS_CFG)
    gen_params = gen.init(jax.random.PRNGKey(0), mel)["params"]

    disc_params, spectral = {}, {}
    for i, (name, d) in enumerate(discs.items()):
        variables = d.init(jax.random.PRNGKey(i + 1), wav)
        disc_params[name] = variables["params"]
        spectral[name] = variables.get("spectral", {})

    opt_cfg = {"type": "Adam", "params": {"lr": 2e-4, "betas": [0.5, 0.9]}}
    gen_tx, _ = optimizer_builder(opt_cfg, None)
    disc_txs = {n: optimizer_builder(opt_cfg, None)[0] for n in discs}

    state = GanTrainState(
        gen_params, gen_tx.init(gen_params),
        disc_params, {n: disc_txs[n].init(disc_params[n]) for n in discs},
        spectral, jnp.asarray(0, dtype=jnp.int32),
    )

    step_fn = make_gan_step(gen, discs, criterion, gen_tx, disc_txs,
                            train_generator=True, include_adversarial=True)
    state2, metrics = step_fn(state, wav, mel, jax.random.PRNGKey(7))

    assert int(state2.step) == 1
    for k in ["generator_loss", "mel_loss", "adversarial_loss",
              "feature_matching_loss", "discriminator_loss", "real_loss",
              "fake_loss"]:
        assert np.isfinite(float(metrics[k])), k
    # params changed for both G and D
    leaf0 = jax.tree_util.tree_leaves(state2.gen_params)[0]
    # run a couple more steps; mel loss should move
    m0 = float(metrics["mel_loss"])
    state3, metrics3 = step_fn(state2, wav, mel, jax.random.PRNGKey(8))
    state4, metrics4 = step_fn(state3, wav, mel, jax.random.PRNGKey(9))
    assert float(metrics4["mel_loss"]) < m0 * 1.05


@pytest.mark.slow
def test_gan_step_warmup_gates():
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(1, 8, 20).astype(np.float32))
    wav = jnp.asarray(0.3 * rng.randn(1, 8 * 16, 1).astype(np.float32))

    gen, discs = build_gan()
    criterion = criterion_builder(LOSS_CFG)
    gen_params = gen.init(jax.random.PRNGKey(0), mel)["params"]
    disc_params, spectral = {}, {}
    for i, (name, d) in enumerate(discs.items()):
        variables = d.init(jax.random.PRNGKey(i + 1), wav)
        disc_params[name] = variables["params"]
        spectral[name] = variables.get("spectral", {})
    opt_cfg = {"type": "Adam", "params": {"lr": 2e-4}}
    gen_tx, _ = optimizer_builder(opt_cfg, None)
    disc_txs = {n: optimizer_builder(opt_cfg, None)[0] for n in discs}
    state = GanTrainState(
        gen_params, gen_tx.init(gen_params),
        disc_params, {n: disc_txs[n].init(disc_params[n]) for n in discs},
        spectral, jnp.asarray(0, dtype=jnp.int32),
    )

    # no adversarial yet: only recon losses, discriminator untouched
    d0 = np.asarray(jax.tree_util.tree_leaves(state.disc_params)[0])  # before donation
    step_fn = make_gan_step(gen, discs, criterion, gen_tx, disc_txs,
                            train_generator=True, include_adversarial=False)
    state2, metrics = step_fn(state, wav, mel, jax.random.PRNGKey(7))
    assert "adversarial_loss" not in metrics
    assert "discriminator_loss" not in metrics
    d1 = jax.tree_util.tree_leaves(state2.disc_params)[0]
    np.testing.assert_array_equal(d0, np.asarray(d1))


@pytest.mark.slow
def test_gan_train_step_multiband():
    """Multiband path (out_channels=4 + PQMF + subband_stft_loss) in the
    jitted GAN step: finite losses, and the reference's 0.5/0.5 re-weighting
    (full-band stft halved, sub-band added at 0.5 — reference
    trainer.py:484-511) holds exactly in the reported metrics."""
    from kantts_tpu.models.pqmf import PQMF

    rng = np.random.RandomState(0)
    B, frames, subbands = 2, 8, 4
    hop_sub = 16  # generator upsampling (4*4): sub-band samples per frame
    mel = jnp.asarray(rng.randn(B, frames, 20).astype(np.float32))
    wav = jnp.asarray(
        0.3 * rng.randn(B, frames * hop_sub * subbands, 1).astype(np.float32))

    gen = Generator(**{**GEN_CFG, "out_channels": subbands}, causal=True)
    _, discs = build_gan()
    pqmf = PQMF(subbands=subbands)
    stft_params = {"fft_sizes": [64, 128], "hop_sizes": [16, 32],
                   "win_lengths": [32, 64], "window": "hann_window"}
    criterion = criterion_builder({
        "Loss": {
            **LOSS_CFG["Loss"],
            "stft_loss": {"enable": True, "params": dict(stft_params),
                          "weights": 0.5},
            "subband_stft_loss": {"enable": True, "params": dict(stft_params),
                                  "weights": 0.5},
        }
    })
    gen_params = gen.init(jax.random.PRNGKey(0), mel)["params"]
    disc_params, spectral = {}, {}
    for i, (name, d) in enumerate(discs.items()):
        variables = d.init(jax.random.PRNGKey(i + 1), wav)
        disc_params[name] = variables["params"]
        spectral[name] = variables.get("spectral", {})
    opt_cfg = {"type": "Adam", "params": {"lr": 2e-4, "betas": [0.5, 0.9]}}
    gen_tx, _ = optimizer_builder(opt_cfg, None)
    disc_txs = {n: optimizer_builder(opt_cfg, None)[0] for n in discs}
    state = GanTrainState(
        gen_params, gen_tx.init(gen_params),
        disc_params, {n: disc_txs[n].init(disc_params[n]) for n in discs},
        spectral, jnp.asarray(0, dtype=jnp.int32),
    )
    step_fn = make_gan_step(gen, discs, criterion, gen_tx, disc_txs, pqmf=pqmf,
                            train_generator=True, include_adversarial=True)
    g0 = np.asarray(jax.tree_util.tree_leaves(state.gen_params)[0]).copy()
    state2, metrics = step_fn(state, wav, mel, jax.random.PRNGKey(7))

    for k in ["generator_loss", "mel_loss", "adversarial_loss",
              "feature_matching_loss", "discriminator_loss",
              "spectral_convergence_loss", "log_stft_magnitude_loss",
              "sub_spectral_convergence_loss", "sub_log_stft_magnitude_loss"]:
        assert np.isfinite(float(metrics[k])), k
    # the re-weighting identity from the reported parts
    expected = (
        0.5 * (float(metrics["spectral_convergence_loss"])
               + float(metrics["log_stft_magnitude_loss"]))
        * criterion["stft_loss"].weights
        + 0.5 * (float(metrics["sub_spectral_convergence_loss"])
                 + float(metrics["sub_log_stft_magnitude_loss"]))
        + float(metrics["mel_loss"]) * criterion["mel_loss"].weights
        + float(metrics["adversarial_loss"])
        * criterion["generator_adv_loss"].weights
        + float(metrics["feature_matching_loss"])
        * criterion["feat_match_loss"].weights
    )
    np.testing.assert_allclose(float(metrics["generator_loss"]), expected,
                               rtol=1e-5)
    g1 = np.asarray(jax.tree_util.tree_leaves(state2.gen_params)[0])
    assert not np.array_equal(g0, g1)


@pytest.mark.slow
def test_duration_head_bias_init_trains_on_short_durations():
    """With the reference-faithful zero bias init, relu(fc) starts (near-)
    saturated on short-duration corpora — under torch's init it is exactly
    dead (dur_loss pinned at log 2; documented footgun, reference
    adaptors.py:60-83, PERFORMANCE.md), under ours partially so.
    ``dur_pred_bias_init: 1.0`` starts the head in the active regime; this
    guards that the flag exists, is honored, and measurably accelerates
    duration training on an all-durations=1 batch."""
    rng = np.random.RandomState(0)
    B, T_in = 2, 12
    T_mel = T_in  # durations all 1
    batch = {
        "input_lings": jnp.asarray(rng.randint(0, 5, (B, T_in, 4)), dtype=jnp.int32),
        "input_emotions": jnp.asarray(rng.randint(0, 4, (B, T_in)), dtype=jnp.int32),
        "input_speakers": jnp.asarray(rng.randint(0, 2, (B, T_in)), dtype=jnp.int32),
        "valid_input_lengths": jnp.asarray([T_in, T_in]),
        "valid_output_lengths": jnp.asarray([T_mel, T_mel]),
        "mel_targets": jnp.asarray(rng.randn(B, T_mel, 10).astype(np.float32)),
        "pitch_contours": jnp.asarray(np.abs(rng.randn(B, T_in)).astype(np.float32)),
        "energy_contours": jnp.asarray(np.abs(rng.randn(B, T_in)).astype(np.float32)),
        "durations": jnp.ones((B, T_in), dtype=jnp.float32),
    }
    criterion = criterion_builder({
        "Loss": {"MelReconLoss": {"enable": True, "params": {"loss_type": "mae"}},
                 "ProsodyReconLoss": {"enable": True, "params": {"loss_type": "mae"}}}
    })

    def run(bias_init, n_steps=30):
        model = KanTtsSAMBERT({**TINY, "dur_pred_bias_init": bias_init})
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch["input_lings"], batch["input_emotions"],
            batch["input_speakers"], batch["valid_input_lengths"],
            batch["valid_output_lengths"], batch["mel_targets"],
            duration_targets=batch["durations"],
            pitch_targets=batch["pitch_contours"],
            energy_targets=batch["energy_contours"], deterministic=False,
        )
        tx, _ = optimizer_builder(
            {"type": "Adam", "params": {"lr": 1e-3}}, None)
        state = TrainState(variables["params"], tx.init(variables["params"]),
                           jnp.asarray(0, dtype=jnp.int32))
        step_fn = make_sambert_step(model, criterion, tx, with_mas=False,
                                    fp_enable=False)
        dur_losses = []
        for i in range(n_steps):
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(i), 0)
            dur_losses.append(float(metrics["dur_loss"]))
        return dur_losses

    dead = run(0.0)
    alive = run(1.0)
    # zero init starts at the saturated plateau (prediction 0 everywhere the
    # relu is off -> loss ~= log(1+1))
    assert abs(dead[0] - np.log(2.0)) < 0.01
    # positive init trains the head markedly further in the same steps
    assert alive[-1] < alive[0] * 0.8
    assert alive[-1] < dead[-1] * 0.75, (alive[-1], dead[-1])


@pytest.mark.slow
def test_sambert_train_step_decreases_loss():
    from tests.test_sambert import train_batch  # fixture function, build inline

    rng = np.random.RandomState(0)
    B, T_in, T_mel = 2, 12, 24
    batch = {
        "input_lings": jnp.asarray(rng.randint(0, 5, (B, T_in, 4)), dtype=jnp.int32),
        "input_emotions": jnp.asarray(rng.randint(0, 4, (B, T_in)), dtype=jnp.int32),
        "input_speakers": jnp.asarray(rng.randint(0, 2, (B, T_in)), dtype=jnp.int32),
        "valid_input_lengths": jnp.asarray([12, 9]),
        "valid_output_lengths": jnp.asarray([24, 17]),
        "mel_targets": jnp.asarray(rng.randn(B, T_mel, 10).astype(np.float32)),
        "pitch_contours": jnp.asarray(np.abs(rng.randn(B, T_in)).astype(np.float32)),
        "energy_contours": jnp.asarray(np.abs(rng.randn(B, T_in)).astype(np.float32)),
    }
    dur = np.zeros((B, T_in), dtype=np.float32)
    dur[0] = 2
    dur[1, :9] = [2, 2, 2, 2, 2, 2, 2, 2, 1]
    dur[1, 9] = 7
    batch["durations"] = jnp.asarray(dur)

    model = KanTtsSAMBERT(TINY)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_lings"], batch["input_emotions"], batch["input_speakers"],
        batch["valid_input_lengths"], batch["valid_output_lengths"],
        batch["mel_targets"], duration_targets=batch["durations"],
        pitch_targets=batch["pitch_contours"],
        energy_targets=batch["energy_contours"], deterministic=False,
    )
    criterion = criterion_builder({
        "Loss": {"MelReconLoss": {"enable": True, "params": {"loss_type": "mae"}},
                 "ProsodyReconLoss": {"enable": True, "params": {"loss_type": "mae"}}}
    })
    tx, _ = optimizer_builder(
        {"type": "Adam", "params": {"lr": 1e-3, "betas": [0.9, 0.98], "eps": 1e-9}},
        {"type": "NoamLR", "params": {"warmup_steps": 10}},
        grad_norm=1.0,
    )
    state = TrainState(variables["params"], tx.init(variables["params"]),
                       jnp.asarray(0, dtype=jnp.int32))
    step_fn = make_sambert_step(model, criterion, tx, with_mas=False,
                                fp_enable=False)

    losses = []
    for i in range(8):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i), 0)
        losses.append(float(metrics["TotalLoss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]

    eval_fn = make_sambert_step(model, criterion, tx, with_mas=False,
                                fp_enable=False, train=False)
    emetrics = eval_fn(state, batch, 0)
    assert np.isfinite(float(emetrics["TotalLoss"]))


def test_sybert_step():
    from kantts_tpu.models.sambert.sambert import KanTtsTextsyBERT
    from kantts_tpu.losses import criterion_builder

    rng = np.random.RandomState(0)
    B, T = 2, 10
    batch = {
        "input_lings": jnp.asarray(rng.randint(0, 5, (B, T, 4)), dtype=jnp.int32),
        "valid_input_lengths": jnp.asarray([10, 8]),
        "targets": jnp.asarray(rng.randint(0, TINY["sy"], (B, T)), dtype=jnp.int32),
        "loss_masks": jnp.asarray(rng.randint(0, 2, (B, T)).astype(np.float32)),
    }
    model = KanTtsTextsyBERT(TINY)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_lings"], batch["valid_input_lengths"], deterministic=False,
    )
    criterion = criterion_builder(
        {"Loss": {"SeqCELoss": {"enable": True, "params": {"loss_type": "ce"}}}}
    )
    tx, _ = optimizer_builder({"type": "Adam", "params": {"lr": 1e-3}}, None)
    state = TrainState(variables["params"], tx.init(variables["params"]),
                       jnp.asarray(0, dtype=jnp.int32))
    step_fn = make_sybert_step(model, criterion, tx)
    losses = []
    for i in range(5):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_sambert_se_train_step():
    """SE=true training: the speaker input is a float d-vector sequence
    (reference kantts_sambert.py:770-778, dataset.py:760-771) rather than an
    id track — the optimizer step must train through it (VarianceAdaptor and
    decoder consume the d-vector directly; there is no spk embedding table).
    Two distinct speakers in the batch exercise multi-speaker conditioning
    under training."""
    rng = np.random.RandomState(1)
    B, T_in, T_mel = 2, 12, 24
    se = rng.randn(2, TINY["speaker_units"]).astype(np.float32)  # 2 speakers
    batch = {
        "input_lings": jnp.asarray(rng.randint(0, 5, (B, T_in, 4)), dtype=jnp.int32),
        "input_emotions": jnp.asarray(rng.randint(0, 4, (B, T_in)), dtype=jnp.int32),
        "input_speakers": jnp.asarray(
            np.stack([np.repeat(se[i][None, :], T_in, axis=0) for i in range(B)])),
        "valid_input_lengths": jnp.asarray([12, 9]),
        "valid_output_lengths": jnp.asarray([24, 17]),
        "mel_targets": jnp.asarray(rng.randn(B, T_mel, 10).astype(np.float32)),
        "pitch_contours": jnp.asarray(np.abs(rng.randn(B, T_in)).astype(np.float32)),
        "energy_contours": jnp.asarray(np.abs(rng.randn(B, T_in)).astype(np.float32)),
    }
    dur = np.full((B, T_in), 2, dtype=np.float32)
    dur[1, 9:] = 0
    dur[1, 8] = 3
    batch["durations"] = jnp.asarray(dur)

    model = KanTtsSAMBERT(dict(TINY, SE=True))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["input_lings"], batch["input_emotions"], batch["input_speakers"],
        batch["valid_input_lengths"], batch["valid_output_lengths"],
        batch["mel_targets"], duration_targets=batch["durations"],
        pitch_targets=batch["pitch_contours"],
        energy_targets=batch["energy_contours"], deterministic=False,
    )
    assert "spk_tokenizer" not in variables["params"]
    criterion = criterion_builder({
        "Loss": {"MelReconLoss": {"enable": True, "params": {"loss_type": "mae"}},
                 "ProsodyReconLoss": {"enable": True, "params": {"loss_type": "mae"}}}
    })
    tx, _ = optimizer_builder(
        {"type": "Adam", "params": {"lr": 1e-3, "betas": [0.9, 0.98], "eps": 1e-9}},
        {"type": "NoamLR", "params": {"warmup_steps": 10}},
        grad_norm=1.0,
    )
    state = TrainState(variables["params"], tx.init(variables["params"]),
                       jnp.asarray(0, dtype=jnp.int32))
    step_fn = make_sambert_step(model, criterion, tx, with_mas=False,
                                fp_enable=False)
    losses = []
    for i in range(8):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i), 0)
        losses.append(float(metrics["TotalLoss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]

    # conditioning is live: the two speakers' d-vectors produce different mels
    res = model.apply(
        {"params": state.params},
        batch["input_lings"][:1].repeat(2, 0),
        batch["input_emotions"][:1].repeat(2, 0),
        jnp.asarray(np.stack([np.repeat(se[i][None, :], T_in, axis=0)
                              for i in range(2)])),
        jnp.asarray([12, 12]), jnp.asarray([24, 24]),
        batch["mel_targets"][:1].repeat(2, 0),
        duration_targets=batch["durations"][:1].repeat(2, 0),
        pitch_targets=batch["pitch_contours"][:1].repeat(2, 0),
        energy_targets=batch["energy_contours"][:1].repeat(2, 0),
        deterministic=True,
    )
    out = np.asarray(res["postnet_outputs"])
    assert np.abs(out[0] - out[1]).max() > 1e-4
