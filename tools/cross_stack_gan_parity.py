"""Cross-stack GAN training parity: run the torch REFERENCE HiFi-GAN
adversarial loop and kantts_tpu's jitted GAN step on the SAME corpus from
IDENTICAL initial weights (generator AND discriminators converted via
utils/torch_convert), with the same losses, optimizers, and warmup-gate
semantics, then compare G/D loss trajectories and the mel-spectral distance
between the two stacks' generated audio.

This covers exactly what SURVEY §7.3 flags as convergence-sensitive in the
GAN stack: per-discriminator-family optimizers, the feature-matching no-grad
real pass, and the "regenerate y_ with the updated generator" trick
(reference trainer.py:469-589, 557-562).

Scope notes:
- MSD uses AvgPool inter-scale pooling and follow_official_norm=False here:
  torch's spectral-norm power iteration advances once per FORWARD (3x per
  step, order-dependent) while ours advances once per D update, so
  spectral-norm trajectories are not 1:1 comparable — weight-norm-only keeps
  the comparison exact. (Forward parity of the spectral path is covered by
  tests/test_torch_parity.py.)
- Weight norm trains as (g, v) in both stacks (same reparametrization), so
  optimizer dynamics match parameter-for-parameter.

Run (CPU): JAX_PLATFORMS=cpu python tools/cross_stack_gan_parity.py [steps]
Writes cross_stack_gan_parity.json next to this file and prints a table.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

from tests.test_torch_parity import _install_stubs


def _argv_steps(default=200):
    try:
        return int(sys.argv[1])
    except (IndexError, ValueError):
        return default


N_STEPS = _argv_steps()
LOG_EVERY = max(1, N_STEPS // 10)
B = 4
HOP = 64  # generator upsampling 8*8 == mel hop, copy-synthesis geometry
FRAMES = 16
T = FRAMES * HOP
N_MELS = 20
LR = 2e-4

GEN_CFG = dict(
    in_channels=N_MELS, out_channels=1, channels=32, kernel_size=7,
    upsample_scales=(8, 8), upsample_kernal_sizes=(16, 16),
    resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),), causal=True,
)
MPD_PERIODS = (2, 3)
MPD_PARAMS = {"channels": 4, "max_downsample_channels": 8,
              "downsample_scales": [3, 3, 1]}
MSD_PARAMS = {"channels": 16, "max_downsample_channels": 32, "max_groups": 4,
              "downsample_scales": [2, 2, 1]}
MEL_PARAMS = dict(fs=1600, fft_size=256, hop_size=64, win_length=128,
                  window="hann", num_mels=N_MELS, fmin=0, fmax=800,
                  log_base=None)
W_MEL, W_ADV, W_FM = 45.0, 1.0, 2.0


def make_corpus():
    """Deterministic harmonic waveforms + their actual loss-mel features as
    generator input (copy-synthesis semantics)."""
    import jax.numpy as jnp

    from kantts_tpu.dsp.mel import LossMelSpectrogram

    rng = np.random.RandomState(0)
    t = np.arange(T) / 1600.0
    wavs = []
    for i in range(B):
        f0 = 55.0 * (i + 2)
        wav = sum(0.3 / (h + 1) * np.sin(2 * np.pi * f0 * (h + 1) * t + i)
                  for h in range(3))
        wavs.append(wav + 0.01 * rng.randn(T))
    wav = np.stack(wavs).astype(np.float32)
    mel_fn = LossMelSpectrogram(**MEL_PARAMS)
    mel = np.asarray(mel_fn(jnp.asarray(wav))).transpose(0, 2, 1)  # (B, F, C)
    # static frame count for the tiny generator: crop/pad to FRAMES
    mel = mel[:, :FRAMES, :].astype(np.float32)
    return wav, mel


def train_torch(wav, mel, n_steps):
    import torch
    from kantts.models.hifigan.hifigan import (
        Generator as TorchGenerator,
        MultiPeriodDiscriminator as TorchMPD,
        MultiScaleDiscriminator as TorchMSD,
    )
    from kantts.train.loss import (
        DiscriminatorAdversarialLoss,
        FeatureMatchLoss,
        GeneratorAdversarialLoss,
        MelSpectrogramLoss,
    )

    torch.manual_seed(0)
    gen = TorchGenerator(**GEN_CFG)
    mpd = TorchMPD(periods=list(MPD_PERIODS), discriminator_params={
        "in_channels": 1, "out_channels": 1, "kernel_sizes": [5, 3],
        "bias": True, "nonlinear_activation": "LeakyReLU",
        "nonlinear_activation_params": {"negative_slope": 0.1},
        "use_spectral_norm": False, **MPD_PARAMS})
    msd = TorchMSD(
        scales=3, downsample_pooling="AvgPool1d",
        discriminator_params={
            "in_channels": 1, "out_channels": 1, "kernel_sizes": [15, 41, 5, 3],
            "bias": True, "nonlinear_activation": "LeakyReLU",
            "nonlinear_activation_params": {"negative_slope": 0.1},
            **MSD_PARAMS},
        follow_official_norm=False)
    sd = {
        "generator": {k: v.detach().numpy().copy()
                      for k, v in gen.state_dict().items()},
        "mpd": {k: v.detach().numpy().copy()
                for k, v in mpd.state_dict().items()},
        "msd": {k: v.detach().numpy().copy()
                for k, v in msd.state_dict().items()},
    }

    mel_crit = MelSpectrogramLoss(**MEL_PARAMS)
    gadv = GeneratorAdversarialLoss(average_by_discriminators=False)
    dadv = DiscriminatorAdversarialLoss(average_by_discriminators=False)
    fm = FeatureMatchLoss(average_by_discriminators=False,
                          average_by_layers=False)

    g_opt = torch.optim.Adam(gen.parameters(), lr=LR, betas=(0.5, 0.9))
    d_opts = {"msd": torch.optim.Adam(msd.parameters(), lr=LR, betas=(0.5, 0.9)),
              "mpd": torch.optim.Adam(mpd.parameters(), lr=LR, betas=(0.5, 0.9))}
    discs = {"msd": msd, "mpd": mpd}

    y = torch.from_numpy(wav)[:, None, :]          # (B, 1, T)
    x = torch.from_numpy(mel).transpose(1, 2)      # (B, C, F)

    traj = {}
    for step in range(1, n_steps + 1):
        # ---- G step (reference trainer.py:473-553)
        y_ = gen(x)
        gen_loss = 0.0
        mel_l = mel_crit(y_, y)
        gen_loss = gen_loss + mel_l * W_MEL
        adv = 0.0
        fmap_fake = {}
        for name, d in discs.items():
            p_, f_ = d(y_)
            fmap_fake[name] = f_
            adv = adv + gadv(p_)
        gen_loss = gen_loss + adv * W_ADV
        fm_loss = 0.0
        for name, d in discs.items():
            with torch.no_grad():
                _, f_real = d(y)
            fm_loss = fm_loss + fm(fmap_fake[name], f_real)
        gen_loss = gen_loss + fm_loss * W_FM
        g_opt.zero_grad()
        gen_loss.backward()
        g_opt.step()

        # ---- D step: regenerate with the UPDATED generator (trainer.py:557-562)
        with torch.no_grad():
            y_ = gen(x)
        dis_loss = 0.0
        for name, d in discs.items():
            p_real, _ = d(y)
            p_fake, _ = d(y_.detach())
            real_l, fake_l = dadv(p_fake, p_real)
            dis_loss = dis_loss + real_l + fake_l
        for opt in d_opts.values():
            opt.zero_grad()
        dis_loss.backward()
        for opt in d_opts.values():
            opt.step()

        if step % LOG_EVERY == 0 or step == 1:
            traj[step] = {"gen_loss": float(gen_loss.detach()),
                          "disc_loss": float(dis_loss.detach()),
                          "mel_loss": float(mel_l.detach())}

    with torch.no_grad():
        y_final = gen(x).numpy()[:, 0, :]
    return sd, traj, y_final


def train_jax(wav, mel, sd, n_steps):
    import jax
    import jax.numpy as jnp

    from kantts_tpu.losses import criterion_builder
    from kantts_tpu.models.hifigan.discriminators import (
        MultiPeriodDiscriminator,
        MultiScaleDiscriminator,
    )
    from kantts_tpu.models.hifigan.generator import Generator
    from kantts_tpu.train.optim import optimizer_builder
    from kantts_tpu.train.states import GanTrainState
    from kantts_tpu.train.steps import make_gan_step
    from kantts_tpu.utils.torch_convert import (
        convert_hifigan_generator,
        convert_mpd,
        convert_msd,
    )

    gen = Generator(**GEN_CFG)
    discs = {
        "MultiScaleDiscriminator": MultiScaleDiscriminator(
            downsample_pooling="AvgPool1d",
            discriminator_params=dict(MSD_PARAMS), follow_official_norm=False),
        "MultiPeriodDiscriminator": MultiPeriodDiscriminator(
            periods=MPD_PERIODS, discriminator_params=dict(MPD_PARAMS)),
    }
    criterion = criterion_builder({
        "Loss": {
            "generator_adv_loss": {"enable": True, "weights": W_ADV,
                                   "params": {"average_by_discriminators": False}},
            "discriminator_adv_loss": {"enable": True,
                                       "params": {"average_by_discriminators": False}},
            "mel_loss": {"enable": True, "weights": W_MEL,
                         "params": dict(MEL_PARAMS)},
            "feat_match_loss": {"enable": True, "weights": W_FM,
                                "params": {"average_by_discriminators": False,
                                           "average_by_layers": False}},
        }
    })
    gen_params = convert_hifigan_generator(sd["generator"], GEN_CFG)
    disc_params = {
        "MultiScaleDiscriminator": convert_msd(
            sd["msd"], scales=3, n_downs=len(MSD_PARAMS["downsample_scales"])),
        "MultiPeriodDiscriminator": convert_mpd(
            sd["mpd"], MPD_PERIODS,
            n_downs=len(MPD_PARAMS["downsample_scales"])),
    }
    spectral = {n: {} for n in discs}
    opt_cfg = {"type": "Adam", "params": {"lr": LR, "betas": [0.5, 0.9]}}
    gen_tx, _ = optimizer_builder(opt_cfg, None)
    disc_txs = {n: optimizer_builder(opt_cfg, None)[0] for n in discs}
    state = GanTrainState(
        gen_params, gen_tx.init(gen_params),
        disc_params, {n: disc_txs[n].init(disc_params[n]) for n in discs},
        spectral, jnp.asarray(0, dtype=jnp.int32),
    )
    step_fn = make_gan_step(gen, discs, criterion, gen_tx, disc_txs,
                            train_generator=True, include_adversarial=True)
    jw = jnp.asarray(wav)[..., None]  # (B, T, 1)
    jm = jnp.asarray(mel)             # (B, F, C)

    traj = {}
    for step in range(1, n_steps + 1):
        state, metrics = step_fn(state, jw, jm, jax.random.PRNGKey(step))
        if step % LOG_EVERY == 0 or step == 1:
            traj[step] = {"gen_loss": float(metrics["generator_loss"]),
                          "disc_loss": float(metrics["discriminator_loss"]),
                          "mel_loss": float(metrics["mel_loss"])}

    y_final = np.asarray(gen.apply({"params": state.gen_params}, jm))[..., 0]
    return traj, y_final


def mel_distance(a_wav, b_wav):
    """Mean |log-mel| distance between two audio batches."""
    import jax.numpy as jnp

    from kantts_tpu.dsp.mel import LossMelSpectrogram

    mel_fn = LossMelSpectrogram(**MEL_PARAMS)
    ma = np.asarray(mel_fn(jnp.asarray(a_wav)))
    mb = np.asarray(mel_fn(jnp.asarray(b_wav)))
    return float(np.mean(np.abs(ma - mb)))


def main():
    _install_stubs()
    wav, mel = make_corpus()
    print(f"adversarial training, both stacks, {N_STEPS} steps (B={B}, "
          f"identical init incl. discriminators, Adam lr={LR}) ...")
    sd, traj_t, y_t = train_torch(wav, mel, N_STEPS)
    traj_j, y_j = train_jax(wav, mel, sd, N_STEPS)

    rows = [(s, traj_t[s]["gen_loss"], traj_j[s]["gen_loss"],
             traj_t[s]["disc_loss"], traj_j[s]["disc_loss"])
            for s in sorted(traj_t)]
    print("\n| step | G loss (torch) | G loss (kantts_tpu) | D loss (torch) "
          "| D loss (kantts_tpu) |")
    print("|---|---|---|---|---|")
    for s, gt, gj, dt, dj in rows:
        print(f"| {s} | {gt:.4f} | {gj:.4f} | {dt:.4f} | {dj:.4f} |")

    g_rel = abs(rows[-1][1] - rows[-1][2]) / abs(rows[-1][1]) * 100
    d_rel = abs(rows[-1][3] - rows[-1][4]) / abs(rows[-1][3]) * 100
    xstack = mel_distance(y_t, y_j)
    t_tgt = mel_distance(y_t, wav)
    j_tgt = mel_distance(y_j, wav)
    print(f"\nfinal G loss rel diff: {g_rel:.2f}%  |  final D loss rel diff: "
          f"{d_rel:.2f}%")
    print(f"generated-audio log-mel distance: cross-stack {xstack:.4f}  "
          f"(torch vs target {t_tgt:.4f}, kantts_tpu vs target {j_tgt:.4f})")

    out = {
        "n_steps": N_STEPS,
        "trajectory": [
            {"step": s, "gen_torch": gt, "gen_jax": gj,
             "disc_torch": dt, "disc_jax": dj}
            for s, gt, gj, dt, dj in rows
        ],
        "final_gen_loss_rel_diff_pct": g_rel,
        "final_disc_loss_rel_diff_pct": d_rel,
        "generated_mel_distance_cross_stack": xstack,
        "generated_mel_distance_torch_vs_target": t_tgt,
        "generated_mel_distance_jax_vs_target": j_tgt,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "cross_stack_gan_parity.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
