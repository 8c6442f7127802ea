"""Jitted train/eval step factories.

Parity targets:
- SAM-BERT step: /root/reference/kantts/train/trainer.py:898-1005 — one
  optimizer, total = mel(dec)+mel(postnet)+dur+pitch+energy (+FP CE)
  (+MAS CTC+KL), grad-norm clip, Adam+NoamLR.
- GAN step: trainer.py:469-589 — generator losses (multi-res STFT, sub-band
  STFT via PQMF, mel loss, adversarial, feature matching), generator update,
  then ``y_`` REGENERATED from the UPDATED generator under stop_gradient for
  the discriminator step (the reference's quality trick, trainer.py:557-559),
  per-discriminator-family optimizers.

TPU-first: each step is ONE jitted XLA program (forward+backward+update for
all networks); warmup gates (generator/discriminator_train_start_steps) are
STATIC python flags selecting among compiled variants, so there is no traced
control flow. Donated states give in-place buffer reuse.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from kantts_tpu.parallel.mesh import data_sharding, replicated_sharding
from kantts_tpu.train.states import GanTrainState, TrainState


def _jit_step(fn, mesh, n_data_args: int, donate: bool = True,
              state_shardings=None):
    """jit with DP shardings when a mesh is given: arg 0 (state) replicated,
    the next ``n_data_args`` args batch-sharded, the rest replicated.

    ``state_shardings`` (a NamedSharding pytree matching the state arg, e.g.
    from parallel.tp.tp_shardings) switches the state to tensor-parallel
    layout: state in/out sharded over the ``model`` axis, batch still
    sharded over ``data`` — the same step program becomes a DP x TP SPMD
    program on a 2-D mesh.

    Cross-process compile reuse comes from the persistent compilation
    cache enabled package-wide (utils/exec_cache.py) — a resumed training
    segment otherwise re-paid the ~10-minute remote step compile, which
    dominated the sustained-throughput gap."""
    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(fn, donate_argnums=donate_argnums)
    rep = replicated_sharding(mesh)
    dsh = data_sharding(mesh)
    import inspect

    n_args = len(inspect.signature(fn).parameters)
    state_in = state_shardings if state_shardings is not None else rep
    in_shardings = [state_in] + [dsh] * n_data_args
    in_shardings += [rep] * (n_args - len(in_shardings))
    if state_shardings is not None:
        # train steps return (state, metrics); eval steps (donate=False,
        # state untouched) return metrics only
        out_shardings = (state_shardings, rep) if donate else rep
    else:
        out_shardings = rep
    return jax.jit(
        fn, donate_argnums=donate_argnums,
        in_shardings=tuple(in_shardings),
        out_shardings=out_shardings,
    )


def make_sambert_step(
    model,
    criterion: Dict[str, Any],
    tx: optax.GradientTransformation,
    with_mas: bool,
    fp_enable: bool,
    train: bool = True,
    mesh=None,
    fp_dict_lings=None,
    state_shardings=None,
):
    """Returns jitted fn(state, batch, rng, epoch) -> (state, metrics).
    With ``mesh``, the batch is sharded over the ``data`` axis and state is
    replicated (single-program DP). With ``state_shardings`` (see
    parallel.tp), params/optimizer leaves are additionally sharded over the
    ``model`` axis (DP x TP)."""

    # Scheduled sampling vs exposure bias: config key
    # ``scheduled_sampling_prob`` (max replacement probability, 0 = off,
    # classic two-pass sampling on the PNCA prev-mel input) with a linear
    # ramp over ``scheduled_sampling_ramp_steps`` so early training stays
    # fully teacher-forced while the decoder is still random.
    _cfg = getattr(model, "config", {}) or {}
    ss_max = float(_cfg.get("scheduled_sampling_prob", 0.0))
    ss_ramp = float(_cfg.get("scheduled_sampling_ramp_steps", 10_000))

    def compute_losses(params, batch, rng, epoch, deterministic,
                       ss_prob=None):
        rngs = {"dropout": rng} if not deterministic else {}
        res = model.apply(
            {"params": params},
            batch["input_lings"],
            batch["input_emotions"],
            batch["input_speakers"],
            batch["valid_input_lengths"],
            batch["valid_output_lengths"],
            batch["mel_targets"],
            duration_targets=batch.get("durations"),
            pitch_targets=batch["pitch_contours"],
            energy_targets=batch["energy_contours"],
            attn_priors=batch.get("attn_priors"),
            fp_label=batch.get("fp_label"),
            fp_plan=batch.get("fp_plan"),
            fp_dict_lings=(jnp.asarray(fp_dict_lings)
                           if fp_dict_lings is not None else None),
            deterministic=deterministic,
            ss_prob=ss_prob,
            rngs=rngs,
        )
        mel_loss_, mel_loss = criterion["MelReconLoss"](
            batch["valid_output_lengths"], batch["mel_targets"],
            res["dec_outputs"], res["postnet_outputs"],
        )
        dur_loss, pitch_loss, energy_loss = criterion["ProsodyReconLoss"](
            res["valid_inter_lengths"], res["duration_targets"],
            res["pitch_targets"], res["energy_targets"],
            res["log_duration_predictions"], res["pitch_predictions"],
            res["energy_predictions"],
        )
        total = mel_loss_ + mel_loss + dur_loss + pitch_loss + energy_loss
        metrics = {
            "mel_loss_": mel_loss_, "mel_loss": mel_loss, "dur_loss": dur_loss,
            "pitch_loss": pitch_loss, "energy_loss": energy_loss,
            "x_band_width": res["x_band_width"].astype(jnp.float32),
            "h_band_width": res["h_band_width"].astype(jnp.float32),
        }
        if fp_enable:
            fp_loss = criterion["FpCELoss"](
                batch["valid_input_lengths"], res["fp_predictions"],
                batch["fp_label"],
            )
            total = total + fp_loss
            metrics["fp_loss"] = fp_loss
        if with_mas:
            ctc = criterion["AttentionCTCLoss"](
                res["attn_logprob"], batch["valid_input_lengths"],
                batch["valid_output_lengths"],
            )
            kl = criterion["AttentionBinarizationLoss"](
                epoch, res["attn_hard"], res["attn_soft"]
            )
            total = total + ctc + kl
            metrics["attn_ctc_loss"] = ctc
            metrics["attn_kl_loss"] = kl
        metrics["TotalLoss"] = total
        return total, metrics

    if not train:
        def eval_step(state: TrainState, batch, epoch):
            _, metrics = compute_losses(
                state.params, batch, jax.random.PRNGKey(0), epoch, True
            )
            return metrics

        return _jit_step(eval_step, mesh, n_data_args=1, donate=False,
                         state_shardings=state_shardings)

    def train_step(state: TrainState, batch, rng, epoch):
        ss_prob = None
        if ss_max > 0.0:
            ss_prob = ss_max * jnp.minimum(
                state.step.astype(jnp.float32) / ss_ramp, 1.0)
        grad_fn = jax.value_and_grad(
            lambda p: compute_losses(p, batch, rng, epoch, False,
                                     ss_prob=ss_prob), has_aux=True
        )
        (_, metrics), grads = grad_fn(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_opt, state.step + 1),
            metrics,
        )

    return _jit_step(train_step, mesh, n_data_args=1,
                     state_shardings=state_shardings)


def make_gan_step(
    generator,
    discriminators: Dict[str, Any],
    criterion: Dict[str, Any],
    gen_tx: optax.GradientTransformation,
    disc_txs: Dict[str, optax.GradientTransformation],
    pqmf=None,
    train_generator: bool = True,
    include_adversarial: bool = True,
    mesh=None,
):
    """Returns jitted fn(state, wav, mel, rng) -> (state, metrics).

    wav: (B, T, 1) real audio; mel: (B, frames, C) generator input.
    ``train_generator`` / ``include_adversarial`` are static warmup gates
    (reference trainer.py:473,514,556).
    """

    def run_discs(disc_params, spectral, y, update_stats):
        outs, fmaps, new_stats = {}, {}, {}
        for name, disc in discriminators.items():
            variables = {"params": disc_params[name]}
            if name in spectral and spectral[name]:
                variables["spectral"] = spectral[name]
            if update_stats:
                (o, f), mut = disc.apply(
                    variables, y, True, mutable=["spectral"]
                )
                new_stats[name] = mut.get("spectral", {})
            else:
                o, f = disc.apply(variables, y)
                new_stats[name] = spectral.get(name, {})
            outs[name] = o
            fmaps[name] = f
        return outs, fmaps, new_stats

    def generator_losses(gen_params, disc_params, spectral, wav, mel, rng):
        y_ = generator.apply({"params": gen_params}, mel, rngs={"noise": rng})
        if pqmf is not None:
            y_mb_ = y_
            y_full = pqmf.synthesis(y_mb_)
        else:
            y_mb_ = None
            y_full = y_

        gen_loss = 0.0
        metrics = {}
        yt = wav[..., 0]
        yt_ = y_full[..., 0]

        if "stft_loss" in criterion:
            sc, mag = criterion["stft_loss"](yt_, yt)
            gen_loss += (sc + mag) * criterion["stft_loss"].weights
            metrics["spectral_convergence_loss"] = sc
            metrics["log_stft_magnitude_loss"] = mag

        if "subband_stft_loss" in criterion and pqmf is not None:
            gen_loss *= 0.5
            y_mb = pqmf.analysis(wav)
            sub_sc, sub_mag = criterion["subband_stft_loss"](
                jnp.swapaxes(y_mb_, 1, 2), jnp.swapaxes(y_mb, 1, 2)
            )
            gen_loss += 0.5 * (sub_sc + sub_mag)
            metrics["sub_spectral_convergence_loss"] = sub_sc
            metrics["sub_log_stft_magnitude_loss"] = sub_mag

        if "mel_loss" in criterion:
            mel_l = criterion["mel_loss"](yt_, yt)
            gen_loss += mel_l * criterion["mel_loss"].weights
            metrics["mel_loss"] = mel_l

        if include_adversarial:
            fake_outs, fake_fmaps, _ = run_discs(
                disc_params, spectral, y_full, update_stats=False
            )
            adv = 0.0
            for name in discriminators:
                adv += criterion["generator_adv_loss"](fake_outs[name])
            gen_loss += adv * criterion["generator_adv_loss"].weights
            metrics["adversarial_loss"] = adv

            if "feat_match_loss" in criterion:
                _, real_fmaps, _ = run_discs(
                    jax.lax.stop_gradient(disc_params), spectral, wav,
                    update_stats=False,
                )
                fm = 0.0
                for name in discriminators:
                    fm += criterion["feat_match_loss"](
                        fake_fmaps[name], real_fmaps[name]
                    )
                gen_loss += fm * criterion["feat_match_loss"].weights
                metrics["feature_matching_loss"] = fm

        metrics["generator_loss"] = gen_loss
        return gen_loss, metrics

    def discriminator_losses(disc_params, spectral, wav, y_fake):
        real_outs, _, new_stats = run_discs(disc_params, spectral, wav, True)
        fake_outs, _, _ = run_discs(disc_params, spectral, y_fake, False)
        real_total = fake_total = 0.0
        for name in discriminators:
            real_l, fake_l = criterion["discriminator_adv_loss"](
                fake_outs[name], real_outs[name]
            )
            real_total += real_l
            fake_total += fake_l
        dis_loss = real_total + fake_total
        metrics = {
            "real_loss": real_total,
            "fake_loss": fake_total,
            "discriminator_loss": dis_loss,
        }
        return dis_loss, (metrics, new_stats)

    def train_step(state: GanTrainState, wav, mel, rng):
        metrics = {}
        gen_params = state.gen_params
        gen_opt_state = state.gen_opt_state
        spectral = state.spectral

        if train_generator:
            (_, gmetrics), ggrads = jax.value_and_grad(
                lambda p: generator_losses(
                    p, state.disc_params, spectral, wav, mel, rng
                ),
                has_aux=True,
            )(gen_params)
            gupdates, gen_opt_state = gen_tx.update(
                ggrads, gen_opt_state, gen_params
            )
            gen_params = optax.apply_updates(gen_params, gupdates)
            metrics.update(gmetrics)

        disc_params = state.disc_params
        disc_opt_states = dict(state.disc_opt_states)
        if include_adversarial:
            # regenerate with the UPDATED generator (reference trainer.py:557-562)
            y_fake = generator.apply({"params": gen_params}, mel,
                                     rngs={"noise": rng})
            if pqmf is not None:
                y_fake = pqmf.synthesis(y_fake)
            y_fake = jax.lax.stop_gradient(y_fake)

            (_, (dmetrics, new_stats)), dgrads = jax.value_and_grad(
                lambda p: discriminator_losses(p, spectral, wav, y_fake),
                has_aux=True,
            )(disc_params)
            new_disc_params = {}
            for name in discriminators:
                dupd, disc_opt_states[name] = disc_txs[name].update(
                    dgrads[name], disc_opt_states[name], disc_params[name]
                )
                new_disc_params[name] = optax.apply_updates(
                    disc_params[name], dupd
                )
            disc_params = new_disc_params
            spectral = new_stats
            metrics.update(dmetrics)

        new_state = GanTrainState(
            gen_params, gen_opt_state, disc_params, disc_opt_states,
            spectral, state.step + 1,
        )
        return new_state, metrics

    return _jit_step(train_step, mesh, n_data_args=2)


def make_gan_eval_step(generator, discriminators, criterion, pqmf=None):
    """Eval: same losses, no updates (reference trainer.py:392-467)."""

    @jax.jit
    def eval_step(state: GanTrainState, wav, mel, rng):
        y_ = generator.apply({"params": state.gen_params}, mel,
                             rngs={"noise": rng})
        if pqmf is not None:
            y_full = pqmf.synthesis(y_)
        else:
            y_full = y_
        metrics = {}
        yt, yt_ = wav[..., 0], y_full[..., 0]
        if "mel_loss" in criterion:
            metrics["mel_loss"] = criterion["mel_loss"](yt_, yt)
        if "stft_loss" in criterion:
            sc, mag = criterion["stft_loss"](yt_, yt)
            metrics["spectral_convergence_loss"] = sc
            metrics["log_stft_magnitude_loss"] = mag

        # adversarial-side eval metrics (reference trainer.py:416-466)
        adv = fm = real_total = fake_total = 0.0
        for name, disc in discriminators.items():
            variables = {"params": state.disc_params[name]}
            if state.spectral.get(name):
                variables["spectral"] = state.spectral[name]
            fake_outs, fake_fmaps = disc.apply(variables, y_full)
            real_outs, real_fmaps = disc.apply(variables, wav)
            if "generator_adv_loss" in criterion:
                adv += criterion["generator_adv_loss"](fake_outs)
            if "feat_match_loss" in criterion:
                fm += criterion["feat_match_loss"](fake_fmaps, real_fmaps)
            if "discriminator_adv_loss" in criterion:
                real_l, fake_l = criterion["discriminator_adv_loss"](
                    fake_outs, real_outs
                )
                real_total += real_l
                fake_total += fake_l
        if "generator_adv_loss" in criterion:
            metrics["adversarial_loss"] = adv
        if "feat_match_loss" in criterion:
            metrics["feature_matching_loss"] = fm
        if "discriminator_adv_loss" in criterion:
            metrics["real_loss"] = real_total
            metrics["fake_loss"] = fake_total
            metrics["discriminator_loss"] = real_total + fake_total
        return metrics, y_full

    return eval_step


def make_sybert_step(model, criterion, tx, train: bool = True, mesh=None):
    """Textsy-BERT masked-LM step (reference trainer.py:1097-1153)."""

    def compute(params, batch, rng, deterministic):
        rngs = {"dropout": rng} if not deterministic else {}
        res = model.apply(
            {"params": params}, batch["input_lings"],
            batch["valid_input_lengths"], deterministic=deterministic,
            rngs=rngs,
        )
        loss, err = criterion["SeqCELoss"](
            res["logits"], batch["targets"], batch["loss_masks"]
        )
        # the reference scales the total by the sy vocab size BEFORE
        # backward (reference trainer.py:1171 `loss_total / logits.size(-1)`,
        # same in eval_step :1148) — the scale changes gradients and the
        # grad-clip threshold's bite, so training dynamics only match if
        # reproduced (found by tools/cross_stack_sybert_parity.py)
        loss = loss / res["logits"].shape[-1]
        return loss, {"loss": loss, "error_rate": err}

    if not train:
        def eval_step(state, batch):
            _, metrics = compute(state.params, batch, jax.random.PRNGKey(0), True)
            return metrics

        return _jit_step(eval_step, mesh, n_data_args=1, donate=False)

    def train_step(state: TrainState, batch, rng):
        (_, metrics), grads = jax.value_and_grad(
            lambda p: compute(p, batch, rng, False), has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_opt, state.step + 1), metrics

    return _jit_step(train_step, mesh, n_data_args=1)
