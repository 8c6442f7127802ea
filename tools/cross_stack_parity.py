"""Cross-stack quality parity: train the torch REFERENCE implementation and
kantts_tpu on the SAME synthetic corpus from IDENTICAL initial weights
(shared via utils/torch_convert), with the same optimizer and loss, then
compare mel-loss trajectories and inter-stack MCD — the quality half of the
BASELINE.json metric ("MCD and mel-loss parity vs the PyTorch reference").

Training semantics matched: /root/reference/kantts/train/trainer.py:898-1005
(one Adam, total = mel(dec)+mel(postnet)+dur+pitch+energy, grad-norm clip).

``--mas`` switches to the MAS configuration (the reference's modern flagship,
sambert_16k_MAS.yaml): no duration targets, frame-level prosody targets,
shared beta-binomial attention prior; the torch side runs the reference's
Viterbi binarization (alignment.py:32-71, numba stubbed to pure python) and
the CTC+KL alignment losses (trainer.py:971-984), the JAX side the in-graph
scan kernel. Adds a hard-duration (alignment) agreement metric.

``--fp`` switches to the filled-pause configuration (FP=True): fp-labeled
inputs, the FpCELoss term (reference trainer.py:865-869), duration/prosody
targets on the SPLICED (extended) grid; the torch side runs the reference's
python per-item insert_fp splice (kantts_sambert.py:766-860), the JAX side
the host insertion plan + in-graph gather. FP_Predictor's hardcoded
Dropout(0.1) is zeroed on both stacks (the only nonzero-dropout module in
the tiny config) so trajectories are deterministic and comparable.

Run (CPU): JAX_PLATFORMS=cpu python tools/cross_stack_parity.py [steps] [--mas|--fp]
Writes cross_stack_parity{_mas,_fp}.json next to this file and prints a table.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

from tests.test_torch_parity import TINY_CFG, _install_stubs

MAS = "--mas" in sys.argv
FP = "--fp" in sys.argv
assert not (MAS and FP), "--mas and --fp are mutually exclusive"


def _cfg(mas, fp):
    if mas:
        return dict(TINY_CFG, MAS=True)
    if fp:
        return dict(TINY_CFG, FP=True, fp_dropout=0.0)
    return TINY_CFG
# KL warmup: both stacks use epoch=10 with warmup_epoch=10 -> full weight
KL_EPOCH, KL_WARMUP = 10, 10


def _argv_steps(default=300):
    try:
        return int(sys.argv[1])
    except (IndexError, ValueError):  # imported as a module (e.g. by tests)
        return default


N_STEPS = _argv_steps()
LOG_EVERY = max(1, N_STEPS // 15)
# Longer utterances (KANTTS_XSTACK_TIN/TMEL) give the duration predictor
# >=4-frame targets so the reference's free-running decode stays live.
B = 8
T_IN = int(os.environ.get("KANTTS_XSTACK_TIN", "10"))
T_MEL = int(os.environ.get("KANTTS_XSTACK_TMEL", "24"))
NUM_MELS = TINY_CFG["num_mels"]
LR = 1e-3


def make_corpus(mas=None, fp=None):
    """Deterministic structured mel targets (smooth per-utterance patterns,
    so MCD is meaningful) + durations/pitch/energy."""
    mas = MAS if mas is None else mas
    fp = FP if fp is None else fp
    rng = np.random.RandomState(0)
    t = np.arange(T_MEL)[:, None] / T_MEL
    m = np.arange(NUM_MELS)[None, :] / NUM_MELS
    mels = np.stack([
        np.sin(2 * np.pi * (1 + i % 3) * t + 2 * np.pi * m * (1 + i % 4))
        + 0.1 * rng.randn(T_MEL, NUM_MELS)
        for i in range(B)
    ]).astype(np.float32)
    dur = np.full((B, T_IN), T_MEL // T_IN, dtype=np.int64)
    dur[:, -1] += T_MEL - dur[0].sum()
    batch = {
        "input_lings": rng.randint(0, 5, (B, T_IN, 4)).astype(np.int64),
        "input_emotions": rng.randint(0, 4, (B, T_IN)).astype(np.int64),
        "input_speakers": rng.randint(0, 2, (B, T_IN)).astype(np.int64),
        "valid_input_lengths": np.asarray([T_IN] * B, dtype=np.int64),
        "valid_output_lengths": np.asarray([T_MEL] * B, dtype=np.int64),
        "mel_targets": mels,
        "durations": dur,
        "pitch_contours": np.abs(rng.randn(B, T_IN)).astype(np.float32),
        "energy_contours": np.abs(rng.randn(B, T_IN)).astype(np.float32),
    }
    if mas:
        # MAS data contract (reference dataset.py:498-520): frame-level
        # prosody, beta-binomial prior over the FULL phone count (incl. EOS),
        # no duration targets; valid_input_lengths excludes the EOS slot
        # (dataset.py:781-783) so MAS can stash mel padding there
        from kantts_tpu.data.dataset import beta_binomial_prior_distribution

        batch["valid_input_lengths"] = np.asarray([T_IN - 1] * B,
                                                  dtype=np.int64)
        batch["durations"] = None
        batch["pitch_contours"] = np.abs(rng.randn(B, T_MEL)).astype(np.float32)
        batch["energy_contours"] = np.abs(rng.randn(B, T_MEL)).astype(np.float32)
        prior = np.asarray(beta_binomial_prior_distribution(T_IN, T_MEL),
                           dtype=np.float32)
        batch["attn_priors"] = np.broadcast_to(prior, (B,) + prior.shape).copy()
    if fp:
        # FP data contract (reference dataset fp_label + trainer.py:820-869):
        # per-token filler classes in {0..3}; duration/pitch/energy targets
        # live on the SPLICED grid (each filler adds 3 slots). The host plan
        # (our collate-side analogue) pads the extended grid to a static
        # bucket L; the torch side slices to max(inter_lengths).
        from kantts_tpu.models.sambert.fp import build_fp_insertion_plan

        fp_label = np.zeros((B, T_IN), dtype=np.int64)
        for b in range(B):
            for k in range(b % 3):  # 0/1/2 fillers per item, classes 1..3
                fp_label[b, 2 + 3 * k] = 1 + (b + k) % 3
        src, f_cls, f_ph, inter, L = build_fp_insertion_plan(
            fp_label.astype(np.int32),
            batch["valid_input_lengths"].astype(np.int32))
        dur = np.zeros((B, L), dtype=np.int64)
        pitch = np.abs(rng.randn(B, L)).astype(np.float32)
        energy = np.abs(rng.randn(B, L)).astype(np.float32)
        for b in range(B):
            n = int(inter[b])
            dur[b, :n] = T_MEL // n
            dur[b, n - 1] += T_MEL - dur[b].sum()
            # zero past inter_length: collate zero-pads prosody targets and
            # the k=9 embedding convs see the padding (same contract as
            # tests/test_fp_torch_parity.py)
            pitch[b, n:] = 0.0
            energy[b, n:] = 0.0
        batch["durations"] = dur
        batch["pitch_contours"] = pitch
        batch["energy_contours"] = energy
        batch["fp_label"] = fp_label
        batch["fp_plan"] = (src, f_cls, f_ph, inter)
        batch["fp_t_ext"] = int(inter.max())
        # shared filler-word token triples (the reference's ling-unit fpdict)
        batch["fp_dict_lings"] = rng.randint(0, 5, (3, 3, 4)).astype(np.int64)
    return batch


def train_torch(batch, n_steps, mas=None, fp=None, out=None):
    """``out``: optional dict; receives the trained torch model under
    "model" (tools/mas_gap_analysis.py does custom post-training decodes)."""
    mas = MAS if mas is None else mas
    fp = FP if fp is None else fp
    cfg = _cfg(mas, fp)
    import torch
    from kantts.models.sambert.kantts_sambert import KanTtsSAMBERT as TorchSambert
    from kantts.train.loss import (
        AttentionBinarizationLoss,
        AttentionCTCLoss,
        MelReconLoss,
        ProsodyReconLoss,
    )

    torch.manual_seed(0)
    model = TorchSambert(cfg)
    if mas:
        # the reference's binarize_attention_parallel ends with
        # .to(attn.get_device()), which is CUDA-only (get_device() == -1 on
        # CPU, kantts_sambert.py:764); rebind the same computation minus the
        # device move so the reference's numba Viterbi runs on CPU here
        import types as _types

        from kantts.models.sambert.alignment import b_mas

        def _binarize_cpu(self, attn, in_lens, out_lens):
            with torch.no_grad():
                attn_cpu = attn.data.cpu().numpy()
                attn_out = b_mas(attn_cpu, in_lens.cpu().numpy(),
                                 out_lens.cpu().numpy(), width=1)
            return torch.from_numpy(attn_out)

        model.binarize_attention_parallel = _types.MethodType(
            _binarize_cpu, model)
    if fp:
        # the shared filler-word triples (reference sets model.fp_dict from
        # the ling unit's get_fpdict, bin/train_sambert.py path)
        model.fp_dict = {k: torch.from_numpy(batch["fp_dict_lings"][k - 1])
                         .long().unsqueeze(0) for k in (1, 2, 3)}
        # zero the hardcoded FP_Predictor Dropout(0.1) for deterministic
        # trajectories (jax side: fp_dropout=0.0 in _cfg)
        model.FP_predictor.dropout.p = 0.0
        model.FP_predictor.dropout_inner.p = 0.0
        # the reference FpCELoss eagerly .cuda()s its class weights
        # (loss.py:92) — route to CPU here
        _orig_cuda = torch.Tensor.cuda
        torch.Tensor.cuda = lambda self, *a, **k: self
        try:
            from kantts.train.loss import FpCELoss

            fp_crit = FpCELoss()
        finally:
            torch.Tensor.cuda = _orig_cuda
    # Dead-ReLU guard for the tiny fixed corpus: at the default init the
    # duration head's relu(fc(.)) is 0 for every input, so no gradient ever
    # reaches it (dur_loss stays exactly log(dur+1)) and free-running decode
    # degenerates in BOTH stacks. A positive fc bias (captured in sd0, so
    # both stacks still share identical init) keeps the head trainable.
    with torch.no_grad():
        dict(model.named_parameters())[next(
            k for k, _ in model.named_parameters()
            if k.endswith("duration_predictor.fc.bias")
        )].fill_(1.0)
    sd0 = {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=LR, betas=(0.9, 0.98),
                           eps=1e-9)
    mel_crit, pros_crit = MelReconLoss("mae"), ProsodyReconLoss("mae")
    if mas:
        ctc_crit = AttentionCTCLoss()
        kl_crit = AttentionBinarizationLoss(start_epoch=0,
                                            warmup_epoch=KL_WARMUP)

    tb = {k: torch.from_numpy(v) for k, v in batch.items()
          if isinstance(v, np.ndarray)}
    # FP: the torch model pads the spliced grid to exactly max(inter_lengths);
    # slice the bucket-padded host-plan targets down to that
    t_ext = batch.get("fp_t_ext")

    def fwd():
        return model(
            tb["input_lings"], tb["input_emotions"], tb["input_speakers"],
            tb["valid_input_lengths"],
            output_lengths=tb["valid_output_lengths"],
            mel_targets=tb["mel_targets"],
            duration_targets=(tb["durations"][:, :t_ext] if fp
                              else tb.get("durations")),
            pitch_targets=(tb["pitch_contours"][:, :t_ext] if fp
                           else tb["pitch_contours"]),
            energy_targets=(tb["energy_contours"][:, :t_ext] if fp
                            else tb["energy_contours"]),
            attn_priors=tb.get("attn_priors"),
            fp_label=tb.get("fp_label"),
        )

    traj = {}
    for step in range(1, n_steps + 1):
        opt.zero_grad()
        res = fwd()
        mel_loss_, mel_loss = mel_crit(tb["valid_output_lengths"],
                                       tb["mel_targets"], res["dec_outputs"],
                                       res["postnet_outputs"])
        dur_l, pitch_l, energy_l = pros_crit(
            res["valid_inter_lengths"], res["duration_targets"],
            res["pitch_targets"], res["energy_targets"],
            res["log_duration_predictions"], res["pitch_predictions"],
            res["energy_predictions"],
        )
        total = mel_loss_ + mel_loss + dur_l + pitch_l + energy_l
        row = {"mel_loss": float(mel_loss.detach()),
               "dur_loss": float(dur_l.detach())}
        if mas:
            ctc_l = ctc_crit(res["attn_logprob"], tb["valid_input_lengths"],
                             tb["valid_output_lengths"])
            kl_l = kl_crit(KL_EPOCH, res["attn_hard"], res["attn_soft"])
            total = total + ctc_l + kl_l
            row["attn_ctc_loss"] = float(ctc_l.detach())
            row["attn_kl_loss"] = float(kl_l.detach())
        if fp:
            fp_l = fp_crit(tb["valid_input_lengths"], res["fp_predictions"],
                           tb["fp_label"])
            total = total + fp_l
            row["fp_loss"] = float(fp_l.detach())
        total.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        if step % LOG_EVERY == 0 or step == 1:
            traj[step] = {"TotalLoss": float(total.detach()), **row}

    model.eval()
    with torch.no_grad():
        res = fwd()
        post_tf = res["postnet_outputs"].numpy()
        mas_durations = (res["duration_targets"].numpy().astype(np.float64)
                         if mas else None)
        try:
            if fp:
                # free-running FP inference takes the predicted-FP_p argmax
                # splice (a different, stochastic-count path); the FP parity
                # claim here is trajectory + teacher-forced
                raise RuntimeError("skipped in FP mode")
            # one utterance at a time: the reference's incremental PNCA
            # decode is only exercised at B=1 in-tree (text_to_wav) and its
            # batched masks are buggy at B>1
            post_free = [
                model(tb["input_lings"][i : i + 1],
                      tb["input_emotions"][i : i + 1],
                      tb["input_speakers"][i : i + 1],
                      tb["valid_input_lengths"][i : i + 1],
                      )["postnet_outputs"].numpy()[0]
                for i in range(tb["input_lings"].size(0))
            ]
        except (ValueError, RuntimeError):
            # degenerate (near-zero) predicted durations -> empty decode
            post_free = None
    if out is not None:
        out["model"] = model
        out["tb"] = tb
    return sd0, traj, post_tf, post_free, mas_durations


def train_jax(batch, sd0, n_steps, mas=None, fp=None, out=None):
    """``out``: optional dict; receives the trained model/state/device batch
    ("model", "state", "jb") for custom post-training decodes."""
    mas = MAS if mas is None else mas
    fp = FP if fp is None else fp
    cfg = _cfg(mas, fp)
    import jax
    import jax.numpy as jnp

    from kantts_tpu.losses import criterion_builder
    from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT, sambert_infer
    from kantts_tpu.train.optim import optimizer_builder
    from kantts_tpu.train.states import TrainState
    from kantts_tpu.train.steps import make_sambert_step
    from kantts_tpu.utils.torch_convert import convert_sambert

    model = KanTtsSAMBERT(cfg)
    params = convert_sambert(sd0, cfg)
    loss_cfg = {
        "MelReconLoss": {"enable": True, "params": {"loss_type": "mae"}},
        "ProsodyReconLoss": {"enable": True, "params": {"loss_type": "mae"}},
    }
    if mas:
        loss_cfg["AttentionCTCLoss"] = {"enable": True}
        loss_cfg["AttentionBinarizationLoss"] = {
            "enable": True,
            "params": {"start_epoch": 0, "warmup_epoch": KL_WARMUP}}
    if fp:
        loss_cfg["FpCELoss"] = {"enable": True}
    crit = criterion_builder({"Loss": loss_cfg})
    tx, _ = optimizer_builder(
        {"type": "Adam", "params": {"lr": LR, "betas": [0.9, 0.98], "eps": 1e-9}},
        None, grad_norm=1.0,
    )
    jb = {
        "input_lings": jnp.asarray(batch["input_lings"], dtype=jnp.int32),
        "input_emotions": jnp.asarray(batch["input_emotions"], dtype=jnp.int32),
        "input_speakers": jnp.asarray(batch["input_speakers"], dtype=jnp.int32),
        "valid_input_lengths": jnp.asarray(batch["valid_input_lengths"]),
        "valid_output_lengths": jnp.asarray(batch["valid_output_lengths"]),
        "mel_targets": jnp.asarray(batch["mel_targets"]),
        "pitch_contours": jnp.asarray(batch["pitch_contours"]),
        "energy_contours": jnp.asarray(batch["energy_contours"]),
    }
    if batch.get("durations") is not None:
        jb["durations"] = jnp.asarray(batch["durations"].astype(np.float32))
    if batch.get("attn_priors") is not None:
        jb["attn_priors"] = jnp.asarray(batch["attn_priors"])
    fp_dict_lings = None
    if fp:
        jb["fp_label"] = jnp.asarray(batch["fp_label"], dtype=jnp.int32)
        jb["fp_plan"] = tuple(jnp.asarray(x) for x in batch["fp_plan"])
        fp_dict_lings = jnp.asarray(batch["fp_dict_lings"], dtype=jnp.int32)
    state = TrainState(params, tx.init(params), jnp.asarray(0, dtype=jnp.int32))
    step_fn = make_sambert_step(model, crit, tx, with_mas=mas,
                                fp_enable=fp, fp_dict_lings=fp_dict_lings)
    traj = {}
    for step in range(1, n_steps + 1):
        state, metrics = step_fn(state, jb, jax.random.PRNGKey(step),
                                 jnp.asarray(KL_EPOCH))
        if step % LOG_EVERY == 0 or step == 1:
            traj[step] = {"TotalLoss": float(metrics["TotalLoss"]),
                          "mel_loss": float(metrics["mel_loss"]),
                          "dur_loss": float(metrics["dur_loss"])}
            if mas:
                traj[step]["attn_ctc_loss"] = float(metrics["attn_ctc_loss"])
                traj[step]["attn_kl_loss"] = float(metrics["attn_kl_loss"])
            if fp:
                traj[step]["fp_loss"] = float(metrics["fp_loss"])

    variables = {"params": state.params}
    res = model.apply(
        variables, jb["input_lings"], jb["input_emotions"],
        jb["input_speakers"], jb["valid_input_lengths"],
        jb["valid_output_lengths"], jb["mel_targets"],
        duration_targets=jb.get("durations"),
        pitch_targets=jb["pitch_contours"],
        energy_targets=jb["energy_contours"],
        attn_priors=jb.get("attn_priors"),
        fp_label=jb.get("fp_label"), fp_plan=jb.get("fp_plan"),
        fp_dict_lings=fp_dict_lings, deterministic=True,
    )
    post_tf = np.asarray(res["postnet_outputs"])
    mas_durations = (np.asarray(res["duration_targets"]).astype(np.float64)
                     if mas else None)
    if fp:  # free-running FP takes the predicted-FP_p splice path; the FP
        return traj, post_tf, None, None, None  # claim is trajectory + TF
    infer = jax.jit(lambda v, l, e, s, ln: sambert_infer(
        model, v, l, e, s, ln, max_output_len=T_MEL * 4))(
        variables, jb["input_lings"], jb["input_emotions"],
        jb["input_speakers"], jb["valid_input_lengths"])
    post_free = np.asarray(infer["postnet_outputs"])
    free_len = np.asarray(infer["LR_length_rounded"]).astype(int)
    if out is not None:
        out["model"] = model
        out["state"] = state
        out["jb"] = jb
        out["free_durations"] = np.asarray(infer["duration_predictions"])
    return traj, post_tf, post_free, free_len, mas_durations


def main():
    _install_stubs()
    from kantts_tpu.utils.metrics import mel_cepstral_distortion

    batch = make_corpus()
    print(f"training both stacks for {N_STEPS} steps (B={B}, "
          f"MAS={'on' if MAS else 'off'}, FP={'on' if FP else 'off'}, "
          f"identical init, Adam lr={LR}, grad clip 1.0) ...")
    sd0, traj_t, post_tf_t, post_free_t, mas_dur_t = train_torch(batch, N_STEPS)
    (traj_j, post_tf_j, post_free_j, free_len_j,
     mas_dur_j) = train_jax(batch, sd0, N_STEPS)

    rows = []
    for step in sorted(traj_t):
        tt, tj = traj_t[step], traj_j[step]
        rows.append((step, tt["TotalLoss"], tj["TotalLoss"],
                     tt["mel_loss"], tj["mel_loss"]))

    # MCD between the stacks' outputs and vs target (teacher-forced -> frame
    # aligned; free-running -> DTW)
    mcd_xstack_tf = np.mean([
        mel_cepstral_distortion(post_tf_t[i], post_tf_j[i], use_dtw=False)
        for i in range(B)
    ])
    tgt = batch["mel_targets"]
    mcd_t_tgt = np.mean([
        mel_cepstral_distortion(post_tf_t[i], tgt[i], use_dtw=False)
        for i in range(B)
    ])
    mcd_j_tgt = np.mean([
        mel_cepstral_distortion(post_tf_j[i], tgt[i], use_dtw=False)
        for i in range(B)
    ])
    if post_free_t is not None:
        mcd_xstack_free = float(np.mean([
            mel_cepstral_distortion(post_free_t[i],
                                    post_free_j[i, : max(free_len_j[i], 1)])
            for i in range(B)
        ]))
    else:
        mcd_xstack_free = None

    print("\n| step | total (torch) | total (kantts_tpu) | mel (torch) | mel (kantts_tpu) |")
    print("|---|---|---|---|---|")
    for step, tt, tj, mt, mj in rows:
        print(f"| {step} | {tt:.4f} | {tj:.4f} | {mt:.4f} | {mj:.4f} |")
    final_t, final_j = rows[-1][1], rows[-1][2]
    print(f"\nfinal TotalLoss: torch {final_t:.4f} vs kantts_tpu {final_j:.4f} "
          f"(rel diff {abs(final_t - final_j) / final_t * 100:.2f}%)")
    print(f"MCD teacher-forced, cross-stack: {mcd_xstack_tf:.3f} dB")
    print(f"MCD teacher-forced vs target:    torch {mcd_t_tgt:.3f} dB, "
          f"kantts_tpu {mcd_j_tgt:.3f} dB")
    if mcd_xstack_free is not None:
        print(f"MCD free-running (DTW), cross-stack: {mcd_xstack_free:.3f} dB")
    else:
        print("MCD free-running: skipped (reference free-running decode "
              "degenerate at this step count)")
    dur_l1 = None
    if MAS:
        # alignment agreement: hard MAS durations per phone after training
        dur_l1 = float(np.mean(np.abs(mas_dur_t - mas_dur_j)))
        exact = float(np.mean(mas_dur_t == mas_dur_j))
        print(f"MAS hard-duration agreement: L1 {dur_l1:.4f} frames/phone, "
              f"exact-match {exact * 100:.1f}%")

    out = {
        "n_steps": N_STEPS,
        "mas": MAS,
        "fp": FP,
        "t_in": T_IN,
        "t_mel": T_MEL,
        "trajectory": [
            {"step": s,
             **{f"{k}_torch": v for k, v in traj_t[s].items()},
             **{f"{k}_jax": v for k, v in traj_j[s].items()}}
            for s in sorted(traj_t)
        ],
        "final_total_rel_diff_pct": abs(final_t - final_j) / final_t * 100,
        "mcd_teacher_forced_cross_stack_db": float(mcd_xstack_tf),
        "mcd_teacher_forced_torch_vs_target_db": float(mcd_t_tgt),
        "mcd_teacher_forced_jax_vs_target_db": float(mcd_j_tgt),
        "mcd_free_running_cross_stack_db": mcd_xstack_free,
        "mas_hard_duration_l1_frames": dur_l1,
    }
    suffix = "" if (T_IN, T_MEL) == (10, 24) else f"_{T_IN}x{T_MEL}"
    if MAS:
        suffix += "_mas"
    if FP:
        suffix += "_fp"
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"cross_stack_parity{suffix}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
