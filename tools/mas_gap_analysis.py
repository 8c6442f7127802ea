"""Root-cause the MAS free-running cross-stack gap (PERFORMANCE.md: 2.56 dB
on the 8x48 corpus vs 0.913 dB for the plain path).

Hypothesis being isolated: the gap is dominated by DURATION divergence —
Viterbi tie-breaks under float drift make the two stacks train their
duration heads toward slightly different hard alignments, and free-running
decode then compounds per-phone duration disagreements into misaligned mel
grids — rather than by mel-decoder divergence.

Method: train both stacks exactly as tools/cross_stack_parity.py --mas does
(identical converted init, same corpus/optimizer), then decode free-running
three ways and compare MCD:

  A. own durations (the headline gap, DTW-aligned);
  B. IDENTICAL durations — the torch stack decodes with the JAX stack's
     predicted durations injected (reference forward accepts
     duration_targets without mel targets; our sambert_infer takes
     duration_override), frame-aligned MCD: what survives is everything
     EXCEPT duration divergence;
  C. symmetric: the JAX stack decodes with the torch stack's durations.

If B/C land near the teacher-forced cross-stack MCD, the residual gap is
duration-channel divergence, quantitatively attributed.

Run (CPU, ~25 min at 1500 steps):
  JAX_PLATFORMS=cpu python tools/mas_gap_analysis.py [n_steps]
Writes tools/mas_gap_analysis.json.
Reference for the alignment path: kantts/models/sambert/alignment.py:32-71.
"""

import json
import os
import sys

# the longer-utterance corpus where free-running decode stays live
os.environ.setdefault("KANTTS_XSTACK_TIN", "8")
os.environ.setdefault("KANTTS_XSTACK_TMEL", "48")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

from tools.cross_stack_parity import (  # noqa: E402
    B,
    T_MEL,
    _install_stubs,
    make_corpus,
    train_jax,
    train_torch,
)


def _argv_steps(default=1500):
    try:
        return int(sys.argv[1])
    except (IndexError, ValueError):
        return default


def torch_decode_with_durations(model, tb, durations):
    """Free-running torch decode at B=1 (the reference's batched inference
    masks are shape-buggy at B>1) with injected per-phone durations."""
    import torch

    outs = []
    model.eval()
    with torch.no_grad():
        for i in range(tb["input_lings"].size(0)):
            d = torch.from_numpy(
                np.round(durations[i : i + 1]).astype(np.float32))
            res = model(
                tb["input_lings"][i : i + 1],
                tb["input_emotions"][i : i + 1],
                tb["input_speakers"][i : i + 1],
                tb["valid_input_lengths"][i : i + 1],
                duration_targets=d,
            )
            outs.append(res["postnet_outputs"].numpy()[0])
    return outs


def jax_decode_with_durations(model, state, jb, durations):
    import jax
    import jax.numpy as jnp

    from kantts_tpu.models.sambert.sambert import sambert_infer

    infer = jax.jit(lambda v, l, e, s, ln, d: sambert_infer(
        model, v, l, e, s, ln, max_output_len=T_MEL * 4,
        duration_override=d))(
        {"params": state.params}, jb["input_lings"], jb["input_emotions"],
        jb["input_speakers"], jb["valid_input_lengths"],
        jnp.asarray(np.round(durations).astype(np.float32)))
    post = np.asarray(infer["postnet_outputs"])
    lens = np.asarray(infer["LR_length_rounded"]).astype(int)
    return [post[i, : max(lens[i], 1)] for i in range(post.shape[0])]


def main():
    _install_stubs()
    from kantts_tpu.utils.metrics import mel_cepstral_distortion

    n_steps = _argv_steps()
    batch = make_corpus(mas=True)
    print(f"training both stacks {n_steps} steps on the "
          f"{os.environ['KANTTS_XSTACK_TIN']}x{os.environ['KANTTS_XSTACK_TMEL']}"
          f" MAS corpus ...")
    t_out, j_out = {}, {}
    sd0, _, post_tf_t, post_free_t, mas_dur_t = train_torch(
        batch, n_steps, mas=True, out=t_out)
    _, post_tf_j, post_free_j, free_len_j, mas_dur_j = train_jax(
        batch, sd0, n_steps, mas=True, out=j_out)

    # per-stack free-running durations at inference
    import torch

    model_t, tb = t_out["model"], t_out["tb"]
    with torch.no_grad():
        model_t.eval()
        dur_t = []
        for i in range(B):
            r = model_t(tb["input_lings"][i : i + 1],
                        tb["input_emotions"][i : i + 1],
                        tb["input_speakers"][i : i + 1],
                        tb["valid_input_lengths"][i : i + 1])
            d = (torch.exp(r["log_duration_predictions"]) - 1.0).clamp(min=0)
            dur_t.append(d.numpy()[0])
    dur_t = np.stack(dur_t)
    dur_j = j_out["free_durations"]

    dur_l1_infer = float(np.mean(np.abs(np.round(dur_t) - np.round(dur_j))))
    print(f"inference duration disagreement: {dur_l1_infer:.3f} frames/phone "
          f"(training-time hard-duration L1 "
          f"{float(np.mean(np.abs(mas_dur_t - mas_dur_j))):.3f})")

    # A: own durations (DTW) — the headline number
    mcd_own = float(np.mean([
        mel_cepstral_distortion(post_free_t[i],
                                post_free_j[i, : max(free_len_j[i], 1)])
        for i in range(B)]))

    # B: torch decodes with the JAX durations -> both grids identical.
    # Report BOTH frame-aligned MCD (strict; only possible because grids
    # match) and DTW MCD (apples-to-apples with row A, which must DTW
    # because its grids differ).
    torch_with_jdur = torch_decode_with_durations(model_t, tb, dur_j)
    jax_own = [post_free_j[i, : max(free_len_j[i], 1)] for i in range(B)]
    mcd_b = float(np.mean([
        mel_cepstral_distortion(torch_with_jdur[i],
                                jax_own[i][: len(torch_with_jdur[i])],
                                use_dtw=False)
        for i in range(B)]))
    mcd_b_dtw = float(np.mean([
        mel_cepstral_distortion(torch_with_jdur[i], jax_own[i])
        for i in range(B)]))

    # C: JAX decodes with the torch durations
    jax_with_tdur = jax_decode_with_durations(
        j_out["model"], j_out["state"], j_out["jb"], dur_t)
    mcd_c = float(np.mean([
        mel_cepstral_distortion(post_free_t[i][: len(jax_with_tdur[i])],
                                jax_with_tdur[i][: len(post_free_t[i])],
                                use_dtw=False)
        for i in range(B)]))
    mcd_c_dtw = float(np.mean([
        mel_cepstral_distortion(post_free_t[i], jax_with_tdur[i])
        for i in range(B)]))

    mcd_tf = float(np.mean([
        mel_cepstral_distortion(post_tf_t[i], post_tf_j[i], use_dtw=False)
        for i in range(B)]))

    print(f"\nMCD cross-stack, teacher-forced:            {mcd_tf:.3f} dB")
    print(f"MCD free-running, own durations (DTW):      {mcd_own:.3f} dB")
    print(f"MCD free-running, IDENTICAL durations (t<-j): {mcd_b:.3f} dB "
          f"aligned / {mcd_b_dtw:.3f} dB DTW")
    print(f"MCD free-running, IDENTICAL durations (j<-t): {mcd_c:.3f} dB "
          f"aligned / {mcd_c_dtw:.3f} dB DTW")
    attr = (1.0 - (0.5 * (mcd_b_dtw + mcd_c_dtw) - mcd_tf)
            / max(mcd_own - mcd_tf, 1e-9))
    print(f"=> share of the free-running excess (over TF) removed by "
          f"identical durations (DTW basis): {100 * attr:.0f}%")

    out = {
        "n_steps": n_steps,
        "corpus": f"{os.environ['KANTTS_XSTACK_TIN']}x{os.environ['KANTTS_XSTACK_TMEL']}",
        "mcd_teacher_forced_db": mcd_tf,
        "mcd_free_own_durations_db": mcd_own,
        "mcd_free_identical_durations_torch_uses_jax_db": mcd_b,
        "mcd_free_identical_durations_jax_uses_torch_db": mcd_c,
        "mcd_free_identical_durations_torch_uses_jax_dtw_db": mcd_b_dtw,
        "mcd_free_identical_durations_jax_uses_torch_dtw_db": mcd_c_dtw,
        "inference_duration_l1_frames": dur_l1_infer,
        "training_hard_duration_l1_frames": float(
            np.mean(np.abs(mas_dur_t - mas_dur_j))),
        "duration_divergence_share_of_excess": attr,
    }
    path = os.path.join(REPO, "tools", "mas_gap_analysis.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
