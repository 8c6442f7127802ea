"""Cross-stack training parity for Textsy-BERT (the third trainer family).

Trains the torch REFERENCE KanTtsTextsyBERT and kantts_tpu's model on the
SAME masked-LM batches from IDENTICAL initial weights (utils/torch_convert
.convert_sybert), with the reference's exact training semantics:
SeqCELoss scaled by 1/sy_vocab before backward (reference
trainer.py:1148,1171), Adam, grad-norm clip 1.0. Compares loss/error
trajectories and final masked-position prediction agreement.

This harness found a real parity bug: the 1/vocab loss scaling changes the
gradients (and how hard the clip bites), so a step that skips it trains a
visibly different trajectory — make_sybert_step now reproduces it.

Run (CPU): JAX_PLATFORMS=cpu python tools/cross_stack_sybert_parity.py [steps]
Writes cross_stack_sybert_parity.json next to this file.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

from tests.test_torch_parity import TINY_CFG, _install_stubs


def _argv_steps(default=400):
    try:
        return int(sys.argv[1])
    except (IndexError, ValueError):
        return default


N_STEPS = _argv_steps()
LOG_EVERY = max(1, N_STEPS // 10)
B, T_IN = 8, 12
LR, CLIP = 1e-3, 1.0
MASK_ID = TINY_CFG["sy"] - 1  # stands in for the @[MASK] special
N_BATCHES = 4


def make_batches():
    """Deterministic masked-LM batches shared verbatim by both stacks
    (the reference's MaskingActor semantics: predict the original sy id at
    masked positions; loss only where bert_mask=1)."""
    rng = np.random.RandomState(0)
    batches = []
    for _ in range(N_BATCHES):
        ling = rng.randint(0, 5, (B, T_IN, 4)).astype(np.int64)
        targets = ling[:, :, 0].copy()
        bert_masks = (rng.rand(B, T_IN) < 0.25).astype(np.float32)
        bert_masks[:, 0] = 1.0  # at least one masked position per item
        masked = ling.copy()
        masked[:, :, 0] = np.where(bert_masks > 0, MASK_ID, masked[:, :, 0])
        batches.append({
            "input_lings": masked,
            "valid_input_lengths": np.asarray([T_IN] * B, dtype=np.int64),
            "targets": targets,
            "bert_masks": bert_masks,
        })
    return batches


def train_torch(batches):
    _install_stubs()
    import torch
    from kantts.models.sambert.kantts_sambert import (
        KanTtsTextsyBERT as TorchSybert,
    )
    from kantts.train.loss import SeqCELoss

    # The reference's Textsy-BERT is BROKEN at HEAD: TextFftEncoder.forward
    # returns 3 values (kantts_sambert.py:338, the ling_embedding added for
    # MAS) but KanTtsTextsyBERT.forward unpacks 2 (:1060) -> ValueError on
    # every forward. With no tests upstream this was never caught. Restore
    # the intended semantics (drop the embedding) so the comparison runs.
    def _fixed_forward(self, inputs_ling, input_lengths):
        from kantts.models.utils import get_mask_from_lengths

        input_masks = get_mask_from_lengths(input_lengths,
                                            max_len=inputs_ling.size(1))
        text_hid, attns, _ = self.text_encoder(inputs_ling, input_masks,
                                               return_attns=True)
        return {"logits": self.fc(text_hid), "enc_slf_attn_lst": attns}

    TorchSybert.forward = _fixed_forward

    torch.manual_seed(0)
    model = TorchSybert(TINY_CFG)
    model.train()
    crit = SeqCELoss()
    opt = torch.optim.Adam(model.parameters(), lr=LR)

    sd0 = {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}
    traj = []
    for step in range(1, N_STEPS + 1):
        b = batches[(step - 1) % len(batches)]
        res = model(torch.from_numpy(b["input_lings"]),
                    torch.from_numpy(b["valid_input_lengths"]))
        loss, err = crit(res["logits"], torch.from_numpy(b["targets"]),
                         torch.from_numpy(b["bert_masks"]))
        loss = loss / res["logits"].size(-1)  # reference trainer.py:1171
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
        opt.step()
        if step % LOG_EVERY == 0 or step == 1:
            traj.append((step, float(loss), float(err)))

    # final masked predictions on batch 0
    model.eval()
    with torch.no_grad():
        res = model(torch.from_numpy(batches[0]["input_lings"]),
                    torch.from_numpy(batches[0]["valid_input_lengths"]))
    preds = res["logits"].argmax(-1).numpy()
    return sd0, traj, preds


def train_jax(batches, sd0):
    import jax
    import jax.numpy as jnp
    import optax

    from kantts_tpu.losses.losses import SeqCELoss
    from kantts_tpu.models.sambert.sambert import KanTtsTextsyBERT
    from kantts_tpu.train.states import TrainState
    from kantts_tpu.train.steps import make_sybert_step
    from kantts_tpu.utils.torch_convert import convert_sybert

    model = KanTtsTextsyBERT(TINY_CFG)
    params = convert_sybert(sd0, TINY_CFG)
    tx = optax.chain(optax.clip_by_global_norm(CLIP),
                     optax.adam(LR, b1=0.9, b2=0.999, eps=1e-8))
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    step_fn = make_sybert_step(model, {"SeqCELoss": SeqCELoss()}, tx)

    jb = [{("loss_masks" if k == "bert_masks" else k): jnp.asarray(v)
           for k, v in b.items()} for b in batches]
    traj = []
    for step in range(1, N_STEPS + 1):
        b = jb[(step - 1) % len(jb)]
        state, metrics = step_fn(state, b, jax.random.PRNGKey(step))
        if step % LOG_EVERY == 0 or step == 1:
            traj.append((step, float(metrics["loss"]),
                         float(metrics["error_rate"])))

    res = model.apply({"params": state.params}, jb[0]["input_lings"],
                      jb[0]["valid_input_lengths"], deterministic=True)
    preds = np.asarray(jnp.argmax(res["logits"], -1))
    return traj, preds


def main():
    batches = make_batches()
    sd0, traj_t, preds_t = train_torch(batches)
    traj_j, preds_j = train_jax(batches, sd0)

    print(f"{'step':>6} {'loss(torch)':>12} {'loss(jax)':>12} "
          f"{'err(torch)':>11} {'err(jax)':>11}")
    rows = []
    for (s, lt, et), (_, lj, ej) in zip(traj_t, traj_j):
        print(f"{s:>6} {lt:>12.6f} {lj:>12.6f} {et:>11.4f} {ej:>11.4f}")
        rows.append({"step": s, "loss_torch": lt, "loss_jax": lj,
                     "err_torch": et, "err_jax": ej})

    mask = batches[0]["bert_masks"] > 0
    agree = float((preds_t[mask] == preds_j[mask]).mean())
    rel = abs(rows[-1]["loss_torch"] - rows[-1]["loss_jax"]) / max(
        rows[-1]["loss_torch"], 1e-9)
    print(f"final loss rel diff: {rel * 100:.3f}%  "
          f"masked-prediction agreement: {agree * 100:.1f}%")

    out = {"n_steps": N_STEPS, "trajectory": rows,
           "final_loss_rel_diff_pct": rel * 100,
           "masked_prediction_agreement": agree}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "cross_stack_sybert_parity.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)
    return out


if __name__ == "__main__":
    main()
