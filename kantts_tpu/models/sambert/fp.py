"""Filled-pause insertion: splice encoded filler syllables into the text
hidden sequence.

Parity target: /root/reference/kantts/models/sambert/kantts_sambert.py:766-860
(``insert_fp``). The reference splices tensors per batch item in a python
loop — fundamentally dynamic-shape work. The TPU-first split:

- HOST (numpy, in the collate or the infer driver): build an INSERTION PLAN —
  for every output slot, either the index of an original token or a
  (filler_class, phase) pair. Output length is a static bucket.
- DEVICE (in-graph): one gather + where select applies the plan
  (``apply_fp_insertion``); the three filler-syllable embedding triples are
  produced by running the text encoder over the fp_dict token triples
  (reference ling_unit.get_fpdict / kantts_sambert.py:778-784).

Emotion/speaker id sequences are only length-extended (wrap-around), exactly
like the reference's repeat-extension (:805-828) — per-position alignment is
not shifted there either (ids are constant per utterance in practice).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def fp_classes_from_predictions(fp_p: np.ndarray, input_masks: np.ndarray
                                ) -> np.ndarray:
    """Argmax FP class per token from predictor probabilities, zeroed on
    padding (reference kantts_sambert.py:788-791 fp_mask derivation)."""
    cls = np.argmax(fp_p, axis=-1)
    cls = np.where(input_masks, 0, cls)
    return cls.astype(np.int32)


def build_fp_insertion_plan(
    fp_classes: np.ndarray,
    input_lengths: np.ndarray,
    out_len: Optional[int] = None,
    bucket: int = 16,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """fp_classes: (B, T_in) in {0..3}; 0 = no filler. A class c>0 at token j
    inserts the 3-slot filler BEFORE token j (reference iterates from the end
    inserting ``text_hid[:j] ++ filler ++ text_hid[j:]``, :830-859).

    Returns (src_idx (B, L), filler_class (B, L), filler_phase (B, L),
    inter_lengths (B,), L). Slots with filler_class == 0 take original token
    src_idx; others take filler_bank[filler_class - 1, filler_phase].
    """
    B, T_in = fp_classes.shape
    inter_lengths = np.asarray(
        [int(input_lengths[b]) + 3 * int((fp_classes[b, : input_lengths[b]] > 0).sum())
         for b in range(B)],
        dtype=np.int32,
    )
    if out_len is None:
        out_len = int(np.ceil(max(int(inter_lengths.max()), 1) / bucket) * bucket)

    src_idx = np.zeros((B, out_len), dtype=np.int32)
    filler_class = np.zeros((B, out_len), dtype=np.int32)
    filler_phase = np.zeros((B, out_len), dtype=np.int32)

    for b in range(B):
        pos = 0
        for j in range(int(input_lengths[b])):
            c = int(fp_classes[b, j])
            if c > 0:
                for phase in range(3):
                    if pos >= out_len:
                        break
                    filler_class[b, pos] = c
                    filler_phase[b, pos] = phase
                    pos += 1
            if pos >= out_len:
                break
            src_idx[b, pos] = j
            pos += 1
        # padding slots keep src_idx 0 / class 0; they are masked downstream
    return src_idx, filler_class, filler_phase, inter_lengths, out_len


def apply_fp_insertion(
    text_hid: jnp.ndarray,
    filler_bank: jnp.ndarray,
    src_idx: jnp.ndarray,
    filler_class: jnp.ndarray,
    filler_phase: jnp.ndarray,
) -> jnp.ndarray:
    """In-graph application of the insertion plan.

    text_hid: (B, T_in, D); filler_bank: (3, 3, D) [class-1, phase, D].
    Returns (B, L, D)."""
    gathered = jnp.take_along_axis(text_hid, src_idx[..., None], axis=1)
    fillers = filler_bank[
        jnp.clip(filler_class - 1, 0, 2), filler_phase
    ]  # (B, L, D)
    return jnp.where((filler_class > 0)[..., None], fillers, gathered)


def extend_wraparound(x: np.ndarray, out_len: int) -> np.ndarray:
    """Length-extend id sequences by wrap-around repetition
    (the reference's repeat-extension, kantts_sambert.py:799-828)."""
    B, T = x.shape[0], x.shape[1]
    idx = np.arange(out_len) % T
    return x[:, idx]
