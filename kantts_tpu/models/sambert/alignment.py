"""Monotonic alignment search (MAS) — jittable Viterbi, width 1.

Parity target: /root/reference/kantts/models/sambert/alignment.py:32-71
(numba ``mas_width1`` / ``b_mas``). The reference runs this on CPU in the
middle of the forward pass (kantts_sambert.py:759-764), costing a
device->host->device round trip per step. Here the DP is a ``lax.scan`` over
mel frames and the backtrack a reversed scan — it stays on the TPU inside the
training step. A numpy twin (``mas_width1_np``) is kept for unit-testing the
scan against straightforward DP semantics.

Complexity: O(T_mel * T_text) work, O(T_mel * T_text) memory for the
backpointers (int8), same as the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -1e30


def mas_width1(attn_map: jnp.ndarray, out_len: jnp.ndarray, in_len: jnp.ndarray
               ) -> jnp.ndarray:
    """Monotonic alignment for ONE item.

    attn_map: (T_mel, T_text) soft attention probabilities (padded);
    out_len/in_len: valid lengths. Returns a hard 0/1 alignment of the same
    shape; rows >= out_len and cols >= in_len are zero.
    """
    T_mel, T_text = attn_map.shape
    cols = jnp.arange(T_text)

    log_attn = jnp.log(jnp.clip(attn_map, 1e-30, None))
    log_attn = jnp.where(cols[None, :] < in_len, log_attn, _NEG)

    # first mel frame must align to the first text token
    row0 = jnp.where(cols == 0, log_attn[0], _NEG)

    def dp_step(prev_log_p, row):
        # stay at j, or advance from j-1 (>= tie goes to j-1, matching the
        # reference's ``>=`` comparison at alignment.py:47)
        shifted = jnp.concatenate([jnp.full((1,), _NEG), prev_log_p[:-1]])
        take_prev = shifted >= prev_log_p
        best = jnp.where(take_prev, shifted, prev_log_p)
        log_p = row + best
        return log_p, take_prev

    log_p_last, take_prev = jax.lax.scan(dp_step, row0, log_attn[1:])
    # take_prev: (T_mel-1, T_text) bool; backpointer for rows 1..T_mel-1

    # backtrack from (out_len-1, in_len-1) down to row 0
    start_row = out_len - 1
    start_col = in_len - 1

    def bt_step(carry, i):
        cur_col, = carry
        # rows processed from T_mel-1 down to 0; active only when i <= start_row
        active = i <= start_row
        onehot = (cols == cur_col) & active
        # move: for row i>0, consult take_prev[i-1, cur_col]
        tp = jnp.where(i > 0, take_prev[jnp.maximum(i - 1, 0), cur_col], False)
        nxt = jnp.where(active & (i > 0) & tp, cur_col - 1, cur_col)
        nxt = jnp.where(active, nxt, cur_col)
        return (nxt,), onehot

    (_,), rows = jax.lax.scan(
        bt_step, (start_col,), jnp.arange(T_mel - 1, -1, -1)
    )
    opt = jnp.flip(rows, axis=0).astype(attn_map.dtype)  # (T_mel, T_text)
    valid = (jnp.arange(T_mel)[:, None] < out_len) & (cols[None, :] < in_len)
    return jnp.where(valid, opt, 0.0)


def b_mas(attn: jnp.ndarray, in_lens: jnp.ndarray, out_lens: jnp.ndarray
          ) -> jnp.ndarray:
    """Batched MAS. attn: (B, 1, T_mel, T_text) -> same-shape hard alignment
    (reference alignment.py:63-71)."""
    hard = jax.vmap(mas_width1)(attn[:, 0], out_lens, in_lens)
    return hard[:, None]


def mas_align(attn: jnp.ndarray, in_lens: jnp.ndarray, out_lens: jnp.ndarray,
              backend: str = "auto") -> jnp.ndarray:
    """Dispatch MAS to the Pallas kernel on TPU (ops/mas_pallas.py) or the
    lax.scan implementation elsewhere. Both are numerically identical."""
    if backend == "auto":
        backend = "pallas" if jax.default_backend() not in ("cpu", "gpu") else "scan"
    if backend == "pallas":
        from kantts_tpu.ops.mas_pallas import b_mas_pallas

        return b_mas_pallas(attn, in_lens, out_lens)
    return b_mas(attn, in_lens, out_lens)


# ------------------------------------------------------------- numpy twin


def mas_width1_np(attn_map: np.ndarray) -> np.ndarray:
    """Reference-semantics DP in numpy (for tests)."""
    T_mel, T_text = attn_map.shape
    log_attn = np.log(np.clip(attn_map, 1e-30, None))
    log_attn[0, 1:] = -np.inf
    log_p = np.zeros_like(log_attn)
    log_p[0] = log_attn[0]
    prev_ind = np.zeros_like(log_attn, dtype=np.int64)
    for i in range(1, T_mel):
        for j in range(T_text):
            prev_log = log_p[i - 1, j]
            prev_j = j
            if j - 1 >= 0 and log_p[i - 1, j - 1] >= log_p[i - 1, j]:
                prev_log = log_p[i - 1, j - 1]
                prev_j = j - 1
            log_p[i, j] = log_attn[i, j] + prev_log
            prev_ind[i, j] = prev_j
    opt = np.zeros_like(attn_map)
    cur = T_text - 1
    for i in range(T_mel - 1, -1, -1):
        opt[i, cur] = 1
        cur = prev_ind[i, cur]
    opt[0, cur] = 1
    return opt
