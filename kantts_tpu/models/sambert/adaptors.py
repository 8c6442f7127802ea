"""Variance adaptors: length regulator + pitch/energy/duration predictors.

Parity targets: /root/reference/kantts/models/sambert/adaptors.py and
kantts_sambert.py:340-500.

TPU-first notes:
- LengthRegulator keeps the reference's matmul-over-cumsum-intervals dense
  expansion (already scatter-free, adaptors.py:19-25) but with a STATIC output
  length — bucketed shapes replace data-dependent max(output_lens).
- The duration predictor's autoregressive inference loop (reference
  adaptors.py:67-83, a python per-phone loop) becomes a single lax.scan driven
  from sambert.py; the module exposes a one-step-capable __call__.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from kantts_tpu.models.sambert.common import Prenet, torch_linear
from kantts_tpu.models.sambert.fsmn import FsmnEncoderV2
from kantts_tpu.models.sambert.lstm import LSTM, BiLSTM


def length_regulate(
    inputs: jnp.ndarray,
    durations: jnp.ndarray,
    out_len: int,
    masks: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand (B, T_in, D) by per-token durations into (B, out_len, D).

    durations are rounded with +0.5 (reference adaptors.py:16). out_len is
    static (a bucket bound, multiple of outputs_per_step). Frames beyond the
    actual expanded length are zero. Returns (expanded, output_lens).
    """
    reps = jnp.floor(durations.astype(jnp.float32) + 0.5)
    output_lens = reps.sum(axis=1).astype(jnp.int32)
    cums = jnp.cumsum(jnp.pad(reps, ((0, 0), (1, 0))), axis=1)
    rng = jnp.arange(out_len, dtype=jnp.float32)[None, :, None]
    mult = ((cums[:, None, :-1] <= rng) & (cums[:, None, 1:] > rng)).astype(inputs.dtype)
    out = jnp.einsum("bot,btd->bod", mult, inputs)
    if masks is not None:
        out = jnp.where(masks[..., None], 0.0, out)
    return out, output_lens


class VarFsmnRnnNARPredictor(nn.Module):
    """Pitch/energy predictor: FSMN -> BiLSTM -> FC -> scalar per token
    (reference adaptors.py:86-141)."""

    filter_size: int
    fsmn_num_layers: int
    num_memory_units: int
    ffn_inner_dim: int
    dropout: float
    shift: int
    lstm_units: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        masks: Optional[jnp.ndarray] = None,
        lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        h = FsmnEncoderV2(
            self.filter_size, self.fsmn_num_layers, self.num_memory_units,
            self.ffn_inner_dim, self.dropout, self.shift, name="fsmn",
        )(x, masks, deterministic)
        if lengths is None and masks is not None:
            lengths = jnp.sum((~masks).astype(jnp.int32), axis=1)
        h = BiLSTM(self.lstm_units, name="blstm")(h, lengths)
        out = torch_linear(1, name="fc")(h)[..., 0]
        if masks is not None:
            out = jnp.where(masks, 0.0, out)
        return out


class VarRnnARPredictor(nn.Module):
    """Autoregressive duration predictor: prenet(prev) ++ cond -> 2-layer LSTM
    -> FC -> ReLU (reference adaptors.py:39-83).

    __call__ handles both the teacher-forced parallel pass (T steps) and a
    single incremental step (T=1 with carried LSTM state) — the lax.scan
    inference driver lives in sambert.py.
    """

    prenet_units: Tuple[int, ...]
    rnn_units: int
    # Head bias init. The reference's zero init (adaptors.py:60-83) makes
    # relu(fc) exactly zero for every input on short-duration corpora, so the
    # head never receives gradient (documented dead-ReLU footgun,
    # PERFORMANCE.md). Config key ``dur_pred_bias_init: 1.0`` opts into a
    # positive init; default 0.0 stays reference-faithful.
    fc_bias_init: float = 0.0

    @nn.compact
    def __call__(
        self,
        inputs: jnp.ndarray,
        cond: jnp.ndarray,
        state: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        masks: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """inputs: (B, T, 1) log(prev_dur+1); cond: (B, T, C)."""
        h = Prenet(tuple(self.prenet_units), name="prenet")(inputs, deterministic)
        h = jnp.concatenate([h, cond], axis=-1)
        h, new_state = LSTM(self.rnn_units, num_layers=2, name="lstm")(h, state)
        out = jax.nn.relu(torch_linear(
            1, name="fc",
            bias_init=nn.initializers.constant(self.fc_bias_init),
        )(h)[..., 0])
        if masks is not None:
            out = jnp.where(masks, 0.0, out)
        return out, new_state
