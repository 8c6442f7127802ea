"""ConvAttention for MAS training (mel <-> text soft alignment).

Parity target: /root/reference/kantts/models/sambert/attention.py:42-125 —
conv projections of text keys and mel queries, isotropic-gaussian similarity
-0.0005 * ||q - k||^2, log-softmax + beta-binomial prior, softmax over text.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from kantts_tpu.models.sambert.common import NEG_INF, conv1d_same


class ConvAttention(nn.Module):
    n_mel_channels: int = 80
    n_text_channels: int = 512
    n_att_channels: int = 80
    use_query_proj: bool = True

    @nn.compact
    def __call__(
        self,
        queries: jnp.ndarray,
        keys: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        attn_prior: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """queries: (B, T_mel, n_mel); keys: (B, T_text, n_text_channels);
        mask: (B, T_text) True = padding; attn_prior: (B, T_mel, T_text).

        Returns (attn (B, 1, T_mel, T_text) softmax over text,
                 attn_logprob same shape)."""
        k = conv1d_same(self.n_text_channels * 2, 3, name="key_proj_0")(keys)
        k = jax.nn.relu(k)
        k = conv1d_same(self.n_att_channels, 1, name="key_proj_1")(k)

        if self.use_query_proj:
            q = conv1d_same(self.n_mel_channels * 2, 3, name="query_proj_0")(queries)
            q = jax.nn.relu(q)
            q = conv1d_same(self.n_mel_channels, 1, name="query_proj_1")(q)
            q = jax.nn.relu(q)
            q = conv1d_same(self.n_att_channels, 1, name="query_proj_2")(q)
        else:
            q = queries

        # -0.0005 * sum_c (q - k)^2, expanded through the MXU:
        # ||q||^2 + ||k||^2 - 2 q.k  (avoids the (B, C, Tq, Tk) broadcast)
        q2 = jnp.sum(q * q, axis=-1)[:, :, None]
        k2 = jnp.sum(k * k, axis=-1)[:, None, :]
        qk = jnp.einsum("bqc,bkc->bqk", q, k)
        attn = -0.0005 * (q2 + k2 - 2.0 * qk)  # (B, T_mel, T_text)

        if attn_prior is not None:
            attn = jax.nn.log_softmax(attn, axis=-1) + jnp.log(attn_prior + 1e-8)

        attn_logprob = attn[:, None]

        if mask is not None:
            attn = jnp.where(mask[:, None, :], NEG_INF, attn)

        attn = jax.nn.softmax(attn, axis=-1)
        return attn[:, None], attn_logprob
