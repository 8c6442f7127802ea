"""Train-state pytrees (flax.struct dataclasses)."""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    """Single-model state (SAM-BERT / Textsy-BERT)."""

    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar


@struct.dataclass
class GanTrainState:
    """Generator + per-discriminator-family states (mirrors the reference's
    nested optimizer/scheduler dicts, trainer.py:591-632)."""

    gen_params: Any
    gen_opt_state: Any
    disc_params: Dict[str, Any]
    disc_opt_states: Dict[str, Any]
    spectral: Dict[str, Any]  # power-iteration vectors for spectral norm
    step: jnp.ndarray
