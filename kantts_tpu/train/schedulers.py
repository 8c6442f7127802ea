"""LR schedules as optax schedule functions.

Parity targets: /root/reference/kantts/train/scheduler.py (FindLR, NoamLR) and
the torch schedulers the configs reference by name (MultiStepLR — resolved via
getattr in the reference's scheduler_builder, models/__init__.py:22-25).

Torch steps its schedulers AFTER each optimizer step with last_epoch starting
at 0, so optimizer step N uses the schedule value at count N (0-based) — the
optax convention matches directly.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def noam_lr(base_lr: float, warmup_steps: int) -> Schedule:
    """lr = base * warmup^0.5 * min(step^-0.5, step * warmup^-1.5), step>=1
    (reference scheduler.py:41-46)."""

    def schedule(count):
        step = jnp.maximum(count, 1).astype(jnp.float32)
        scale = warmup_steps ** 0.5 * jnp.minimum(
            step ** -0.5, step * warmup_steps ** -1.5
        )
        return base_lr * scale

    return schedule


def find_lr(base_lr: float, max_steps: int, max_lr: float = 10.0) -> Schedule:
    """Exponential LR sweep (reference scheduler.py:7-22)."""

    def schedule(count):
        frac = count.astype(jnp.float32) / (max_steps - 1)
        return base_lr * (max_lr / base_lr) ** frac

    return schedule


def multistep_lr(base_lr: float, milestones: Sequence[int], gamma: float = 0.1
                 ) -> Schedule:
    ms = jnp.asarray(sorted(milestones))

    def schedule(count):
        n = jnp.sum(count >= ms)
        return base_lr * gamma ** n.astype(jnp.float32)

    return schedule


def step_lr(base_lr: float, step_size: int, gamma: float = 0.1) -> Schedule:
    def schedule(count):
        return base_lr * gamma ** (count // step_size).astype(jnp.float32)

    return schedule


def exponential_lr(base_lr: float, gamma: float) -> Schedule:
    def schedule(count):
        return base_lr * gamma ** count.astype(jnp.float32)

    return schedule


def constant_lr(base_lr: float) -> Schedule:
    def schedule(count):
        del count
        return jnp.asarray(base_lr)

    return schedule


_SCHEDULERS = {
    "NoamLR": lambda base_lr, p: noam_lr(base_lr, p["warmup_steps"]),
    "FindLR": lambda base_lr, p: find_lr(base_lr, p["max_steps"],
                                         p.get("max_lr", 10.0)),
    "MultiStepLR": lambda base_lr, p: multistep_lr(base_lr, p["milestones"],
                                                   p.get("gamma", 0.1)),
    "StepLR": lambda base_lr, p: step_lr(base_lr, p["step_size"],
                                         p.get("gamma", 0.1)),
    "ExponentialLR": lambda base_lr, p: exponential_lr(base_lr, p["gamma"]),
    "ConstantLR": lambda base_lr, p: constant_lr(base_lr),
}


def scheduler_builder(name: str, base_lr: float, params: Dict[str, Any]) -> Schedule:
    if name not in _SCHEDULERS:
        raise ValueError(f"Unknown scheduler: {name}")
    return _SCHEDULERS[name](base_lr, params or {})
