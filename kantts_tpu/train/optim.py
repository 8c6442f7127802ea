"""Optimizer construction (optax) from the reference's torch-style config.

Parity target: /root/reference/kantts/models/__init__.py:16-25 — optimizer
type is a torch.optim class name with params (lr/betas/eps/weight_decay);
scheduler likewise by name. Torch Adam's ``weight_decay`` is L2-on-gradients,
which optax.add_decayed_weights before scale_by_adam reproduces.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import optax

from kantts_tpu.train.schedulers import Schedule, scheduler_builder


def optimizer_builder(
    opt_config: Dict[str, Any],
    sched_config: Dict[str, Any] | None,
    grad_norm: float | None = None,
) -> Tuple[optax.GradientTransformation, Schedule]:
    """Build an optax chain + its LR schedule from reference-style config
    dicts ({type, params})."""
    opt_type = opt_config.get("type", "Adam")
    p = dict(opt_config.get("params", {}))
    base_lr = p.get("lr", 1e-3)

    if sched_config:
        schedule = scheduler_builder(
            sched_config["type"], base_lr, sched_config.get("params", {})
        )
    else:
        schedule = scheduler_builder("ConstantLR", base_lr, {})

    chain = []
    if grad_norm is not None and grad_norm > 0:
        chain.append(optax.clip_by_global_norm(grad_norm))

    wd = p.get("weight_decay", 0.0)
    if opt_type in ("Adam", "AdamW"):
        b1, b2 = p.get("betas", (0.9, 0.999))
        eps = p.get("eps", 1e-8)
        if opt_type == "Adam" and wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
        if opt_type == "AdamW" and wd:
            chain.append(optax.add_decayed_weights(wd))
    elif opt_type == "SGD":
        momentum = p.get("momentum", 0.0)
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        if momentum:
            chain.append(optax.trace(decay=momentum, nesterov=p.get("nesterov", False)))
    else:
        raise ValueError(f"Unsupported optimizer: {opt_type}")

    chain.append(optax.scale_by_schedule(schedule))
    chain.append(optax.scale(-1.0))
    return optax.chain(*chain), schedule
