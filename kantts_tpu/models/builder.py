"""Model/optimizer assembly from config (the model_builder registry).

Parity target: /root/reference/kantts/models/__init__.py:16-164 — dispatch on
``config["model_type"]`` to per-family builders that construct
model+optimizer+scheduler structures; discriminator families are selected by
class-name keys under config["Model"] (the globals() lookup at
models/__init__.py:51).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from kantts_tpu.models.hifigan.discriminators import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    MultiSpecDiscriminator,
)
from kantts_tpu.models.hifigan.generator import Generator
from kantts_tpu.models.pqmf import PQMF
from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT, KanTtsTextsyBERT
from kantts_tpu.train.optim import optimizer_builder
from kantts_tpu.train.states import GanTrainState, TrainState

DISCRIMINATOR_CLASSES = {
    "MultiScaleDiscriminator": MultiScaleDiscriminator,
    "MultiPeriodDiscriminator": MultiPeriodDiscriminator,
    "MultiSpecDiscriminator": MultiSpecDiscriminator,
}


def _tuplify(obj):
    """YAML lists -> tuples so linen module attributes stay hashable."""
    if isinstance(obj, list):
        return tuple(_tuplify(x) for x in obj)
    if isinstance(obj, dict):
        return {k: _tuplify(v) for k, v in obj.items()}
    return obj


def hifigan_model_builder(config: Dict[str, Any], seed: int = 0
                          ) -> Dict[str, Any]:
    """Build Generator + discriminators (+PQMF when out_channels > 1,
    reference models/__init__.py:28-86) with per-family optimizers."""
    model_cfg = config["Model"]
    gen_params_cfg = dict(model_cfg["Generator"]["params"])
    gen_kwargs = _tuplify(gen_params_cfg)
    gen_kwargs["nsf_params"] = gen_params_cfg.get("nsf_params")  # keep dict
    # optional bf16 compute (params stay f32): config key `mixed_precision`
    compute_dtype = (jnp.bfloat16 if config.get("mixed_precision", False)
                     else jnp.float32)
    gen_kwargs["dtype"] = compute_dtype
    generator = Generator(**gen_kwargs)

    discriminators = {}
    for name, cls in DISCRIMINATOR_CLASSES.items():
        if name in model_cfg:
            dparams = _tuplify(model_cfg[name].get("params", {}))
            dparams.pop("discriminator_params", None)
            dparams["discriminator_params"] = dict(
                model_cfg[name].get("params", {}).get("discriminator_params", {})
            )
            dparams["dtype"] = compute_dtype
            discriminators[name] = cls(**dparams)

    pqmf = None
    if gen_params_cfg.get("out_channels", 1) > 1:
        pqmf = PQMF(subbands=gen_params_cfg["out_channels"])

    # init
    rng = jax.random.PRNGKey(seed)
    n_mel = gen_params_cfg.get("in_channels", 80)
    mel_dummy = jnp.zeros((1, 8, n_mel))
    up = int(np.prod(gen_params_cfg.get("upsample_scales", (8, 8, 2, 2))))
    wav_dummy = jnp.zeros(
        (1, 8 * up * gen_params_cfg.get("out_channels", 1), 1)
    )
    init_rngs = {"params": rng, "noise": jax.random.PRNGKey(seed + 100)}
    gen_variables = generator.init(init_rngs, mel_dummy)

    disc_params, spectral = {}, {}
    for i, (name, d) in enumerate(discriminators.items()):
        variables = d.init(jax.random.PRNGKey(seed + 1 + i), wav_dummy)
        disc_params[name] = variables["params"]
        spectral[name] = variables.get("spectral", {})

    gen_tx, gen_sched = optimizer_builder(
        model_cfg["Generator"]["optimizer"],
        model_cfg["Generator"].get("scheduler"),
        config.get("generator_grad_norm", -1),
    )
    disc_txs, disc_scheds = {}, {}
    for name in discriminators:
        disc_txs[name], disc_scheds[name] = optimizer_builder(
            model_cfg[name]["optimizer"], model_cfg[name].get("scheduler"),
            config.get("discriminator_grad_norm", -1),
        )

    state = GanTrainState(
        gen_variables["params"], gen_tx.init(gen_variables["params"]),
        disc_params, {n: disc_txs[n].init(disc_params[n]) for n in disc_txs},
        spectral, jnp.asarray(0, dtype=jnp.int32),
    )
    return {
        "generator": generator,
        "discriminators": discriminators,
        "pqmf": pqmf,
        "state": state,
        "gen_tx": gen_tx,
        "disc_txs": disc_txs,
        "schedulers": {"generator": gen_sched, "discriminator": disc_scheds},
    }


def sambert_model_builder(config: Dict[str, Any], seed: int = 0
                          ) -> Dict[str, Any]:
    """Build KanTtsSAMBERT + optimizer (reference models/__init__.py:90-123)."""
    params_cfg = dict(config["Model"]["KanTtsSAMBERT"]["params"])
    if config.get("mixed_precision", False):
        # bf16 transformer compute, f32 params/LN/softmax/output heads
        params_cfg.setdefault("compute_dtype", "bfloat16")
    model = KanTtsSAMBERT(params_cfg)
    r = params_cfg["outputs_per_step"]
    # NSF configs already include the f0/uv channels in num_mels (e.g. 82)
    n_mels = params_cfg["num_mels"]

    B, T_in, T_mel = 2, 8, 4 * r
    n_ling = 1 if params_cfg.get("using_byte", False) else 4
    if params_cfg.get("SE", False):
        spk_dummy = jnp.zeros((B, T_in, params_cfg["speaker_units"]))
    else:
        spk_dummy = jnp.zeros((B, T_in), dtype=jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(seed),
         "dropout": jax.random.PRNGKey(seed + 1)},
        jnp.zeros((B, T_in, n_ling), dtype=jnp.int32),
        jnp.zeros((B, T_in), dtype=jnp.int32),
        spk_dummy,
        jnp.full((B,), T_in, dtype=jnp.int32),
        jnp.full((B,), T_mel, dtype=jnp.int32),
        jnp.zeros((B, T_mel, n_mels)),
        duration_targets=(None if params_cfg.get("MAS", False)
                          else jnp.full((B, T_in), float(T_mel) / T_in)),
        pitch_targets=jnp.zeros((B, T_mel if params_cfg.get("MAS", False) else T_in)),
        energy_targets=jnp.zeros((B, T_mel if params_cfg.get("MAS", False) else T_in)),
        attn_priors=(jnp.ones((B, T_mel, T_in))
                     if params_cfg.get("MAS", False) else None),
        deterministic=False,
    )
    tx, sched = optimizer_builder(
        config["Model"]["KanTtsSAMBERT"]["optimizer"],
        config["Model"]["KanTtsSAMBERT"].get("scheduler"),
        config.get("grad_norm"),
    )
    state = TrainState(variables["params"], tx.init(variables["params"]),
                       jnp.asarray(0, dtype=jnp.int32))
    return {"model": model, "state": state, "tx": tx, "scheduler": sched}


def sybert_model_builder(config: Dict[str, Any], seed: int = 0
                         ) -> Dict[str, Any]:
    """(reference models/__init__.py:126-150)."""
    params_cfg = dict(config["Model"]["KanTtsTextsyBERT"]["params"])
    model = KanTtsTextsyBERT(params_cfg)
    B, T_in = 2, 8
    variables = model.init(
        {"params": jax.random.PRNGKey(seed),
         "dropout": jax.random.PRNGKey(seed + 1)},
        jnp.zeros((B, T_in, 4), dtype=jnp.int32),
        jnp.full((B,), T_in, dtype=jnp.int32),
        deterministic=False,
    )
    tx, sched = optimizer_builder(
        config["Model"]["KanTtsTextsyBERT"]["optimizer"],
        config["Model"]["KanTtsTextsyBERT"].get("scheduler"),
        config.get("grad_norm"),
    )
    state = TrainState(variables["params"], tx.init(variables["params"]),
                       jnp.asarray(0, dtype=jnp.int32))
    return {"model": model, "state": state, "tx": tx, "scheduler": sched}


model_dict = {
    "hifigan": hifigan_model_builder,
    "sambert": sambert_model_builder,
    "sybert": sybert_model_builder,
}


def model_builder(config: Dict[str, Any], seed: int = 0) -> Dict[str, Any]:
    """(reference models/__init__.py:154-164)."""
    return model_dict[config["model_type"]](config, seed)
