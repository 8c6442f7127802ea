"""Tensor / sequence parallelism over a 2-D ("data", "model") device mesh.

The reference's only parallelism is multi-process DDP over NCCL
(/root/reference/kantts/train/trainer.py:25-52); data parallelism here is
its GSPMD equivalent (parallel/mesh.py). This module goes beyond the
reference with TPU-native model parallelism — useful when scaling SAM-BERT
variants past a single chip's HBM, or for cutting single-utterance latency
across a pod slice:

- **Tensor parallelism (Megatron-style)**: attention qkv / FFN-inner kernels
  are column-sharded and the corresponding output projections row-sharded
  over the ``model`` axis via GSPMD PartitionSpecs. XLA inserts exactly one
  all-reduce per attention / FFN block over ICI. Everything else (norms,
  embeddings, LSTMs, prediction heads) stays replicated. Specs only steer
  layout — GSPMD guarantees the same numerics as the unsharded program
  modulo float reduction order (asserted in tests/test_tensor_parallel.py).
- **Sequence parallelism (inference)**: the HiFi-GAN conv stack is sharded
  along the TIME axis of the mel input; XLA spatially partitions every conv
  (halo exchange at shard edges), so one long utterance is synthesized
  cooperatively by all devices in the ``model`` axis.

Composes with data parallelism: a (n_dp, n_tp) mesh runs the same jitted
train step with batches sharded over ``data`` and the parameter/optimizer
leaves sharded per these rules over ``model``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kantts_tpu.parallel.mesh import DATA_AXIS

MODEL_AXIS = "model"

# layer names (the immediate parent of a kernel/bias leaf) that shard by
# OUTPUT dim (column parallel) / by INPUT dim (row parallel). Scoped to the
# attention / conv-FFN modules so e.g. predictor output heads named "fc"
# stay replicated.
_COL_LAYERS = {"w_qkv", "w_x_qkv", "w_h_kv", "w_1"}
_ROW_LAYERS = {"fc", "fc_x", "fc_h", "w_2"}
_TP_SCOPES = {"slf_attn", "pnca_attn", "pos_ffn", "fsmn"}


def make_mesh_2d(n_data: int, n_model: int, devices=None) -> Mesh:
    """("data", "model") mesh; ``model`` should map to an ICI-adjacent
    submesh on real hardware (jax.devices() order already is)."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: n_data * n_model]).reshape(
        n_data, n_model)
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def _tp_spec(keys, shape, n_model: int) -> P:
    """PartitionSpec for one param (or optimizer-moment) leaf by path."""
    if len(keys) < 2 or not shape:
        return P()
    leaf, layer = keys[-1], keys[-2]
    if not _TP_SCOPES & set(keys[:-2]):
        return P()
    if layer in _COL_LAYERS:
        if leaf == "kernel" and shape[-1] % n_model == 0:
            return P(*([None] * (len(shape) - 1)), MODEL_AXIS)
        if leaf == "bias" and shape[0] % n_model == 0:
            return P(MODEL_AXIS)
    elif layer in _ROW_LAYERS and leaf == "kernel" and len(shape) >= 2 \
            and shape[-2] % n_model == 0:
        return P(*([None] * (len(shape) - 2)), MODEL_AXIS, None)
    return P()


def _path_keys(path):
    keys = []
    for k in path:
        name = getattr(k, "key", None)
        if name is None:
            name = getattr(k, "name", None)
        if isinstance(name, str):
            keys.append(name)
    return keys


def tp_shardings(tree: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a params / TrainState / optimizer-state tree.

    Optimizer moments (Adam mu/nu) nest the param dict paths, so the same
    path rules shard them identically to their params — a requirement for
    elementwise optimizer updates to stay local."""
    n_model = mesh.shape[MODEL_AXIS]

    def per_leaf(path, leaf):
        spec = _tp_spec(_path_keys(path), tuple(getattr(leaf, "shape", ())),
                        n_model)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(per_leaf, tree)


def shard_state(state: Any, mesh: Mesh) -> Any:
    """Place a TrainState on the mesh with TP shardings (replicated over
    ``data``, attention/FFN leaves sharded over ``model``)."""
    return jax.tree_util.tree_map(
        jax.device_put, state, tp_shardings(state, mesh))


def time_sharded(mel, mesh: Mesh, time_axis: int = 1):
    """Shard an activation along its time axis over the ``model`` axis
    (sequence-parallel vocoder inference). XLA handles conv halo exchange."""
    spec = [None] * mel.ndim
    spec[time_axis] = MODEL_AXIS
    return jax.device_put(mel, NamedSharding(mesh, P(*spec)))
