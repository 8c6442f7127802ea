"""Device-mesh data parallelism (jax.sharding + jit/GSPMD).

The reference's entire parallelism story is multi-process DDP over NCCL with
gradient allreduce (/root/reference/kantts/train/trainer.py:25-52 +
models/__init__.py:71-84). The TPU-native equivalent here:

- one mesh axis ``data``; params/optimizer state REPLICATED, batches SHARDED
  on the leading axis;
- the train step is jitted with NamedSharding constraints; XLA/GSPMD inserts
  the gradient all-reduce over ICI automatically (replicated-out params from
  sharded-in data);
- multi-host: ``jax.distributed.initialize`` + the same mesh spanning all
  processes; per-host input sharding replaces DistributedSampler
  (reference bin/train_sambert.py:108-122); process 0 handles checkpoint/eval
  (reference rank-0 gating, trainer.py:209-212).

Models at the reference's scale (10-100M params) train fine with pure DP;
for scaling beyond it (larger variants, or cutting single-utterance latency
across a pod slice) parallel/tp.py adds Megatron-style tensor parallelism
and sequence-parallel vocoder inference on a 2-D ("data", "model") mesh.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host rendezvous (the `init_process_group(env://)` analogue,
    reference trainer.py:25-52). No-op for single-process runs.

    On the CPU platform (multi-process simulation / tests), cross-process
    collectives need the gloo transport; select it before the backend exists.
    """
    if num_processes is not None and num_processes > 1:
        import os

        if os.environ.get("JAX_PLATFORMS", "") == "cpu":
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(coordinator_address, num_processes, process_id)


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the ``data`` axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Put every array in the batch with batch-axis sharding.

    Single-process: a plain device_put scatter. Multi-process: each host's
    loader yields a DIFFERENT local batch (DistributedSampler shards
    indices), so the local arrays are per-process SHARDS of a global batch —
    assemble them with make_array_from_process_local_data (the torch-DDP
    per-rank-batch analogue; reference bin/train_sambert.py:108-122)."""
    sharding = data_sharding(mesh)
    if jax.process_count() > 1:
        def put(x):
            if not (hasattr(x, "shape") and x.ndim):
                return x
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            )
    else:
        def put(x):
            return (jax.device_put(x, sharding)
                    if hasattr(x, "shape") and x.ndim else x)
    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def is_primary() -> bool:
    """Process-0 gate for checkpoint/eval/log (rank-0 analogue)."""
    return jax.process_index() == 0
