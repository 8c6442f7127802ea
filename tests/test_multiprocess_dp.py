"""Multi-process data parallelism simulation: 2 CPU processes rendezvous via
jax.distributed (gloo collectives), each loads a DISJOINT half of the global
batch through DistributedSampler, and one jitted SAM-BERT train step over the
2-process mesh must reproduce the single-process update on the same global
batch — the semantics of the reference's DDP allreduce
(/root/reference/kantts/train/trainer.py:25-52, models/__init__.py:71-84)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env():
    """Subprocess env: CPU platform, 1 local device, and NO axon
    sitecustomize (it initializes the PJRT backend at interpreter start,
    which breaks multi-process federation)."""
    env = dict(os.environ)
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([REPO] + pp)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    return env


@pytest.fixture(scope="module")
def mp_run(tmp_path_factory):
    outdir = tmp_path_factory.mktemp("mp_dp")
    port = _free_port()
    env = _clean_env()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_dp_worker.py"),
             str(rank), "2", str(port), str(outdir)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for rank in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        logs.append(out)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    return outdir


def test_sampler_shards_are_disjoint(mp_run):
    idx0 = json.load(open(mp_run / "rank0_indices.json"))
    idx1 = json.load(open(mp_run / "rank1_indices.json"))
    assert len(idx0) == len(idx1) == 2
    assert not set(idx0) & set(idx1)
    assert set(idx0) | set(idx1) == set(range(4))


def test_metrics_agree_across_ranks(mp_run):
    m0 = json.load(open(mp_run / "rank0_metrics.json"))
    m1 = json.load(open(mp_run / "rank1_metrics.json"))
    assert m0.keys() == m1.keys()
    for k in m0:
        assert abs(m0[k] - m1[k]) < 1e-5, (k, m0[k], m1[k])


def test_primary_gating(mp_run):
    assert (mp_run / "params_mp.msgpack").exists()
    # only rank 0 writes params; both write their metrics
    assert (mp_run / "rank1_metrics.json").exists()


def test_update_matches_single_process(mp_run):
    """The 2-process DP step == a single-process step on the same global
    batch (assembled in mesh device order: rank0 shard then rank1 shard)."""
    import jax
    from flax import serialization

    from kantts_tpu.parallel.mesh import make_mesh
    from tests.mp_dp_worker import build_and_step, full_batch

    idx0 = json.load(open(mp_run / "rank0_indices.json"))
    idx1 = json.load(open(mp_run / "rank1_indices.json"))
    order = np.asarray(idx0 + idx1)
    ref = {k: v[order] for k, v in full_batch().items()}

    mesh = make_mesh(2)  # 2 of the 8 virtual local devices
    state, metrics = build_and_step(mesh, ref)

    m0 = json.load(open(mp_run / "rank0_metrics.json"))
    for k, v in m0.items():
        assert abs(float(metrics[k]) - v) < 1e-4, (k, float(metrics[k]), v)

    params_sp = jax.tree_util.tree_map(np.asarray, state.params)
    with open(mp_run / "params_mp.msgpack", "rb") as f:
        params_mp = serialization.from_bytes(params_sp, f.read())
    flat_sp = jax.tree_util.tree_leaves_with_path(params_sp)
    flat_mp = jax.tree_util.tree_leaves(params_mp)
    assert len(flat_sp) == len(flat_mp)
    for (path, a), b in zip(flat_sp, flat_mp):
        np.testing.assert_allclose(
            a, b, atol=2e-5, rtol=1e-4,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}",
        )
