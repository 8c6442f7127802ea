"""Checkpoint durability: atomic writes (crash mid-save never corrupts the
newest checkpoint — which the crash-time handler depends on) and keep-last-k
retention. Reference saves directly to the final path
(/root/reference/kantts/train/trainer.py:1007-1021) and keeps everything."""

import os

import numpy as np
import pytest

from kantts_tpu.train import trainer as trainer_mod
from kantts_tpu.train.trainer import (
    AsyncCheckpointWriter,
    load_checkpoint_bytes,
    prune_checkpoints,
    save_checkpoint_bytes,
)


def _tree(value):
    return {"model": {"w": np.full((4, 4), value, dtype=np.float32)},
            "steps": int(value)}


def test_checkpoint_roundtrip_and_no_tmp_residue(tmp_path):
    path = str(tmp_path / "ckpt" / "checkpoint_10.ckpt")
    save_checkpoint_bytes(_tree(1.0), path)
    loaded = load_checkpoint_bytes(_tree(0.0), path)
    np.testing.assert_array_equal(loaded["model"]["w"], _tree(1.0)["model"]["w"])
    assert loaded["steps"] == 1
    assert os.listdir(os.path.dirname(path)) == ["checkpoint_10.ckpt"]


def test_crash_during_save_leaves_previous_checkpoint(tmp_path, monkeypatch):
    path = str(tmp_path / "checkpoint_10.ckpt")
    save_checkpoint_bytes(_tree(1.0), path)

    # crash while the temp file is being written: the final path is untouched
    real_open = open

    def exploding_open(fname, *a, **kw):
        f = real_open(fname, *a, **kw)
        if str(fname).endswith(".tmp"):
            class _Boom:
                def __enter__(self):
                    return self

                def __exit__(self, *exc):
                    f.close()
                    return False

                def write(self, data):
                    f.write(data[: len(data) // 2])
                    raise OSError("disk full")

            return _Boom()
        return f

    monkeypatch.setattr("builtins.open", exploding_open)
    with pytest.raises(OSError):
        save_checkpoint_bytes(_tree(2.0), path)
    monkeypatch.undo()

    loaded = load_checkpoint_bytes(_tree(0.0), path)
    np.testing.assert_array_equal(loaded["model"]["w"], _tree(1.0)["model"]["w"])


def test_crash_during_rename_leaves_previous_checkpoint(tmp_path, monkeypatch):
    path = str(tmp_path / "checkpoint_10.ckpt")
    save_checkpoint_bytes(_tree(1.0), path)
    monkeypatch.setattr(trainer_mod.os, "replace",
                        lambda *a: (_ for _ in ()).throw(OSError("boom")))
    with pytest.raises(OSError):
        save_checkpoint_bytes(_tree(2.0), path)
    monkeypatch.undo()
    loaded = load_checkpoint_bytes(_tree(0.0), path)
    np.testing.assert_array_equal(loaded["model"]["w"], _tree(1.0)["model"]["w"])


def test_async_writer_ordered_and_loadable(tmp_path):
    writer = AsyncCheckpointWriter()
    path = str(tmp_path / "checkpoint_10.ckpt")
    for v in (1.0, 2.0, 3.0):  # ordered: last submit wins
        writer.submit(_tree(v), path)
    writer.submit(_tree(7.0), str(tmp_path / "checkpoint_20.ckpt"))
    writer.wait()
    loaded = load_checkpoint_bytes(_tree(0.0), path)
    np.testing.assert_array_equal(loaded["model"]["w"], _tree(3.0)["model"]["w"])
    assert loaded["steps"] == 3
    assert load_checkpoint_bytes(_tree(0.0),
                                 str(tmp_path / "checkpoint_20.ckpt"))["steps"] == 7


def test_async_writer_surfaces_errors(tmp_path):
    writer = AsyncCheckpointWriter()
    # unwritable destination: parent is a FILE
    blocker = tmp_path / "blocker"
    blocker.write_text("x")
    writer.submit(_tree(1.0), str(blocker / "checkpoint_1.ckpt"))
    with pytest.raises(OSError):
        writer.wait()
    # writer stays usable after the error
    ok = str(tmp_path / "checkpoint_2.ckpt")
    writer.submit(_tree(2.0), ok)
    writer.wait()
    assert load_checkpoint_bytes(_tree(0.0), ok)["steps"] == 2


def test_prune_checkpoints_keeps_last_k(tmp_path):
    ckpt_dir = str(tmp_path)
    for steps in (100, 20, 300, 40, 500):
        save_checkpoint_bytes(_tree(steps), os.path.join(
            ckpt_dir, f"checkpoint_{steps}.ckpt"))
    # non-matching files are never touched
    (tmp_path / "notes.txt").write_text("keep me")
    prune_checkpoints(ckpt_dir, keep_last=2)
    kept = sorted(os.listdir(ckpt_dir))
    assert kept == ["checkpoint_300.ckpt", "checkpoint_500.ckpt", "notes.txt"]
    # keep_last=0 disables retention
    prune_checkpoints(ckpt_dir, keep_last=0)
    assert sorted(os.listdir(ckpt_dir)) == kept


def test_pack_put_roundtrip():
    """Single-device batch transfer packs all leaves into one buffer and
    carves them back out on-device: values, dtypes, shapes, and non-array
    leaves must round-trip exactly (int64/float64 canonicalize like
    device_put does with x64 off)."""
    import numpy as np

    from kantts_tpu.train.trainer import pack_put

    rng = np.random.RandomState(0)
    batch = {
        "f32": rng.randn(4, 7, 3).astype(np.float32),
        "i64": rng.randint(0, 100, (4, 9)),
        "i32": np.asarray([3, 1, 2, 9], dtype=np.int32),
        "bool": rng.rand(2, 5) > 0.5,
        "f16": rng.randn(3, 2).astype(np.float16),
        "none": None,
        "scalar": 7,
        "nested": {"h": rng.randn(2, 2).astype(np.float32)},
    }
    out = pack_put(batch)
    for key in ("f32", "i32", "f16"):
        assert np.array_equal(np.asarray(out[key]), batch[key])
        assert out[key].dtype == batch[key].dtype
    assert np.array_equal(np.asarray(out["i64"]), batch["i64"])
    assert out["i64"].dtype == np.int32
    assert np.array_equal(np.asarray(out["bool"]), batch["bool"])
    assert np.array_equal(np.asarray(out["nested"]["h"]), batch["nested"]["h"])
    assert out["none"] is None and out["scalar"] == 7
