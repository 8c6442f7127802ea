"""Data-parallel integration: the full bin trainers running with the 8-device
CPU mesh (params replicated, batches sharded) — catches sharding issues in
the trainer/loader glue that unit tests miss."""

import pytest

import glob

import yaml

pytestmark = pytest.mark.slow

from tests.test_e2e import HIFIGAN_TINY, SAMBERT_TINY, corpus  # noqa: F401


def test_train_sambert_dp(corpus, tmp_path):
    from kantts_tpu.bin.train_sambert import train

    stage = tmp_path / "am_dp"
    stage.mkdir()
    cfg = dict(SAMBERT_TINY)
    cfg["batch_size"] = 8  # divisible by the 8-device mesh
    cfg["train_max_steps"] = 3
    cfg["save_interval_steps"] = 2
    cfg_path = stage / "model.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    train(str(cfg_path), str(corpus), str(stage), data_parallel=True)
    assert glob.glob(str(stage / "ckpt" / "*.ckpt"))


def test_train_hifigan_dp(corpus, tmp_path):
    from kantts_tpu.bin.train_hifigan import train

    stage = tmp_path / "voc_dp"
    stage.mkdir()
    cfg = dict(HIFIGAN_TINY)
    cfg["batch_size"] = 8
    cfg["train_max_steps"] = 3
    cfg["save_interval_steps"] = 2
    cfg_path = stage / "model.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    train(str(cfg_path), str(corpus), str(stage), data_parallel=True)
    assert glob.glob(str(stage / "ckpt" / "*.ckpt"))


def test_train_sambert_tp(corpus, tmp_path):
    """tensor_parallel: 2 shards attention/FFN kernels over the model axis
    of a (4 data x 2 model) mesh end-to-end through the CLI."""
    from kantts_tpu.bin.train_sambert import train

    stage = tmp_path / "am_tp"
    stage.mkdir()
    cfg = dict(SAMBERT_TINY)
    cfg["batch_size"] = 8
    cfg["train_max_steps"] = 3
    cfg["save_interval_steps"] = 2
    cfg["tensor_parallel"] = 2
    cfg_path = stage / "model.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    train(str(cfg_path), str(corpus), str(stage), data_parallel=True)
    assert glob.glob(str(stage / "ckpt" / "*.ckpt"))
