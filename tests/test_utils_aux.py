"""Unit tests for the small auxiliary modules: utils/log.py, utils/plot.py,
data/data_types.py (the remaining untested coverage holes)."""

import logging
import os

import numpy as np

from kantts_tpu.data.data_types import DATA_TYPE_DICT, get_loader
from kantts_tpu.utils.log import logging_to_file, stamp_logs
from kantts_tpu.utils.plot import (
    plot_alignment,
    plot_spectrogram,
    plot_waveform,
)


def test_logging_to_file_writes_records(tmp_path):
    log_file = tmp_path / "sub" / "train.log"
    root = logging.getLogger()
    n_handlers = len(root.handlers)
    logging_to_file(str(log_file))
    try:
        old_level = root.level
        root.setLevel(logging.INFO)
        logging.info("hello-from-test")
        stamp_logs()
        root.setLevel(old_level)
        for h in root.handlers:
            h.flush()
        text = log_file.read_text()
        assert "hello-from-test" in text
        assert "git revision hash" in text
    finally:
        for h in root.handlers[n_handlers:]:
            root.removeHandler(h)
            h.close()


def test_plot_functions_write_files(tmp_path):
    rng = np.random.RandomState(0)
    spec_path = tmp_path / "spec.png"
    align_path = tmp_path / "align.png"
    wav_path = tmp_path / "wav.png"
    plot_spectrogram(rng.rand(40, 80), str(spec_path))
    plot_alignment(rng.rand(40, 12), str(align_path), info="step 1")
    plot_waveform(rng.randn(1600).astype(np.float32), str(wav_path))
    for p in (spec_path, align_path, wav_path):
        assert p.exists() and p.stat().st_size > 0


def test_data_type_loaders(tmp_path):
    txt = tmp_path / "a.txt"
    txt.write_text("one\ntwo\n")
    assert get_loader("txt")(str(txt)) == ["one", "two"]

    arr = np.arange(6, dtype=np.float32).reshape(2, 3)
    npy = tmp_path / "a.npy"
    np.save(npy, arr)
    np.testing.assert_array_equal(get_loader("npy")(str(npy)), arr)

    raw = np.arange(5, dtype=np.float32)
    binf = tmp_path / "a.bin"
    raw.tofile(binf)
    np.testing.assert_array_equal(get_loader("bin")(str(binf)), raw)

    assert set(DATA_TYPE_DICT) == {"txt", "wav", "npy", "bin"}
    try:
        get_loader("xyz")
        raise AssertionError("expected KeyError")
    except KeyError:
        pass
