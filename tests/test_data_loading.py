"""Unit tests for the data-loading layer: threaded prefetch DataLoader
(byte-identical to the sync path), BERT masking dataset, FpProcessor
metafile round-trip."""

import time

import numpy as np
import pytest
import yaml

from kantts_tpu.data.dataset import (
    BERTTextDataset,
    DataLoader,
    DistributedSampler,
    MaskingActor,
)
from kantts_tpu.preprocess.fp_processor import FpProcessor
from tests.test_e2e import SAMBERT_TINY, make_symbols


class _SlowDataset:
    """List-backed dataset with uneven artificial IO latency."""

    def __init__(self, n=23):
        self.items = [np.full((4,), i, dtype=np.float32) for i in range(n)]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        time.sleep(0.001 * (i % 3))
        return self.items[i]

    def collate_fn(self, batch):
        return np.stack(batch)


class _FailingDataset(_SlowDataset):
    def __getitem__(self, i):
        if i == 5:
            raise ValueError("boom at 5")
        return super().__getitem__(i)


def _collect(loader):
    return [np.asarray(b).copy() for b in loader]


def test_prefetch_matches_sync_across_epochs():
    ds = _SlowDataset()
    sync = DataLoader(ds, 4, seed=7)
    pre = DataLoader(ds, 4, seed=7, num_workers=3, prefetch=2)
    for epoch in range(2):
        sync.sampler.set_epoch(epoch)
        pre.sampler.set_epoch(epoch)
        a, b = _collect(sync), _collect(pre)
        assert len(a) == len(b) == len(sync)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


def test_prefetch_stateful_collate_deterministic():
    """A collate that consumes a shared RandomState (the vocoder crop
    pattern) must see the same draw sequence sync vs threaded."""
    ds = _SlowDataset()

    def make_loader(workers):
        rng = np.random.RandomState(3)
        return DataLoader(
            ds, 4, seed=7, num_workers=workers,
            collate_fn=lambda b: np.stack(b) + rng.randint(0, 1000),
        )

    for x, y in zip(_collect(make_loader(0)), _collect(make_loader(3))):
        np.testing.assert_array_equal(x, y)


def test_prefetch_propagates_exception():
    loader = DataLoader(_FailingDataset(), 4, shuffle=False, num_workers=2)
    with pytest.raises(ValueError, match="boom at 5"):
        _collect(loader)


def test_prefetch_early_break_no_hang():
    ds = _SlowDataset(40)
    loader = DataLoader(ds, 4, num_workers=2, prefetch=1)
    for _ in range(3):  # re-enter after bailing out mid-epoch
        it = iter(loader)
        next(it)
        it.close()


def test_prefetch_drop_last_false():
    ds = _SlowDataset(10)
    loader = DataLoader(ds, 4, shuffle=False, drop_last=False, num_workers=2)
    batches = _collect(loader)
    assert [len(b) for b in batches] == [4, 4, 2]


def test_prefetch_respects_sampler_sharding():
    ds = _SlowDataset(16)
    batches = []
    for rank in range(2):
        loader = DataLoader(
            ds, 2, sampler=DistributedSampler(len(ds), 2, rank, shuffle=False),
            num_workers=2,
        )
        batches.append(np.concatenate([b[:, 0] for b in _collect(loader)]))
    seen = np.sort(np.concatenate(batches))
    np.testing.assert_array_equal(seen, np.arange(16, dtype=np.float32))


# ----------------------------------------------------------- BERT masking


def _bert_config():
    cfg = yaml.safe_load(yaml.safe_dump(SAMBERT_TINY))
    cfg["Model"]["KanTtsTextsyBERT"] = {"params": {"mask_ratio": 0.15}}
    return cfg


@pytest.fixture(scope="module")
def bert_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("bert_corpus")
    lines = [f"utt{i:03d}\t{make_symbols()}" for i in range(8)]
    meta = root / "bert_train.lst"
    meta.write_text("\n".join(lines) + "\n")
    return BERTTextDataset(_bert_config(), str(meta), str(root))


def test_bert_masking_semantics(bert_dataset):
    ds = bert_dataset
    lu = ds.ling_unit
    mask_id = lu.mask_id("sy")
    n_masked = n_total = n_changed = 0
    for _ in range(40):
        ling_data = ds[0]
        mask, sy_masked = ds.bert_masking(ling_data)
        orig = np.asarray(ling_data[0])
        assert mask[-1] == 0  # EOS never masked
        # unmasked positions keep the original symbol
        np.testing.assert_array_equal(sy_masked[mask == 0], orig[mask == 0])
        n_masked += int(mask.sum())
        n_total += len(mask)
        n_changed += int((sy_masked[mask == 1] == mask_id).sum())
    assert 0.02 < n_masked / n_total < 0.45  # ~15% in expectation
    assert n_changed > 0  # the 80% [MASK] branch fires


def test_masking_actor_split_ratios():
    actor = MaskingActor(0.15, np.random.RandomState(0))
    seq = np.arange(100, dtype=np.int64)
    mask = np.ones(100)
    out = actor.input_bert_masking(seq, nb_category=1000, mask_symbol_id=7777,
                                   mask=mask)
    n_mask_tok = int((out == 7777).sum())
    n_kept = int((out == seq).sum())
    assert n_mask_tok == 80  # floor(100 * 0.8)
    assert n_kept >= 10  # 10% kept + random-replacement collisions


def test_bert_collate_shapes(bert_dataset):
    ds = bert_dataset
    batch = ds.collate_fn([ds[i] for i in range(4)])
    B, L, C = batch["input_lings"].shape
    assert B == 4 and C == 4 and L % ds.input_bucket == 0
    assert batch["targets"].shape == (B, L)
    assert batch["loss_masks"].shape == (B, L)
    # targets carry the ORIGINAL sy track wherever the loss mask is set
    masked = batch["loss_masks"] == 1
    assert (batch["targets"][masked] != 0).any()
    # valid lengths exclude EOS
    assert (batch["valid_input_lengths"] == len(make_symbols().split()) - 0).all() or \
           (batch["valid_input_lengths"] >= 1).all()


def test_bert_threaded_loader_masks_deterministic(tmp_path):
    """Masks are drawn in collate_fn (coordinator thread, sampler order), so
    the threaded loader is byte-identical to the synchronous path even though
    MaskingActor holds one shared RandomState."""
    root = tmp_path / "bert_corpus"
    root.mkdir()
    lines = [f"utt{i:03d}\t{make_symbols()}" for i in range(12)]
    meta = root / "bert_train.lst"
    meta.write_text("\n".join(lines) + "\n")

    def batches(num_workers):
        ds = BERTTextDataset(_bert_config(), str(meta), str(root))
        ds.masking_actor.rng = np.random.RandomState(7)
        loader = DataLoader(ds, batch_size=4, shuffle=True, seed=5,
                            num_workers=num_workers)
        return list(loader)

    sync, threaded = batches(0), batches(4)
    assert len(sync) == len(threaded) == 3
    for a, b in zip(sync, threaded):
        for key in a:
            np.testing.assert_array_equal(a[key], b[key])


# ----------------------------------------------------------- FpProcessor


SYLLABLES = [
    ("ni_c", "tone3"), ("hao_c", "tone3"), ("ma_c", "tone5"), ("ya_c", "tone1"),
]


def _one_syllable(sy, tone, emotion="emotion_neutral"):
    return f"{{{sy}${tone}$s_both$word_both${emotion}$F7}}"


def test_fp_processor_roundtrip(tmp_path):
    # raw metafile: 4 single-syllable words per utterance
    raw_lines = []
    for i in range(3):
        syms = " ".join(_one_syllable(sy, tone) for sy, tone in SYLLABLES)
        raw_lines.append(f"utt{i:03d}\t{syms}")
    raw_meta = tmp_path / "raw_metafile.txt"
    raw_meta.write_text("\n".join(raw_lines) + "\n")

    # prosody annotation: header line + FP labels (+3 filler lines the
    # parser skips, reference fp_processor.py block stride)
    prosody_lines = []
    for i in range(3):
        prosody_lines.append(f"utt{i:03d}\t你好吗呀")
        prosody_lines.append("N FP N N")
        prosody_lines.extend(["x", "x", "x"])
    prosody = tmp_path / "prosody.txt"
    prosody.write_text("\n".join(prosody_lines) + "\n")

    proc = FpProcessor()
    fpadd = proc.addfp(str(tmp_path), str(prosody),
                       [line + "\n" for line in raw_lines])
    fpadd_lines = open(fpadd).read().strip().split("\n")
    assert len(fpadd_lines) == 3
    for line in fpadd_lines:
        toks = line.split("\t")[1].split(" ")
        assert len(toks) == 4
        # the FP-labelled 2nd syllable is tagged disgust; others neutral
        assert "emotion_disgust" in toks[1]
        assert all("emotion_neutral" in toks[j] for j in (0, 2, 3))

    fprm = proc.removefp(str(tmp_path), fpadd,
                         [line + "\n" for line in raw_lines])
    for line in open(fprm).read().strip().split("\n"):
        toks = line.split("\t")[1].split(" ")
        # filler removed -> 3 syllables, none disgust-tagged in the raw text
        assert len(toks) == 3
        assert "hao_c" not in line.split("\t")[1]
