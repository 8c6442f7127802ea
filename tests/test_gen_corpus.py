"""Guards for tools/gen_corpus.py: the generated corpus must satisfy the
AMDataset/VocDataset contracts and carry the advertised speech statistics
(log-normal durations in range, declining voiced F0, learnable phone
identity), since the sustained-training evidence rests on it."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gen_corpus"))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_corpus.py"), root,
         "--n", "6", "--max-s", "3", "--min-s", "1"],
        check=True, env=env, cwd=REPO, timeout=600,
    )
    return root


def test_layout_and_metafile(corpus):
    for sub in ["wav", "mel", "duration", "f0", "energy", "frame_f0",
                "frame_uv"]:
        assert os.listdir(os.path.join(corpus, sub)), sub
    lines = open(os.path.join(corpus, "raw_metafile.txt")).read().splitlines()
    assert len(lines) == 6
    # symbols must encode through the production linguistic unit
    sys.path.insert(0, REPO)
    from kantts_tpu.text.ling_unit import KanTtsLinguisticUnit

    lu = KanTtsLinguisticUnit({"linguistic_unit": {
        "cleaners": "english_cleaners",
        "lfeat_type_list": "sy,tone,syllable_flag,word_segment,"
                           "emo_category,speaker_category",
        "speaker_list": "F7,F1,M2,M9"}})
    for line in lines:
        utt, symbols = line.split("\t")
        seqs = lu.encode_symbol_sequence(symbols)
        n_dur = np.load(os.path.join(corpus, "duration", utt + ".npy")).shape[0]
        # sy track length = phones + EOS slot
        assert len(seqs[0]) == n_dur + 1


def test_feature_consistency(corpus):
    for utt in [f"utt{i:04d}" for i in range(6)]:
        mel = np.load(os.path.join(corpus, "mel", utt + ".npy"))
        dur = np.load(os.path.join(corpus, "duration", utt + ".npy"))
        f0 = np.load(os.path.join(corpus, "f0", utt + ".npy"))
        uv = np.load(os.path.join(corpus, "frame_uv", utt + ".npy"))
        assert mel.shape[1] == 80
        assert dur.sum() == mel.shape[0] == len(f0) == len(uv)
        assert dur.min() >= 1 and dur.max() <= 40
        # voiced fraction is speech-like (finals are voiced, most initials not)
        assert 0.4 < uv.mean() <= 1.0
        # normalized f0 on voiced frames has ~zero mean corpus-wide; per-utt
        # it stays bounded
        assert abs(f0[uv > 0].mean()) < 3.0


def test_f0_declines_within_utterance(corpus):
    """The declination contour: early voiced frames sit above late ones on
    average (the statistic the pitch predictor should learn)."""
    drops = []
    for utt in [f"utt{i:04d}" for i in range(6)]:
        f0 = np.load(os.path.join(corpus, "frame_f0", utt + ".npy"))
        uv = np.load(os.path.join(corpus, "frame_uv", utt + ".npy"))
        v = np.where(uv > 0)[0]
        first, last = v[: len(v) // 3], v[-len(v) // 3:]
        drops.append(f0[first].mean() - f0[last].mean())
    assert np.mean(drops) > 0.1  # in corpus-sigma units


def test_phone_identity_is_learnable(corpus):
    """Repeated occurrences of the same phone must be acoustically closer
    than different phones (otherwise MAS has nothing to align to): average
    within-phone mel-frame distance < across-phone distance."""
    lines = open(os.path.join(corpus, "raw_metafile.txt")).read().splitlines()
    frames_by_phone = {}
    for line in lines:
        utt, symbols = line.split("\t")
        mel = np.load(os.path.join(corpus, "mel", utt + ".npy"))
        durs = np.load(os.path.join(corpus, "duration", utt + ".npy"))
        phones = [tok[1:].split("$")[0] for tok in symbols.split()]
        pos = 0
        for ph, d in zip(phones, durs):
            mid = mel[pos + d // 2]  # steady-state frame
            frames_by_phone.setdefault(ph, []).append(mid)
            pos += d
    multi = {p: np.stack(v) for p, v in frames_by_phone.items() if len(v) >= 2}
    assert len(multi) >= 5  # 144-phone inventory; a 6-utt corpus repeats few
    centroids = {p: v.mean(0) for p, v in multi.items()}
    within = np.mean([np.linalg.norm(v - centroids[p], axis=1).mean()
                      for p, v in multi.items()])
    cents = np.stack(list(centroids.values()))
    across = np.mean([np.linalg.norm(cents[i] - cents[j])
                      for i in range(len(cents))
                      for j in range(i + 1, len(cents))])
    assert within < across, (within, across)


def test_bench_sustained_parse_sps(tmp_path):
    """The trainer's log sentences end with a period right after the value —
    the parser must not absorb it into the float (round-4 regression)."""
    from tools.bench_sustained import parse_sps

    log = tmp_path / "stdout.log"
    log.write_text(
        "2026-08-18:14:34:40, INFO [trainer.py:277] "
        "(Steps: 200) steps_per_sec = 0.419.\n"
        "noise line\n"
        "2026-08-18:14:35:41, INFO [trainer.py:277] "
        "(Steps: 300) steps_per_sec = 4.\n"
        # a killed segment re-trained step 200: keep the LAST occurrence
        "2026-08-18:14:44:40, INFO [trainer.py:277] "
        "(Steps: 200) steps_per_sec = 0.5.\n"
    )
    assert parse_sps(str(log)) == [(200, 0.5), (300, 4.0)]
