"""SE processor tests: kaldi fbank sanity + numerical parity of the JAX
D-TDNN inference against the reference torch implementation (imported
read-only from /root/reference purely as a test oracle)."""

import os
import sys

import numpy as np
import pytest

from kantts_tpu.preprocess.se_processor import dtdnn_embed, kaldi_fbank


def test_kaldi_fbank_shape_and_values():
    sr = 16000
    t = np.arange(sr) / sr
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    feat = kaldi_fbank(wav, sr, num_mel_bins=80)
    # snip_edges: 1 + (16000-400)//160 frames
    assert feat.shape == (1 + (sr - 400) // 160, 80)
    assert np.isfinite(feat).all()
    # 440 Hz tone: energy concentrated in low mel bins
    mean_spec = feat.mean(axis=0)
    assert mean_spec[:20].max() > mean_spec[60:].max()


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference tree not available")
def test_dtdnn_matches_reference_torch():
    import torch

    sys.path.insert(0, "/root/reference")
    from kantts.preprocess.se_processor.D_TDNN import DTDNN

    torch.manual_seed(0)
    model = DTDNN()
    model.eval()
    # randomize batchnorm running stats so the test isn't trivially identity
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(0)
    feat = rng.randn(1, 230, 80).astype(np.float32)

    with torch.no_grad():
        ref = model(torch.from_numpy(feat)).numpy()

    params = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    ours = dtdnn_embed(params, feat)

    assert ours.shape == ref.shape == (1, 192)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)
