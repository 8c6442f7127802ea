"""SAM-BERT tests: primitives vs torch, MAS scan vs numpy DP, teacher-forced
vs incremental decoder equivalence, full train/infer shape contracts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kantts_tpu.models.sambert.adaptors import length_regulate
from kantts_tpu.models.sambert.alignment import b_mas, mas_width1, mas_width1_np
from kantts_tpu.models.sambert.lstm import LSTM, BiLSTM, reverse_sequence
from kantts_tpu.models.sambert.pnca import MelPNCADecoder, pnca_decoder_infer
from kantts_tpu.models.sambert.sambert import (
    KanTtsSAMBERT,
    KanTtsTextsyBERT,
    average_frame_feat,
    make_mel_decoder,
    sambert_infer,
)

TINY = dict(
    max_len=64,
    embedding_dim=32,
    encoder_num_layers=2,
    encoder_num_heads=2,
    encoder_num_units=16,
    encoder_ffn_inner_dim=32,
    encoder_dropout=0.1,
    encoder_attention_dropout=0.1,
    encoder_relu_dropout=0.1,
    encoder_projection_units=8,
    speaker_units=8,
    emotion_units=8,
    predictor_filter_size=5,
    predictor_fsmn_num_layers=1,
    predictor_num_memory_units=16,
    predictor_ffn_inner_dim=16,
    predictor_dropout=0.1,
    predictor_shift=0,
    predictor_lstm_units=8,
    dur_pred_prenet_units=[8, 8],
    dur_pred_lstm_units=8,
    decoder_prenet_units=[16, 16],
    decoder_num_layers=2,
    decoder_num_heads=2,
    decoder_num_units=16,
    decoder_ffn_inner_dim=32,
    decoder_dropout=0.1,
    decoder_attention_dropout=0.1,
    decoder_relu_dropout=0.1,
    outputs_per_step=3,
    num_mels=10,
    postnet_filter_size=5,
    postnet_fsmn_num_layers=2,
    postnet_num_memory_units=16,
    postnet_ffn_inner_dim=16,
    postnet_dropout=0.1,
    postnet_shift=1,
    postnet_lstm_units=8,
    sy=20,
    tone=6,
    syllable_flag=8,
    word_segment=8,
    emotion=5,
    speaker=3,
)


def test_lstm_matches_torch():
    import torch

    B, T, D, H = 2, 7, 5, 4
    rng = np.random.RandomState(0)
    x = rng.randn(B, T, D).astype(np.float32)
    tl = torch.nn.LSTM(D, H, num_layers=2, batch_first=True)
    with torch.no_grad():
        ty, (th, tc) = tl(torch.from_numpy(x))

    params = {}
    for layer in range(2):
        params[f"w_ih_l{layer}"] = jnp.asarray(
            getattr(tl, f"weight_ih_l{layer}").detach().numpy().T
        )
        params[f"w_hh_l{layer}"] = jnp.asarray(
            getattr(tl, f"weight_hh_l{layer}").detach().numpy().T
        )
        params[f"b_ih_l{layer}"] = jnp.asarray(
            getattr(tl, f"bias_ih_l{layer}").detach().numpy()
        )
        params[f"b_hh_l{layer}"] = jnp.asarray(
            getattr(tl, f"bias_hh_l{layer}").detach().numpy()
        )
    mod = LSTM(H, num_layers=2)
    jy, (jh, jc) = mod.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jy), ty.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jh), th.numpy(), atol=1e-5)


def test_bilstm_matches_torch_packed():
    import torch

    B, T, D, H = 2, 6, 5, 4
    rng = np.random.RandomState(1)
    x = rng.randn(B, T, D).astype(np.float32)
    lengths = np.array([6, 4])
    x[1, 4:] = 0.0

    tl = torch.nn.LSTM(D, H, batch_first=True, bidirectional=True)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), lengths.tolist(), batch_first=True, enforce_sorted=False
    )
    with torch.no_grad():
        ty, _ = tl(packed)
    ty, _ = torch.nn.utils.rnn.pad_packed_sequence(ty, batch_first=True, total_length=T)

    params = {}
    for suffix in ["", "_reverse"]:
        params[f"w_ih_l0{suffix}"] = jnp.asarray(
            getattr(tl, f"weight_ih_l0{suffix}").detach().numpy().T
        )
        params[f"w_hh_l0{suffix}"] = jnp.asarray(
            getattr(tl, f"weight_hh_l0{suffix}").detach().numpy().T
        )
        params[f"b_ih_l0{suffix}"] = jnp.asarray(
            getattr(tl, f"bias_ih_l0{suffix}").detach().numpy()
        )
        params[f"b_hh_l0{suffix}"] = jnp.asarray(
            getattr(tl, f"bias_hh_l0{suffix}").detach().numpy()
        )
    mod = BiLSTM(H)
    jy = mod.apply({"params": params}, jnp.asarray(x), jnp.asarray(lengths))
    # valid region matches the packed-sequence reference
    np.testing.assert_allclose(np.asarray(jy)[0], ty.numpy()[0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(jy)[1, :4], ty.numpy()[1, :4], atol=1e-5)


def test_reverse_sequence():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 6, 2))
    x = jnp.concatenate([x, x], axis=0)
    rev = reverse_sequence(x, jnp.asarray([6, 3]))
    np.testing.assert_allclose(np.asarray(rev)[0, 0], [10, 11])
    np.testing.assert_allclose(np.asarray(rev)[1, 0], [4, 5])
    np.testing.assert_allclose(np.asarray(rev)[1, 3:], 0.0)


def test_length_regulate():
    x = jnp.asarray(np.arange(6, dtype=np.float32).reshape(1, 3, 2))
    dur = jnp.asarray([[2.0, 1.0, 3.0]])
    out, lens = length_regulate(x, dur, 9)
    assert int(lens[0]) == 6
    expected = np.array(
        [[0, 1], [0, 1], [2, 3], [4, 5], [4, 5], [4, 5], [0, 0], [0, 0], [0, 0]],
        dtype=np.float32,
    )
    np.testing.assert_allclose(np.asarray(out)[0], expected)


def test_length_regulate_rounding():
    x = jnp.ones((1, 2, 1))
    dur = jnp.asarray([[1.4, 1.6]])  # rounds to 1, 2
    _, lens = length_regulate(x, dur, 6)
    assert int(lens[0]) == 3


def test_mas_matches_numpy():
    rng = np.random.RandomState(0)
    T_mel, T_text = 20, 7
    attn = rng.rand(T_mel, T_text).astype(np.float32)
    attn = attn / attn.sum(-1, keepdims=True)
    ref = mas_width1_np(attn)
    ours = np.asarray(mas_width1(jnp.asarray(attn), jnp.asarray(T_mel), jnp.asarray(T_text)))
    np.testing.assert_array_equal(ours, ref)


def test_b_mas_with_lengths():
    rng = np.random.RandomState(1)
    B, T_mel, T_text = 3, 16, 6
    attn = rng.rand(B, 1, T_mel, T_text).astype(np.float32)
    in_lens = np.array([6, 4, 5])
    out_lens = np.array([16, 10, 12])
    hard = np.asarray(b_mas(jnp.asarray(attn), jnp.asarray(in_lens), jnp.asarray(out_lens)))
    for b in range(B):
        ref = mas_width1_np(attn[b, 0, : out_lens[b], : in_lens[b]])
        np.testing.assert_array_equal(hard[b, 0, : out_lens[b], : in_lens[b]], ref)
        # durations sum to out_len; monotonic path covers all valid rows
        assert hard[b, 0].sum() == out_lens[b]
        assert hard[b, 0, out_lens[b]:, :].sum() == 0
        assert hard[b, 0, :, in_lens[b]:].sum() == 0


def test_average_frame_feat_matches_torch_semantics():
    rng = np.random.RandomState(0)
    B, T_mel, T_in = 2, 12, 4
    feat = rng.rand(B, T_mel).astype(np.float32)
    feat[0, 3] = 0.0  # a zero frame should be excluded from the mean
    durs = np.array([[3, 4, 3, 2], [2, 2, 4, 4]], dtype=np.int32)

    out = np.asarray(average_frame_feat(jnp.asarray(feat), jnp.asarray(durs)))
    for b in range(B):
        start = 0
        for i, d in enumerate(durs[b]):
            seg = feat[b, start : start + d]
            nz = seg[seg != 0]
            expected = nz.mean() if len(nz) else 0.0
            np.testing.assert_allclose(out[b, i], expected, rtol=1e-5)
            start += d


@pytest.fixture(scope="module")
def train_batch():
    rng = np.random.RandomState(0)
    B, T_in, T_mel = 2, 12, 24  # T_mel multiple of r=3
    batch = dict(
        inputs_ling=jnp.asarray(rng.randint(0, 5, (B, T_in, 4)), dtype=jnp.int32),
        inputs_emotion=jnp.asarray(rng.randint(0, 4, (B, T_in)), dtype=jnp.int32),
        inputs_speaker=jnp.asarray(rng.randint(0, 2, (B, T_in)), dtype=jnp.int32),
        input_lengths=jnp.asarray([12, 9]),
        output_lengths=jnp.asarray([24, 17]),
        mel_targets=jnp.asarray(rng.randn(B, T_mel, 10).astype(np.float32)),
        pitch_targets=jnp.asarray(np.abs(rng.randn(B, T_in)).astype(np.float32)),
        energy_targets=jnp.asarray(np.abs(rng.randn(B, T_in)).astype(np.float32)),
    )
    # durations sum to padded mel length per item
    dur = np.zeros((B, T_in), dtype=np.float32)
    dur[0] = 2
    dur[1, :9] = [2, 2, 2, 2, 2, 2, 2, 2, 1]
    dur[1, 9] = 24 - 17  # mel padding stashed on EOS slot
    batch["duration_targets"] = jnp.asarray(dur)
    return batch


@pytest.mark.slow
def test_sambert_train_forward(train_batch):
    model = KanTtsSAMBERT(TINY)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **train_batch, deterministic=False,
    )
    res = model.apply(
        variables, **train_batch, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert res["dec_outputs"].shape == (2, 24, 10)
    assert res["postnet_outputs"].shape == (2, 24, 10)
    assert res["log_duration_predictions"].shape == (2, 12)
    assert res["pitch_predictions"].shape == (2, 12)
    # padded region zeroed
    np.testing.assert_allclose(np.asarray(res["postnet_outputs"])[1, 17:], 0.0)
    assert len(res["pnca_x_attn_lst"]) == 2


@pytest.mark.slow  # 18-37 s of XLA:CPU trace+compile on this 1-core box; equivalent coverage stays in the full tier
def test_sambert_train_forward_mas(train_batch):
    cfg = dict(TINY, MAS=True)
    model = KanTtsSAMBERT(cfg)
    batch = dict(train_batch)
    batch.pop("duration_targets")
    B, T_mel, T_in = 2, 24, 12
    rng = np.random.RandomState(3)
    batch["attn_priors"] = jnp.asarray(
        np.abs(rng.rand(B, T_mel, T_in)).astype(np.float32)
    )
    batch["pitch_targets"] = jnp.asarray(np.abs(rng.randn(B, T_mel)).astype(np.float32))
    batch["energy_targets"] = jnp.asarray(np.abs(rng.randn(B, T_mel)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, deterministic=False,
    )
    res = model.apply(
        variables, **batch, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert res["attn_soft"].shape == (2, 1, 24, 12)
    assert res["attn_hard"].shape == (2, 1, 24, 12)
    # hard durations + stashed padding sum to padded mel length
    d = np.asarray(res["duration_targets"])
    np.testing.assert_allclose(d.sum(axis=1), [24.0, 24.0])
    # pitch targets are now token-level
    assert res["pitch_targets"].shape == (2, 12)


def test_decoder_train_infer_equivalence():
    """The incremental scan decode must reproduce the parallel teacher-forced
    pass when teacher inputs equal the incrementally generated frames."""
    cfg = TINY
    decoder = make_mel_decoder(cfg)
    B, T_lfr = 1, 6
    d_mem = cfg["encoder_projection_units"] * 3 + 16
    rng = np.random.RandomState(0)
    memory = jnp.asarray(rng.randn(B, T_lfr, d_mem).astype(np.float32))
    x_band = jnp.asarray(3)
    h_band = jnp.asarray(3)

    target_dummy = jnp.zeros((B, T_lfr * 3, cfg["num_mels"]))
    variables = decoder.init(
        jax.random.PRNGKey(0), memory, x_band, h_band, target_dummy,
    )

    # incremental decode
    inferred = pnca_decoder_infer(decoder, variables, memory, x_band, h_band)
    assert inferred.shape == (B, T_lfr, cfg["num_mels"] * 3)

    # build the full-frame-rate target whose last-frame-per-group equals the
    # frames the incremental decoder fed itself
    mel_full = np.asarray(inferred).reshape(B, T_lfr * 3, cfg["num_mels"])
    parallel, _, _ = decoder.apply(
        variables, memory, x_band, h_band, jnp.asarray(mel_full),
    )
    np.testing.assert_allclose(
        np.asarray(parallel), np.asarray(inferred), atol=2e-4
    )


@pytest.mark.slow
def test_sambert_infer_end_to_end():
    model = KanTtsSAMBERT(TINY)
    rng = np.random.RandomState(0)
    B, T_in = 1, 8
    batch = dict(
        inputs_ling=jnp.asarray(rng.randint(0, 5, (B, T_in, 4)), dtype=jnp.int32),
        inputs_emotion=jnp.asarray(rng.randint(0, 4, (B, T_in)), dtype=jnp.int32),
        inputs_speaker=jnp.asarray(rng.randint(0, 2, (B, T_in)), dtype=jnp.int32),
        input_lengths=jnp.asarray([8]),
        output_lengths=jnp.asarray([24]),
        mel_targets=jnp.zeros((B, 24, 10)),
        duration_targets=jnp.asarray(np.full((B, T_in), 3.0, dtype=np.float32)),
        pitch_targets=jnp.zeros((B, T_in)),
        energy_targets=jnp.zeros((B, T_in)),
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, deterministic=False,
    )
    res = sambert_infer(
        model, variables,
        batch["inputs_ling"], batch["inputs_emotion"], batch["inputs_speaker"],
        batch["input_lengths"], max_output_len=48,
    )
    assert res["postnet_outputs"].shape == (1, 48, 10)
    assert res["duration_predictions"].shape == (1, 8)
    valid = int(res["LR_length_rounded"][0])
    assert 0 <= valid <= 48


@pytest.mark.slow
def test_sambert_infer_duration_override():
    """duration_override must drive the length regulator exactly: the
    returned valid length equals the injected duration sum, and the output
    differs from the AR-predicted-duration decode when durations differ."""
    model = KanTtsSAMBERT(TINY)
    rng = np.random.RandomState(1)
    B, T_in = 1, 8
    batch = dict(
        inputs_ling=jnp.asarray(rng.randint(0, 5, (B, T_in, 4)), dtype=jnp.int32),
        inputs_emotion=jnp.asarray(rng.randint(0, 4, (B, T_in)), dtype=jnp.int32),
        inputs_speaker=jnp.asarray(rng.randint(0, 2, (B, T_in)), dtype=jnp.int32),
        input_lengths=jnp.asarray([8]),
        output_lengths=jnp.asarray([24]),
        mel_targets=jnp.zeros((B, 24, 10)),
        duration_targets=jnp.asarray(np.full((B, T_in), 3.0, dtype=np.float32)),
        pitch_targets=jnp.zeros((B, T_in)),
        energy_targets=jnp.zeros((B, T_in)),
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, deterministic=False,
    )
    dur = jnp.asarray(np.array([[2, 4, 3, 5, 2, 6, 1, 1]], dtype=np.float32))
    res = sambert_infer(
        model, variables,
        batch["inputs_ling"], batch["inputs_emotion"], batch["inputs_speaker"],
        batch["input_lengths"], max_output_len=48, duration_override=dur,
    )
    assert int(res["LR_length_rounded"][0]) == min(int(dur.sum()), 48)
    # the duration head still reports its own predictions
    assert res["duration_predictions"].shape == (1, 8)
    res_own = sambert_infer(
        model, variables,
        batch["inputs_ling"], batch["inputs_emotion"], batch["inputs_speaker"],
        batch["input_lengths"], max_output_len=48,
    )
    assert not np.allclose(np.asarray(res["postnet_outputs"]),
                           np.asarray(res_own["postnet_outputs"]))


def test_textsy_bert():
    model = KanTtsTextsyBERT(TINY)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 5, (2, 10, 4)), dtype=jnp.int32)
    lengths = jnp.asarray([10, 7])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, lengths,
    )
    res = model.apply(variables, x, lengths)
    assert res["logits"].shape == (2, 10, TINY["sy"])


@pytest.mark.slow
def test_sambert_se_forward_and_infer(train_batch):
    """SE=true replaces the speaker-id embedding with a raw d-vector
    (reference kantts_sambert.py:770-778): inputs_speaker is the float
    (B, T_in, speaker_units) embedding itself. Train forward + full AR
    inference must run with float speaker inputs."""
    cfg = dict(TINY, SE=True)
    model = KanTtsSAMBERT(cfg)
    rs = np.random.RandomState(3)
    batch = dict(train_batch)
    B, T_in = batch["inputs_emotion"].shape
    batch["inputs_speaker"] = jnp.asarray(
        rs.randn(B, T_in, TINY["speaker_units"]).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, deterministic=False,
    )
    assert "spk_tokenizer" not in variables["params"]
    res = model.apply(
        variables, **batch, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert res["postnet_outputs"].shape == (2, 24, 10)
    assert np.isfinite(np.asarray(res["postnet_outputs"])).all()

    infer = sambert_infer(
        model, variables,
        batch["inputs_ling"][:1], batch["inputs_emotion"][:1],
        batch["inputs_speaker"][:1], jnp.asarray([12]), max_output_len=48,
    )
    assert infer["postnet_outputs"].shape == (1, 48, 10)
    assert np.isfinite(np.asarray(infer["postnet_outputs"])).all()
