"""Subprocess worker for test_multiprocess_dp.py: one SAM-BERT DP train step
over a multi-process CPU mesh (jax.distributed + gloo collectives), the
simulation analogue of the reference's multi-GPU DDP rendezvous
(/root/reference/kantts/train/trainer.py:25-52).

Run: python tests/mp_dp_worker.py <rank> <nproc> <port> <outdir>
The parent must strip the axon sitecustomize from PYTHONPATH (it initializes
the PJRT backend at interpreter start, which pins process_count to 1).
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GLOBAL_BATCH = 4
T_IN, T_MEL = 12, 24
NUM_MELS = 10


def tiny_cfg():
    return dict(
        max_len=32, embedding_dim=32, encoder_num_layers=1, encoder_num_heads=2,
        encoder_num_units=16, encoder_ffn_inner_dim=32, encoder_dropout=0.0,
        encoder_attention_dropout=0.0, encoder_relu_dropout=0.0,
        encoder_projection_units=8, speaker_units=8, emotion_units=8,
        predictor_filter_size=5, predictor_fsmn_num_layers=1,
        predictor_num_memory_units=16, predictor_ffn_inner_dim=16,
        predictor_dropout=0.0, predictor_shift=0, predictor_lstm_units=8,
        dur_pred_prenet_units=[8, 8], dur_pred_lstm_units=8,
        decoder_prenet_units=[16, 16], decoder_num_layers=1,
        decoder_num_heads=2, decoder_num_units=16, decoder_ffn_inner_dim=32,
        decoder_dropout=0.0, decoder_attention_dropout=0.0,
        decoder_relu_dropout=0.0, outputs_per_step=3, num_mels=NUM_MELS,
        postnet_filter_size=5, postnet_fsmn_num_layers=1,
        postnet_num_memory_units=16, postnet_ffn_inner_dim=16,
        postnet_dropout=0.0, postnet_shift=1, postnet_lstm_units=8,
        sy=20, tone=6, syllable_flag=8, word_segment=8, emotion=5, speaker=3,
    )


def full_batch():
    """The deterministic GLOBAL batch; every process builds the same one."""
    import numpy as np

    rng = np.random.RandomState(0)
    B = GLOBAL_BATCH
    dur = np.full((B, T_IN), T_MEL // T_IN, dtype=np.float32)
    return {
        "input_lings": rng.randint(0, 5, (B, T_IN, 4)).astype(np.int32),
        "input_emotions": rng.randint(0, 4, (B, T_IN)).astype(np.int32),
        "input_speakers": rng.randint(0, 2, (B, T_IN)).astype(np.int32),
        "valid_input_lengths": np.asarray([T_IN] * B, dtype=np.int32),
        "valid_output_lengths": np.asarray([T_MEL] * B, dtype=np.int32),
        "mel_targets": rng.randn(B, T_MEL, NUM_MELS).astype(np.float32),
        "pitch_contours": np.abs(rng.randn(B, T_IN)).astype(np.float32),
        "energy_contours": np.abs(rng.randn(B, T_IN)).astype(np.float32),
        "durations": dur,
    }


def build_and_step(mesh, local_batch):
    """Init the tiny model deterministically, run ONE DP train step."""
    import jax
    import jax.numpy as jnp

    from kantts_tpu.losses import criterion_builder
    from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT
    from kantts_tpu.parallel.mesh import replicate, shard_batch
    from kantts_tpu.train.optim import optimizer_builder
    from kantts_tpu.train.states import TrainState
    from kantts_tpu.train.steps import make_sambert_step

    model = KanTtsSAMBERT(tiny_cfg())
    ref = full_batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(ref["input_lings"]), jnp.asarray(ref["input_emotions"]),
        jnp.asarray(ref["input_speakers"]),
        jnp.asarray(ref["valid_input_lengths"]),
        jnp.asarray(ref["valid_output_lengths"]),
        jnp.asarray(ref["mel_targets"]),
        duration_targets=jnp.asarray(ref["durations"]),
        pitch_targets=jnp.asarray(ref["pitch_contours"]),
        energy_targets=jnp.asarray(ref["energy_contours"]),
        deterministic=False,
    )
    crit = criterion_builder({
        "Loss": {"MelReconLoss": {"enable": True, "params": {"loss_type": "mae"}},
                 "ProsodyReconLoss": {"enable": True, "params": {"loss_type": "mae"}}}
    })
    tx, _ = optimizer_builder(
        {"type": "Adam", "params": {"lr": 1e-3, "betas": [0.9, 0.98], "eps": 1e-9}},
        None, grad_norm=1.0,
    )
    state = TrainState(variables["params"], tx.init(variables["params"]),
                       jnp.asarray(0, dtype=jnp.int32))
    state = replicate(state, mesh)
    step = make_sambert_step(model, crit, tx, with_mas=False, fp_enable=False,
                             mesh=mesh)
    state, metrics = step(state, shard_batch(local_batch, mesh),
                          jax.random.PRNGKey(7), jnp.asarray(0))
    return state, metrics


def main():
    rank, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=1")

    from kantts_tpu.parallel.mesh import distributed_init, is_primary, make_mesh

    distributed_init(f"127.0.0.1:{port}", nproc, rank)

    import jax
    import numpy as np
    from flax import serialization

    from kantts_tpu.data.dataset import DistributedSampler

    assert jax.process_count() == nproc, "rendezvous failed"

    sampler = DistributedSampler(GLOBAL_BATCH, nproc, rank, shuffle=True)
    local_idx = list(sampler)
    with open(os.path.join(outdir, f"rank{rank}_indices.json"), "w") as f:
        json.dump(local_idx, f)

    ref = full_batch()
    local = {k: v[np.asarray(local_idx)] for k, v in ref.items()}

    mesh = make_mesh()
    state, metrics = build_and_step(mesh, local)
    out = {k: float(v) for k, v in metrics.items()}
    with open(os.path.join(outdir, f"rank{rank}_metrics.json"), "w") as f:
        json.dump(out, f)

    # is_primary() gates checkpoint writes (rank-0 analogue)
    if is_primary():
        params_host = jax.tree_util.tree_map(np.asarray, state.params)
        with open(os.path.join(outdir, "params_mp.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(params_host))


if __name__ == "__main__":
    main()
