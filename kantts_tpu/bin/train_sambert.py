"""Train the SAM-BERT acoustic model.

CLI parity: /root/reference/kantts/bin/train_sambert.py:35-199 —
train(model_config, root_dir, stage_dir, resume_path, resume_bert_path);
two-file YAML merge, config stamping, vocab-size injection from the ling
unit, crash-time checkpoint.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from kantts_tpu.data import DataLoader, DistributedSampler, get_am_datasets
from kantts_tpu.losses import criterion_builder
from kantts_tpu.models.builder import model_builder
from kantts_tpu.parallel.mesh import is_primary, make_mesh, replicate
from kantts_tpu.train.steps import make_sambert_step
from kantts_tpu.train.trainer import SambertTrainer, load_sambert_encoder_from_sybert
from kantts_tpu.train.states import TrainState
from kantts_tpu.utils.config import load_merged_config, stamp_and_dump
from kantts_tpu.utils.log import logging_to_file

logging.basicConfig(
    format="%(asctime)s, %(levelname)-4s [%(filename)s:%(lineno)d] %(message)s",
    datefmt="%Y-%m-%d:%H:%M:%S",
    level=logging.INFO,
)


def train(model_config, root_dir, stage_dir, resume_path=None,
          resume_bert_path=None, data_parallel=True):
    if not os.path.exists(root_dir):
        raise ValueError(f"root_dir {root_dir} not found")
    os.makedirs(stage_dir, exist_ok=True)
    if is_primary():
        logging_to_file(os.path.join(stage_dir, "stdout.log"))

    config = load_merged_config(root_dir, model_config)
    config = stamp_and_dump(config, stage_dir)

    meta_file = [os.path.join(d, "raw_metafile.txt")
                 for d in ([root_dir] if isinstance(root_dir, str) else root_dir)]
    se_enable = config["Model"]["KanTtsSAMBERT"]["params"].get("SE", False)
    train_dataset, valid_dataset = get_am_datasets(
        meta_file, root_dir, config, config.get("allow_cache", False),
        se_enable=se_enable,
        # static-shape bucket granularity: coarser buckets trade padding
        # waste for fewer compiled programs (one per distinct rounded
        # (input, frame) pair) — the lever that matters when XLA compiles
        # remotely or the corpus has a wide length spread
        input_bucket=int(config.get("input_bucket", 16)),
        frame_bucket=int(config.get("frame_bucket", 96)),
    )
    logging.info("train + valid: %d + %d", len(train_dataset), len(valid_dataset))

    # inject vocab sizes (reference bin/train_sambert.py:144-146)
    ling_unit_size = train_dataset.ling_unit.get_unit_size()
    config["Model"]["KanTtsSAMBERT"]["params"].update(ling_unit_size)

    # tensor_parallel: N in the config shards attention/FFN kernels over a
    # ("data", "model") 2-D mesh (parallel/tp.py) — single-controller
    # multi-chip only; multi-host runs keep pure DP.
    tp = int(config.get("tensor_parallel", 1))
    state_shardings = None
    if (tp > 1 and data_parallel and jax.process_count() == 1
            and len(jax.devices()) % tp == 0):
        from kantts_tpu.parallel.tp import make_mesh_2d

        mesh = make_mesh_2d(len(jax.devices()) // tp, tp)
    else:
        tp = 1
        mesh = make_mesh() if data_parallel and len(jax.devices()) > 1 else None
    num_replicas = jax.process_count()
    train_loader = DataLoader(
        train_dataset, config["batch_size"],
        sampler=DistributedSampler(len(train_dataset), num_replicas,
                                   jax.process_index(), shuffle=True),
        num_workers=config.get("num_workers", 0),
    )
    valid_loader = DataLoader(
        valid_dataset, config["batch_size"],
        sampler=DistributedSampler(len(valid_dataset), num_replicas,
                                   jax.process_index(), shuffle=False),
        drop_last=False,
    )

    built = model_builder(config)
    model, state, tx = built["model"], built["state"], built["tx"]
    if mesh is not None and tp > 1:
        from kantts_tpu.parallel.tp import shard_state, tp_shardings

        state_shardings = tp_shardings(state, mesh)
        state = shard_state(state, mesh)
        logging.info("tensor parallelism: %d-way over the model axis", tp)
    elif mesh is not None:
        state = replicate(state, mesh)

    criterion = criterion_builder(config)
    params_cfg = config["Model"]["KanTtsSAMBERT"]["params"]
    with_mas = params_cfg.get("MAS", False)
    fp_enable = params_cfg.get("FP", False)

    fp_dict_lings = train_dataset.fp_dict_lings if fp_enable else None
    train_step = make_sambert_step(model, criterion, tx, with_mas, fp_enable,
                                   mesh=mesh, fp_dict_lings=fp_dict_lings,
                                   state_shardings=state_shardings)
    eval_step = make_sambert_step(model, criterion, tx, with_mas, fp_enable,
                                  train=False, mesh=mesh,
                                  fp_dict_lings=fp_dict_lings,
                                  state_shardings=state_shardings)

    trainer = SambertTrainer(
        config, model, state, train_step, eval_step, train_loader,
        valid_loader, stage_dir,
        max_steps=config.get("train_max_steps"),
        save_interval=config.get("save_interval_steps", 10000),
        valid_interval=config.get("eval_interval_steps", 10000),
        log_interval=config.get("log_interval_steps", 1000),
        mesh=mesh,
    )

    if resume_path is not None:
        trainer.load_checkpoint(resume_path, restore_training_state=True)
        logging.info("Resumed from %s at step %d", resume_path, trainer.steps)
    if resume_bert_path is not None:
        warm = load_sambert_encoder_from_sybert(trainer.state.params,
                                                resume_bert_path)
        trainer.state = TrainState(warm, trainer.state.opt_state,
                                   trainer.state.step)
        logging.info("Warm-started text encoder from %s", resume_bert_path)

    try:
        trainer.train()
    except (Exception, KeyboardInterrupt) as e:
        logging.exception(e)
        trainer.save_checkpoint(
            os.path.join(trainer.ckpt_dir, f"checkpoint-{trainer.steps}.ckpt")
        )
        logging.info("Saved crash checkpoint at step %d", trainer.steps)
        raise


def main():
    parser = argparse.ArgumentParser(description="Train SAM-BERT (TPU)")
    parser.add_argument("--model_config", type=str, required=True)
    parser.add_argument("--root_dir", type=str, required=True, nargs="+")
    parser.add_argument("--stage_dir", type=str, required=True)
    parser.add_argument("--resume_path", type=str, default=None)
    parser.add_argument("--resume_bert_path", type=str, default=None)
    args = parser.parse_args()
    root = args.root_dir if len(args.root_dir) > 1 else args.root_dir[0]
    train(args.model_config, root, args.stage_dir, args.resume_path,
          args.resume_bert_path)


if __name__ == "__main__":
    main()
