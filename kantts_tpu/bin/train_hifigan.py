"""Train the HiFi-GAN vocoder.

CLI parity: /root/reference/kantts/bin/train_hifigan.py:35-179 —
train(model_config, root_dir, stage_dir, resume_path); resume is
weights-only fine-tune style (restore_training_state=False, reference :167).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from kantts_tpu.data import DataLoader, DistributedSampler, get_voc_datasets
from kantts_tpu.losses import criterion_builder
from kantts_tpu.models.builder import model_builder
from kantts_tpu.parallel.mesh import is_primary, make_mesh, replicate
from kantts_tpu.train.steps import make_gan_eval_step, make_gan_step
from kantts_tpu.train.trainer import GanTrainer
from kantts_tpu.utils.config import load_merged_config, stamp_and_dump
from kantts_tpu.utils.log import logging_to_file

logging.basicConfig(
    format="%(asctime)s, %(levelname)-4s [%(filename)s:%(lineno)d] %(message)s",
    datefmt="%Y-%m-%d:%H:%M:%S",
    level=logging.INFO,
)


class _VocLoader(DataLoader):
    """Crop-collate needs a per-epoch RandomState for reproducible shards."""

    def __init__(self, dataset, batch_size, sampler, seed=1234, **kwargs):
        self._crop_rng = np.random.RandomState(seed)
        super().__init__(
            dataset, batch_size, sampler,
            collate_fn=lambda b: dataset.collate_fn(b, self._crop_rng),
            **kwargs,
        )


def train(model_config, root_dir, stage_dir, resume_path=None,
          data_parallel=True, resume_training_state=False):
    if not os.path.exists(root_dir if isinstance(root_dir, str) else root_dir[0]):
        raise ValueError(f"root_dir {root_dir} not found")
    os.makedirs(stage_dir, exist_ok=True)
    if is_primary():
        logging_to_file(os.path.join(stage_dir, "stdout.log"))

    config = load_merged_config(
        root_dir if isinstance(root_dir, str) else root_dir[0], model_config
    )
    config = stamp_and_dump(config, stage_dir)

    train_dataset, valid_dataset = get_voc_datasets(config, root_dir)
    logging.info("train + valid: %d + %d", len(train_dataset), len(valid_dataset))

    mesh = make_mesh() if data_parallel and len(jax.devices()) > 1 else None
    num_replicas = jax.process_count()
    train_loader = _VocLoader(
        train_dataset, config["batch_size"],
        DistributedSampler(len(train_dataset), num_replicas,
                           jax.process_index(), shuffle=True),
        num_workers=config.get("num_workers", 0),
    )
    valid_loader = _VocLoader(
        valid_dataset, config["batch_size"],
        DistributedSampler(len(valid_dataset), num_replicas,
                           jax.process_index(), shuffle=False),
        drop_last=False,
    )

    built = model_builder(config)
    generator = built["generator"]
    discriminators = built["discriminators"]
    pqmf = built["pqmf"]
    state = built["state"]
    if mesh is not None:
        state = replicate(state, mesh)

    criterion = criterion_builder(config)

    def make_step(train_gen, include_adv):
        return make_gan_step(
            generator, discriminators, criterion, built["gen_tx"],
            built["disc_txs"], pqmf=pqmf, train_generator=train_gen,
            include_adversarial=include_adv, mesh=mesh,
        )

    eval_step = make_gan_eval_step(generator, discriminators, criterion, pqmf)

    trainer = GanTrainer(
        config, generator, discriminators, state, make_step, eval_step,
        train_loader, valid_loader, stage_dir, pqmf=pqmf,
        sampling_rate=config["audio_config"]["sampling_rate"],
        max_steps=config.get("train_max_steps"),
        save_interval=config.get("save_interval_steps", 10000),
        valid_interval=config.get("eval_interval_steps", 10000),
        log_interval=config.get("log_interval_steps", 1000),
        mesh=mesh,
    )

    if resume_path is not None:
        # weights-only default mirrors the reference (train_hifigan.py:167,
        # fine-tune style); --resume_training_state continues the schedule
        # (step counter, both optimizers, spectral-norm state)
        trainer.load_checkpoint(
            resume_path, restore_training_state=resume_training_state)
        if resume_training_state:
            logging.info("Resumed from %s at step %d", resume_path,
                         trainer.steps)
        else:
            logging.info("Loaded weights from %s (fine-tune style)",
                         resume_path)

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
    parser = argparse.ArgumentParser(description="Train HiFi-GAN (TPU)")
    parser.add_argument("--model_config", type=str, required=True)
    parser.add_argument("--root_dir", type=str, required=True, nargs="+")
    parser.add_argument("--stage_dir", type=str, required=True)
    parser.add_argument("--resume_path", type=str, default=None)
    parser.add_argument("--resume_training_state", action="store_true",
                        help="restore step counter + optimizer states from "
                        "--resume_path (true resume, not fine-tune)")
    args = parser.parse_args()
    root = args.root_dir if len(args.root_dir) > 1 else args.root_dir[0]
    train(args.model_config, root, args.stage_dir, args.resume_path,
          resume_training_state=args.resume_training_state)


if __name__ == "__main__":
    main()
