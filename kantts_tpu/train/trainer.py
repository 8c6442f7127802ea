"""Training orchestration: step loops, interval hooks, checkpoints, eval
artifacts, TensorBoard metrics.

Parity target: /root/reference/kantts/train/trainer.py — base Trainer
(train/train_epoch/check_{eval,save,log}_interval, trainer.py:55-273),
GAN_Trainer (warmup gates + wav/png eval dumps, :276-674), Sambert_Trainer
(mel/alignment eval dumps, :677-1042), Textsy_BERT_Trainer (:1045-1219).

TPU-native differences: the per-step math lives in the jitted step functions
(steps.py); this layer only moves numpy batches in, accumulates scalar
metrics, and gates process-0 side effects (the rank-0 analogue).
Checkpoints are msgpack pytrees with the same logical layout as the
reference's torch dicts ({model, optimizer, steps}; GAN nests
generator/discriminator sub-dicts, trainer.py:591-632).
"""

from __future__ import annotations

import functools
import logging
import os
import time
from collections import defaultdict
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from kantts_tpu.parallel.mesh import is_primary, shard_batch
from kantts_tpu.train.states import GanTrainState, TrainState
from kantts_tpu.utils.audio import save_wav
from kantts_tpu.utils.plot import plot_alignment, plot_spectrogram, plot_waveform

try:
    from tensorboardX import SummaryWriter
except ImportError:  # pragma: no cover
    SummaryWriter = None


def save_checkpoint_bytes(tree: Any, path: str) -> None:
    """Atomic checkpoint write: serialize to a temp file in the target dir,
    then os.replace into place, so a crash mid-write can never corrupt the
    newest checkpoint (which the crash-time handler depends on). In
    multi-process runs every process assembles the tree (the host-local copy
    is the DP 'gather'), but only process 0 touches the filesystem —
    the reference's rank-0 gating of outputs (trainer.py:209-212)."""
    if not is_primary():
        return
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = serialization.to_bytes(tree)
    tmp_path = path + ".tmp"
    with open(tmp_path, "wb") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp_path, path)


class AsyncCheckpointWriter:
    """Single background writer thread: serialization + atomic write happen
    off the train loop, so the 2.5M-step GAN run never blocks on checkpoint
    IO. Trees handed over must be host-local snapshots (the trainers'
    ``_unreplicate`` copies), so later param updates cannot race the write.
    Writes are strictly ordered (one queue, one thread); ``wait()`` drains.
    A failed write is logged and re-raised on the next save/wait so crashes
    are not silent."""

    def __init__(self):
        import queue as _queue
        import threading as _threading

        self._queue: Any = _queue.Queue()
        self._error: Any = None
        self._thread = _threading.Thread(target=self._run, daemon=True,
                                         name="kantts-ckpt-writer")
        self._thread.start()

    def _run(self):
        while True:
            item = self._queue.get()
            if item is None:
                return
            tree, path, after = item
            try:
                save_checkpoint_bytes(tree, path)
                if after is not None:
                    after()
            except BaseException as e:  # surfaced on next save/wait
                logging.exception("async checkpoint write failed: %s", path)
                self._error = e
            finally:
                self._queue.task_done()

    def _raise_pending(self):
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def submit(self, tree: Any, path: str, after=None) -> None:
        """``after``: callback run on the writer thread once the write has
        landed (e.g. keep-last-k pruning, which must see the new file)."""
        self._raise_pending()
        self._queue.put((tree, path, after))

    def wait(self) -> None:
        self._queue.join()
        self._raise_pending()


def prune_checkpoints(ckpt_dir: str, keep_last: int) -> None:
    """Keep-last-k retention over ``checkpoint_{steps}.ckpt`` files; the
    reference keeps everything (20k-step cadence over 1M+ steps fills disks)."""
    if keep_last <= 0 or not os.path.isdir(ckpt_dir):
        return
    ckpts = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("checkpoint_") and name.endswith(".ckpt"):
            try:
                steps = int(name[len("checkpoint_"):-len(".ckpt")])
            except ValueError:
                continue
            ckpts.append((steps, name))
    for _, name in sorted(ckpts)[:-keep_last] if len(ckpts) > keep_last else []:
        os.remove(os.path.join(ckpt_dir, name))


def load_checkpoint_bytes(target: Any, path: str) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


class Trainer:
    """Step-driven loop with interval-gated eval/save/log
    (reference trainer.py:195-222)."""

    def __init__(self, config, train_loader, valid_loader, save_dir,
                 max_steps=None, save_interval=1, valid_interval=1,
                 log_interval=10, mesh=None):
        self.config = config
        self.train_loader = train_loader
        self.valid_loader = valid_loader
        self.save_dir = save_dir
        self.max_steps = max_steps if max_steps is not None else 10 ** 12
        self.save_interval = save_interval
        self.valid_interval = valid_interval
        self.log_interval = log_interval
        self.mesh = mesh

        self.steps = 1
        self.epoch = 0
        self.finish_training = False
        self.total_train_loss = defaultdict(float)
        self.total_eval_loss = defaultdict(float)

        self.log_dir = os.path.join(save_dir, "log")
        self.ckpt_dir = os.path.join(save_dir, "ckpt")
        if is_primary():
            os.makedirs(self.log_dir, exist_ok=True)
            os.makedirs(self.ckpt_dir, exist_ok=True)
        self.writer = (SummaryWriter(self.log_dir)
                       if SummaryWriter and is_primary() else None)
        self.rng = jax.random.PRNGKey(config.get("seed", 0))
        self.eval_rng = np.random.RandomState(config.get("seed", 0))
        # config: async_checkpoint: true -> serialization+write happen on a
        # background thread (interval saves only; crash-time saves stay
        # synchronous so the process cannot exit before the write lands)
        self._ckpt_writer = None
        # KANTTS_TRAIN_PROFILE=1: per-phase wall-time attribution of the
        # train loop (loader wait / host->device prepare / step dispatch /
        # eval / save / log-sync), reported at every log interval. Host-side
        # timers only — dispatch is async, so device-bound time surfaces in
        # the step-dispatch phase (backpressure) and the log-sync phase (the
        # single float() barrier); loader-bound time surfaces as loader wait.
        self._profile = os.environ.get("KANTTS_TRAIN_PROFILE") == "1"
        self._phase = defaultdict(float)

    # ------------------------------------------------------------------ loop

    def train(self):
        # a resume from a checkpoint already at train_max_steps must exit
        # without executing (and checkpointing) an extra step
        self.check_stop_training()
        while not self.finish_training:
            self.train_epoch()
            self.epoch += 1
            self.check_stop_training()
        self.wait_for_checkpoints()

    def wait_for_checkpoints(self):
        """Drain pending async checkpoint writes (no-op when sync)."""
        if self._ckpt_writer is not None:
            self._ckpt_writer.wait()

    def _write_checkpoint(self, tree, path, allow_async=False):
        def _prune():
            if is_primary():
                prune_checkpoints(self.ckpt_dir,
                                  self.config.get("keep_last_checkpoints", 0))

        if allow_async and self.config.get("async_checkpoint", False):
            if self._ckpt_writer is None:
                self._ckpt_writer = AsyncCheckpointWriter()
            self._ckpt_writer.submit(tree, path, after=_prune)
        else:
            save_checkpoint_bytes(tree, path)
            _prune()

    def train_epoch(self):
        for batch in self._lookahead(self.train_loader):
            t0 = time.perf_counter() if self._profile else 0.0
            self.train_step(batch)
            if self._profile:
                t1 = time.perf_counter()
                self._phase["step_dispatch"] += t1 - t0
            # interval hooks run on ALL processes: eval_step executes the
            # SPMD jitted step on globally-sharded arrays, which every
            # process must participate in. Only file/TensorBoard writes are
            # primary-gated (inside the hooks), matching the reference's
            # rank-0 gating of outputs rather than of the computation.
            self.check_eval_interval()
            self.check_save_interval()
            if self._profile:
                t2 = time.perf_counter()
                self._phase["eval_save"] += t2 - t1
            self.check_log_interval()
            if self._profile:
                self._phase["log_sync"] += time.perf_counter() - t2
            self.steps += 1
            self.check_stop_training()
            if self.finish_training:
                break
        logging.info("Epoch %d finished", self.epoch)
        if hasattr(self.train_loader, "sampler"):
            self.train_loader.sampler.set_epoch(self.epoch + 1)

    def _lookahead(self, loader):
        """Device lookahead on a TRANSFER THREAD: prepare_batch (the
        host->device copy / SPMD sharding) runs off the train loop so it
        overlaps step compute in wall-clock. device_put releases the GIL
        during the copy, and on this box's relay-attached TPU the copy
        blocks ~hundreds of ms per batch (one round-trip per array leaf) —
        inlining it serialized transfer into the step cadence (round-5
        phase profiles: 97% step_dispatch before, then 88% prepare with an
        inline async device_put; both ~2 steps/s vs 15.5 isolated).
        Queue depth 2 = one batch transferring while one waits ready."""
        import queue as _queue
        import threading as _threading

        profile = self._profile
        out: _queue.Queue = _queue.Queue(maxsize=2)
        stop = _threading.Event()
        _SENTINEL = object()

        def producer():
            try:
                for raw in loader:
                    t0 = time.perf_counter() if profile else 0.0
                    prepared = self.prepare_batch(raw)
                    if profile:
                        # background time: overlapped, NOT on the loop's
                        # critical path (loader_wait is the honest cost)
                        self._phase["prepare_bg"] += time.perf_counter() - t0
                    while not stop.is_set():
                        try:
                            out.put(prepared, timeout=0.5)
                            break
                        except _queue.Full:
                            continue
                    if stop.is_set():
                        return
                out.put(_SENTINEL)
            except BaseException as e:  # surfaced on the consumer side
                out.put(e)

        thread = _threading.Thread(target=producer, daemon=True,
                                   name="kantts-transfer")
        thread.start()
        try:
            while True:
                t0 = time.perf_counter() if profile else 0.0
                item = out.get()
                if profile:
                    self._phase["loader_wait"] += time.perf_counter() - t0
                if item is _SENTINEL:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
                if self.finish_training:
                    return
        finally:
            stop.set()

    def prepare_batch(self, batch):
        return batch

    def check_stop_training(self):
        # self.steps is the NEXT step to execute (1-based); after training
        # step k it is k+1, so train_max_steps=N runs exactly N steps and the
        # save hook fires at step N before the stop. This deliberately
        # DEVIATES from the reference (trainer.py:204-215 increments after
        # its hooks and its >= check nets max_steps-1 executed steps with no
        # save at the final step) — exact-N with a final save is the behavior
        # resume segmentation needs; do not "fix" this back for parity.
        if self.steps > self.max_steps:
            self.finish_training = True

    def next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    def maybe_shard(self, batch):
        if self.mesh is not None:
            return shard_batch(batch, self.mesh)
        return pack_put(batch)

    def device_state(self, state):
        """One-transfer device placement of a restored (numpy-leaf) state.

        After ``from_bytes`` the state leaves are numpy; left that way, the
        first step call transfers them ARG-BY-ARG (hundreds of host
        round-trips on the relay-attached TPU — measured ~5 min of every
        resumed segment's start). Single-device: one packed transfer. With
        a mesh: leave placement to the step's in_shardings."""
        if self.mesh is not None:
            return state
        return pack_put(state)

    # ------------------------------------------------------------- intervals

    def check_save_interval(self):
        if self.ckpt_dir and self.steps % self.save_interval == 0:
            path = os.path.join(self.ckpt_dir, f"checkpoint_{self.steps}.ckpt")
            # all processes gather; primary writes (async if configured);
            # keep-last-k pruning runs after the write lands
            self.save_checkpoint(path, allow_async=True)
            if is_primary():
                logging.info("Checkpoint saved at step %d", self.steps)

    def check_log_interval(self):
        if self.steps % self.log_interval == 0:
            for key in list(self.total_train_loss.keys()):
                # metrics are lazy device scalars; this float() is the only
                # host sync in the steady-state train loop
                self.total_train_loss[key] = (
                    float(self.total_train_loss[key]) / self.log_interval
                )
                if is_primary():
                    logging.info("(Steps: %d) %s = %.4f.", self.steps, key,
                                 self.total_train_loss[key])
            now = time.perf_counter()
            if getattr(self, "_last_log_time", None) is not None:
                sps = self.log_interval / (now - self._last_log_time)
                self.total_train_loss["train/steps_per_sec"] = sps
                if is_primary():
                    logging.info("(Steps: %d) steps_per_sec = %.3f.",
                                 self.steps, sps)
                if self._profile:
                    window = now - self._last_log_time
                    tracked = sum(self._phase.values())
                    parts = " ".join(
                        f"{k}={v:.2f}" for k, v in sorted(self._phase.items()))
                    if is_primary():
                        logging.info(
                            "(Steps: %d) phase_seconds %s other=%.2f "
                            "window=%.2f", self.steps, parts,
                            max(window - tracked, 0.0), window)
            if self._profile:
                # reset on EVERY log tick (incl. the first, which has no
                # window) so each report covers exactly one log interval
                self._phase = defaultdict(float)
            self._last_log_time = now
            self.write_to_tensorboard(self.total_train_loss)
            self.total_train_loss = defaultdict(float)

    def check_eval_interval(self):
        if self.valid_interval > 0 and self.steps % self.valid_interval == 0:
            self.eval_epoch()

    def write_to_tensorboard(self, metrics: Dict[str, float]):
        if self.writer is not None:
            for key, value in metrics.items():
                self.writer.add_scalar(key, float(value), self.steps)

    def accumulate(self, store, metrics: Dict[str, Any], prefix: str):
        """Sum metrics WITHOUT forcing a device->host sync: values stay lazy
        jax scalars so the train loop never blocks on step k before
        dispatching step k+1 (float() happens at log time)."""
        for key, value in metrics.items():
            store[f"{prefix}/{key}"] = store[f"{prefix}/{key}"] + value

    # ------------------------------------------------------------------ eval

    def eval_epoch(self):
        """Runs on ALL processes (eval_step is an SPMD program over
        globally-sharded batches); artifact dumps and logging are
        primary-gated — they use host-local state copies only."""
        if is_primary():
            logging.info("(Epoch: %d) Start evaluation.", self.epoch)
        self.total_eval_loss = defaultdict(float)
        num_batches = max(1, len(self.valid_loader))
        rand_idx = self.eval_rng.randint(0, num_batches)
        for idx, batch in enumerate(self.valid_loader):
            self.eval_step(batch)
            if idx == rand_idx and is_primary():
                self.generate_and_save_intermediate_result(batch)
        for key in list(self.total_eval_loss.keys()):
            self.total_eval_loss[key] = float(self.total_eval_loss[key]) / num_batches
            if is_primary():
                logging.info("(Steps: %d) %s = %.4f.", self.steps, key,
                             self.total_eval_loss[key])
        self.write_to_tensorboard(self.total_eval_loss)
        if is_primary():
            logging.info("Epoch %d evaluation finished", self.epoch)

    # --------------------------------------------------- subclass interface

    def train_step(self, batch):
        raise NotImplementedError

    def eval_step(self, batch):
        raise NotImplementedError

    def generate_and_save_intermediate_result(self, batch):
        pass

    def save_checkpoint(self, path):
        raise NotImplementedError

    def load_checkpoint(self, path, restore_training_state=False):
        raise NotImplementedError


class SambertTrainer(Trainer):
    """Single-optimizer acoustic-model trainer (reference trainer.py:677-1042)."""

    def __init__(self, config, model, state: TrainState, train_step_fn,
                 eval_step_fn, train_loader, valid_loader, save_dir, **kwargs):
        super().__init__(config, train_loader, valid_loader, save_dir, **kwargs)
        self.model = model
        self.state = state
        self.train_step_fn = train_step_fn
        self.eval_step_fn = eval_step_fn

    def _prep(self, batch):
        batch = {k: v for k, v in batch.items() if v is not None}
        return self.maybe_shard(batch)

    prepare_batch = _prep  # train-loop lookahead shards one batch ahead

    def train_step(self, batch):
        self.state, metrics = self.train_step_fn(
            self.state, batch, self.next_rng(), jnp.asarray(self.epoch),
        )
        self.accumulate(self.total_train_loss, metrics, "train")

    def eval_step(self, batch):
        metrics = self.eval_step_fn(self.state, self._prep(batch),
                                    jnp.asarray(self.epoch))
        self.accumulate(self.total_eval_loss, metrics, "eval")

    def generate_and_save_intermediate_result(self, batch):
        """Dump target/predicted mels as images + npy, plus per-layer/per-head
        encoder self-attention and PNCA x/h attention heatmaps (reference
        trainer.py:718-798)."""
        out_dir = os.path.join(self.save_dir,
                               f"intermediate_results_{self.steps}")
        os.makedirs(out_dir, exist_ok=True)
        from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT

        res = self.model.apply(
            {"params": _unreplicate(self.state.params)},
            jnp.asarray(batch["input_lings"]),
            jnp.asarray(batch["input_emotions"]),
            jnp.asarray(batch["input_speakers"]),
            jnp.asarray(batch["valid_input_lengths"]),
            jnp.asarray(batch["valid_output_lengths"]),
            jnp.asarray(batch["mel_targets"]),
            duration_targets=(jnp.asarray(batch["durations"])
                              if batch.get("durations") is not None else None),
            pitch_targets=jnp.asarray(batch["pitch_contours"]),
            energy_targets=jnp.asarray(batch["energy_contours"]),
            attn_priors=(jnp.asarray(batch["attn_priors"])
                         if batch.get("attn_priors") is not None else None),
            deterministic=True,
        )
        n = min(self.config.get("num_save_intermediate_results", 4),
                batch["mel_targets"].shape[0])
        for i in range(n):
            L = int(batch["valid_output_lengths"][i])
            plot_spectrogram(np.asarray(res["postnet_outputs"])[i, :L],
                             os.path.join(out_dir, f"{i}_postnet.png"))
            plot_spectrogram(np.asarray(batch["mel_targets"])[i, :L],
                             os.path.join(out_dir, f"{i}_target.png"))
            np.save(os.path.join(out_dir, f"{i}_mel.npy"),
                    np.asarray(res["postnet_outputs"])[i, :L])
            if res.get("attn_soft") is not None:
                plot_alignment(np.asarray(res["attn_soft"])[i, 0],
                               os.path.join(out_dir, f"{i}_mas_attn.png"))
        # per-layer/per-head attention heatmaps for the first item, same
        # artifact set as the reference (trainer.py:740-798)
        L0 = int(batch["valid_input_lengths"][0])
        for li, slf_attn in enumerate(res.get("enc_slf_attn_lst") or []):
            heads = np.asarray(slf_attn[0])  # (n_head, T_in, T_in)
            for hi in range(heads.shape[0]):
                plot_alignment(
                    heads[hi, :L0, :L0],
                    os.path.join(out_dir,
                                 f"enc_slf_attn_dev_layer{li}_head{hi}.png"),
                    info=f"valid_len_{L0}",
                )
        x_bw = res.get("x_band_width")
        h_bw = res.get("h_band_width")
        pnca_pairs = zip(res.get("pnca_x_attn_lst") or [],
                         res.get("pnca_h_attn_lst") or [])
        for li, (x_attn, h_attn) in enumerate(pnca_pairs):
            for hi in range(np.asarray(x_attn).shape[1]):
                plot_alignment(
                    np.asarray(x_attn)[0, hi],
                    os.path.join(out_dir,
                                 f"pnca_x_attn_dev_layer{li}_head{hi}.png"),
                    info=f"x_band_width_{int(x_bw)}" if x_bw is not None else None,
                )
                plot_alignment(
                    np.asarray(h_attn)[0, hi],
                    os.path.join(out_dir,
                                 f"pnca_h_attn_dev_layer{li}_head{hi}.png"),
                    info=f"h_band_width_{int(h_bw)}" if h_bw is not None else None,
                )
        # coarse/output/target mel npy triplet (reference trainer.py:789-795)
        L0_mel = int(batch["valid_output_lengths"][0])
        np.save(os.path.join(out_dir, "coarse_mel.npy"),
                np.asarray(res["dec_outputs"])[0, :L0_mel])
        np.save(os.path.join(out_dir, "output_mel.npy"),
                np.asarray(res["postnet_outputs"])[0, :L0_mel])
        np.save(os.path.join(out_dir, "target_mel.npy"),
                np.asarray(batch["mel_targets"])[0, :L0_mel])

    def save_checkpoint(self, path, allow_async=False):
        tree = {
            "model": _unreplicate(self.state.params),
            "optimizer": _unreplicate(self.state.opt_state),
            "steps": self.steps,
        }
        self._write_checkpoint(tree, path, allow_async)

    def load_checkpoint(self, path, restore_training_state=False):
        target = {
            "model": self.state.params,
            "optimizer": self.state.opt_state,
            "steps": 0,
        }
        loaded = load_checkpoint_bytes(target, path)
        opt_state = (loaded["optimizer"] if restore_training_state
                     else self.state.opt_state)
        step = loaded["steps"] if restore_training_state else self.state.step
        self.state = self.device_state(
            TrainState(loaded["model"], opt_state, jnp.asarray(step)))
        if restore_training_state:
            # the checkpoint records COMPLETED steps; resume at the next one
            self.steps = int(loaded["steps"]) + 1


class GanTrainer(Trainer):
    """Two-optimizer adversarial trainer with warmup gates
    (reference trainer.py:276-674)."""

    def __init__(self, config, generator, discriminators, state: GanTrainState,
                 make_step_fn, eval_step_fn, train_loader, valid_loader,
                 save_dir, pqmf=None, sampling_rate=16000, **kwargs):
        super().__init__(config, train_loader, valid_loader, save_dir, **kwargs)
        self.generator = generator
        self.discriminators = discriminators
        self.state = state
        self.make_step_fn = make_step_fn  # (train_gen, include_adv) -> step fn
        self.eval_step_fn = eval_step_fn
        self.pqmf = pqmf
        self.sampling_rate = sampling_rate
        self.gen_start = config.get("generator_train_start_steps", 0)
        self.disc_start = config.get("discriminator_train_start_steps", 0)
        self._step_cache: Dict[tuple, Any] = {}

    def _step_fn(self):
        train_gen = self.steps >= self.gen_start
        include_adv = self.steps > self.disc_start
        key = (train_gen, include_adv)
        if key not in self._step_cache:
            self._step_cache[key] = self.make_step_fn(train_gen, include_adv)
        return self._step_cache[key]

    def prepare_batch(self, batch):
        wav, mel = batch
        return self.maybe_shard(wav), self.maybe_shard(mel)

    def train_step(self, batch):
        wav, mel = batch
        self.state, metrics = self._step_fn()(self.state, wav, mel,
                                              self.next_rng())
        self.accumulate(self.total_train_loss, metrics, "train")

    def eval_step(self, batch):
        wav, mel = batch
        metrics, _ = self.eval_step_fn(self.state, self.maybe_shard(wav),
                                       self.maybe_shard(mel), self.next_rng())
        self.accumulate(self.total_eval_loss, metrics, "eval")

    def generate_and_save_intermediate_result(self, batch):
        """Render reference vs generated wavs + waveform pngs
        (reference trainer.py:334-385)."""
        wav, mel = batch
        # host-local state copy: this runs on the primary process only, so it
        # must not touch globally-sharded arrays (all-process participation)
        local_state = _unreplicate(self.state)
        _, y_gen = self.eval_step_fn(local_state, jnp.asarray(wav),
                                     jnp.asarray(mel), self.next_rng())
        out_dir = os.path.join(self.save_dir,
                               f"intermediate_results_{self.steps}")
        os.makedirs(out_dir, exist_ok=True)
        n = min(self.config.get("num_save_intermediate_results", 4),
                wav.shape[0])
        for i in range(n):
            ref = np.asarray(wav)[i, :, 0]
            gen = np.asarray(y_gen)[i, :, 0]
            save_wav(ref, os.path.join(out_dir, f"{i}_ref.wav"),
                     self.sampling_rate)
            save_wav(gen, os.path.join(out_dir, f"{i}_gen.wav"),
                     self.sampling_rate)
            plot_waveform(ref, os.path.join(out_dir, f"{i}_ref.png"),
                          self.sampling_rate)
            plot_waveform(gen, os.path.join(out_dir, f"{i}_gen.png"),
                          self.sampling_rate)

    def save_checkpoint(self, path, allow_async=False):
        tree = {
            "model": {
                "generator": _unreplicate(self.state.gen_params),
                "discriminator": _unreplicate(self.state.disc_params),
            },
            "optimizer": {
                "generator": _unreplicate(self.state.gen_opt_state),
                "discriminator": _unreplicate(self.state.disc_opt_states),
            },
            "spectral": _unreplicate(self.state.spectral),
            "steps": self.steps,
        }
        self._write_checkpoint(tree, path, allow_async)

    def load_checkpoint(self, path, restore_training_state=False):
        target = {
            "model": {"generator": self.state.gen_params,
                      "discriminator": self.state.disc_params},
            "optimizer": {"generator": self.state.gen_opt_state,
                          "discriminator": self.state.disc_opt_states},
            "spectral": self.state.spectral,
            "steps": 0,
        }
        loaded = load_checkpoint_bytes(target, path)
        if restore_training_state:
            # the checkpoint records COMPLETED steps; resume at the next one
            # (state.step keeps the completed count — the jitted step
            # increments it)
            self.steps = int(loaded["steps"]) + 1
            self.state = self.device_state(GanTrainState(
                loaded["model"]["generator"],
                loaded["optimizer"]["generator"],
                loaded["model"]["discriminator"],
                loaded["optimizer"]["discriminator"],
                loaded["spectral"],
                jnp.asarray(int(loaded["steps"])),
            ))
        else:  # fine-tune style: weights only (reference train_hifigan.py:167)
            self.state = self.device_state(GanTrainState(
                loaded["model"]["generator"],
                self.state.gen_opt_state,
                loaded["model"]["discriminator"],
                self.state.disc_opt_states,
                loaded["spectral"],
                self.state.step,
            ))


class TextsyBertTrainer(Trainer):
    """Masked-LM pretraining trainer (reference trainer.py:1045-1219)."""

    def __init__(self, config, model, state: TrainState, train_step_fn,
                 eval_step_fn, train_loader, valid_loader, save_dir, **kwargs):
        super().__init__(config, train_loader, valid_loader, save_dir, **kwargs)
        self.model = model
        self.state = state
        self.train_step_fn = train_step_fn
        self.eval_step_fn = eval_step_fn

    def prepare_batch(self, batch):
        return self.maybe_shard(dict(batch))

    def train_step(self, batch):
        self.state, metrics = self.train_step_fn(
            self.state, batch, self.next_rng()
        )
        self.accumulate(self.total_train_loss, metrics, "train")

    def eval_step(self, batch):
        metrics = self.eval_step_fn(self.state, self.maybe_shard(dict(batch)))
        self.accumulate(self.total_eval_loss, metrics, "eval")

    def save_checkpoint(self, path, allow_async=False):
        self._write_checkpoint({
            "model": _unreplicate(self.state.params),
            "optimizer": _unreplicate(self.state.opt_state),
            "steps": self.steps,
        }, path, allow_async)

    def load_checkpoint(self, path, restore_training_state=False):
        target = {"model": self.state.params,
                  "optimizer": self.state.opt_state, "steps": 0}
        loaded = load_checkpoint_bytes(target, path)
        opt_state = (loaded["optimizer"] if restore_training_state
                     else self.state.opt_state)
        self.state = self.device_state(
            TrainState(loaded["model"], opt_state, self.state.step))
        if restore_training_state:
            # the checkpoint records COMPLETED steps; resume at the next one
            self.steps = int(loaded["steps"]) + 1


@functools.lru_cache(maxsize=256)
def _carve_fn(segkey):
    """ONE jitted program carving every packed leaf out of an int32 buffer.

    Eagerly dispatching carve ops per leaf costs one host round-trip per
    dispatch on the relay-attached TPU, which kept transfer ~330 ms/batch
    even after packing the copy into one device_put. Fusing the carving
    into one cached jit makes steady-state transfer exactly one device_put
    + one execute (measured ~5 ms/batch). The carve is slice + SAME-WIDTH
    bitcast (int32<->f32 reinterpretation, metadata-only) + reshape — an
    earlier all-bytes variant bitcast uint8 spans across widths, and XLA
    lowered that into a ~470 MB executable taking ~200 s on the remote
    compile service; same-width carving keeps the executable tens of KiB
    and ~2 s to compile (persisted across processes regardless).
    segkey: ((start_elems, n_elems, shape, kind), ...), kind in
    {"f32", "i32", "bool"} or ("narrow", dtype_str, n_orig)."""
    def carve(dbuf):
        outs = []
        for start, n, shape, kind in segkey:
            leaf = jax.lax.slice(dbuf, (start,), (start + n,))
            if kind == "f32":
                leaf = jax.lax.bitcast_convert_type(leaf, jnp.float32)
            elif kind == "bool":
                leaf = leaf.astype(jnp.bool_)
            elif isinstance(kind, tuple):  # ("narrow", dtype_str, n_orig)
                _, dstr, n_orig = kind
                leaf = jax.lax.bitcast_convert_type(
                    leaf, jnp.dtype(dstr)).reshape((-1,))
                leaf = jax.lax.slice(leaf, (0,), (n_orig,))
            outs.append(leaf.reshape(shape))
        return tuple(outs)
    return jax.jit(carve)


def _as_i32(a: np.ndarray):
    """Reinterpret/convert a host array as int32 words + its carve kind.

    f32 is viewed (zero-copy, bit-identical); int64/f64 canonicalize the
    way device_put does with x64 disabled; bools widen to int32 (mask
    leaves are small — the inflation is noise next to a round-trip saved);
    16/8-bit dtypes pad to a word boundary and ride as int32 words, carved
    back bit-identically with a same-total-width bitcast."""
    if a.dtype == np.float64:
        a = a.astype(np.float32)
    if a.dtype == np.float32:
        return a.view(np.int32), "f32"
    if a.dtype == np.bool_:
        return a.astype(np.int32), "bool"
    if a.dtype == np.int64:
        a = a.astype(np.int32)
    if a.dtype.itemsize in (1, 2):
        per = 4 // a.dtype.itemsize
        flat = a.ravel()
        pad = (-flat.size) % per
        if pad:
            flat = np.concatenate([flat, np.zeros(pad, a.dtype)])
        return flat.view(np.int32), ("narrow", a.dtype.str, a.size)
    return a.view(np.int32) if a.dtype.itemsize == 4 else \
        a.astype(np.int32), "i32"


def pack_put(batch):
    """Host->device transfer of a whole batch as ONE int32 buffer.

    A per-leaf device_put costs one blocking round-trip per array on this
    box's relay-attached TPU (~40 ms each; a training batch has ~9 leaves),
    which made transfer — not compute — the sustained-training bound
    (round-5 phase profiles). Packing every leaf into one int32 buffer
    (f32 leaves bit-reinterpreted, see _as_i32) pays ONE round-trip; one
    cached jitted program (_carve_fn) carves the views back out on-device.
    Step functions receive ordinary device arrays — nothing downstream
    changes. A real PCIe-attached TPU host also benefits (fewer, larger
    DMAs), just less dramatically."""
    leaves, treedef = jax.tree_util.tree_flatten(batch)
    arrs, segs, packed, off = [], [], [], 0
    for leaf in leaves:
        if hasattr(leaf, "shape") and getattr(leaf, "ndim", 0) and not isinstance(
                leaf, jax.Array):
            a, kind = _as_i32(np.ascontiguousarray(leaf))
            arrs.append(a.ravel())
            segs.append(None)
            packed.append((off, a.size, tuple(leaf.shape), kind))
            off += a.size
        else:
            segs.append(leaf)
    if not arrs:
        return batch
    dbuf = jax.device_put(np.concatenate(arrs))
    carved = iter(_carve_fn(tuple(packed))(dbuf))
    out = [next(carved) if seg is None else seg for seg in segs]
    return jax.tree_util.tree_unflatten(treedef, out)


def _unreplicate(tree):
    """Fetch a host-local copy of (possibly sharded/replicated) arrays."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def load_sambert_encoder_from_sybert(params, sybert_ckpt_path):
    """Warm-start SAM-BERT's text encoder from a Textsy-BERT checkpoint
    (reference --resume_bert_path, trainer.py:150-161 with strict=False).

    Copies the shared ``text_encoder`` subtree where shapes match.
    """
    import copy

    with open(sybert_ckpt_path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    bert_encoder = payload["model"].get("text_encoder", {})
    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, params))

    def merge(dst, src):
        for key, value in src.items():
            if key not in dst:
                continue
            if isinstance(value, dict):
                merge(dst[key], value)
            elif hasattr(dst[key], "shape") and dst[key].shape == value.shape:
                dst[key] = value
        return dst

    if "text_encoder" in params:
        merge(params["text_encoder"], bert_encoder)
    return params
