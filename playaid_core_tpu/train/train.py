"""Training: pjit data/tensor-parallel fine-tuning with orbax checkpoints.

Rebuild of the reference train CLI + Lightning wrappers (reference:
action_detector.py:16-81, models/*_detector.py training_steps) as an
explicit JAX loop:

* TrainState (params + batch stats + Adam) on a (data, model) mesh —
  batch sharded over `data`, the transformer/classifier weights sharded
  over `model` per :data:`playaid_core_tpu.parallel.mesh.DEFAULT_TP_RULES`;
* jitted train/eval steps with donated state;
* the reference's curriculum: epoch train-accuracy > 0.85 raises the
  synthetic difficulty, and T is resampled every epoch
  (reference: models/cnn_action_detector.py:118-129);
* orbax checkpoint save/restore (replacing Lightning .ckpt);
* metrics to a JSONL log (replacing TensorBoard/WandB loggers) plus an
  optional TensorBoard writer when available.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Optional

import click
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.training import train_state

from playaid_core_tpu import constants
from playaid_core_tpu.models.cnn_action_detector import CNNActionDetector
from playaid_core_tpu.models.losses import accuracy, center_frame_loss, per_frame_loss
from playaid_core_tpu.models.resnet_transformer import ResnetTransformerDetector
from playaid_core_tpu.models.rnn_action_detector import RNNActionDetector
from playaid_core_tpu.ontology import MOVE_TO_CLASS_ID
from playaid_core_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
)
from playaid_core_tpu.parallel.staging import BackgroundIterator, device_prefetch
from playaid_core_tpu.train.dataset import UltActionRecogDataset


class TrainState(train_state.TrainState):
    batch_stats: Any = None


MODEL_FAMILIES = {
    "cnn": (CNNActionDetector, center_frame_loss),
    "rnn": (RNNActionDetector, per_frame_loss),
    "resformer": (ResnetTransformerDetector, per_frame_loss),
}


def build_model(family: str, num_actions: int, sequence_length: int, dtype=jnp.float32):
    cls, loss_fn = MODEL_FAMILIES[family]
    if family == "rnn":
        model = cls(num_actions=num_actions, dtype=dtype)
    else:
        model = cls(num_actions=num_actions, sequence_length=sequence_length, dtype=dtype)
    return model, loss_fn


def create_train_state(model, rng, sample_batch, learning_rate,
                       warmup_steps=200, decay_steps=None):
    variables = model.init(rng, sample_batch)
    # Short linear warmup, then the reference's constant Adam (reference:
    # action_detector.py:67-74 used plain Adam): from-scratch ResNet-50 +
    # post-norm transformer at small batch is unstable in the first few
    # hundred steps without it.  ``decay_steps`` switches to cosine decay
    # to 10% over that horizon — long fixed-budget runs converge tighter.
    if decay_steps:
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=learning_rate * 0.05, peak_value=learning_rate,
            warmup_steps=warmup_steps or 1, decay_steps=decay_steps,
            end_value=learning_rate * 0.1,
        )
    elif warmup_steps:
        schedule = optax.linear_schedule(
            init_value=learning_rate * 0.05, end_value=learning_rate,
            transition_steps=warmup_steps,
        )
    else:
        schedule = learning_rate
    tx = optax.adam(schedule)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=tx,
    )


def make_train_step(model, loss_fn):
    @jax.jit
    def train_step(state: TrainState, frames, labels, dropout_rng):
        # uint8 wire format: batches ship as bytes (4x less host->device
        # traffic — decisive through a tunneled device) and normalize
        # here, fused into the step.
        if frames.dtype == jnp.uint8:
            frames = frames.astype(jnp.float32) / 255.0

        def compute_loss(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out = model.apply(
                variables, frames, train=True, mutable=mutable,
                rngs={"dropout": dropout_rng},
            )
            log_probs, updates = out if mutable else (out, {})
            loss = loss_fn(log_probs, labels)
            return loss, (log_probs, updates)

        (loss, (log_probs, updates)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads=grads)
        if state.batch_stats is not None:
            new_state = new_state.replace(batch_stats=updates["batch_stats"])
        acc = accuracy(log_probs, _match_labels(log_probs, labels))
        # Gradient observability (the reference watched gradients through
        # wandb.watch, reference: action_detector.py:63-65): global grad
        # and param L2 norms ride along as two scalars, fused into the
        # step — logged per epoch to JSONL/TB.
        grad_norm = optax.global_norm(grads)
        param_norm = optax.global_norm(new_state.params)
        return new_state, loss, acc, grad_norm, param_norm

    return train_step


def _match_labels(log_probs, labels):
    """CNN-family outputs are [B, C] supervised on the center frame."""
    if log_probs.ndim == 2 and log_probs.shape[0] == labels.shape[0]:
        return labels[:, labels.shape[1] // 2]
    return labels


def make_eval_step(model, loss_fn):
    @jax.jit
    def eval_step(state: TrainState, frames, labels):
        if frames.dtype == jnp.uint8:
            frames = frames.astype(jnp.float32) / 255.0
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        log_probs = model.apply(variables, frames, train=False)
        loss = loss_fn(log_probs, labels)
        acc = accuracy(log_probs, _match_labels(log_probs, labels))
        return loss, acc

    return eval_step


@dataclass
class TrainerConfig:
    family: str = "resformer"
    num_actions: int = 63
    sequence_length: int = 7
    batch_size: int = 8
    learning_rate: float = 3e-4
    num_epochs: int = 1000
    num_samples: int = 1024
    crop_size: int = 128
    model_parallel: int = 1
    curriculum_threshold: float = 0.85
    checkpoint_dir: Optional[str] = None
    log_path: Optional[str] = None
    # Ship batches to the device as uint8 and normalize on-device (the
    # wire cost of a [B,T,128,128,3] float32 batch dominates step time on
    # tunneled devices).  Exact: sources are uint8 images.
    uint8_transfer: bool = True
    # Optional TensorBoard event dir (reference logged to
    # `logs/action_recog/<name>` via Lightning's TensorBoardLogger,
    # reference: action_detector.py:59-61).  Requires a tensorboard
    # writer implementation (torch's is used when importable).
    tensorboard_dir: Optional[str] = None
    # Cosine-decay horizon in steps (None = constant LR after warmup)
    lr_decay_steps: Optional[int] = None
    # Linear LR warmup steps.  0 disables — required for tiny training
    # budgets (e.g. in-test fixtures of < a few hundred steps, which would
    # otherwise spend their whole budget inside the ramp).
    warmup_steps: int = 200
    # Print one line per epoch (long headless runs are otherwise silent
    # until the end).
    verbose: bool = False
    dtype: Any = jnp.float32


class Trainer:
    """Explicit training loop with mesh sharding, staging, curriculum and
    checkpointing."""

    def __init__(self, config: TrainerConfig, train_dataset, val_dataset=None, mesh=None):
        self.config = config
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.mesh = mesh if mesh is not None else make_mesh(
            model_parallel=config.model_parallel
        )
        self.model, self.loss_fn = build_model(
            config.family, config.num_actions, config.sequence_length, config.dtype
        )
        self.train_step = make_train_step(self.model, self.loss_fn)
        self.eval_step = make_eval_step(self.model, self.loss_fn)
        self.state = None
        self.metrics_log = []
        self._tb_writer = None
        if config.tensorboard_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb_writer = SummaryWriter(config.tensorboard_dir)
            except Exception:
                self._tb_writer = None  # JSONL log remains authoritative

    def init_state(self, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        t = self.train_dataset.num_frames_per_sample
        s = self.config.crop_size
        sample = jnp.zeros((1, t, s, s, 3), jnp.float32)
        self.state = create_train_state(
            self.model, rng, sample, self.config.learning_rate,
            warmup_steps=self.config.warmup_steps,
            decay_steps=self.config.lr_decay_steps,
        )
        # Place params on the mesh: TP rules for the model axis, replicate
        # the rest; batch_stats replicated.
        with self.mesh:
            shardings = param_shardings(self.mesh, self.state.params)
            params = jax.tree_util.tree_map(jax.device_put, self.state.params, shardings)
            self.state = self.state.replace(params=params)
        return self.state

    def _log(self, record):
        self.metrics_log.append(record)
        if self.config.verbose:
            parts = [f"epoch {record.get('epoch', len(self.metrics_log) - 1)}"]
            for key in ("train_loss", "train_acc", "val_loss", "val_acc"):
                if key in record:
                    parts.append(f"{key} {record[key]:.4f}")
            print("  ".join(parts), flush=True)
        if self.config.log_path:
            os.makedirs(os.path.dirname(self.config.log_path), exist_ok=True)
            with open(self.config.log_path, "a") as f:
                f.write(json.dumps(record) + "\n")
        if self._tb_writer is not None:
            step = record.get("epoch", len(self.metrics_log))
            for key, value in record.items():
                if isinstance(value, (int, float)) and key != "epoch":
                    self._tb_writer.add_scalar(key, value, step)
            self._tb_writer.flush()

    def fit(self, num_epochs=None, steps_per_epoch=None, seed=0):
        if self.state is None:
            self.init_state(jax.random.PRNGKey(seed))
        cfg = self.config
        num_epochs = num_epochs if num_epochs is not None else cfg.num_epochs
        steps = steps_per_epoch or max(cfg.num_samples // cfg.batch_size, 1)
        rng = jax.random.PRNGKey(seed + 1)
        data_size = self.mesh.devices.shape[0]
        # Shard the batch over the data axis only when it divides evenly;
        # otherwise replicate (tiny-batch debugging case).
        bsh = batch_sharding(self.mesh) if cfg.batch_size % data_size == 0 else replicated(
            self.mesh
        )

        def to_wire(gen):
            # float32-in-[0,1] -> uint8 in the producer thread: exact
            # round-trip (sources are uint8 images), 4x less transfer.
            for frames, chars, labels in gen:
                if cfg.uint8_transfer and frames.dtype == np.float32:
                    frames = np.clip(np.rint(frames * 255.0), 0, 255).astype(
                        np.uint8
                    )
                yield frames, chars, labels

        # Device-side batch generation (train/device_synth.py): the
        # dataset's pixels never exist on the host, so the staging
        # machinery (producer thread + wire format + prefetch) is
        # bypassed — batches are async device computations chained
        # straight into the train step.
        device_gen = getattr(self.train_dataset, "device_batches", None)

        def epoch_batches():
            if device_gen is not None:
                for frames, chars, labels in device_gen(cfg.batch_size, steps):
                    if bsh is not None and self.mesh.devices.size > 1:
                        frames = jax.device_put(frames, bsh)
                    yield frames, chars, labels
                return
            batches = BackgroundIterator(
                to_wire(self.train_dataset.batches(cfg.batch_size, steps)),
                maxsize=4,
            )
            yield from device_prefetch(batches, 2, bsh)

        for epoch in range(num_epochs):
            epoch_accs, epoch_losses = [], []
            epoch_gnorms, epoch_pnorm = [], None
            n_steps = 0
            t_frames = 1
            start = time.time()
            with self.mesh:
                for frames, chars, labels in epoch_batches():
                    rng, step_rng = jax.random.split(rng)
                    self.state, loss, acc, gnorm, pnorm = self.train_step(
                        self.state, frames, labels, step_rng
                    )
                    # Keep metrics on device until epoch end: a float()
                    # here would block on the tunnel every step and stop
                    # transfer/compute overlap.
                    epoch_losses.append(loss)
                    epoch_accs.append(acc)
                    epoch_gnorms.append(gnorm)
                    epoch_pnorm = pnorm
                    n_steps += 1
                    t_frames = frames.shape[1]  # RNN resamples T per epoch
            epoch_losses = [float(v) for v in jax.device_get(epoch_losses)]
            epoch_accs = [float(v) for v in jax.device_get(epoch_accs)]
            epoch_gnorms = [float(v) for v in jax.device_get(epoch_gnorms)]

            epoch_acc = float(np.mean(epoch_accs)) if epoch_accs else 0.0
            elapsed = time.time() - start
            record = {
                "epoch": epoch,
                "train_loss": float(np.mean(epoch_losses)) if epoch_losses else 0.0,
                "train_acc": epoch_acc,
                "grad_norm": float(np.mean(epoch_gnorms)) if epoch_gnorms else 0.0,
                "grad_norm_last": epoch_gnorms[-1] if epoch_gnorms else 0.0,
                "param_norm": (
                    float(jax.device_get(epoch_pnorm))
                    if epoch_pnorm is not None else 0.0
                ),
                "seconds": elapsed,
                # Train throughput telemetry: steps/s and crops/s (a crop =
                # one T-frame window member actually pushed through the
                # encoder) for the perf record.
                "steps_per_sec": round(n_steps / elapsed, 3) if elapsed > 0 else 0.0,
                "crops_per_sec": (
                    round(n_steps * cfg.batch_size * t_frames / elapsed, 1)
                    if elapsed > 0 else 0.0
                ),
                "synth_difficulty": self.train_dataset.synth_difficulty,
            }

            # Curriculum (reference: models/cnn_action_detector.py:118-129).
            if epoch_acc > cfg.curriculum_threshold:
                self.train_dataset.make_synth_more_challenging()
            # T resampling is only valid for families whose graph is
            # T-agnostic (the RNN); the CNN's temporal dense and the
            # ResFormer's time encoding are sized to sequence_length (the
            # reference had the same constraint, action_detector.py:47-48).
            if cfg.family == "rnn":
                self.train_dataset.switch_num_frames_per_sample()

            if self.val_dataset is not None:
                val_losses, val_accs = [], []
                with self.mesh:
                    for frames, chars, labels in device_prefetch(
                        to_wire(self.val_dataset.batches(
                            cfg.batch_size, max(steps // 4, 1))), 2, bsh
                    ):
                        loss, acc = self.eval_step(self.state, frames, labels)
                        val_losses.append(loss)
                        val_accs.append(acc)
                val_losses = [float(v) for v in jax.device_get(val_losses)]
                val_accs = [float(v) for v in jax.device_get(val_accs)]
                record["val_loss"] = float(np.mean(val_losses))
                record["val_acc"] = float(np.mean(val_accs))

            self._log(record)
            if cfg.checkpoint_dir:
                self.save_checkpoint(epoch)
        return self.state

    def evaluate(self, dataset, num_batches=8):
        losses, accs = [], []
        with self.mesh:
            for frames, chars, labels in dataset.batches(self.config.batch_size, num_batches):
                loss, acc = self.eval_step(self.state, frames, labels)
                losses.append(float(loss))
                accs.append(float(acc))
        return {"loss": float(np.mean(losses)), "acc": float(np.mean(accs))}

    # ---------------- checkpointing (orbax) ----------------

    def save_checkpoint(self, step):
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.config.checkpoint_dir, f"step_{step}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            path,
            {
                "params": jax.device_get(self.state.params),
                "batch_stats": jax.device_get(self.state.batch_stats),
                "opt_state": jax.device_get(self.state.opt_state),
            },
            force=True,
        )
        ckptr.wait_until_finished()
        return path

    def restore_checkpoint(self, path):
        import orbax.checkpoint as ocp

        if self.state is None:
            self.init_state()
        ckptr = ocp.StandardCheckpointer()
        target = {
            "params": jax.device_get(self.state.params),
            "batch_stats": jax.device_get(self.state.batch_stats),
            "opt_state": jax.device_get(self.state.opt_state),
        }
        restored = ckptr.restore(os.path.abspath(path), target=target)
        self.state = self.state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        return self.state


@click.command()
@click.option("--ckpt", default=None, help="initial checkpoint path")
@click.option("--fighters", "-f", multiple=True, help="fighter(s) names")
@click.option("--family", default="resformer",
              type=click.Choice(list(MODEL_FAMILIES)), help="model family")
@click.option("--batch_size", default=8, type=int, help="batch size")
@click.option("--num_epochs", default=1000, type=int, help="num epochs")
@click.option("--name", default=None, help="name of the run")
@click.option("--num_samples", default=1024, help="simulated number of items in the dataset")
@click.option("--num_frames_per_sample", default=7, help="number of frames per sample")
@click.option("--frame_delta", default=(1, 2, 3, 4, 5, 6), multiple=True, type=int,
              help="frame delta")
@click.option("--model_parallel", default=1, type=int, help="model-parallel mesh axis size")
@click.option("--bf16", is_flag=True, help="bfloat16 compute")
@click.option("--tensorboard", is_flag=True,
              help="also write TensorBoard events next to the JSONL log")
def train(ckpt, fighters, family, batch_size, num_epochs, name, num_samples,
          num_frames_per_sample, frame_delta, model_parallel, bf16, tensorboard):
    """Train CLI (reference: action_detector.py:16-81)."""
    actions = list(MOVE_TO_CLASS_ID.keys())
    char_subset = list(fighters)
    name = name or f"{family}-{'-'.join(char_subset) or 'all'}"

    dataset_args = dict(
        num_samples=num_samples,
        img_dimension=128,
        anim_subset=actions,
        num_frames_per_sample=[num_frames_per_sample],
        frame_delta=list(frame_delta),
        char_subset=char_subset,
        # No current model family consumes the preceding-action context;
        # skip its 8 extra label reads per sample on the hot path.
        num_preceding_actions=0,
    )
    train_ds = UltActionRecogDataset(split="train", **dataset_args)
    val_args = dict(dataset_args, num_samples=num_samples // 4)
    val_ds = UltActionRecogDataset(split="validation", **val_args)

    config = TrainerConfig(
        family=family,
        num_actions=len(actions),
        sequence_length=num_frames_per_sample,
        batch_size=batch_size,
        learning_rate=3e-4,
        num_epochs=num_epochs,
        num_samples=num_samples,
        model_parallel=model_parallel,
        checkpoint_dir=os.path.join(constants.SAVED_ACTION_MODELS, name),
        log_path=os.path.join(constants.ACTION_RECOG_OUTPUT_DIR, name, "metrics.jsonl"),
        tensorboard_dir=(
            os.path.join(constants.ACTION_RECOG_OUTPUT_DIR, name, "tb")
            if tensorboard else None
        ),
        dtype=jnp.bfloat16 if bf16 else jnp.float32,
    )
    trainer = Trainer(config, train_ds, val_ds)
    trainer.init_state()
    if ckpt:
        trainer.restore_checkpoint(ckpt)
    trainer.fit()
    print(trainer.evaluate(UltActionRecogDataset(split="test", **val_args)))


if __name__ == "__main__":
    train()
