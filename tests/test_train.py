"""Trainer smoke tests on a tiny generated dataset (CPU, 8 virtual devices)."""

import os

import cv2
import numpy as np
import pytest

from playaid_core_tpu.parallel.mesh import make_mesh
from playaid_core_tpu.train.dataset import UltActionRecogDataset
from playaid_core_tpu.train.train import Trainer, TrainerConfig

ACTIONS = ["ForwardSmash", "Jab", "Wait", "Unknown"]


pytestmark = pytest.mark.slow  # model-compile-heavy; -m 'not slow' skips


@pytest.fixture(scope="module")
def tiny_gt_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("gt_tiny")
    rng = np.random.default_rng(0)
    for split in ("train", "validation"):
        base = root / split / "vid" / "0_byleth"
        (base / "images").mkdir(parents=True)
        (base / "labels").mkdir(parents=True)
        for frame in range(20):
            img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            cv2.imwrite(str(base / "images" / f"{frame:06d}.jpg"), img)
            with open(base / "labels" / f"{frame:06d}.txt", "w") as f:
                f.write(ACTIONS[frame % 2])
    return root


def _dataset(root, split):
    return UltActionRecogDataset(
        split=split,
        num_samples=8,
        img_dimension=32,
        anim_subset=ACTIONS,
        num_frames_per_sample=3,
        frame_delta=[1],
        char_subset=["Byleth"],
        crop_size=32,
        seed=0,
        gt_root_train=str(root / "train"),
        gt_root_val=str(root / "validation"),
        gt_root_test=str(root / "validation"),
        stages_dir="/nonexistent",
        clean_char_dir="/nonexistent",
    )


def test_trainer_fit_and_eval(tiny_gt_tree, tmp_path):
    config = TrainerConfig(
        family="cnn",
        num_actions=len(ACTIONS),
        sequence_length=3,
        batch_size=4,
        learning_rate=1e-3,
        num_samples=8,
        crop_size=32,
        checkpoint_dir=None,
        log_path=str(tmp_path / "metrics.jsonl"),
    )
    train_ds = _dataset(tiny_gt_tree, "train")
    val_ds = _dataset(tiny_gt_tree, "validation")
    trainer = Trainer(config, train_ds, val_ds, mesh=make_mesh(model_parallel=2))
    trainer.fit(num_epochs=2, steps_per_epoch=2)

    assert len(trainer.metrics_log) == 2
    rec = trainer.metrics_log[0]
    assert "train_loss" in rec and "val_acc" in rec
    assert np.isfinite(rec["train_loss"])
    assert os.path.exists(config.log_path)

    metrics = trainer.evaluate(val_ds, num_batches=1)
    assert 0.0 <= metrics["acc"] <= 1.0


def test_trainer_loss_decreases_on_fixed_batch(tiny_gt_tree):
    """Overfit sanity: repeated steps on one batch reduce the loss."""
    import jax

    config = TrainerConfig(
        family="cnn", num_actions=len(ACTIONS), sequence_length=3,
        batch_size=2, learning_rate=1e-3, num_samples=4, crop_size=32,
    )
    train_ds = _dataset(tiny_gt_tree, "train")
    trainer = Trainer(config, train_ds, mesh=make_mesh())
    trainer.init_state()

    frames, chars, labels = next(train_ds.batches(2, 1))
    rng = jax.random.PRNGKey(0)
    losses = []
    state = trainer.state
    for i in range(8):
        rng, step = jax.random.split(rng)
        state, loss, acc, gnorm, pnorm = trainer.train_step(
            state, frames, labels, step
        )
        losses.append(float(loss))
        assert float(gnorm) > 0.0 and float(pnorm) > 0.0
    assert losses[-1] < losses[0], losses


def test_checkpoint_roundtrip(tiny_gt_tree, tmp_path):
    import jax

    config = TrainerConfig(
        family="cnn", num_actions=len(ACTIONS), sequence_length=3,
        batch_size=2, num_samples=4, crop_size=32,
        checkpoint_dir=str(tmp_path / "ckpts"),
    )
    train_ds = _dataset(tiny_gt_tree, "train")
    trainer = Trainer(config, train_ds, mesh=make_mesh())
    trainer.init_state()
    path = trainer.save_checkpoint(0)
    assert os.path.exists(path)

    # Perturb params, restore, verify equality with the saved state.
    saved = jax.device_get(trainer.state.params)
    trainer.state = trainer.state.replace(
        params=jax.tree_util.tree_map(lambda x: x + 1.0, trainer.state.params)
    )
    trainer.restore_checkpoint(path)
    restored = jax.device_get(trainer.state.params)
    a = jax.tree_util.tree_leaves(saved)[0]
    b = jax.tree_util.tree_leaves(restored)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
