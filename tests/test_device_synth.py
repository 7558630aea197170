"""Device-side synthetic batch generation (train/device_synth.py)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from playaid_core_tpu.datagen import skeletal_sprites as sk
from playaid_core_tpu.train.device_synth import (
    DeviceSynthDataset,
    SpriteBank,
    StageBank,
)

FIGHTERS = ["Byleth", "Pikachu"]
MOVES = ["Wait", "Jab", "Run", "Shield"]


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_assets")
    clean = os.path.join(root, "clean")
    stages = os.path.join(root, "stages")
    os.makedirs(stages, exist_ok=True)
    sk.generate_sprite_set(clean, fighters=FIGHTERS, moves=MOVES,
                           frames_per_move=4, variant_seeds=(0,))
    rng = np.random.default_rng(0)
    for i in range(2):
        img = rng.integers(0, 255, (300, 400, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(stages, f"stage_{i}.jpg"), img)
    return clean, stages


@pytest.fixture(scope="module")
def dataset(assets):
    clean, stages = assets
    return DeviceSynthDataset(
        anim_subset=MOVES + ["Unknown"], characters=FIGHTERS,
        clean_char_dir=clean, stages_dir=stages, num_samples=64,
        num_frames_per_sample=5, synth_window="middleout",
        synth_cycle_repeats=(2, 3), synth_difficulty=1, seed=0,
        stage_patch=160,
    )


def test_sprite_bank_layout(assets):
    clean, _ = assets
    bank = SpriteBank(clean, FIGHTERS, sprite_size=64)
    # 2 fighters x 4 moves x 1 variant x 2 facings x 4 frames
    assert bank.num_sprites == 2 * 4 * 1 * 2 * 4
    assert bank.bank.shape == (bank.num_sprites, 64, 64, 4)
    for seq in bank.sequences:
        assert len(seq["rows"]) == 4
        assert seq["char"] in FIGHTERS
        assert seq["move"] in MOVES


def test_stage_bank(assets):
    _, stages = assets
    bank = StageBank(stages, patch=160, patches_per_stage=4)
    assert bank.bank.shape == (8, 160, 160, 3)


def test_batch_shapes_and_labels(dataset):
    frames, chars, labels = next(dataset.device_batches(6))
    assert frames.shape == (6, 5, 128, 128, 3)
    assert frames.dtype == np.uint8
    assert labels.shape == (6, 5)
    assert set(np.unique(labels)).issubset(set(range(len(MOVES) + 1)))
    assert chars.shape == (6,)
    assert set(np.unique(chars)).issubset({0, 1})


def test_sprite_actually_composited(dataset):
    # The composite must differ from the pure stage patch in the center
    # (the sprite is pasted centered with bounded jitter).
    frames, _, _ = next(dataset.device_batches(8))
    frames = np.asarray(frames)
    center = frames[:, :, 44:84, 44:84]
    border = frames[:, :, :12, :12]
    # sprites are drawn with saturated palettes over noise stages; the
    # center region's per-frame variance profile must differ from the
    # corner's for most samples
    diff = np.abs(center.mean(axis=(2, 3, 4)) - border.mean(axis=(2, 3, 4)))
    assert (diff > 1.0).any()


def test_determinism_same_seed(assets):
    clean, stages = assets

    def make():
        return DeviceSynthDataset(
            anim_subset=MOVES + ["Unknown"], characters=FIGHTERS,
            clean_char_dir=clean, stages_dir=stages, num_samples=16,
            num_frames_per_sample=5, synth_difficulty=2, seed=7,
            stage_patch=160,
        )

    f1, c1, l1 = next(make().device_batches(4))
    f2, c2, l2 = next(make().device_batches(4))
    assert np.array_equal(np.asarray(f1), np.asarray(f2))
    assert np.array_equal(l1, l2)
    assert np.array_equal(c1, c2)


def test_fill_controls_sprite_extent(assets):
    """A fill near 1.0 must paint a larger sprite than a small fill —
    checks the output->bank geometric mapping's scale sign/origin."""
    clean, stages = assets

    def nonstage_fraction(fill):
        ds = DeviceSynthDataset(
            anim_subset=MOVES, characters=FIGHTERS[:1],
            clean_char_dir=clean, stages_dir=stages, num_samples=8,
            num_frames_per_sample=3, synth_sprite_fill=(fill, fill),
            synth_center_jitter=0, synth_difficulty=0, seed=3,
            stage_patch=160,
        )
        frames, _, _ = next(ds.device_batches(8))
        frames = np.asarray(frames).astype(np.int32)
        # difficulty 0 -> no photometrics; compare against the same seed's
        # stage-only render by regenerating with a transparent sprite
        # stand-in: instead, use spatial extent of non-background
        # structure via high-frequency energy in the center column
        mid = frames[:, :, :, 60:68].std(axis=(2, 3, 4)).mean()
        return mid

    # Not a strict pixel test (stages are noise): assert the big-fill
    # configuration differs measurably from the tiny-fill one.
    big, small = nonstage_fraction(0.95), nonstage_fraction(0.2)
    assert abs(big - small) > 0.5


def test_curriculum_hook(dataset):
    d0 = dataset.synth_difficulty
    dataset.make_synth_more_challenging()
    assert dataset.synth_difficulty == min(d0 + 1, 2)
    dataset.synth_difficulty = d0


def test_trainer_smoke_with_device_batches(assets):
    """Trainer.fit consumes device_batches end-to-end (tiny CNN, CPU)."""
    import jax.numpy as jnp

    from playaid_core_tpu.train.train import Trainer, TrainerConfig

    clean, stages = assets
    ds = DeviceSynthDataset(
        anim_subset=MOVES + ["Unknown"], characters=FIGHTERS,
        clean_char_dir=clean, stages_dir=stages, num_samples=8,
        num_frames_per_sample=3, synth_difficulty=0, seed=0,
        crop_size=32, stage_patch=96,
    )
    config = TrainerConfig(
        family="cnn", num_actions=len(MOVES) + 1, sequence_length=3,
        batch_size=4, learning_rate=1e-3, num_epochs=1, num_samples=8,
        crop_size=32, warmup_steps=0, dtype=jnp.float32,
    )
    trainer = Trainer(config, ds)
    trainer.init_state()
    trainer.fit(num_epochs=1, steps_per_epoch=2)
    assert len(trainer.metrics_log) == 1
    rec = trainer.metrics_log[0]
    assert rec["steps_per_sec"] > 0
    assert np.isfinite(rec["train_loss"])
