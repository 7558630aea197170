"""Per-clip-consistent sprite augmentation (round-3 root-cause fix).

The synth mode once drew the difficulty pipeline independently per frame:
full-range hue rotation recolored the sprite every frame and an
unconditional paste draw teleported it, burying the pose-motion signal
under appearance flicker no deployed window ever shows (reference windows
come from one video with one appearance, ult_action_dataset.py:569-689).
These tests pin the fixed contract: augmentation draws once per clip,
while different clips still get different draws.
"""

import cv2
import numpy as np
import pytest

from playaid_core_tpu.train.dataset import UltActionRecogDataset

ACTIONS = ["ForwardSmash", "Jab", "Unknown"]
SPRITE_COLOR = (40, 180, 220)  # one color everywhere: augmentation is the
                               # only source of cross-frame color change


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    root = tmp_path_factory.mktemp("clipconsist")
    stages = root / "stages"
    stages.mkdir()
    cv2.imwrite(str(stages / "s.jpg"), np.full((720, 1280, 3), 70, np.uint8))
    clean = root / "clean"
    for move in ("ForwardSmash", "Jab"):
        d = clean / "Byleth" / move
        d.mkdir(parents=True)
        for i in range(8):
            sprite = np.zeros((96, 64, 4), np.uint8)
            sprite[10:80, 5:60, :3] = SPRITE_COLOR
            sprite[10:80, 5:60, 3] = 255
            cv2.imwrite(str(d / f"byleth_c00_{move.lower()}_frame_90_{i}.png"),
                        sprite)
    return root, stages, clean


def _ds(assets, seed=0):
    root, stages, clean = assets
    return UltActionRecogDataset(
        split="synth",
        num_samples=32,
        img_dimension=96,
        anim_subset=ACTIONS,
        num_frames_per_sample=4,
        frame_delta=[1],
        char_subset=["Byleth"],
        crop_size=96,
        seed=seed,
        gt_root_train=str(root / "none"),
        gt_root_val=str(root / "none"),
        gt_root_test=str(root / "none"),
        stages_dir=str(stages),
        clean_char_dir=str(clean),
        synth_difficulty=1,
        synth_frame_degrade=0.0,
    )


def _clip_channel_means(ds, n):
    """Per-clip array of per-frame RGB means, shape [n, T, 3]."""
    out = []
    for i in range(n):
        frames = ds[i][0]  # [T, H, W, 3] float in [0, 1]
        out.append(frames.mean(axis=(1, 2)))
    return np.asarray(out)


def test_augmentation_consistent_within_clip(assets):
    means = _clip_channel_means(_ds(assets), 12)
    # Within a clip, appearance draws are shared: channel means move only
    # by the +/-3 px drift and +/-0.04 fill jitter (sub-0.02 on a flat
    # sprite over a flat stage).  Pre-fix this was >0.05 routinely.
    within = np.abs(means - means.mean(axis=1, keepdims=True)).max()
    assert within < 0.02, f"within-clip channel-mean delta {within:.4f}"


def test_augmentation_varies_across_clips(assets):
    means = _clip_channel_means(_ds(assets), 12).mean(axis=1)  # [n, 3]
    # Different clips draw different hue/geometry: consistency must come
    # from sharing the per-clip seed, not from augmentation being off.
    spread = means.max(axis=0) - means.min(axis=0)
    assert spread.max() > 0.02, f"across-clip spread {spread}"
