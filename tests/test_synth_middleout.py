"""Deployed-geometry (middle-out) synthetic training windows.

At inference the classifier consumes quadratic middle-out windows
(offsets frame_delta*(mid-i)^2, reference: dataset_utils.py:109-138); the
reference's synth mode trained on CONSECUTIVE animation frames instead
(ult_action_dataset.py:633-638 — its "skip each frame" TODO was never
done), so the temporal head saw motion at 1/3 the deployed rate with
uniform spacing.  ``synth_window="middleout"`` samples training windows
with the deployed geometry; these tests pin it.
"""

import re

import cv2
import numpy as np
import pytest

from playaid_core_tpu.train.dataset import UltActionRecogDataset

NUM_ANIM_FRAMES = 32


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    root = tmp_path_factory.mktemp("middleout")
    stages = root / "stages"
    stages.mkdir()
    cv2.imwrite(str(stages / "s.jpg"), np.full((720, 1280, 3), 70, np.uint8))
    clean = root / "clean"
    d = clean / "Byleth" / "Jab"
    d.mkdir(parents=True)
    for i in range(NUM_ANIM_FRAMES):
        sprite = np.zeros((96, 64, 4), np.uint8)
        sprite[10:80, 5:60, :3] = (40, 180, 220)
        sprite[10:80, 5:60, 3] = 255
        cv2.imwrite(str(d / f"byleth_c00_jab_frame_90_{i:02d}.png"), sprite)
    return root, stages, clean


def make_ds(root, stages, clean, **kw):
    none = str(root / "none")
    return UltActionRecogDataset(
        split="synth", num_samples=8, img_dimension=96,
        anim_subset=["Jab"], num_frames_per_sample=7, frame_delta=[3],
        char_subset=["Byleth"], crop_size=96, seed=0,
        gt_root_train=none, gt_root_val=none, gt_root_test=none,
        stages_dir=str(stages), clean_char_dir=str(clean), **kw,
    )


def _frame_ids(meta):
    return [int(re.search(r"_(\d+)\.png$", p).group(1))
            for p in meta["frame_paths"]]


def test_middleout_window_geometry(assets):
    """Window frame indices follow the quadratic middle-out pattern
    (delta * (mid - i)^2 around the center) in mini-timeline units."""
    ds = make_ds(*assets, synth_window="middleout", synth_cycle_repeats=(1, 1))
    expected = np.array([-9, -4, -1, 0, 1, 4, 9]) % NUM_ANIM_FRAMES
    for _ in range(6):
        frames, _char, labels, meta = ds.get_synth(0)
        assert frames.shape == (7, 96, 96, 3)
        assert labels.shape == (7,)
        ids = np.array(_frame_ids(meta))
        # single move of NUM_ANIM_FRAMES frames: global mini-timeline index
        # == within-move index mod NUM_ANIM_FRAMES
        rel = (ids - ids[3]) % NUM_ANIM_FRAMES
        assert np.array_equal(rel, expected), (ids, rel)


def test_middleout_window_delta(assets):
    ds = make_ds(*assets, synth_window="middleout", synth_window_delta=2,
                 synth_cycle_repeats=(1, 1))
    expected = np.array([-18, -8, -2, 0, 2, 8, 18]) % NUM_ANIM_FRAMES
    _f, _c, _l, meta = ds.get_synth(0)
    ids = np.array(_frame_ids(meta))
    assert np.array_equal((ids - ids[3]) % NUM_ANIM_FRAMES, expected)


def test_consecutive_default_unchanged(assets):
    """Default synth_window stays the reference's consecutive sampling."""
    ds = make_ds(*assets)
    assert ds.synth_window == "consecutive"
    for _ in range(4):
        _f, _c, _l, meta = ds.get_synth(0)
        ids = np.array(_frame_ids(meta))
        rel = (ids - ids[0]) % NUM_ANIM_FRAMES
        assert np.array_equal(rel, np.arange(7) % NUM_ANIM_FRAMES), ids


def test_middleout_labels_match_slots(assets, tmp_path):
    """Per-slot labels come from each slot's mini-timeline position (a
    window crossing a move boundary carries both moves' labels)."""
    root, stages, _clean = assets
    clean = tmp_path / "clean2"
    for move, n in (("Jab", 16), ("ForwardSmash", 16)):
        d = clean / "Byleth" / move
        d.mkdir(parents=True)
        for i in range(n):
            sprite = np.zeros((96, 64, 4), np.uint8)
            sprite[10:80, 5:60, :3] = (40, 180, 220)
            sprite[10:80, 5:60, 3] = 255
            cv2.imwrite(str(d / f"b_c00_m_frame_90_{i:02d}.png"), sprite)
    ds = UltActionRecogDataset(
        split="synth", num_samples=8, img_dimension=96,
        anim_subset=["Jab", "ForwardSmash"], num_frames_per_sample=7,
        frame_delta=[3], char_subset=["Byleth"], crop_size=96, seed=1,
        gt_root_train=str(root / "none"), gt_root_val=str(root / "none"),
        gt_root_test=str(root / "none"), stages_dir=str(stages),
        clean_char_dir=str(clean), synth_window="middleout",
    )
    saw_mixed = False
    for _ in range(40):
        _f, _c, labels, meta = ds.get_synth(0)
        assert list(meta["actions"]) == [ds.animations[i] for i in labels]
        if len(set(meta["actions"])) > 1:
            saw_mixed = True
    assert saw_mixed, "middle-out windows should sometimes cross move boundaries"
