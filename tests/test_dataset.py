"""Dataset tests over a tiny generated gt_action_detection tree and
synthetic sprite/stage assets — no real game data needed."""

import os

import cv2
import numpy as np
import pytest

from playaid_core_tpu.train.dataset import (
    UltActionRecogDataset,
    get_character_actions_animations_dict,
    middle_out_sample,
)

ACTIONS = ["ForwardSmash", "Jab", "Wait", "NeutralAir", "Unknown"]


@pytest.fixture(scope="module")
def gt_tree(tmp_path_factory):
    """gt_action_detection/<split>/<video>/<id>_<fighter>/{images,labels}"""
    root = tmp_path_factory.mktemp("gt_action")
    rng = np.random.default_rng(0)
    for split in ("train", "validation", "test"):
        for video in ("vid_a",):
            for fid, fighter in ((0, "byleth"), (1, "pikachu")):
                base = root / split / video / f"{fid}_{fighter}"
                (base / "images").mkdir(parents=True)
                (base / "labels").mkdir(parents=True)
                for frame in range(30):
                    img = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
                    cv2.imwrite(str(base / "images" / f"{frame:06d}.jpg"), img)
                    action = ACTIONS[frame % 3]
                    with open(base / "labels" / f"{frame:06d}.txt", "w") as f:
                        f.write(action)
    return root


@pytest.fixture(scope="module")
def synth_assets(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    stages = root / "stages"
    stages.mkdir()
    rng = np.random.default_rng(1)
    cv2.imwrite(str(stages / "stage1.jpg"),
                rng.integers(0, 255, (720, 1280, 3), dtype=np.uint8))
    clean = root / "clean"
    for fighter in ("Byleth",):
        for move in ("ForwardSmash", "Jab"):
            d = clean / fighter / move
            d.mkdir(parents=True)
            for frame in range(12):
                sprite = np.zeros((96, 64, 4), np.uint8)
                sprite[20:80, 10:50, :3] = rng.integers(50, 255, 3, dtype=np.uint8)
                sprite[20:80, 10:50, 3] = 255
                name = f"byleth_c00_{move.lower()}_frame_90_{frame}.png"
                cv2.imwrite(str(d / name), sprite)
    return stages, clean


def _make_dataset(gt_tree, synth_assets=None, split="train", **kw):
    stages_dir, clean_dir = synth_assets if synth_assets else (None, None)
    return UltActionRecogDataset(
        split=split,
        num_samples=16,
        img_dimension=128,
        anim_subset=ACTIONS,
        num_frames_per_sample=5,
        frame_delta=[1, 2],
        char_subset=["Byleth", "Pikachu"],
        seed=0,
        gt_root_train=str(gt_tree / "train"),
        gt_root_val=str(gt_tree / "validation"),
        gt_root_test=str(gt_tree / "test"),
        stages_dir=str(stages_dir) if stages_dir else "/nonexistent",
        clean_char_dir=str(clean_dir) if clean_dir else "/nonexistent",
        **kw,
    )


def test_ground_truth_sample_shapes(gt_tree):
    ds = _make_dataset(gt_tree)
    frames, char_id, labels, meta = ds[0]
    assert frames.shape == (5, 128, 128, 3)
    assert frames.dtype == np.float32
    assert 0.0 <= frames.max() <= 1.0
    assert labels.shape == (5,)
    assert all(0 <= l < len(ACTIONS) for l in labels)
    assert meta["char"] in ("Byleth", "Pikachu")
    assert len(meta["preceding_actions"]) == 8


def test_ground_truth_labels_match_files(gt_tree):
    ds = _make_dataset(gt_tree)
    _, _, labels, meta = ds[0]
    for label, action in zip(labels, meta["actions"]):
        expected = ACTIONS.index(action) if action in ACTIONS else ACTIONS.index("Unknown")
        assert label == expected


def test_augmented_ground_truth(gt_tree):
    ds = _make_dataset(gt_tree, synth_difficulty=1)
    frames, _, labels, _ = ds[0]
    assert frames.shape == (5, 128, 128, 3)


def test_curriculum_hooks(gt_tree):
    ds = _make_dataset(gt_tree)
    assert ds.synth_difficulty == 0
    ds.make_synth_more_challenging()
    assert ds.synth_difficulty == 1
    ds.make_synth_more_challenging()
    ds.make_synth_more_challenging()
    assert ds.synth_difficulty == 2  # capped
    ds.switch_num_frames_per_sample()
    assert ds.num_frames_per_sample == 5


def test_batches_iterator(gt_tree):
    ds = _make_dataset(gt_tree)
    batches = list(ds.batches(4, num_batches=2))
    assert len(batches) == 2
    frames, chars, labels = batches[0]
    assert frames.shape == (4, 5, 128, 128, 3)
    assert chars.shape == (4,)
    assert labels.shape == (4, 5)


def test_synth_mode(gt_tree, synth_assets):
    ds = _make_dataset(gt_tree, synth_assets, split="synth")
    frames, char_id, labels, meta = ds[0]
    assert frames.shape == (5, 128, 128, 3)
    assert char_id == 0  # Byleth
    # Labels come from the scripted clip actions.
    assert all(0 <= l < len(ACTIONS) for l in labels)
    # Composites are not blank.
    assert frames.std() > 0.01


def test_char_anim_dict_structure(synth_assets):
    stages, clean = synth_assets
    d = get_character_actions_animations_dict(str(clean))
    assert "Byleth" in d
    assert "ForwardSmash" in d["Byleth"]
    body = d["Byleth"]["ForwardSmash"]["c00"]
    anim = list(body.keys())[0]
    frames = body[anim]["90"]
    # Sorted numerically by trailing frame number.
    nums = [int(os.path.basename(p).rsplit("_", 1)[1].split(".")[0]) for p in frames]
    assert nums == sorted(nums)


def test_middle_out_sample_host():
    assert middle_out_sample(10, 5, 1, 30) == [6, 9, 10, 11, 14]


def test_missing_tree_raises(tmp_path):
    ds = UltActionRecogDataset(
        split="train", num_samples=4, img_dimension=128, anim_subset=ACTIONS,
        char_subset=["Byleth"], seed=0,
        gt_root_train=str(tmp_path / "none"),
        gt_root_val=str(tmp_path / "none"),
        gt_root_test=str(tmp_path / "none"),
        stages_dir="/nonexistent", clean_char_dir="/nonexistent",
    )
    with pytest.raises(RuntimeError):
        ds[0]
