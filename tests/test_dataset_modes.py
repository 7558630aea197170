"""simple / manual dataset modes (reference: ult_action_dataset.py:373-559)."""

import cv2
import numpy as np
import pytest

from playaid_core_tpu.train.dataset import UltActionRecogDataset

ACTIONS = ["ForwardSmash", "Jab", "Wait", "Unknown"]


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    root = tmp_path_factory.mktemp("modes")
    rng = np.random.default_rng(0)
    stages = root / "stages"
    stages.mkdir()
    cv2.imwrite(str(stages / "s.jpg"),
                rng.integers(0, 255, (720, 1280, 3), dtype=np.uint8))
    clean = root / "clean"
    for move in ("ForwardSmash", "Jab"):
        d = clean / "Byleth" / move
        d.mkdir(parents=True)
        for i in range(8):
            sprite = np.zeros((96, 64, 4), np.uint8)
            sprite[10:80, 5:60, :3] = rng.integers(60, 255, 3, dtype=np.uint8)
            sprite[10:80, 5:60, 3] = 255
            cv2.imwrite(str(d / f"byleth_c00_{move.lower()}_frame_90_{i}.png"), sprite)

    # Manual-annotation clip + CSV.
    video = root / "clip.mp4"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 30, (640, 360))
    for i in range(30):
        w.write(np.full((360, 640, 3), 30 + i * 5 % 200, np.uint8))
    w.release()
    csv_path = root / "labels.csv"
    with open(csv_path, "w") as f:
        f.write("frame,fighter,action,cx,cy,w,h\n")
        for i in range(30):
            action = ACTIONS[i % 2]
            f.write(f"{i},Byleth,{action},0.5,0.5,0.3,0.4\n")
    return root, stages, clean, video, csv_path


def _ds(assets, split, **kw):
    root, stages, clean, video, csv_path = assets
    return UltActionRecogDataset(
        split=split,
        num_samples=8,
        img_dimension=96,
        anim_subset=ACTIONS,
        num_frames_per_sample=3,
        frame_delta=[1],
        char_subset=["Byleth"],
        crop_size=64,
        seed=0,
        gt_root_train=str(root / "none"),
        gt_root_val=str(root / "none"),
        gt_root_test=str(root / "none"),
        stages_dir=str(stages),
        clean_char_dir=str(clean),
        manual_ground_truth_csv=str(csv_path),
        manual_ground_truth_video=str(video),
        **kw,
    )


def test_simple_mode(assets):
    ds = _ds(assets, "simple")
    f0 = ds[0]
    f1 = ds[1]
    frames, char_id, labels, meta = f1
    assert frames.shape == (3, 96, 96, 3)
    # Alternating classes between even/odd indices.
    assert f0[3]["actions"] != f1[3]["actions"]
    assert all(a in ("ForwardSmash", "Jab") for a in meta["actions"])


def test_manual_mode(assets):
    ds = _ds(assets, "manual")
    frames, char_id, labels, meta = ds[0]
    assert frames.shape == (3, 64, 64, 3)
    assert meta["char"] == "Byleth"
    assert all(a in ACTIONS for a in meta["actions"])
    assert all(0 <= l < len(ACTIONS) for l in labels)


def test_manual_thirds_split(assets):
    root, stages, clean, video, csv_path = assets
    train = _ds(assets, "manual", manual_split="train")
    test = _ds(assets, "manual", manual_split="test")
    train_frames = set(train.manual_labels["Byleth"].keys())
    test_frames = set(test.manual_labels["Byleth"].keys())
    assert train_frames and test_frames
    assert not (train_frames & test_frames)
