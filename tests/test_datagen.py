"""Datagen suite tests over fully synthetic assets."""

import os

import cv2
import numpy as np
import pytest

from playaid_core_tpu.datagen.gen_gt_action_detection import process_pairing
from playaid_core_tpu.datagen.gen_gt_char_detection import generate_data as gen_char_data
from playaid_core_tpu.datagen.gen_synth_char_detection import (
    generate_stage_char_compositions,
)
from playaid_core_tpu.datagen.gen_synth_video_actions import SynthVideoGenerator
from playaid_core_tpu.datagen.raw_anim_cleaner import (
    clean_all_raw_fighter_anim_data,
    get_bounding_box,
    remove_black_background,
)
from tests.synthlog import scripted_match, write_log


@pytest.fixture(scope="module")
def gt_pairing(tmp_path_factory):
    """A (video, log) ground-truth pairing on disk, 720p for projection."""
    root = tmp_path_factory.mktemp("gt_root")
    d = root / "byleth_v_pikachu_1"
    d.mkdir()
    video = d / "match.mp4"
    log = d / "log.txt"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 60, (1280, 720))
    for i in range(40):
        w.write(np.full((720, 1280, 3), (i * 5) % 255, np.uint8))
    w.release()
    write_log(log, scripted_match(40))
    return root, ("byleth_v_pikachu_1", "match.mp4", "log.txt", 0)


def test_gen_gt_action_detection(gt_pairing, tmp_path):
    root, pairing = gt_pairing
    out = tmp_path / "train"
    written = process_pairing(str(out), pairing, ground_truth_dir=str(root))
    assert written > 0
    fighter_dirs = sorted(os.listdir(out / "byleth_v_pikachu_1"))
    assert fighter_dirs == ["0_byleth", "1_pikachu"]
    images = sorted(os.listdir(out / "byleth_v_pikachu_1" / "0_byleth" / "images"))
    labels = sorted(os.listdir(out / "byleth_v_pikachu_1" / "0_byleth" / "labels"))
    assert len(images) == len(labels) > 0
    img = cv2.imread(str(out / "byleth_v_pikachu_1" / "0_byleth" / "images" / images[0]))
    assert img.shape == (128, 128, 3)
    with open(out / "byleth_v_pikachu_1" / "0_byleth" / "labels" / labels[0]) as f:
        assert f.read() in ("Wait", "ForwardSmash", "Jab", "DashAttack", "Undefined")
    # Idempotent on re-run.
    assert process_pairing(str(out), pairing, ground_truth_dir=str(root)) == 0


def test_gen_gt_char_detection(gt_pairing, tmp_path):
    root, pairing = gt_pairing
    pairings_csv = tmp_path / "train.csv"
    with open(pairings_csv, "w") as f:
        f.write("dir,video,log,offset\n")
        f.write(",".join(str(v) for v in pairing) + "\n")
    out = tmp_path / "char_det"
    written = gen_char_data(
        str(pairings_csv), "train", interval=10, output_root=str(out),
        ground_truth_dir=str(root),
    )
    assert written > 0
    labels = sorted(os.listdir(out / "train" / "labels"))
    with open(out / "train" / "labels" / labels[0]) as f:
        lines = [l for l in f.read().splitlines() if l]
    assert len(lines) == 2
    parts = lines[0].split(" ")
    assert len(parts) == 5


@pytest.fixture(scope="module")
def sprite_assets(tmp_path_factory):
    root = tmp_path_factory.mktemp("sprites")
    stages = root / "stages"
    stages.mkdir()
    rng = np.random.default_rng(0)
    cv2.imwrite(str(stages / "s.jpg"), rng.integers(0, 255, (720, 1280, 3), dtype=np.uint8))
    clean = root / "clean"
    for fighter in ("Byleth", "Pikachu"):
        for move in ("Jab", "ForwardSmash"):
            d = clean / fighter / move
            d.mkdir(parents=True)
            for i in range(6):
                sprite = np.zeros((160, 120, 4), np.uint8)
                sprite[20:140, 10:110, :3] = rng.integers(60, 255, 3, dtype=np.uint8)
                sprite[20:140, 10:110, 3] = 255
                cv2.imwrite(str(d / f"{fighter.lower()}_c00_{move.lower()}_frame_90_{i}.png"),
                            sprite)
    return stages, clean


def test_gen_synth_char_detection(sprite_assets, tmp_path):
    stages, clean = sprite_assets
    n = generate_stage_char_compositions(
        "train", 3, seed=0, output_root=str(tmp_path), stages_dir=str(stages),
        clean_char_dir=str(clean),
    )
    assert n == 3
    images = sorted(os.listdir(tmp_path / "train" / "images"))
    labels = sorted(os.listdir(tmp_path / "train" / "labels"))
    assert len(images) == 3 and len(labels) == 3
    img = cv2.imread(str(tmp_path / "train" / "images" / images[0]))
    assert img.shape == (720, 1280, 3)


def test_hud_distractors_render_without_labels(sprite_assets, tmp_path):
    """hud_distractors=1.0 must visibly alter the composite (overlay
    clutter is drawn) while leaving the YOLO labels untouched — HUD
    text is hard-negative background, never a labeled object."""
    stages, clean = sprite_assets
    # One composite per run: the HUD draw consumes rng, so later
    # composites' sprite placements would diverge between the two runs.
    for sub, hud in (("plain", 0.0), ("hud", 1.0)):
        generate_stage_char_compositions(
            sub, 1, seed=7, output_root=str(tmp_path), stages_dir=str(stages),
            clean_char_dir=str(clean), augment=False, degrade=0.0,
            hud_distractors=hud,
        )
    plain = cv2.imread(str(tmp_path / "plain" / "images" / "comp-0.jpg"))
    hud = cv2.imread(str(tmp_path / "hud" / "images" / "comp-0.jpg"))
    assert plain.shape == hud.shape
    # same rng stream up to the HUD draw -> sprites land identically;
    # the overlay is the only difference and it must be substantial
    assert np.abs(plain.astype(int) - hud.astype(int)).sum() > 10_000
    with open(tmp_path / "plain" / "labels" / "comp-0.txt") as f:
        plain_labels = f.read()
    with open(tmp_path / "hud" / "labels" / "comp-0.txt") as f:
        hud_labels = f.read()
    assert plain_labels == hud_labels


def test_gen_synth_video_actions(sprite_assets, tmp_path):
    stages, clean = sprite_assets
    gen = SynthVideoGenerator(
        {"train": 1, "validation": 1}, video_length=5, width=640, height=480,
        output_root=str(tmp_path / "ava"), stages_dir=str(stages),
        clean_char_dir=str(clean),
    )
    gen.generate()
    frames = sorted(os.listdir(tmp_path / "ava" / "frames" / "video_0"))
    assert len(frames) == 5
    with open(tmp_path / "ava" / "annotations" / "train.csv") as f:
        rows = [r for r in f.read().splitlines() if r]
    assert len(rows) == 10  # 5 frames x 2 characters
    with open(tmp_path / "ava" / "frames" / "train.txt") as f:
        header = f.readline()
    assert header.startswith("original_vido_id")  # AVA misspelling preserved
    assert os.path.exists(tmp_path / "ava" / "annotations" / "label_map_file.pbtxt")
    assert os.path.exists(tmp_path / "ava" / "annotations" / "excluded.csv")


def test_raw_anim_cleaner(tmp_path):
    raw = tmp_path / "raw" / "byleth" / "c00attack1"
    raw.mkdir(parents=True)
    img = np.zeros((200, 300, 3), np.uint8)
    img[50:150, 100:220] = (80, 160, 240)
    cv2.imwrite(str(raw / "frame_0.png"), img)

    written = clean_all_raw_fighter_anim_data(
        "byleth", raw_dir=str(tmp_path / "raw"), clean_dir=str(tmp_path / "clean")
    )
    assert written == 1
    # Raw anim name mapped to the ontology move.
    out = tmp_path / "clean" / "byleth" / "Jab" / "frame_0.png"
    assert out.exists()
    cleaned = cv2.imread(str(out), cv2.IMREAD_UNCHANGED)
    # Tight crop to the opaque content.
    assert cleaned.shape == (100, 120, 4)
    assert (cleaned[:, :, 3] == 255).all()


def test_bounding_box_vectorized():
    img = np.zeros((50, 60, 4), np.uint8)
    img[10:20, 30:45, 3] = 255
    (l, t), (r, _), (_, b), _ = get_bounding_box(img)
    assert (l, t, r, b) == (30, 10, 44, 19)


def test_remove_black_background():
    img = np.zeros((10, 10, 3), np.uint8)
    img[5, 5] = (100, 100, 100)
    out = remove_black_background(img)
    assert out.shape == (10, 10, 4)
    assert out[0, 0, 3] == 0
    assert out[5, 5, 3] == 255


def test_multi_vod_batch(gt_pairing, tmp_path):
    from playaid_core_tpu.pipeline.multi import run_batch

    root, pairing = gt_pairing
    dir_name, video_name, log_name, log_offset = pairing
    jobs = [
        dict(
            input_video_path=os.path.join(str(root), dir_name, video_name),
            ground_truth_path=os.path.join(str(root), dir_name, log_name),
            log_offset=log_offset,
            output_video_path=str(tmp_path / f"out_{i}.mp4"),
            skip_graphs=True,
            skip_summaries=True,
            include_audio=False,
            progress=False,
        )
        for i in range(2)
    ]
    results = run_batch(jobs, workers=2)
    assert len(results) == 2
    for out, err in results:
        assert err is None, err
        assert os.path.exists(out)
