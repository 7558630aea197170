import numpy as np

from playaid_core_tpu.fighter import Fighter
from playaid_core_tpu.timeline import (
    load_ground_truth_from_path,
    precompute_timeline_projection,
    update_fighters_from_timeline,
)
from tests.synthlog import scripted_match, write_log


def test_basic_parse(tmp_path):
    frames = scripted_match(60)
    path = tmp_path / "log.txt"
    write_log(path, frames)
    gt = load_ground_truth_from_path(str(path))
    assert len(gt) == 60
    for frame in gt:
        assert len(frame) == 2
        assert frame[0]["fighter_id"] == 0
        assert frame[1]["fighter_id"] == 1


def test_gap_repair(tmp_path):
    frames = scripted_match(60)
    path = tmp_path / "log.txt"
    # Drop frames 30..34 from the file; num_frames_left keeps counting.
    write_log(path, frames, gap_at=30, gap_size=5)
    gt = load_ground_truth_from_path(str(path))
    # Gap repair pads the gap, so total length is preserved.
    assert len(gt) == 60
    # The repaired slots share the post-gap frame's records (the gap filler
    # appends the just-created empty frame list, which then receives the
    # post-gap records — reference: timeline.py:244-256).
    assert gt[30][0]["num_frames_left"] == gt[34][0]["num_frames_left"]
    assert len(gt[30]) == 2
    # Pre-gap frame is intact.
    assert gt[29][0]["num_frames_left"] == 25200 - 29


def test_positive_log_offset_skips_frames(tmp_path):
    frames = scripted_match(60)
    path = tmp_path / "log.txt"
    write_log(path, frames)
    gt = load_ground_truth_from_path(str(path), log_offset=5)
    assert len(gt) == 55
    gt0 = load_ground_truth_from_path(str(path))
    assert gt[0][0]["num_frames_left"] == gt0[5][0]["num_frames_left"]


def test_negative_log_offset_duplicates_start(tmp_path):
    frames = scripted_match(30)
    path = tmp_path / "log.txt"
    write_log(path, frames)
    gt = load_ground_truth_from_path(str(path), log_offset=-3)
    assert len(gt) == 33
    assert gt[0][0]["num_frames_left"] == gt[1][0]["num_frames_left"]


def test_fighter_id_renumbering(tmp_path):
    frames = scripted_match(10)
    # Give the second player a weird raw id like real logs do.
    for rec0, rec1 in frames:
        rec1["fighter_id"] = 4
    path = tmp_path / "log.txt"
    write_log(path, frames)
    gt = load_ground_truth_from_path(str(path))
    assert all(f[0]["fighter_id"] == 0 and f[1]["fighter_id"] == 1 for f in gt)


def test_update_fighters_lifecycle(tmp_path):
    frames = scripted_match(50)
    path = tmp_path / "log.txt"
    write_log(path, frames)
    gt = load_ground_truth_from_path(str(path))

    fighters = []
    for i in range(len(gt)):
        fighters = update_fighters_from_timeline(i, gt[i], fighters)
        assert len(fighters) == 2
    assert fighters[0].fighter_name == "Byleth"
    assert fighters[1].fighter_name == "Pikachu"
    # Two of the scripted hits (frames 20, 43) land within 50 frames.
    assert fighters[1].damage == 25.0


def test_precompute_projection_matches_scalar(tmp_path):
    frames = scripted_match(40)
    path = tmp_path / "log.txt"
    write_log(path, frames)

    gt_scalar = load_ground_truth_from_path(str(path))
    gt_batch = load_ground_truth_from_path(str(path))
    precompute_timeline_projection(gt_batch)

    for i in range(len(gt_scalar)):
        for j in range(2):
            f_scalar = Fighter(frame_num=i, data=gt_scalar[i][j])
            f_batch = Fighter(frame_num=i, data=gt_batch[i][j])
            assert np.isclose(f_scalar.crop.center_x, f_batch.crop.center_x)
            assert np.isclose(f_scalar.crop.center_y, f_batch.crop.center_y)
            assert np.isclose(f_scalar.crop.crop_width, f_batch.crop.crop_width)
            assert np.isclose(f_scalar.crop.crop_height, f_batch.crop.crop_height)
