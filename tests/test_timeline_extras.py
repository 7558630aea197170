"""GTVideo, streaming generators, stats snapshots — the surfaces the
reference's timeline_test exercised against real assets, here on
generated fixtures (reference: timeline_test.py:9-48)."""

import os

import cv2
import numpy as np
import pytest
import yaml

from playaid_core_tpu.stats import Stats
from playaid_core_tpu.timeline import (
    GTVideo,
    load_ground_truth_from_path,
    load_timeline_from_ai_output,
    yield_fighters_and_stats,
    yield_interval_fighters_and_stats,
)
from tests.synthlog import scripted_match, write_log


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("gtv")
    video = d / "v.mp4"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 60, (320, 180))
    for i in range(60):
        w.write(np.full((180, 320, 3), i * 4 % 255, np.uint8))
    w.release()
    log = d / "log.txt"
    write_log(log, scripted_match(60))
    return str(video), str(log)


def test_gtvideo(pair):
    video, log = pair
    gtv = GTVideo(video, log)
    assert isinstance(gtv.get_fps(), float)
    assert gtv.get_fps() == 60.0
    frame = gtv.get_frame(10)
    assert frame.shape == (180, 320, 3)
    frames = gtv.get_frames(0, 3)
    assert len(frames) == 3
    gt = gtv.get_ground_truth(0, 5)
    assert len(gt) == 5 and len(gt[0]) == 2
    frames, gt = gtv.get_frames_and_labels(0, 4)
    assert len(frames) == 4 and len(gt) == 4


def test_yield_fighters_and_stats(pair):
    video, log = pair
    stats = Stats()
    steps = list(yield_fighters_and_stats(stats, video, log))
    assert len(steps) == 60
    fighters, stats_out, i = steps[-1]
    assert i == 59
    assert stats_out.stats[0].action_count["ForwardSmash"] == 1


def test_yield_interval(pair):
    video, log = pair
    stats = Stats()
    steps = list(yield_interval_fighters_and_stats(stats, 10, video, log))
    # Frames 10, 20, ..., 50 (0 excluded by the reference's contract).
    assert [i for _, _, i in steps] == [10, 20, 30, 40, 50]


def test_write_all_stats_idempotent(pair, tmp_path):
    video, log = pair
    gt = load_ground_truth_from_path(log)
    stats = Stats(video)
    stats.output_dir = str(tmp_path / "stats")
    stats.write_all_stats(gt, [], interval=20)
    files = sorted(os.listdir(stats.output_dir))
    assert "stats_0.yaml" in files and "stats_40.yaml" in files
    with open(stats.stats_path(40)) as f:
        snap = yaml.safe_load(f)
    assert "history" in snap

    # Second call is a no-op (resume semantics, reference: stats.py:317-319).
    mtimes = {f: os.path.getmtime(os.path.join(stats.output_dir, f)) for f in files}
    stats2 = Stats(video)
    stats2.output_dir = stats.output_dir
    stats2.write_all_stats(gt, [], interval=20)
    for f in files:
        assert os.path.getmtime(os.path.join(stats.output_dir, f)) == mtimes[f]

    # load_stats + stat_diff over the snapshots.
    assert stats2.load_stats(0)
    ok, diff_results, start, end = stats2.stat_diff(0, 40)
    assert ok
    assert list(diff_results)  # stats changed between frame 0 and 40


def test_move_counter_str_emoji(pair):
    video, log = pair
    stats = Stats()
    fighters = None
    for fighters, stats, i in yield_fighters_and_stats(stats, video, log):
        pass
    s = stats.move_counter_str(fighters[0], "ForwardSmash")
    assert s == "1✅, 0❌, 0⭕️, 1"


def test_load_timeline_from_ai_output(tmp_path):
    ai = {
        "Pikachu": {i: {"crop": "0 0.4 0.5 0.1 0.2 0.9", "action": "Jab"} for i in range(5)},
        "Joker": {i: {"crop": "3 0.6 0.5 0.1 0.2 0.9", "action": "Wait"} for i in range(5)},
    }
    path = tmp_path / "ai_output.yaml"
    with open(path, "w") as f:
        yaml.dump(ai, f)
    timeline = load_timeline_from_ai_output(str(path), max_frames=5)
    assert len(timeline) == 5
    rec = timeline[0][0]
    assert rec["fighter_id"] in (0, 1)
    assert "crop" in rec and rec["action"] in ("Jab", "Wait")

    from playaid_core_tpu.fighter import Fighter

    f = Fighter(frame_num=0, data=timeline[0][0])
    # AI-provided crop and action take precedence over projection/hex.
    assert f.action in ("Jab", "Wait")
