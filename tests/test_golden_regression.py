"""Golden-fixture regression: the full stats output of the scripted match
must stay bit-identical across changes (the fixture was captured from the
reference-parity-verified implementation)."""

import json
import os

from playaid_core_tpu.stats import Stats
from playaid_core_tpu.timeline import load_ground_truth_from_path, update_fighters_from_timeline
from tests.synthlog import scripted_match, write_log

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_stats.json")


def _normalize(o):
    if isinstance(o, dict):
        return {str(k): _normalize(v) for k, v in o.items()}
    if isinstance(o, (list, tuple)):
        return [_normalize(v) for v in o]
    return o


def test_stats_match_golden_fixture(tmp_path):
    log = tmp_path / "log.txt"
    write_log(log, scripted_match(120), gap_at=95, gap_size=4)
    gt = load_ground_truth_from_path(str(log))
    stats = Stats()
    fighters = []
    for i in range(len(gt)):
        fighters = update_fighters_from_timeline(i, gt[i], fighters)
        stats.record_frame(fighters)

    with open(FIXTURE) as f:
        golden = json.load(f)
    current = _normalize(stats.stats.to_dict())
    assert current == golden


def test_manuscript_inspection_report(tmp_path):
    import cv2
    import numpy as np

    from playaid_core_tpu.viz.manuscript_vis import inspect_match

    video = tmp_path / "v.mp4"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 60, (1280, 720))
    for i in range(50):
        w.write(np.full((720, 1280, 3), 40 + i, np.uint8))
    w.release()
    log = tmp_path / "log.txt"
    write_log(log, scripted_match(50))

    out = inspect_match(str(video), str(log), [0, 20, 45], str(tmp_path / "report.html"))
    content = open(out).read()
    assert content.count("<h2>Frame") == 3
    assert "Byleth" in content
    assert "data:image/jpeg;base64" in content


def test_vod_boxes_from_log(tmp_path):
    from playaid_core_tpu.infer.vod_pipeline import boxes_from_log

    log = tmp_path / "log.txt"
    write_log(log, scripted_match(30))
    boxes = boxes_from_log(str(log))
    assert boxes.shape == (30, 2, 4)
    assert (boxes[:, :, 2:] > 0).all()  # positive sizes
    # Fighters move across the scripted match.
    assert abs(boxes[0, 0, 0] - boxes[29, 0, 0]) > 0.001
