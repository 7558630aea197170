"""vis_ai dashboard: AIRunner predictions rendered as an HTML report with
✅/❌ vs ground truth (reference: visualizations/cnn_action_detector_vis.py:156-184)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from playaid_core_tpu import constants
from playaid_core_tpu.infer.pipeline import BatchedActionPipeline
from playaid_core_tpu.infer.runner import AIRunner
from playaid_core_tpu.viz.vis_ai import collect_vis_records, write_vis_ai_report

from test_ai_runner import FakeDetector


@pytest.fixture(scope="module")
def completed_runner(tmp_path_factory, monkeypatch_module=None):
    d = tmp_path_factory.mktemp("vis_ai")
    video = d / "clip.mp4"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 60, (320, 180))
    for i in range(25):
        w.write(np.full((180, 320, 3), 60 + i, np.uint8))
    w.release()

    old_cache = constants.AI_CACHE
    constants.AI_CACHE = str(d / "ai_cache")
    pipe = BatchedActionPipeline(family="cnn", num_actions=8, sequence_length=3,
                                 frame_delta=1, crop_size=32)
    runner = AIRunner(
        input_video_path=str(video),
        detector=FakeDetector(num_frames=20),
        pipeline=pipe,
    )
    runner.run_detection_setup()
    runner.run_action_recognition()
    yield runner
    constants.AI_CACHE = old_cache


def test_collect_records_without_gt(completed_runner):
    records, agg = collect_vis_records(completed_runner, sample_every=4)
    assert records, "no records sampled"
    assert agg["full_agreement"] is None
    f0 = records[0]["fighters"][0]
    assert f0["action"]
    assert f0["correct"] is None
    assert f0["crop"] is not None and f0["crop"].ndim == 3


def test_report_with_gt(completed_runner, tmp_path):
    runner = completed_runner
    # Ground truth = the runner's own predictions for fighter 0 (all ✅),
    # garbage for fighter 1 (all ❌) — exercises both marks.
    f0, f1 = runner.fighters
    n = runner.max_frames - 1
    gt = {
        f0: [runner.ai_output_data[f0][i].action for i in range(n)],
        f1: ["__not_a_move__"] * n,
    }
    path, agg = write_vis_ai_report(str(tmp_path / "vis_ai.html"), runner, gt,
                                    sample_every=3)
    assert os.path.exists(path)
    assert agg["full_agreement"] == pytest.approx(0.5)
    content = open(path).read()
    assert "✅" in content and "❌" in content
    assert "action agreement" in content
    assert "data:image/png;base64," in content
