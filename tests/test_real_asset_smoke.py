"""Argument/error paths + a mini end-to-end pass of the real-asset
runbook entry point (tools/real_asset_smoke.py, docs/RUNBOOK.md)."""

import importlib.util
import os

import numpy as np
import pytest
from click.testing import CliRunner

cv2 = pytest.importorskip("cv2")

from tests.synthlog import scripted_match, write_log

_SPEC = importlib.util.spec_from_file_location(
    "real_asset_smoke",
    os.path.join(os.path.dirname(os.path.dirname(__file__)),
                 "tools", "real_asset_smoke.py"),
)
smoke = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(smoke)


def _make_pair(tmp_path, frames=60):
    log = str(tmp_path / "log.txt")
    write_log(log, scripted_match(frames + 5))
    video = str(tmp_path / "match.mp4")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 60, (640, 360))
    rng = np.random.default_rng(0)
    base = rng.integers(0, 80, (360, 640, 3), dtype=np.uint8)
    for i in range(frames):
        f = base.copy()
        cv2.circle(f, (100 + 3 * i, 180), 30, (0, 200, 255), -1)
        w.write(f)
    w.release()
    return video, log


def test_missing_video_message(tmp_path):
    result = CliRunner().invoke(
        smoke.main, ["--video", str(tmp_path / "nope.mp4"),
                     "--log", str(tmp_path / "nope.txt")],
    )
    assert result.exit_code != 0
    assert "video not found" in result.output


def test_missing_log_message(tmp_path):
    video, _ = _make_pair(tmp_path, frames=4)
    result = CliRunner().invoke(
        smoke.main, ["--video", video, "--log", str(tmp_path / "nope.txt")],
    )
    assert result.exit_code != 0
    assert "log not found" in result.output


def test_missing_checkpoint_message(tmp_path):
    video, log = _make_pair(tmp_path, frames=4)
    result = CliRunner().invoke(
        smoke.main, ["--video", video, "--log", log,
                     "--checkpoint", str(tmp_path / "none")],
    )
    assert result.exit_code != 0
    assert "checkpoint not found" in result.output


def test_garbage_log_message(tmp_path):
    video, _ = _make_pair(tmp_path, frames=4)
    bad = str(tmp_path / "garbage.txt")
    with open(bad, "w") as f:
        f.write("this is not json\nnot even close\n")
    result = CliRunner().invoke(
        smoke.main, ["--video", video, "--log", bad],
    )
    assert result.exit_code != 0
    assert "could not parse log" in result.output or "0 frames" in result.output


@pytest.mark.slow
def test_end_to_end_pass(tmp_path):
    video, log = _make_pair(tmp_path, frames=60)
    out = str(tmp_path / "smoke_out")
    result = CliRunner().invoke(
        smoke.main,
        ["--video", video, "--log", log, "--frames", "60",
         "--offset", "0", "--out", out],
    )
    assert result.exit_code == 0, result.output
    assert "real-asset smoke report" in result.output
    assert os.path.exists(os.path.join(out, "annotated.mp4"))
    assert os.path.exists(os.path.join(out, "stats_snapshot.yaml"))
