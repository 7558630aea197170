import os

import cv2
import numpy as np
import pytest

from playaid_core_tpu.pipeline.manuscript import Manuscript
from playaid_core_tpu.render.annotator import Annotator
from playaid_core_tpu.video.reader import PrefetchingReader, VideoReader
from tests.synthlog import scripted_match, write_log

W, H, N = 320, 180, 60


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    video_path = str(d / "match.mp4")
    log_path = str(d / "match_log.txt")

    writer = cv2.VideoWriter(video_path, cv2.VideoWriter_fourcc(*"mp4v"), 60, (W, H))
    rng = np.random.default_rng(0)
    for i in range(N):
        frame = np.full((H, W, 3), (i * 2) % 255, np.uint8)
        frame[:20, :20] = rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)
        writer.write(frame)
    writer.release()

    write_log(log_path, scripted_match(N))
    return d, video_path, log_path


def test_video_reader_sequential(fixture_dir):
    _, video_path, _ = fixture_dir
    r = VideoReader(video_path)
    assert r.frame_count == N
    ok, f0 = r.read_at(0)
    assert ok and f0.shape == (H, W, 3)
    ok, f10 = r.read_at(10)
    assert ok
    # Backward seek works too.
    ok, f5 = r.read_at(5)
    assert ok
    r.release()


def test_prefetching_reader(fixture_dir):
    _, video_path, _ = fixture_dir
    r = PrefetchingReader(video_path, start=0, stop=20)
    frames = list(r)
    assert len(frames) == 20
    assert frames[0][0] == 0 and frames[-1][0] == 19
    r.release()


def test_manuscript_no_graphs(fixture_dir, tmp_path):
    d, video_path, log_path = fixture_dir
    out = str(tmp_path / "out.mp4")
    m = Manuscript(
        input_video_path=video_path,
        output_video_path=out,
        ground_truth_path=log_path,
        skip_graphs=True,
        skip_summaries=True,
        include_audio=False,
        progress=False,
    )
    m.render()
    assert os.path.exists(out)
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == N
    # No padding when graphs are off.
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == W
    assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == H
    cap.release()


def test_manuscript_with_graphs_and_frames_window(fixture_dir, tmp_path):
    d, video_path, log_path = fixture_dir
    out = str(tmp_path / "out_graphs.mp4")
    m = Manuscript(
        input_video_path=video_path,
        output_video_path=out,
        ground_truth_path=log_path,
        start_frame=10,
        max_frames=30,
        skip_graphs=False,
        skip_summaries=True,
        include_audio=False,
        progress=False,
    )
    m.render()
    cap = cv2.VideoCapture(out)
    # Padded canvas: +400 left/right/bottom.
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == W + 800
    assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == H + 400
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 20
    ok, frame = cap.read()
    assert ok
    # Side panels render non-black content into the padding.
    left_panel = frame[:, :400]
    assert left_panel.mean() > 5
    cap.release()
    # Stats were warmed up over frames 0..9.
    assert m.stats.stats[0].action_count
    # Scripted match starts with Wait; warm-up counted it.
    assert m.stats.stats[0].action_count["Wait"] >= 1


def test_post_game_summaries(fixture_dir, tmp_path, monkeypatch):
    d, video_path, log_path = fixture_dir
    out = str(tmp_path / "out_summary.mp4")
    m = Manuscript(
        input_video_path=video_path,
        output_video_path=out,
        ground_truth_path=log_path,
        max_frames=5,
        skip_graphs=False,
        skip_summaries=False,
        include_audio=False,
        progress=False,
    )
    # Hold each summary for 2 frames instead of 180 to keep the test fast.
    writes = []
    orig = Annotator.write_num_seconds

    def fast_write(self, num_seconds):
        writes.append(num_seconds)
        for _ in range(2):
            self.write()

    monkeypatch.setattr(Annotator, "write_num_seconds", fast_write)
    m.render()
    # 5 summary charts held 3s each (reference: annotator.py:325-343).
    assert writes == [3, 3, 3, 3, 3]
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 5 + 10
    cap.release()


def test_cli_runs(fixture_dir, tmp_path):
    from click.testing import CliRunner

    from playaid_core_tpu.pipeline.manuscript import run_manuscript

    d, video_path, log_path = fixture_dir
    out = str(tmp_path / "cli_out.mp4")
    # log_offset defaults to 5 in direct mode (reference: manuscript.py:377).
    result = CliRunner().invoke(
        run_manuscript,
        [
            "--video-path", video_path,
            "--log-path", log_path,
            "--output-path", out,
            "--frames", "0,20",
            "--skip-graphs",
            "--skip-summaries",
        ],
    )
    assert result.exit_code == 0, result.output
    assert os.path.exists(out)
    assert "COMPLETED" in result.output
