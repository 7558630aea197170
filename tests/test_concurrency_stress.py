"""Stress the concurrency primitives: ordered delivery under many chunks
and workers, backpressure bounds, profile flag."""

import threading

import cv2
import numpy as np

from playaid_core_tpu.infer.vod_pipeline import BoundedSegmentDecoder
from playaid_core_tpu.parallel.staging import BackgroundIterator


def _make_video(path, n, size=(160, 96)):
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30, size)
    for i in range(n):
        frame = np.full((size[1], size[0], 3), i % 251, np.uint8)
        w.write(frame)
    w.release()


def test_decoder_ordered_many_chunks(tmp_path):
    path = tmp_path / "v.mp4"
    _make_video(path, 97)  # odd count, chunk 8 -> 13 chunks, last partial

    seen = []
    dec = BoundedSegmentDecoder(str(path), 97, 8,
                                transform=lambda i, f: int(f[0, 0, 0]),
                                workers=4, ahead=2)
    for start, items in dec:
        seen.extend(range(start, start + len(items)))
    assert seen == list(range(97))


def test_decoder_frame_content_matches_index(tmp_path):
    path = tmp_path / "v.mp4"
    _make_video(path, 60)
    values = {}
    dec = BoundedSegmentDecoder(str(path), 60, 16,
                                transform=lambda i, f: (i, int(f[0, 0, 0])),
                                workers=3)
    for start, items in dec:
        for i, v in items:
            values[i] = v
    # mp4v is lossy but the gray levels survive within a few units.
    for i, v in values.items():
        assert abs(v - (i % 251)) <= 6, (i, v)


def test_decoder_backpressure_bound(tmp_path):
    """Workers never run more than `ahead` chunks past the consumer."""
    path = tmp_path / "v.mp4"
    _make_video(path, 64)
    max_lead = []
    lock = threading.Lock()
    consumed = [0]

    def transform(i, f):
        with lock:
            max_lead.append(i // 8 - consumed[0])
        return None

    dec = BoundedSegmentDecoder(str(path), 64, 8, transform, workers=4, ahead=2)
    import time

    for start, items in dec:
        time.sleep(0.01)  # slow consumer
        with lock:
            consumed[0] = start // 8 + 1
    # ahead=2 allows decoding chunk consumed+2 at most (+1 slack for the
    # chunk a worker grabbed just before the consumer advanced).
    assert max(max_lead) <= 4, max(max_lead)


def test_decoder_worker_error_propagates(tmp_path):
    """A transform exception surfaces in the consumer instead of hanging."""
    import pytest

    path = tmp_path / "v.mp4"
    _make_video(path, 24)

    def bad_transform(i, f):
        if i >= 10:
            raise IndexError("boxes exhausted")
        return None

    dec = BoundedSegmentDecoder(str(path), 24, 8, bad_transform, workers=2)
    with pytest.raises(IndexError):
        for _ in dec:
            pass


def test_background_iterator_large():
    out = list(BackgroundIterator(iter(range(5000)), maxsize=16))
    assert out == list(range(5000))


def test_manuscript_profile_flag(tmp_path):
    from playaid_core_tpu.pipeline.manuscript import Manuscript
    from tests.synthlog import scripted_match, write_log

    video = tmp_path / "v.mp4"
    _make_video(video, 30, size=(320, 180))
    log = tmp_path / "log.txt"
    write_log(log, scripted_match(30))
    m = Manuscript(
        input_video_path=str(video),
        output_video_path=str(tmp_path / "out.mp4"),
        ground_truth_path=str(log),
        skip_graphs=True,
        skip_summaries=True,
        include_audio=False,
        progress=False,
        profile=True,
    )
    m.render()
    summary = m.timer.summary()
    assert {"decode", "state+stats", "charts", "encode"} <= set(summary)
    assert summary["decode"]["count"] >= 30
