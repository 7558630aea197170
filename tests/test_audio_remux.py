"""Native audio remux (native/audio_remux.cpp via video.native_remux).

The reference remuxes the source VOD's audio into the annotated render by
shelling out to ffmpeg (reference: manuscript.py:249-279).  This image has
no ffmpeg binary, so previously the success path could only be tested with
a stubbed subprocess; these tests exercise the REAL in-process libavformat
path end to end: author an audio-bearing fixture (ar_add_tone), remux its
track into a separately rendered silent video, and verify the result still
decodes with the audio present.
"""

import os

import numpy as np
import pytest

from playaid_core_tpu.video import native_remux

pytestmark = pytest.mark.skipif(
    not native_remux.available(), reason="native audio remuxer unavailable"
)


def _write_video(path, num_frames=30, size=64, seed=0):
    import cv2

    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30.0,
                        (size, size))
    rng = np.random.default_rng(seed)
    for _ in range(num_frames):
        w.write(rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
    w.release()
    return str(path)


def _frame_count(path):
    import cv2

    cap = cv2.VideoCapture(str(path))
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    return n


@pytest.fixture
def av_fixture(tmp_path):
    """An MP4 with both a video stream and an AAC tone track."""
    silent = _write_video(tmp_path / "src_silent.mp4")
    with_audio = str(tmp_path / "src_av.mp4")
    assert native_remux.add_tone(silent, with_audio)
    return with_audio


def test_add_tone_authors_audio_stream(av_fixture):
    assert native_remux.count_audio_streams(av_fixture) == 1
    # The video stream survived the copy.
    assert _frame_count(av_fixture) == 30


def test_remux_success_path(tmp_path, av_fixture):
    rendered = _write_video(tmp_path / "annotated.mp4", seed=1)
    assert native_remux.count_audio_streams(rendered) == 0
    out = str(tmp_path / "out.mp4")
    assert native_remux.remux(rendered, av_fixture, out)
    assert native_remux.count_audio_streams(out) == 1
    # Video is stream-copied, not re-encoded: same frame count.
    assert _frame_count(out) == 30


def test_remux_no_audio_source_degrades(tmp_path):
    rendered = _write_video(tmp_path / "annotated.mp4", seed=1)
    silent_src = _write_video(tmp_path / "src.mp4", seed=2)
    out = str(tmp_path / "out.mp4")
    assert not native_remux.remux(rendered, silent_src, out)
    assert not os.path.exists(out)


def test_add_audio_uses_native_path_without_ffmpeg(tmp_path, av_fixture,
                                                   monkeypatch):
    from playaid_core_tpu.video import writer

    monkeypatch.setattr(writer, "ffmpeg_available", lambda: False)
    rendered = _write_video(tmp_path / "annotated.mp4", seed=3)
    assert writer.add_audio(rendered, av_fixture)
    assert native_remux.count_audio_streams(rendered) == 1
    assert _frame_count(rendered) == 30


def test_add_audio_degrades_without_audio_stream(tmp_path, monkeypatch):
    from playaid_core_tpu.video import writer

    monkeypatch.setattr(writer, "ffmpeg_available", lambda: False)
    rendered = _write_video(tmp_path / "annotated.mp4", seed=4)
    silent_src = _write_video(tmp_path / "src.mp4", seed=5)
    assert not writer.add_audio(rendered, silent_src)
    # Silent render left in place, still decodable.
    assert _frame_count(rendered) == 30
