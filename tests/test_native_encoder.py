"""Native (libavcodec/libx264) encoder + threaded writer seam.

The image's cv2 bundles an ffmpeg with no h264 encoder; the system
libavcodec has libx264.  These tests cover the encode->decode roundtrip,
the transcode fixture path the h264 bench uses, and the background
encode thread in the VideoWriter seam (including its error surfacing).
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from playaid_core_tpu.video import native_encoder

pytestmark = pytest.mark.skipif(
    not native_encoder.available(), reason="native video encoder unavailable"
)


def _frames(n, w=320, h=180, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.integers(20, 80, (h, w, 3), dtype=np.uint8)
    out = []
    for i in range(n):
        f = base.copy()
        cv2.circle(f, (40 + i * 8, h // 2), 30, (0, 210, 250), -1)
        out.append(f)
    return out


def test_h264_roundtrip(tmp_path):
    path = str(tmp_path / "o.mp4")
    frames = _frames(24)
    with native_encoder.NativeVideoWriter(path, 60, (320, 180), crf=18) as w:
        for f in frames:
            w.write(f)
    cap = cv2.VideoCapture(path)
    fcc = int(cap.get(cv2.CAP_PROP_FOURCC))
    assert "".join(chr((fcc >> 8 * i) & 0xFF) for i in range(4)) in ("h264", "avc1")
    got = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        got.append(f)
    cap.release()
    assert len(got) == len(frames)
    # content survives (lossy): the moving circle is where we put it
    diff = np.abs(got[10].astype(int) - frames[10].astype(int)).mean()
    assert diff < 12.0, diff


def test_transcode_mp4v_to_h264(tmp_path):
    src = str(tmp_path / "src.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 60, (320, 180))
    for f in _frames(30):
        w.write(f)
    w.release()
    dst = str(tmp_path / "dst.mp4")
    n = native_encoder.transcode(src, dst, crf=20)
    assert n == 30
    cap = cv2.VideoCapture(dst)
    fcc = int(cap.get(cv2.CAP_PROP_FOURCC))
    assert "".join(chr((fcc >> 8 * i) & 0xFF) for i in range(4)) in ("h264", "avc1")
    count = 0
    while cap.read()[0]:
        count += 1
    cap.release()
    assert count == 30


def test_odd_dimensions_rejected(tmp_path):
    with pytest.raises(ValueError):
        native_encoder.NativeVideoWriter(str(tmp_path / "x.mp4"), 60, (321, 180))


def test_videowriter_seam_threaded(tmp_path):
    from playaid_core_tpu.video.writer import VideoWriter, _EncodeThread

    path = str(tmp_path / "seam.mp4")
    w = VideoWriter(path, 60, 320, 180)
    assert isinstance(w.writer, _EncodeThread)
    for f in _frames(20):
        w.write(f)
    w.release()
    cap = cv2.VideoCapture(path)
    count = 0
    while cap.read()[0]:
        count += 1
    cap.release()
    assert count == 20


def test_videowriter_seam_cv2_fallback(tmp_path, monkeypatch):
    monkeypatch.setenv("PLAYAID_ENCODER", "cv2")
    from playaid_core_tpu.video.writer import VideoWriter

    path = str(tmp_path / "fb.mp4")
    w = VideoWriter(path, 60, 320, 180)
    for f in _frames(8):
        w.write(f)
    w.release()
    assert os.path.getsize(path) > 1000


def test_encode_thread_surfaces_errors():
    from playaid_core_tpu.video.writer import _EncodeThread

    class Boom:
        def write(self, frame):
            raise RuntimeError("disk full")

        def release(self):
            pass

    t = _EncodeThread(Boom(), maxsize=2)
    frame = np.zeros((8, 8, 3), np.uint8)
    with pytest.raises(RuntimeError, match="disk full"):
        for _ in range(64):  # must not deadlock on the bounded queue
            t.write(frame)
