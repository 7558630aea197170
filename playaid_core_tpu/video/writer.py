"""Video encode + audio remux seam.

Wraps cv2 VideoWriter (mp4v, as the reference, annotator.py:72-77) and
keeps the reference's ffmpeg audio-remux stage (reference:
manuscript.py:249-279) as a host-side subprocess seam that degrades
gracefully when no ffmpeg binary is present.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import cv2


class _EncodeThread:
    """Background encode stage: ``write`` enqueues a frame copy and
    returns; a dedicated thread feeds the underlying encoder (which
    releases the GIL inside libavcodec).  On the GT manuscript path the
    ~11-14 ms/frame encode then overlaps the render loop instead of
    serializing with it — measured charts-on throughput moves by roughly
    that amount per frame on a 1-core host."""

    def __init__(self, inner, maxsize=4):
        import queue
        import threading

        self.inner = inner
        self._q = queue.Queue(maxsize=maxsize)
        self._error = None
        self._thread = threading.Thread(target=self._drain, daemon=True)
        self._thread.start()

    def _drain(self):
        while True:
            frame = self._q.get()
            if frame is None:
                return
            try:
                # cv2's writer wants BGR; the native encoder takes RGBA
                # directly.  Converting here keeps the render thread free.
                if (frame.ndim == 3 and frame.shape[2] == 4
                        and isinstance(self.inner, cv2.VideoWriter)):
                    frame = cv2.cvtColor(frame, cv2.COLOR_RGBA2BGR)
                self.inner.write(frame)
            except BaseException as e:  # surface on the next write/release
                self._error = e
                # keep consuming so a producer blocked in put() never hangs
                while self._q.get() is not None:
                    pass
                return

    def write(self, frame, copy=True):
        if self._error is not None:
            raise self._error
        # copy=False: caller hands over a frame it will not touch again
        # (e.g. a freshly allocated cvtColor result).
        self._q.put(frame.copy() if copy else frame)

    def release(self):
        self._q.put(None)
        self._thread.join()
        self.inner.release()
        if self._error is not None:
            raise self._error


class VideoWriter:
    """Threaded encode seam for rendered output.

    Prefers the native libx264 encoder (``ultrafast``: same per-frame
    cost as cv2's mp4v at the annotator's 2080x1120 canvas but 3-4x
    smaller files in the codec players expect); falls back to cv2 mp4v
    when the native library can't build.  Either encoder runs on a
    background thread so encoding overlaps rendering.
    ``PLAYAID_ENCODER=cv2`` forces the fallback;
    ``PLAYAID_ENCODER_SYNC=1`` disables the thread (debugging).
    """

    def __init__(self, path, fps, width, height, codec=None):
        self.path = path
        self.width = width
        self.height = height
        parent = os.path.dirname(os.path.abspath(path))
        os.makedirs(parent, exist_ok=True)
        inner = None
        # PLAYAID_ENCODER: "cv2" (mp4v — the REFERENCE'S own output codec,
        # annotator.py:72, and the cheapest per frame on one core: the
        # charts-on render measured ~17% faster e2e than x264-ultrafast —
        # the round-5 default), "native" (libx264 ultrafast: ~10x smaller
        # files in the codec players expect, at ~2 ms/frame more encode
        # CPU), "mpeg4" (mp4v through the native encoder, qscale mode).
        prefer = codec or os.environ.get("PLAYAID_ENCODER", "cv2")
        if prefer != "cv2" and width % 2 == 0 and height % 2 == 0:
            try:
                from playaid_core_tpu.video.native_encoder import (
                    NativeVideoWriter,
                    available,
                )

                if prefer == "mpeg4" and available("mpeg4"):
                    inner = NativeVideoWriter(
                        path, fps, (width, height), codec="mpeg4",
                        preset=None,
                        crf=int(os.environ.get("PLAYAID_MPEG4_Q", "8")),
                        threads=0,
                    )
                elif available():
                    inner = NativeVideoWriter(
                        path, fps, (width, height), codec="libx264",
                        preset=os.environ.get("PLAYAID_X264_PRESET", "ultrafast"),
                        crf=int(os.environ.get("PLAYAID_X264_CRF", "26")),
                        threads=0,
                    )
            except Exception:
                inner = None
        if inner is None:
            inner = cv2.VideoWriter(
                path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (width, height)
            )
        if os.environ.get("PLAYAID_ENCODER_SYNC", "0") == "1":
            self.writer = inner
        else:
            self.writer = _EncodeThread(inner)

    def write(self, frame, copy=True):
        """Write a [h, w, 3] BGR or [h, w, 4] RGBA uint8 frame.  RGBA is
        converted for cv2 fallbacks (off-thread when threaded); the native
        encoder consumes it directly."""
        assert frame.shape[0] == self.height and frame.shape[1] == self.width, (
            f"Incorrect frame size, expected {self.width}x{self.height} "
            f"got {frame.shape[1]}x{frame.shape[0]}"
        )
        if isinstance(self.writer, _EncodeThread):
            self.writer.write(frame, copy=copy)
        else:
            if frame.ndim == 3 and frame.shape[2] == 4 and isinstance(
                    self.writer, cv2.VideoWriter):
                frame = cv2.cvtColor(frame, cv2.COLOR_RGBA2BGR)
            self.writer.write(frame)

    def release(self):
        self.writer.release()


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def add_audio(output_video_path, input_video_path):
    """Remux the source audio track into the rendered video
    (reference: manuscript.py:249-279).  Prefers the ffmpeg binary (the
    reference's exact seam); without one, uses the in-process libavformat
    remuxer (video.native_remux).  Degrades gracefully: no remux backend,
    or a source with no audio stream, leaves the silent video in place
    with a warning instead of failing an already-finished render."""
    if not ffmpeg_available():
        return _add_audio_native(output_video_path, input_video_path)

    import tempfile
    import uuid

    tmp_path = os.path.join(
        tempfile.gettempdir(),
        f"{uuid.uuid4().hex}_{os.path.basename(output_video_path)}",
    )
    command = [
        "ffmpeg",
        "-y",
        "-i", output_video_path,
        "-i", input_video_path,
        "-c:v", "copy",
        "-c:a", "aac",
        "-strict", "experimental",
        "-map", "0:v:0",
        "-map", "1:a:0",
        "-shortest",
        tmp_path,
    ]
    result = subprocess.run(command, capture_output=True)
    if result.returncode != 0:
        print(
            "audio remux failed (source may have no audio stream); "
            f"keeping silent video: {result.stderr.decode(errors='replace')[-200:]}"
        )
        if os.path.exists(tmp_path):
            os.unlink(tmp_path)
        return False
    shutil.move(tmp_path, output_video_path)
    return True


def _add_audio_native(output_video_path, input_video_path):
    """In-process remux via libavformat (native/audio_remux.cpp) for hosts
    without an ffmpeg binary — same -shortest stream-copy semantics."""
    from playaid_core_tpu.video import native_remux

    if not native_remux.available():
        print("no ffmpeg binary and native remuxer unavailable; "
              "skipping audio remux")
        return False

    import tempfile
    import uuid

    tmp_path = os.path.join(
        tempfile.gettempdir(),
        f"{uuid.uuid4().hex}_{os.path.basename(output_video_path)}",
    )
    try:
        ok = native_remux.remux(output_video_path, input_video_path, tmp_path)
    except Exception as e:
        print(f"native audio remux failed ({e}); keeping silent video")
        return False
    if not ok:
        print("audio remux failed (source may have no audio stream); "
              "keeping silent video")
        return False
    shutil.move(tmp_path, output_video_path)
    return True
