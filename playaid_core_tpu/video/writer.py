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


class VideoWriter:
    def __init__(self, path, fps, width, height):
        self.path = path
        self.width = width
        self.height = height
        parent = os.path.dirname(os.path.abspath(path))
        os.makedirs(parent, exist_ok=True)
        self.writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (width, height)
        )

    def write(self, bgr_frame):
        assert bgr_frame.shape[0] == self.height and bgr_frame.shape[1] == self.width, (
            f"Incorrect frame size, expected {self.width}x{self.height} "
            f"got {bgr_frame.shape[1]}x{bgr_frame.shape[0]}"
        )
        self.writer.write(bgr_frame)

    def release(self):
        self.writer.release()


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def add_audio(output_video_path, input_video_path):
    """Remux the source audio track into the rendered video
    (reference: manuscript.py:249-279).  Degrades gracefully: no ffmpeg,
    or a source with no audio stream, leaves the silent video in place
    with a warning instead of failing an already-finished render."""
    if not ffmpeg_available():
        print("ffmpeg not found; skipping audio remux")
        return False

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
