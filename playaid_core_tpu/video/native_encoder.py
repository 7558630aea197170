"""ctypes bindings for the native (libavcodec) video encoder.

Wraps ``native/video_encoder.cpp`` (build-on-demand like the decoder).
Two jobs:

* **h264 output** — the image's OpenCV bundles an ffmpeg with NO h264
  encoder, so nothing in the repo could produce the codec real VODs use;
  the system libavcodec has libx264.  Benchmarks use this to measure the
  h264 decode path on realistic input instead of mpeg4-only.
* **fast annotated-video encode** — the GT (manuscript) path is
  encode-bound with cv2's single-threaded mp4v writer (~15 ms/frame at
  2080x1120; reference: annotator.py:72 ``VideoWriter mp4v``).  libx264
  ``veryfast`` with frame-threading is both faster and smaller.

``available()`` is False when the toolchain or x264 is missing; callers
fall back to cv2.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "video_encoder.cpp")
_CACHE_DIR = os.environ.get(
    "PLAYAID_NATIVE_CACHE", os.path.join(tempfile.gettempdir(), "playaid_native")
)

_lib = None
_build_failed = False


def _build_library():
    os.makedirs(_CACHE_DIR, exist_ok=True)
    so_path = os.path.join(_CACHE_DIR, "libvideoencoder.so")
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_SRC):
        return so_path
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-o", so_path, _SRC,
        "-lavformat", "-lavcodec", "-lavutil", "-lswscale",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return so_path


def get_library():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        lib = ctypes.CDLL(_build_library())
        lib.ve_open.restype = ctypes.c_void_p
        lib.ve_open.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ]
        lib.ve_write.restype = ctypes.c_int
        lib.ve_write.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_ubyte)]
        lib.ve_write_fmt.restype = ctypes.c_int
        lib.ve_write_fmt.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_ubyte),
                                     ctypes.c_int]
        lib.ve_close.restype = ctypes.c_int
        lib.ve_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _build_failed = True
        _lib = None
    return _lib


_probe_cache: dict = {}


def available(codec="libx264"):
    lib = get_library()
    if lib is None:
        return False
    if codec in _probe_cache:
        return _probe_cache[codec]
    # Probe once per codec: open+close a tiny encoder (catches a
    # libavcodec built without the requested encoder).  The result is
    # cached — callers check available() before every writer open.
    path = os.path.join(tempfile.gettempdir(), f"_probe_{os.getpid()}.mp4")
    h = lib.ve_open(path.encode(), 64, 64, 30.0, codec.encode(), b"veryfast",
                    28, 1)
    ok = bool(h)
    if h:
        lib.ve_close(ctypes.c_void_p(h))
    try:
        # ve_open can create the file before failing (header write) —
        # clean up on both outcomes.
        os.unlink(path)
    except OSError:
        pass
    _probe_cache[codec] = ok
    return ok


class NativeVideoWriter:
    """cv2.VideoWriter-shaped wrapper over the libavcodec encoder.

    ``threads=0`` lets x264 pick frame-threads = cores; on multi-core
    hosts encode then overlaps with the caller's rendering loop.
    """

    def __init__(self, path, fps, size, codec="libx264", preset="veryfast",
                 crf=23, threads=0):
        # For codecs without a crf option (mpeg4 — the reference's own
        # output codec), the C layer maps ``crf`` onto a constant
        # quantizer (1 best .. 31 worst); ``preset=None`` skips the
        # x264-only preset option.
        self._lib = get_library()
        if self._lib is None:
            raise RuntimeError("native video encoder unavailable")
        w, h = int(size[0]), int(size[1])
        if (w % 2) or (h % 2):
            raise ValueError("width/height must be even for yuv420p")
        self._h = self._lib.ve_open(
            str(path).encode(), w, h, float(fps), codec.encode(),
            preset.encode() if preset else b"",
            int(crf) if crf is not None else -1, int(threads),
        )
        if not self._h:
            raise RuntimeError(f"could not open encoder {codec} for {path}")
        self._size = (w, h)

    def isOpened(self):
        return bool(self._h)

    def write(self, frame):
        """Encode one frame: [h, w, 3] BGR or [h, w, 4] RGBA uint8 (RGBA
        goes through a single sws color-convert+subsample pass, no
        cvtColor needed on the render thread)."""
        frame = np.ascontiguousarray(frame, dtype=np.uint8)
        h, w = frame.shape[:2]
        if (w, h) != self._size:
            raise ValueError(f"frame size {(w, h)} != {self._size}")
        fmt = 1 if frame.ndim == 3 and frame.shape[2] == 4 else 0
        rc = self._lib.ve_write_fmt(
            self._h, frame.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), fmt
        )
        if rc != 0:
            raise RuntimeError(f"encode error: {rc}")

    def release(self):
        if self._h:
            self._lib.ve_close(ctypes.c_void_p(self._h))
            self._h = None

    def __del__(self):
        try:
            self.release()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.release()
        return False


def transcode(src, dst, codec="libx264", preset="veryfast", crf=23,
              threads=0, max_frames=None):
    """Re-encode a video file with the native encoder (used to produce
    h264 bench fixtures from cv2-written mp4v sources)."""
    import cv2

    cap = cv2.VideoCapture(src)
    if not cap.isOpened():
        raise RuntimeError(f"cannot open {src}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 60.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    writer = NativeVideoWriter(dst, fps, (w, h), codec=codec, preset=preset,
                               crf=crf, threads=threads)
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok or (max_frames is not None and n >= max_frames):
            break
        writer.write(frame)
        n += 1
    cap.release()
    writer.release()
    return n
