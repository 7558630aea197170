"""ctypes bindings for the native (libavformat) audio remuxer.

Wraps ``native/audio_remux.cpp`` (build-on-demand like the decoder and
encoder).  The reference remuxes the source VOD's audio into the rendered
annotated video by shelling out to the ffmpeg binary
(reference: manuscript.py:249-279); this image ships the libav* libraries
but no ffmpeg binary, so ``video.writer.add_audio`` uses this in-process
path when the subprocess seam can't.

Also exposes ``add_tone`` — stream-copy a video while encoding a mono AAC
sine track of the same duration — which is how tests author an
audio-bearing MP4 fixture (cv2's bundled ffmpeg has no audio muxing).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "audio_remux.cpp")
_CACHE_DIR = os.environ.get(
    "PLAYAID_NATIVE_CACHE", os.path.join(tempfile.gettempdir(), "playaid_native")
)

_lib = None
_build_failed = False


def _build_library():
    os.makedirs(_CACHE_DIR, exist_ok=True)
    so_path = os.path.join(_CACHE_DIR, "libaudioremux.so")
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_SRC):
        return so_path
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-o", so_path, _SRC,
        "-lavformat", "-lavcodec", "-lavutil",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return so_path


def get_library():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        lib = ctypes.CDLL(_build_library())
        lib.ar_count_audio.restype = ctypes.c_int
        lib.ar_count_audio.argtypes = [ctypes.c_char_p]
        lib.ar_remux.restype = ctypes.c_int
        lib.ar_remux.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                 ctypes.c_char_p]
        lib.ar_add_tone.restype = ctypes.c_int
        lib.ar_add_tone.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                    ctypes.c_double, ctypes.c_int]
        _lib = lib
    except Exception:
        _build_failed = True
        _lib = None
    return _lib


def available() -> bool:
    return get_library() is not None


def count_audio_streams(path) -> int:
    """Number of audio streams in the container, or <0 on open failure."""
    lib = get_library()
    if lib is None:
        raise RuntimeError("native audio remuxer unavailable")
    return lib.ar_count_audio(os.fspath(path).encode())


def remux(video_path, audio_src_path, out_path) -> bool:
    """Stream-copy video from ``video_path`` + the best audio stream from
    ``audio_src_path`` into ``out_path`` (ffmpeg ``-shortest`` semantics:
    stops at the first input to end).  Returns False — leaving no output
    file — when the audio source has no audio stream or the mux fails."""
    lib = get_library()
    if lib is None:
        raise RuntimeError("native audio remuxer unavailable")
    # Only clean up a failure artifact WE created: some failure modes
    # (e.g. -2 no-audio) return before the native code ever opens
    # out_path, and a pre-existing caller file there must survive.
    preexisting = os.path.exists(out_path)
    rc = lib.ar_remux(
        os.fspath(video_path).encode(),
        os.fspath(audio_src_path).encode(),
        os.fspath(out_path).encode(),
    )
    if rc != 0 and not preexisting and os.path.exists(out_path):
        os.unlink(out_path)
    return rc == 0


def add_tone(in_path, out_path, freq=440.0, sample_rate=44100) -> bool:
    """Copy the video of ``in_path`` and add a mono AAC sine-tone track of
    the same duration.  Fixture authoring for tests.

    Memory bound: the native pass writes every video packet before the
    first audio packet, so the muxer buffers the whole video stream in
    RAM until the tone pass starts — fine for test fixtures, unsuitable
    for real VOD-length inputs."""
    lib = get_library()
    if lib is None:
        raise RuntimeError("native audio remuxer unavailable")
    preexisting = os.path.exists(out_path)
    rc = lib.ar_add_tone(
        os.fspath(in_path).encode(), os.fspath(out_path).encode(),
        float(freq), int(sample_rate),
    )
    if rc != 0 and not preexisting and os.path.exists(out_path):
        os.unlink(out_path)
    return rc == 0
