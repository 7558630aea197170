"""ctypes bindings for the native crop-extracting VOD decoder.

Wraps ``native/video_decoder.cpp`` (build-on-demand like the log parser,
see :mod:`playaid_core_tpu.native`): one C call decodes a whole chunk of
frames and fills a preallocated ``[n, K, S, S, 3]`` uint8 BGR crop buffer,
converting ONLY the crop regions from YUV (cv2's ``read()`` converts the
full 1080p frame to BGR first — that conversion costs as much as the
decode itself and is pure waste when the model consumes two 128px crops).

Optional ``lowres`` decodes at 1/2^n resolution on codecs that support it
(mpeg4 yes, h264 no — the library clamps to the codec's ``max_lowres``
so requesting it is always safe).

Falls back cleanly: ``available()`` is False when ffmpeg dev libraries or
a compiler are missing, and callers use the cv2 path.
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
_SRC = os.path.join(_REPO_ROOT, "native", "video_decoder.cpp")
_CACHE_DIR = os.environ.get(
    "PLAYAID_NATIVE_CACHE", os.path.join(tempfile.gettempdir(), "playaid_native")
)

_lib = None
_build_failed = False


def _build_library():
    os.makedirs(_CACHE_DIR, exist_ok=True)
    so_path = os.path.join(_CACHE_DIR, "libvideodecoder.so")
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
        lib.vd_open.restype = ctypes.c_void_p
        lib.vd_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.vd_open_ex.restype = ctypes.c_void_p
        lib.vd_open_ex.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.vd_full_width.restype = ctypes.c_int
        lib.vd_full_width.argtypes = [ctypes.c_void_p]
        lib.vd_full_height.restype = ctypes.c_int
        lib.vd_full_height.argtypes = [ctypes.c_void_p]
        lib.vd_lowres.restype = ctypes.c_int
        lib.vd_lowres.argtypes = [ctypes.c_void_p]
        lib.vd_max_lowres.restype = ctypes.c_int
        lib.vd_max_lowres.argtypes = [ctypes.c_void_p]
        lib.vd_fast.restype = ctypes.c_int
        lib.vd_fast.argtypes = [ctypes.c_void_p]
        lib.vd_fps.restype = ctypes.c_double
        lib.vd_fps.argtypes = [ctypes.c_void_p]
        lib.vd_num_frames.restype = ctypes.c_long
        lib.vd_num_frames.argtypes = [ctypes.c_void_p]
        lib.vd_decode_crops_fmt.restype = ctypes.c_long
        lib.vd_decode_crops_fmt.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.vd_decode_crops_dense.restype = ctypes.c_long
        lib.vd_decode_crops_dense.argtypes = lib.vd_decode_crops_fmt.argtypes
        lib.vd_close.restype = None
        lib.vd_close.argtypes = [ctypes.c_void_p]
        lib.vd_set_stride_skip.restype = None
        lib.vd_set_stride_skip.argtypes = [ctypes.c_void_p, ctypes.c_int]
        _lib = lib
    except Exception:
        _build_failed = True
        _lib = None
    return _lib


def available() -> bool:
    return get_library() is not None


class NativeVideoDecoder:
    """Sequential/seekable decoder producing letterboxed BGR crops.

    Geometry matches ``YoloCrop.square_crop`` / ``extract_crops``
    (reference: fighter.py:323-381) so labels agree with the cv2 path.
    """

    def __init__(self, path, lowres=0, fast=False, stride_skip=True):
        # fast: skip the codec's in-loop deblocking filter + enable
        # non-spec-compliant speedups (AV_CODEC_FLAG2_FAST).  The honest
        # reduced-cost mode for h264, which has no fractional lowres;
        # pixel deltas are sub-visible after the 128px crop resample and
        # label agreement is test-validated (test_native_decoder,
        # test_decode_backend_agreement).  fast="auto" applies the flags
        # only when the stream's codec has an in-loop deblock (h264/hevc/
        # vp8/vp9/av1) and leaves other codecs spec-exact; the `fast`
        # property reports the effective mode.
        lib = get_library()
        if lib is None:
            raise RuntimeError("native video decoder unavailable")
        self._lib = lib
        fast_flag = 2 if fast == "auto" else int(bool(fast))
        self._h = lib.vd_open_ex(path.encode(), int(lowres), fast_flag)
        if not self._h:
            raise RuntimeError(f"could not open video: {path}")
        # stride_skip: when decode_crops runs with stride > 1, packets on
        # non-extracted slots are decoded with skip_frame=NONREF — the
        # codec drops a picture only when nothing references it, so the
        # extracted frames stay bit-identical while unreferenced B-frames
        # on skipped slots cost nothing.  Exact by construction; on since
        # it is a pure win (no-op for streams without non-ref frames).
        if stride_skip:
            lib.vd_set_stride_skip(self._h, 1)

    @property
    def width(self):
        return self._lib.vd_full_width(self._h)

    @property
    def height(self):
        return self._lib.vd_full_height(self._h)

    @property
    def lowres(self):
        return self._lib.vd_lowres(self._h)

    @property
    def max_lowres(self):
        """The codec's fractional-decode capability (0 = none, e.g. h264;
        3 = 1/8 decode, e.g. mpeg4) — the clamp auto-lowres respects."""
        return self._lib.vd_max_lowres(self._h)

    @property
    def fast(self):
        """Effective fast mode after "auto" resolution (1 = fast flags
        applied to this stream's codec, 0 = spec-exact decode)."""
        return self._lib.vd_fast(self._h)

    @property
    def fps(self):
        return self._lib.vd_fps(self._h)

    @property
    def num_frames(self):
        return self._lib.vd_num_frames(self._h)

    def decode_crops(self, start, boxes, out_size=128, padding=30, stride=1,
                     out=None, fmt="bgr", dense=False):
        """Decode ``boxes.shape[0]`` frames from ``start`` and extract
        ``boxes.shape[1]`` crops per (strided) frame.

        boxes: [n, K, 4] float32 normalized (cx, cy, w, h).
        fmt "bgr": returns (decoded_count, crops [n, K, S, S, 3] uint8 BGR).
        fmt "yuv420": returns (decoded_count, crops [n, K, S*S*3//2] uint8
        packed planar Y/U/V) — half the bytes for the host->device link;
        convert on device (BT.601 limited range).  Skipped or out-of-frame
        regions are black in both formats.

        ``dense=True`` packs extracted frames contiguously — the output's
        first axis is ``ceil(n/stride)`` and frame i lands in slot
        i//stride, so stride>1 callers ship the buffer without a strided
        host-side gather.  ``decoded_count`` stays in frame units.
        """
        boxes = np.ascontiguousarray(boxes, dtype=np.float32)
        n, k = boxes.shape[0], boxes.shape[1]
        if float(padding) != int(padding):
            # A fractional pad (square_crop's fraction-of-box semantics,
            # e.g. the capstone's 0.125) would silently truncate to 0 in
            # the C call; resolve it first (vod_pipeline.resolve_padding
            # realizes fractions by inflating the boxes).
            raise ValueError(
                f"native decode_crops needs an integer pixel padding, got "
                f"{padding!r}; use vod_pipeline.resolve_padding for "
                f"fractional padding"
            )
        fmt_i = {"bgr": 0, "yuv420": 1}[fmt]
        rows = (n + stride - 1) // stride if dense else n
        shape = (
            (rows, k, out_size, out_size, 3) if fmt_i == 0
            else (rows, k, out_size * out_size * 3 // 2)
        )
        if out is None:
            out = np.zeros(shape, np.uint8)
        else:
            out[:] = 0
        call = (self._lib.vd_decode_crops_dense if dense
                else self._lib.vd_decode_crops_fmt)
        decoded = call(
            self._h, int(start), int(n),
            boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), int(k),
            int(padding), int(out_size), int(stride), fmt_i,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
        if decoded == -2:
            # Seek target past the end of the stream (container metadata
            # overstated the frame count, or the caller's boxes extend
            # past a truncated video): an empty chunk, not an error — the
            # cv2 backend behaves the same way.
            return 0, out
        if decoded < 0:
            raise RuntimeError(f"decode error at frame {start}: {decoded}")
        return int(decoded), out

    def close(self):
        if self._h:
            self._lib.vd_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# Probe cache + decoder handle pool.
#
# Opening an h264 container costs ~45 ms on a 1-core host (avformat stream
# probing decodes real packets), and the VOD pipeline used to pay it TWICE
# per analyze() call: once for the auto-lowres/fast probe and once inside
# the decode worker.  On a host whose decode ceiling is ~2 ms/frame that is
# ~45 frames of budget per open.  The pool keeps closed-over handles warm,
# keyed by (path identity, lowres, fast), so a probe's handle is reused as
# the worker's decoder and repeat analyses of the same VOD (bench runs,
# re-analysis with a different model/stride, multi-pass tooling) pay zero
# opens.  decode_crops() seeks on its own, so a pooled handle's stream
# position never leaks between uses.
# ---------------------------------------------------------------------------

import threading as _threading

_pool_lock = _threading.Lock()
_handle_pool: dict = {}   # key -> [NativeVideoDecoder, ...]
_probe_cache: dict = {}   # file identity -> probe dict
_POOL_MAX_PER_KEY = 4     # analyze_many can hold a few concurrently


def _file_identity(path):
    st = os.stat(path)
    return (os.path.realpath(path), st.st_mtime_ns, st.st_size)


def _fast_flag(fast):
    return 2 if fast == "auto" else int(bool(fast))


def probe(path, fast="auto"):
    """Cheap cached stream probe: dims, fps, frame count, the codec's
    lowres capability and the effective fast mode for ``fast``.

    The probe's open handle is parked in the handle pool (lowres=0), so a
    following :func:`acquire` for a full-res decode reuses it instead of
    re-opening the container.
    """
    ident = _file_identity(path)
    key = (ident, _fast_flag(fast))
    with _pool_lock:
        info = _probe_cache.get(key)
    if info is not None:
        return info
    dec = acquire(path, lowres=0, fast=fast)
    info = {
        "width": dec.width,
        "height": dec.height,
        "fps": dec.fps,
        "num_frames": dec.num_frames,
        "max_lowres": dec.max_lowres,
        "fast": dec.fast,
    }
    release(dec)
    with _pool_lock:
        _probe_cache[key] = info
    return info


def acquire(path, lowres=0, fast=False):
    """Get a decoder for ``path`` — pooled if one is warm, opened if not."""
    key = (_file_identity(path), int(lowres), _fast_flag(fast))
    with _pool_lock:
        handles = _handle_pool.get(key)
        if handles:
            return handles.pop()
    dec = NativeVideoDecoder(path, lowres=lowres, fast=fast)
    dec._pool_key = key
    return dec


def release(dec):
    """Return a decoder obtained from :func:`acquire` to the pool (or
    close it if the pool for its key is full)."""
    key = getattr(dec, "_pool_key", None)
    if key is None or dec._h is None:
        dec.close()
        return
    with _pool_lock:
        handles = _handle_pool.setdefault(key, [])
        if len(handles) < _POOL_MAX_PER_KEY:
            handles.append(dec)
            return
    dec.close()


def clear_pool():
    """Close every pooled handle and drop probe caches (tests, teardown)."""
    with _pool_lock:
        handles = [d for hs in _handle_pool.values() for d in hs]
        _handle_pool.clear()
        _probe_cache.clear()
    for d in handles:
        d.close()
