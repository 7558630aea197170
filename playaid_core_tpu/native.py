"""Native (C++) runtime components: build-on-demand + ctypes bindings.

The hot host-side ingest path — parsing ult_logger JSON lines — runs
through a small C++ scanner (native/log_parser.cpp) that extracts the
known numeric fields directly, ~20-40x faster than ``json.loads`` per
line.  The extension is compiled on first use with the system toolchain
and cached; every caller falls back to the pure-Python parser
transparently when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "log_parser.cpp")
_CACHE_DIR = os.environ.get(
    "PLAYAID_NATIVE_CACHE", os.path.join(tempfile.gettempdir(), "playaid_native")
)

# Field order must match kScalarKeys + camera blocks in log_parser.cpp.
FIELDS = [
    "damage", "facing", "fighter_id", "motion_kind", "num_frames_left",
    "pos_x", "pos_y", "shield_size", "status_kind", "stock_count",
    "hitstun_left", "attack_connected", "can_act", "animation_frame_num",
    "stage_id", "fighter_name",
    "cam_x", "cam_y", "cam_z", "tgt_x", "tgt_y", "tgt_z",
]
_NUM_FIELDS = len(FIELDS)

_lib = None
_build_failed = False


def _build_library():
    os.makedirs(_CACHE_DIR, exist_ok=True)
    so_path = os.path.join(_CACHE_DIR, "liblogparser.so")
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_SRC):
        return so_path
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", so_path, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)
    return so_path


def get_library():
    """Load (building if needed) the native library, or None."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        so_path = _build_library()
        lib = ctypes.CDLL(so_path)
        lib.parse_log.restype = ctypes.c_long
        lib.parse_log.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_long,
            ctypes.c_long,
        ]
        _lib = lib
    except Exception:
        _build_failed = True
        _lib = None
    return _lib


def native_available() -> bool:
    return get_library() is not None


def parse_log_records(path, max_records=None):
    """Parse an ult_logger file into a list of record dicts matching the
    JSON structure the timeline/Fighter layers consume.

    Returns None when the native library is unavailable (callers fall back
    to json.loads).
    """
    lib = get_library()
    if lib is None:
        return None

    if max_records is None:
        # Exact line count: an estimate from file size silently truncates
        # logs with shorter-than-expected lines (the C parser stops at
        # max_records without any overflow signal).
        count = 0
        with open(path, "rb") as f:
            while True:
                block = f.read(1 << 22)
                if not block:
                    break
                count += block.count(b"\n")
        # +2 covers a final line without a trailing newline.
        max_records = max(count + 2, 64)

    buf = np.empty((max_records, _NUM_FIELDS), dtype=np.float64)
    n = lib.parse_log(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_records,
        _NUM_FIELDS,
    )
    if n < 0:
        return None
    buf = buf[:n]

    records = []
    for row in buf:
        records.append(
            {
                "damage": float(row[0]),
                "facing": float(row[1]),
                "fighter_id": int(row[2]),
                "motion_kind": int(row[3]),
                "num_frames_left": int(row[4]),
                "pos_x": float(row[5]),
                "pos_y": float(row[6]),
                "shield_size": float(row[7]),
                "status_kind": int(row[8]),
                "stock_count": int(row[9]),
                "hitstun_left": float(row[10]),
                "attack_connected": bool(row[11]),
                "can_act": bool(row[12]),
                "animation_frame_num": float(row[13]),
                "stage_id": int(row[14]),
                "fighter_name": int(row[15]),
                "camera_position": {"x": float(row[16]), "y": float(row[17]),
                                    "z": float(row[18])},
                "camera_target_position": {"x": float(row[19]), "y": float(row[20]),
                                           "z": float(row[21])},
            }
        )
    return records
