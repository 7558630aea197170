"""Native C++ log parser: build, parity with the Python parser, speed."""

import json
import time

import pytest

from playaid_core_tpu.native import native_available, parse_log_records
from playaid_core_tpu.timeline import load_ground_truth_from_path
from tests.synthlog import scripted_match, write_log

needs_native = pytest.mark.skipif(not native_available(), reason="no C++ toolchain")


@needs_native
def test_native_records_match_json(tmp_path):
    path = tmp_path / "log.txt"
    write_log(path, scripted_match(50))
    native = parse_log_records(str(path))
    with open(path) as f:
        expected = [json.loads(l) for l in f if l.strip()]
    assert len(native) == len(expected)
    for n, e in zip(native, expected):
        for key in ("damage", "facing", "fighter_id", "motion_kind", "num_frames_left",
                    "pos_x", "pos_y", "shield_size", "status_kind", "stock_count",
                    "hitstun_left", "attack_connected", "can_act", "stage_id",
                    "fighter_name"):
            assert n[key] == e[key], (key, n[key], e[key])
        for axis in ("x", "y", "z"):
            assert abs(n["camera_position"][axis] - e["camera_position"][axis]) < 1e-9
            assert (
                abs(n["camera_target_position"][axis] - e["camera_target_position"][axis])
                < 1e-9
            )


@needs_native
def test_timeline_parsers_agree(tmp_path):
    path = tmp_path / "log.txt"
    write_log(path, scripted_match(80), gap_at=40, gap_size=3)
    gt_native = load_ground_truth_from_path(str(path), parser="native")
    gt_python = load_ground_truth_from_path(str(path), parser="python")
    assert len(gt_native) == len(gt_python)
    for fn, fp in zip(gt_native, gt_python):
        for rn, rp in zip(fn, fp):
            assert rn["motion_kind"] == rp["motion_kind"]
            assert rn["num_frames_left"] == rp["num_frames_left"]
            assert rn["fighter_id"] == rp["fighter_id"]


@needs_native
def test_native_not_slower(tmp_path):
    """Sanity perf check (best-of-3, lenient bound — wall-clock under
    parallel suite load is noisy; the strict speedup is a bench concern,
    not a correctness gate)."""
    path = tmp_path / "big_log.txt"
    write_log(path, scripted_match(120) * 40)  # 9600 frames -> 19200 lines

    t_native = min(
        _timed(lambda: parse_log_records(str(path))) for _ in range(3)
    )

    def python_parse():
        with open(path) as f:
            return [json.loads(l) for l in f if l.strip()]

    t_python = min(_timed(python_parse) for _ in range(3))

    assert len(parse_log_records(str(path))) == len(python_parse())
    assert t_native < t_python * 1.2, (t_native, t_python)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def test_python_fallback(tmp_path, monkeypatch):
    import playaid_core_tpu.native as native_mod

    monkeypatch.setattr(native_mod, "_build_failed", True)
    monkeypatch.setattr(native_mod, "_lib", None)
    path = tmp_path / "log.txt"
    write_log(path, scripted_match(10))
    gt = load_ground_truth_from_path(str(path), parser="auto")
    assert len(gt) == 10
