"""Behavioral parity vs the reference implementation.

Runs the reference's timeline->Fighter->Stats pipeline (imported from the
read-only checkout with minimal dependency shims) and this framework's
pipeline on the same synthetic log, then compares per-frame fighter signals
and the final stats dict.  Skipped when the reference checkout is absent.
"""

import os
import sys

import pytest

REFERENCE = os.environ.get("PLAYAID_REFERENCE", "/root/reference")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "playaid")),
    reason="reference checkout not available",
)


@pytest.fixture(scope="module")
def ref_modules(tmp_path_factory):
    sys.path.insert(0, os.path.join(REPO, "tools", "ref_shims"))
    sys.path.insert(0, REFERENCE)
    import playaid.constants as ref_constants

    # Keep the read-only reference tree untouched.
    ref_constants.AI_CACHE = str(tmp_path_factory.mktemp("ref_ai_cache"))

    import playaid.fighter as ref_fighter
    import playaid.stats as ref_stats
    import playaid.timeline as ref_timeline

    yield ref_fighter, ref_timeline, ref_stats
    sys.path.remove(os.path.join(REPO, "tools", "ref_shims"))
    sys.path.remove(REFERENCE)


def _normalize(obj):
    """Convert the reference's accidental (frame, -1) end_frame tuples to
    ints and recurse through containers."""
    if isinstance(obj, dict):
        out = {}
        for k, v in obj.items():
            if k == "end_frame" and isinstance(v, tuple):
                v = v[0]
            out[k] = _normalize(v)
        return out
    if isinstance(obj, (list, tuple)):
        return [_normalize(v) for v in obj]
    return obj


def test_full_pipeline_parity(ref_modules, tmp_path):
    ref_fighter, ref_timeline, ref_stats_mod = ref_modules

    from playaid_core_tpu.stats import Stats
    from playaid_core_tpu.timeline import (
        load_ground_truth_from_path,
        precompute_timeline_projection,
        update_fighters_from_timeline,
    )
    from tests.synthlog import scripted_match, write_log

    log_path = tmp_path / "log.txt"
    write_log(log_path, scripted_match(120), gap_at=95, gap_size=4)

    # --- reference run ---
    ref_gt = ref_timeline.load_ground_truth_from_path(str(log_path))
    ref_stats = ref_stats_mod.Stats(str(tmp_path / "video.mp4"))
    ref_fighters = []
    ref_trace = []
    for i in range(len(ref_gt)):
        ref_fighters = ref_timeline.update_fighters_from_timeline(i, ref_gt[i], ref_fighters)
        ref_stats.record_frame(ref_fighters)
        ref_trace.append(
            [
                (
                    f.action,
                    round(f.damage, 4),
                    round(f.damage_delta, 4),
                    f.animation_frame_num,
                    f.new_action,
                    f.anim_state,
                    f.crop.xyxy_pixels(1280, 720),
                    f.previous_non_damaged_action,
                )
                for f in ref_fighters[:2]
            ]
        )

    # --- this framework's run (batched projection on) ---
    gt = load_ground_truth_from_path(str(log_path))
    precompute_timeline_projection(gt)
    stats = Stats()
    fighters = []
    trace = []
    for i in range(len(gt)):
        fighters = update_fighters_from_timeline(i, gt[i], fighters)
        stats.record_frame(fighters)
        trace.append(
            [
                (
                    f.action,
                    round(f.damage, 4),
                    round(f.damage_delta, 4),
                    f.animation_frame_num,
                    f.new_action,
                    f.anim_state,
                    f.crop.xyxy_pixels(1280, 720),
                    f.previous_non_damaged_action,
                )
                for f in fighters[:2]
            ]
        )

    assert len(ref_trace) == len(trace)
    for i, (r, m) in enumerate(zip(ref_trace, trace)):
        assert r == m, f"fighter trace diverged at frame {i}: {r} vs {m}"

    ref_dict = _normalize(ref_stats.stats.to_dict())
    my_dict = _normalize(stats.stats.to_dict())
    assert ref_dict == my_dict


def test_single_record_parity(ref_modules):
    ref_fighter, _, _ = ref_modules
    from playaid_core_tpu.fighter import Fighter
    from tests.synthlog import make_record

    rec = make_record(0, 0, "Byleth", "ForwardSmash", pos_x=12.0, pos_y=3.0)
    rf = ref_fighter.Fighter(frame_num=0, data=dict(rec))
    mf = Fighter(frame_num=0, data=dict(rec))

    assert rf.action == mf.action
    assert rf.action_string == mf.action_string
    assert rf.motion_hex == mf.motion_hex
    assert rf.fighter_name == mf.fighter_name
    assert rf.crop.xyxy_pixels(1280, 720) == mf.crop.xyxy_pixels(1280, 720)
    assert list(rf.point_in_pixel) == list(mf.point_in_pixel)
