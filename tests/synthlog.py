"""Synthetic ult_logger log generation for tests and benchmarks.

Builds deterministic two-fighter match scripts in the exact on-disk format
the timeline parser consumes (one JSON line per fighter per frame), without
needing any real game assets.
"""

from __future__ import annotations

import json

from playaid_core_tpu.ontology import (
    FIGHTER_NAME_TO_ENUM,
    HEX_TO_ACTION,
    get_animation_type_for_param_string,
)

# Reverse index: canonical move -> a motion_kind int whose hex maps to it.
_ACTION_TO_MOTION = {}


def motion_kind_for(action: str) -> int:
    """Find a motion_kind value whose params_labels entry resolves to
    ``action`` through the ontology's prefix-fallback lookup."""
    if not _ACTION_TO_MOTION:
        for hex_str, param in HEX_TO_ACTION.items():
            if not param:
                continue
            move = get_animation_type_for_param_string(param)
            if move not in _ACTION_TO_MOTION:
                _ACTION_TO_MOTION[move] = int(hex_str, 16)
    return _ACTION_TO_MOTION[action]


DEFAULT_CAMERA = {
    "camera_position": {"x": 0.0, "y": 14.0, "z": 167.24},
    "camera_target_position": {"x": 0.0, "y": 11.85, "z": 0.0},
}


def make_record(
    frame_idx: int,
    fighter_id: int,
    fighter_name: str = "Byleth",
    action: str = "Wait",
    damage: float = 0.0,
    pos_x: float = 0.0,
    pos_y: float = 0.0,
    status_kind: int = 0,
    attack_connected: bool = False,
    num_frames_left: int | None = None,
    stage_id: int = 86,
    stock_count: int = 3,
    hitstun_left: float = 0.0,
):
    return {
        "animation_frame_num": 0,
        "attack_connected": attack_connected,
        "camera_fov": 30.0,
        "camera_position": dict(DEFAULT_CAMERA["camera_position"]),
        "camera_target_position": dict(DEFAULT_CAMERA["camera_target_position"]),
        "can_act": True,
        "damage": damage,
        "facing": 1.0 if fighter_id == 0 else -1.0,
        "fighter_id": fighter_id,
        "fighter_name": FIGHTER_NAME_TO_ENUM[fighter_name],
        "hitstun_left": hitstun_left,
        "motion_kind": motion_kind_for(action),
        "num_frames_left": 25200 - frame_idx if num_frames_left is None else num_frames_left,
        "pos_x": pos_x,
        "pos_y": pos_y,
        "shield_size": 50.0,
        "stage_id": stage_id,
        "status_kind": status_kind,
        "stock_count": stock_count,
    }


def scripted_match(num_frames: int = 120):
    """A small deterministic match: fighter 0 (Byleth) throws a
    ForwardSmash that connects, fighter 1 (Pikachu) gets damaged, techs,
    goes to ledge; includes a dropped-frame gap to exercise gap repair."""
    frames = []
    p1_damage = 0.0
    for i in range(num_frames):
        if 10 <= i < 25:
            a0 = "ForwardSmash"
        elif 40 <= i < 45:
            a0 = "Jab"
        elif 60 <= i < 70:
            a0 = "DashAttack"
        else:
            a0 = "Wait"

        connected = False
        if i == 20 or i == 43 or i == 65:
            p1_damage += 12.5
            connected = True
        if 20 <= i < 25 or 43 <= i < 45 or 65 <= i < 70:
            a1 = "Damaged"
        elif 25 <= i < 32:
            a1 = "TechRoll"
        elif 70 <= i < 80:
            a1 = "LedgeHang"
        elif 80 <= i < 85:
            a1 = "LedgeNormalGetUp"
        else:
            a1 = "Wait"

        rec0 = make_record(
            i, 0, "Byleth", a0, damage=0.0, pos_x=-20.0 + i * 0.1, pos_y=0.0,
            attack_connected=connected,
        )
        rec1 = make_record(
            i, 1, "Pikachu", a1, damage=p1_damage, pos_x=20.0 - i * 0.1, pos_y=0.0,
        )
        frames.append((rec0, rec1))
    return frames


def write_log(path, frames, gap_at=None, gap_size=0):
    """Serialise frames to an ult_logger-format file.  When ``gap_at`` is
    set, ``gap_size`` frames are dropped from the file while
    ``num_frames_left`` keeps counting down, exercising the parser's gap
    repair (reference: timeline.py:249-256)."""
    with open(path, "w") as f:
        for i, (rec0, rec1) in enumerate(frames):
            if gap_at is not None and gap_at <= i < gap_at + gap_size:
                continue
            f.write(json.dumps(rec0) + "\n")
            f.write(json.dumps(rec1) + "\n")
