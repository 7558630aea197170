"""Skeletal sprite generator: the scaled capstone's asset source.

Covers: every (fighter, move) renders non-trivially; classes are
geometrically distinct (pose signatures differ between moves); variant
seeds change appearance deterministically; the generated sprite-set
layout round-trips through the synth dataset's animation dict
(reference layout: dataset_utils.py:429-506).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from playaid_core_tpu.datagen import skeletal_sprites as sk


def test_all_moves_all_fighters_render():
    for fighter in sk.FIGHTER_STYLES:
        for move in sk.MOVES:
            img = sk.render_sprite(fighter, move, 0.4)
            assert img.shape == (176, 176, 4)
            cov = (img[:, :, 3] > 0).mean()
            assert cov > 0.02, f"{fighter}/{move} nearly empty ({cov:.3f})"


def test_moves_are_in_trained_subset():
    from playaid_core_tpu.ontology import TRAINED_ACTIONS_2_17

    assert len(sk.MOVES) >= 20
    assert set(sk.MOVES) <= set(TRAINED_ACTIONS_2_17)


def test_tight_crop_meets_composite_minimum():
    """The composite generator skips sprites under 100px
    (gen_synth_char_detection.py:206-207 in the reference)."""
    for fighter in sk.FIGHTER_STYLES:
        for move in sk.MOVES:
            img = sk.tight_crop(sk.render_sprite(fighter, move, 0.7))
            assert min(img.shape[:2]) >= 100, (fighter, move, img.shape)


def test_pose_signatures_distinct():
    """Rendered silhouettes must differ across moves for the same
    fighter at matched phase — no two classes may collapse."""
    sils = {}
    for move in sk.MOVES:
        img = sk.render_sprite("Byleth", move, 0.55)
        sil = cv2.resize((img[:, :, 3] > 0).astype(np.float32), (44, 44))
        sils[move] = sil
    moves = list(sils)
    for i, a in enumerate(moves):
        for b in moves[i + 1 :]:
            iou = (np.minimum(sils[a], sils[b]).sum()
                   / max(np.maximum(sils[a], sils[b]).sum(), 1e-6))
            assert iou < 0.93, f"{a} vs {b} silhouettes nearly identical ({iou:.3f})"


def test_animation_moves_over_phase():
    """Motion: consecutive phases of one move must differ (temporal
    models rely on it)."""
    for move in ["Walk", "Run", "Jab", "ForwardSmash", "Roll"]:
        a = sk.render_sprite("Pikachu", move, 0.2)[:, :, 3] > 0
        b = sk.render_sprite("Pikachu", move, 0.45)[:, :, 3] > 0
        assert (a ^ b).mean() > 0.004, move


def test_variant_seeds_deterministic_and_distinct():
    base = sk.render_sprite("Joker", "Wait", 0.3, variant_seed=0)
    v1a = sk.render_sprite("Joker", "Wait", 0.3, variant_seed=5)
    v1b = sk.render_sprite("Joker", "Wait", 0.3, variant_seed=5)
    np.testing.assert_array_equal(v1a, v1b)
    assert np.abs(base.astype(int) - v1a.astype(int)).mean() > 0.5


def test_variant_deterministic_across_processes():
    """Variant styles must not depend on the per-process string-hash salt:
    eval GT rendered in one process must match detections cached by
    another (builtin hash() broke this, PYTHONHASHSEED-salted)."""
    import subprocess
    import sys

    snippet = (
        "from playaid_core_tpu.datagen import skeletal_sprites as sk;"
        "v = sk.style_variant(sk.FIGHTER_STYLES['Joker'], 17);"
        "print(v.body_color, round(v.head_r, 6), round(v.thickness, 6))"
    )
    import os

    outs = set()
    for hashseed in ("1", "2"):
        env = dict(os.environ)
        env.update(PYTHONHASHSEED=hashseed, JAX_PLATFORMS="cpu")
        r = subprocess.run([sys.executable, "-c", snippet], env=env,
                           capture_output=True, text=True, check=True)
        outs.add(r.stdout.strip())
    assert len(outs) == 1, f"variant differs across hash salts: {outs}"


def test_facing_mirrors():
    r = sk.render_sprite("Byleth", "ForwardTilt", 0.5, facing=1)
    l = sk.render_sprite("Byleth", "ForwardTilt", 0.5, facing=-1)
    # mirrored sprite extends to the opposite side of center
    rx = np.nonzero(r[:, :, 3].any(0))[0]
    lx = np.nonzero(l[:, :, 3].any(0))[0]
    assert (rx.max() - 88) > 20 and (88 - lx.min()) > 20


def test_sprite_set_roundtrips_through_dataset_dict(tmp_path):
    from playaid_core_tpu.train.dataset import (
        get_character_actions_animations_dict,
    )

    root = str(tmp_path / "clean")
    n = sk.generate_sprite_set(
        root, fighters=["Pikachu", "Byleth"], moves=["Wait", "Jab"],
        frames_per_move=4, variant_seeds=(0, 3),
    )
    assert n == 2 * 2 * 2 * 2 * 4  # fighters x moves x variants x facings x frames
    d = get_character_actions_animations_dict(root)
    assert set(d) == {"Pikachu", "Byleth"}
    assert set(d["Pikachu"]) == {"Wait", "Jab"}
    # body key = variant, cam key = facing; frames sorted by index
    node = d["Pikachu"]["Wait"]
    assert set(node) == {"c00", "c03"}
    for variant in node.values():
        for anim in variant.values():
            assert set(anim) == {"90", "270"}
            for frames in anim.values():
                assert len(frames) == 4
                idx = [int(f.rsplit("_", 1)[1].split(".")[0]) for f in frames]
                assert idx == sorted(idx)
