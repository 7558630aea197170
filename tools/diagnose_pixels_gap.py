#!/usr/bin/env python
"""Bisect the pixels-only action-agreement gap.

Loads the trained states saved by tools/train_pixels_stack.py and probes
the action model on (a) the actual inference crops the AIRunner
classified, (b) freshly generated training-distribution synth samples,
and (c) controlled perturbations (shift / scale / jpeg) of training-like
crops — isolating which distribution difference flips predictions.

    python tools/diagnose_pixels_gap.py /tmp/pixels_run2
"""

import glob
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def main():
    import cv2
    import jax.numpy as jnp

    from e2e_pixels_demo import FIGHTERS, MOVES
    from playaid_core_tpu.infer.pipeline import BatchedActionPipeline

    ACTIONS = MOVES + ["Unknown"]
    workdir = sys.argv[1]
    with open(os.path.join(workdir, "trained_states.pkl"), "rb") as f:
        states = pickle.load(f)

    pipe = BatchedActionPipeline(family="cnn", num_actions=len(ACTIONS),
                                 sequence_length=3, frame_delta=1, crop_size=64)
    variables = pipe.from_monolithic(states["action"])

    def classify_crops(crops_rgb_f32):
        """[N, 64, 64, 3] float RGB -> window-of-3 (repeat) predictions."""
        emb = pipe.embed_crops(variables, jnp.asarray(crops_rgb_f32))
        labels, conf = pipe.classify_sequence(variables, emb, pad_bucket=256)
        return np.asarray(labels), np.asarray(conf)

    # --- (a) actual inference crops ---
    print("=== actual AIRunner crops ===")
    for fighter in FIGHTERS:
        crop_paths = sorted(
            glob.glob(os.path.join(workdir, "ai_cache", "*", "*", "crops",
                                   fighter, "*.jpg")),
            key=lambda p: int(p.rsplit("_", 1)[1].split(".")[0]),
        )
        crops, gts = [], []
        for p in crop_paths[:120]:
            fr = int(p.rsplit("_", 1)[1].split(".")[0])
            k = list(FIGHTERS).index(fighter)
            gts.append(MOVES[(((fr - 1) // 20) + k) % len(MOVES)])
            bgr = cv2.imread(p)
            crops.append(bgr[:, :, ::-1].astype(np.float32) / 255.0)
        labels, _ = classify_crops(np.stack(crops))
        preds = [ACTIONS[i] for i in labels]
        acc = np.mean([p == g for p, g in zip(preds, gts)])
        from collections import Counter

        conf_mat = {}
        for p, g in zip(preds, gts):
            conf_mat.setdefault(g, Counter())[p] += 1
        print(f"{fighter}: acc {acc:.2%}  {dict((k, dict(v)) for k, v in conf_mat.items())}")

    # --- (b) training-distribution samples ---
    print("=== fresh training-distribution synth samples ===")
    from playaid_core_tpu.train.dataset import UltActionRecogDataset

    ds = UltActionRecogDataset(
        split="synth", num_samples=256, img_dimension=64,
        anim_subset=ACTIONS, num_frames_per_sample=3, frame_delta=[1],
        char_subset=list(FIGHTERS), crop_size=64, seed=123,
        gt_root_train="/tmp/none", gt_root_val="/tmp/none", gt_root_test="/tmp/none",
        stages_dir=os.path.join(workdir, "assets", "stages"),
        clean_char_dir=os.path.join(workdir, "assets", "clean"),
        synth_sprite_fill=(0.72, 1.0),
    )
    per_char = {}
    for i in range(64):
        frames, char_id, labels, meta = ds[i]
        mid = np.asarray(frames[len(frames) // 2])
        if mid.shape[0] == 3:
            mid = np.transpose(mid, (1, 2, 0))
        gt = ACTIONS[int(labels[len(labels) // 2])]
        fighter = list(FIGHTERS)[int(char_id) // max(1, len(list(FIGHTERS)))] \
            if False else int(char_id)
        per_char.setdefault(fighter, []).append((mid, gt))
    for char_id, items in sorted(per_char.items()):
        crops = np.stack([c for c, _ in items])
        labels, _ = classify_crops(crops)
        preds = [ACTIONS[i] for i in labels]
        acc = np.mean([p == g for p, (_, g) in zip(preds, items)])
        print(f"char_id {char_id}: train-dist acc {acc:.2%} "
              f"(n={len(items)})")

    # --- (c) controlled perturbations of eval-video-style sprites ---
    print("=== eval-style sprites, controlled rendering ===")
    from e2e_pixels_demo import draw_sprite

    rng = np.random.default_rng(0)
    stage = cv2.imread(os.path.join(workdir, "assets", "stages",
                                    os.listdir(os.path.join(workdir, "assets", "stages"))[0]))

    def eval_crop(fighter, move, sprite_size=110, shift=(0, 0), jpeg=False,
                  crop_side=126):
        sprite = draw_sprite(fighter, move, 0.3, rng, sprite_size)
        canvas = cv2.resize(stage, (1280, 720)).copy()
        cx, cy = 400, 360
        x0, y0 = cx - sprite_size // 2, cy - sprite_size // 2
        a = sprite[:, :, 3:4].astype(np.float32) / 255.0
        canvas[y0:y0 + sprite_size, x0:x0 + sprite_size] = (
            sprite[:, :, :3] * a
            + canvas[y0:y0 + sprite_size, x0:x0 + sprite_size] * (1 - a)
        ).astype(np.uint8)
        ccx, ccy = cx + shift[0], cy + shift[1]
        half = crop_side // 2
        crop = canvas[ccy - half:ccy + half, ccx - half:ccx + half]
        crop = cv2.resize(crop, (64, 64), interpolation=cv2.INTER_AREA)
        if jpeg:
            ok, enc = cv2.imencode(".jpg", crop)
            crop = cv2.imdecode(enc, cv2.IMREAD_COLOR)
        return crop[:, :, ::-1].astype(np.float32) / 255.0

    for variant, kwargs in [
        ("centered", {}),
        ("jpeg", {"jpeg": True}),
        ("shift+12px", {"shift": (12, 12)}),
        ("small-box(crop_side=102)", {"crop_side": 102}),
        ("large-box(crop_side=150)", {"crop_side": 150}),
    ]:
        crops, gts = [], []
        for fighter in FIGHTERS:
            for move in MOVES:
                crops.append(eval_crop(fighter, move, **kwargs))
                gts.append((fighter, move))
        labels, _ = classify_crops(np.stack(crops))
        preds = [ACTIONS[i] for i in labels]
        marks = [
            f"{f[:3]}/{m}:{p}{'✓' if p == m else '✗'}"
            for (f, m), p in zip(gts, preds)
        ]
        acc = np.mean([p == m for (_, m), p in zip(gts, preds)])
        print(f"{variant}: acc {acc:.2%} | {' '.join(marks)}")


if __name__ == "__main__":
    main()
