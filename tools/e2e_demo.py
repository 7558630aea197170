#!/usr/bin/env python
"""End-to-end demonstration: train an action model on synthetic data,
then recover per-frame labels from a synthetic VOD with the batched TPU
pipeline, and measure agreement against ground truth.

This chains the reference's training config (action model on
ult_action_dataset) into its inference config (batched two-fighter
recognition over a full video) with no real game assets: sprites are
generated with distinct per-move shapes, a match video is composited from
them, and the trained checkpoint rides through
``BatchedActionPipeline.from_monolithic`` into ``VodAnalyzer``.

Run on TPU:  python tools/e2e_demo.py
"""

from __future__ import annotations

import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MOVES = ["Jab", "ForwardSmash", "Wait"]
ACTIONS = MOVES + ["Unknown"]


def _draw_move_sprite(move, phase, rng, size=96):
    """Distinct, learnable visual per move with per-frame animation phase."""
    img = np.zeros((size, size, 4), np.uint8)
    c = size // 2
    wiggle = int(6 * np.sin(phase * 2 * np.pi))
    color = {
        "Jab": (40, 40, 230),          # red square
        "ForwardSmash": (40, 220, 40),  # green circle
        "Wait": (230, 120, 40),         # blue-ish triangle
    }[move]
    if move == "Jab":
        cv2.rectangle(img, (c - 25 + wiggle, c - 25), (c + 25 + wiggle, c + 25),
                      (*color, 255), -1)
    elif move == "ForwardSmash":
        cv2.circle(img, (c, c + wiggle), 28, (*color, 255), -1)
    else:
        pts = np.array([[c, c - 30 + wiggle], [c - 28, c + 24], [c + 28, c + 24]])
        cv2.fillPoly(img, [pts], (*color, 255))
    noise = rng.integers(0, 30, (size, size, 1), dtype=np.uint8)
    img[:, :, :3] = np.clip(img[:, :, :3].astype(int) + noise, 0, 255).astype(np.uint8)
    return img


def make_assets(root, fighters=("Byleth",), frames_per_move=10):
    """Sprite tree (clean-char layout) + one stage image."""
    rng = np.random.default_rng(0)
    stages = os.path.join(root, "stages")
    os.makedirs(stages, exist_ok=True)
    stage = rng.integers(20, 90, (720, 1280, 3), dtype=np.uint8)
    cv2.imwrite(os.path.join(stages, "stage.jpg"), stage)

    clean = os.path.join(root, "clean")
    for fighter in fighters:
        for move in MOVES:
            d = os.path.join(clean, fighter, move)
            os.makedirs(d, exist_ok=True)
            for i in range(frames_per_move):
                sprite = _draw_move_sprite(move, i / frames_per_move, rng)
                cv2.imwrite(
                    os.path.join(d, f"{fighter.lower()}_c00_{move.lower()}_frame_90_{i}.png"),
                    sprite,
                )
    return stages, clean


def make_eval_video(path, stages_dir, num_frames=240, width=1280, height=720,
                    sprite_size=96, seed=7):
    """Two moving 'fighters' cycling through moves; returns
    (boxes [F, 2, 4], labels [F, 2] action names)."""
    rng = np.random.default_rng(seed)
    stage = cv2.imread(os.path.join(stages_dir, os.listdir(stages_dir)[0]))
    stage = cv2.resize(stage, (width, height))
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 60, (width, height))

    boxes = np.zeros((num_frames, 2, 4), np.float32)
    labels = np.empty((num_frames, 2), object)
    # Move schedule: hold each move 20 frames.
    for i in range(num_frames):
        frame = stage.copy()
        for k in range(2):
            move = MOVES[((i // 20) + k) % len(MOVES)]
            phase = (i % 10) / 10
            sprite = _draw_move_sprite(move, phase, rng, sprite_size)
            cx = int(width * (0.3 + 0.4 * k) + 60 * np.sin(i / 40 + k))
            cy = int(height * 0.5 + 40 * np.cos(i / 30 + k))
            x0, y0 = cx - sprite_size // 2, cy - sprite_size // 2
            alpha = sprite[:, :, 3:4].astype(np.float32) / 255.0
            frame[y0 : y0 + sprite_size, x0 : x0 + sprite_size] = (
                sprite[:, :, :3] * alpha
                + frame[y0 : y0 + sprite_size, x0 : x0 + sprite_size] * (1 - alpha)
            ).astype(np.uint8)
            boxes[i, k] = (cx / width, cy / height, sprite_size / width,
                           sprite_size / height)
            labels[i, k] = move
        writer.write(frame)
    writer.release()
    return boxes, labels


def run_demo(workdir, num_epochs=6, steps_per_epoch=24, batch_size=16, crop_size=64,
             eval_frames=240, seq_len=3):
    import jax
    import jax.numpy as jnp

    from playaid_core_tpu.infer.pipeline import BatchedActionPipeline
    from playaid_core_tpu.infer.vod_pipeline import VodAnalyzer
    from playaid_core_tpu.train.dataset import UltActionRecogDataset
    from playaid_core_tpu.train.train import Trainer, TrainerConfig

    stages, clean = make_assets(os.path.join(workdir, "assets"))

    dataset = UltActionRecogDataset(
        split="synth",
        num_samples=steps_per_epoch * batch_size,
        img_dimension=crop_size,
        anim_subset=ACTIONS,
        num_frames_per_sample=seq_len,
        frame_delta=[1],
        char_subset=["Byleth"],
        crop_size=crop_size,
        seed=0,
        gt_root_train=os.path.join(workdir, "none"),
        gt_root_val=os.path.join(workdir, "none"),
        gt_root_test=os.path.join(workdir, "none"),
        stages_dir=stages,
        clean_char_dir=clean,
    )

    config = TrainerConfig(
        family="cnn",
        num_actions=len(ACTIONS),
        sequence_length=seq_len,
        batch_size=batch_size,
        learning_rate=1e-3,
        num_samples=steps_per_epoch * batch_size,
        crop_size=crop_size,
        # The demo sprites are color-coded; the difficulty-1 curriculum's
        # full-range hue shift removes that cue and collapses accuracy, so
        # pin the difficulty for this demonstration.
        curriculum_threshold=1.1,
        # ~144-step budget sits inside the default 200-step LR warmup ramp.
        warmup_steps=0,
    )
    trainer = Trainer(config, dataset)
    trainer.init_state()
    trainer.fit(num_epochs=num_epochs, steps_per_epoch=steps_per_epoch)
    final_acc = trainer.metrics_log[-1]["train_acc"]
    print(f"train acc: {[round(r['train_acc'], 3) for r in trainer.metrics_log]}")

    # --- inference over a composited VOD with the trained weights ---
    video_path = os.path.join(workdir, "eval.mp4")
    boxes, gt_labels = make_eval_video(video_path, stages, num_frames=eval_frames)

    variables = {
        "params": jax.device_get(trainer.state.params),
        "batch_stats": jax.device_get(trainer.state.batch_stats),
    }
    pipe = BatchedActionPipeline(
        family="cnn", num_actions=len(ACTIONS), sequence_length=seq_len,
        frame_delta=1, crop_size=crop_size,
    )
    split_vars = pipe.from_monolithic(variables)
    analyzer = VodAnalyzer(pipe, variables=split_vars, chunk=48, padding=8,
                           host_resize=True)
    result = analyzer.analyze(video_path, boxes)

    pred_names = np.vectorize(lambda i: ACTIONS[i])(result["labels"])
    agreement = float((pred_names == gt_labels).mean())
    print(f"inference: {result['frames']} frames at {result['fps']:.1f} fps")
    print(f"per-frame label agreement vs ground truth: {agreement:.2%}")
    return {"train_acc": final_acc, "agreement": agreement, "fps": result["fps"]}


if __name__ == "__main__":
    import tempfile

    out = run_demo(tempfile.mkdtemp(prefix="e2e_demo_"))
    print(out)
