#!/usr/bin/env python
"""Capstone demonstration: the fully self-contained pixels-only path.

No ground-truth log, no external detector — everything in-framework:

1. generate two fighters' sprite sets + stage (distinct palettes/shapes);
2. generate detection composites (datagen) and train the CenterNet
   character detector;
3. generate synthetic action-recognition data and train the CNN action
   model;
4. composite an eval match video;
5. run the real AIRunner: JaxCharacterDetector -> crops/labels cache ->
   cleanup -> batched action recognition -> ai_output.yaml;
6. score detection hit-rate and per-frame action agreement vs the
   generator's ground truth.

Run on TPU:  python tools/e2e_pixels_demo.py
"""

from __future__ import annotations

import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MOVES = ["Jab", "ForwardSmash", "Wait"]
ACTIONS = MOVES + ["Unknown"]
# Byleth (CHAR_LIST index 0) and Pikachu (index 2).
FIGHTERS = {"Byleth": 0, "Pikachu": 2}
PALETTES = {
    "Byleth": {"Jab": (40, 40, 230), "ForwardSmash": (40, 220, 40),
               "Wait": (230, 120, 40)},
    "Pikachu": {"Jab": (230, 230, 40), "ForwardSmash": (230, 40, 230),
                "Wait": (40, 230, 230)},
}


def draw_sprite(fighter, move, phase, rng, size=128):
    """Sprites must exceed the composite generator's 100px minimum
    (reference: gen_synth_char_detection.py:206-207) or they are skipped."""
    img = np.zeros((size, size, 4), np.uint8)
    c = size // 2
    s = size / 128.0
    wiggle = int(8 * s * np.sin(phase * 2 * np.pi))
    color = PALETTES[fighter][move]
    if move == "Jab":
        r = int(34 * s)
        cv2.rectangle(img, (c - r + wiggle, c - r), (c + r + wiggle, c + r),
                      (*color, 255), -1)
    elif move == "ForwardSmash":
        cv2.circle(img, (c, c + wiggle), int(38 * s), (*color, 255), -1)
    else:
        pts = np.array([[c, c - int(40 * s) + wiggle],
                        [c - int(37 * s), c + int(32 * s)],
                        [c + int(37 * s), c + int(32 * s)]])
        cv2.fillPoly(img, [pts], (*color, 255))
    if fighter == "Pikachu":
        # Secondary marker so identity isn't color-only.
        cv2.circle(img, (c, c), int(11 * s), (255, 255, 255, 255), -1)
    noise = rng.integers(0, 30, (size, size, 1), dtype=np.uint8)
    img[:, :, :3] = np.clip(img[:, :, :3].astype(int) + noise, 0, 255).astype(np.uint8)
    return img


def make_assets(root, frames_per_move=10):
    rng = np.random.default_rng(0)
    stages = os.path.join(root, "stages")
    os.makedirs(stages, exist_ok=True)
    cv2.imwrite(os.path.join(stages, "stage.jpg"),
                rng.integers(20, 90, (720, 1280, 3), dtype=np.uint8))
    clean = os.path.join(root, "clean")
    for fighter in FIGHTERS:
        for move in MOVES:
            d = os.path.join(clean, fighter, move)
            os.makedirs(d, exist_ok=True)
            for i in range(frames_per_move):
                sprite = draw_sprite(fighter, move, i / frames_per_move, rng)
                cv2.imwrite(
                    os.path.join(d, f"{fighter.lower()}_c00_{move.lower()}_frame_90_{i}.png"),
                    sprite,
                )
    return stages, clean


def make_eval_video(path, stages_dir, num_frames=240, width=1280, height=720,
                    sprite_size=110, seed=7):
    rng = np.random.default_rng(seed)
    stage = cv2.imread(os.path.join(stages_dir, os.listdir(stages_dir)[0]))
    stage = cv2.resize(stage, (width, height))
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 60, (width, height))

    gt_boxes = np.zeros((num_frames, 2, 4), np.float32)
    gt_labels = np.empty((num_frames, 2), object)
    fighters = list(FIGHTERS)
    for i in range(num_frames):
        frame = stage.copy()
        for k, fighter in enumerate(fighters):
            move = MOVES[((i // 20) + k) % len(MOVES)]
            sprite = draw_sprite(fighter, move, (i % 10) / 10, rng, sprite_size)
            cx = int(width * (0.3 + 0.4 * k) + 60 * np.sin(i / 40 + k))
            cy = int(height * 0.5 + 40 * np.cos(i / 30 + k))
            x0, y0 = cx - sprite_size // 2, cy - sprite_size // 2
            alpha = sprite[:, :, 3:4].astype(np.float32) / 255.0
            frame[y0 : y0 + sprite_size, x0 : x0 + sprite_size] = (
                sprite[:, :, :3] * alpha
                + frame[y0 : y0 + sprite_size, x0 : x0 + sprite_size] * (1 - alpha)
            ).astype(np.uint8)
            gt_boxes[i, k] = (cx / width, cy / height, sprite_size / width,
                              sprite_size / height)
            gt_labels[i, k] = move
        writer.write(frame)
    writer.release()
    return gt_boxes, gt_labels


def run_demo(workdir, det_steps=600, act_epochs=5, act_steps=24, eval_frames=240,
             det_composites=300):
    import jax
    import jax.numpy as jnp

    from playaid_core_tpu import constants
    from playaid_core_tpu.datagen.gen_synth_char_detection import (
        generate_stage_char_compositions,
    )
    from playaid_core_tpu.infer.detection import JaxCharacterDetector
    from playaid_core_tpu.infer.pipeline import BatchedActionPipeline
    from playaid_core_tpu.infer.runner import AIRunner
    from playaid_core_tpu.train.dataset import UltActionRecogDataset
    from playaid_core_tpu.train.detector_train import DetectionDataset, DetectorTrainer
    from playaid_core_tpu.train.train import Trainer, TrainerConfig

    stages, clean = make_assets(os.path.join(workdir, "assets"))

    # --- 1) detector data + training ---
    print("generating detection composites...")
    # Identity in this demo is color-coded, so skip the hue-shifting sprite
    # augmentation when compositing detector training data.
    generate_stage_char_compositions(
        "train", det_composites, seed=0,
        output_root=os.path.join(workdir, "composites"),
        stages_dir=stages, clean_char_dir=clean, char_list=list(constants.CHAR_LIST),
        augment=False,
    )
    det_ds = DetectionDataset(
        os.path.join(workdir, "composites", "train"), input_hw=(256, 448),
        num_classes=len(constants.CHAR_LIST), seed=0,
    )
    print("training detector...")
    det_trainer = DetectorTrainer(det_ds, num_classes=len(constants.CHAR_LIST),
                                  input_hw=(256, 448), dtype=jnp.bfloat16)
    det_trainer.fit(det_steps, batch_size=8, log_every=100, verbose=True)
    print("detector loss:", [round(r["loss"], 3) for r in det_trainer.metrics_log])

    # --- 2) action model training ---
    action_ds = UltActionRecogDataset(
        split="synth", num_samples=act_steps * 16, img_dimension=64,
        anim_subset=ACTIONS, num_frames_per_sample=3, frame_delta=[1],
        char_subset=list(FIGHTERS), crop_size=64, seed=0,
        gt_root_train=os.path.join(workdir, "none"),
        gt_root_val=os.path.join(workdir, "none"),
        gt_root_test=os.path.join(workdir, "none"),
        stages_dir=stages, clean_char_dir=clean,
        # Scale-only augmentation: detector crops leave the sprite at
        # ~80-95% of the window; train across that range (the difficulty
        # pipeline's hue scrambling would erase this demo's color cues).
        # Center jitter matches detector center error — exactly-centered
        # training makes the classifier brittle to predicted-box offsets.
        synth_sprite_fill=(0.72, 1.0),
        synth_center_jitter=8,
    )
    config = TrainerConfig(
        family="cnn", num_actions=len(ACTIONS), sequence_length=3, batch_size=16,
        learning_rate=1e-3, num_samples=act_steps * 16, crop_size=64,
        curriculum_threshold=1.1,
    )
    print("training action model...")
    act_trainer = Trainer(config, action_ds)
    act_trainer.init_state()
    act_trainer.fit(num_epochs=act_epochs, steps_per_epoch=act_steps)
    print("action acc:", [round(r["train_acc"], 3) for r in act_trainer.metrics_log])

    # --- 3) eval video + full pixels-only AIRunner ---
    video_path = os.path.join(workdir, "eval_match.mp4")
    gt_boxes, gt_labels = make_eval_video(video_path, stages, num_frames=eval_frames)

    pipe = BatchedActionPipeline(
        family="cnn", num_actions=len(ACTIONS), sequence_length=3, frame_delta=1,
        crop_size=64,
    )
    split_vars = pipe.from_monolithic({
        "params": jax.device_get(act_trainer.state.params),
        "batch_stats": jax.device_get(act_trainer.state.batch_stats),
    })

    constants.AI_CACHE = os.path.join(workdir, "ai_cache")
    runner = AIRunner(
        input_video_path=video_path,
        detector=JaxCharacterDetector(det_trainer, score_threshold=0.05,
                                      crop_size=64, crop_padding=8, batch_size=24),
        pipeline=pipe,
        variables=split_vars,
        crop_padding=8,  # match the detector's crop framing
    )
    runner.actions = ACTIONS
    print("running pixels-only AIRunner...")
    runner.run_detection_setup()
    runner.run_action_recognition()
    runner.write_output()

    # --- 4) score ---
    fighters = list(FIGHTERS)
    det_hits, act_hits, total = 0, 0, 0
    from playaid_core_tpu.infer.detection import read_fighter_yolo_crop

    for i in range(1, runner.max_frames):
        for k, fighter in enumerate(fighters):
            crop = read_fighter_yolo_crop(runner.get_label_path(i), fighter)
            total += 1
            gt = gt_boxes[i - 1, k]
            if crop is not None and abs(crop.center_x - gt[0]) < 0.06 and abs(
                crop.center_y - gt[1]
            ) < 0.08:
                det_hits += 1
            pred = runner.ai_output_data[fighter][i - 1].action
            if pred == gt_labels[i - 1, k]:
                act_hits += 1

    det_rate = det_hits / total
    act_rate = act_hits / total
    print(f"detection localization rate: {det_rate:.2%}")
    print(f"pixels-only action agreement: {act_rate:.2%}")
    return {
        "det_rate": det_rate,
        "act_rate": act_rate,
        "act_trainer": act_trainer,
        "det_trainer": det_trainer,
        "runner": runner,
        "gt_labels": gt_labels,
        "gt_boxes": gt_boxes,
        "pipe": pipe,
        "split_vars": split_vars,
    }


if __name__ == "__main__":
    import tempfile

    out = run_demo(tempfile.mkdtemp(prefix="pixels_demo_"))
    print(out)
