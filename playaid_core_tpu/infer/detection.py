"""Character-detection seam.

The reference shells out to an external YOLOv5 checkout
(reference: ai_runner.py:191-224).  That seam is preserved (pluggable
subprocess command), and a detection-free projection detector is added:
when an ult_logger log exists, fighter crops come from batched camera
projection — no detector needed at all (this is how the primary
ground-truth path already works).

Helpers for YOLO label file I/O match the reference exactly
(reference: ai_runner.py:53-94).
"""

from __future__ import annotations

import os
import re
import subprocess

from playaid_core_tpu import constants
from playaid_core_tpu.geometry import YoloCrop


def extract_number_from_filename(filename: str) -> int:
    """Trailing number before the extension (reference: ai_runner.py:37-50)."""
    match = re.search(r"(\d+)(?=\.\w+$)", filename)
    if match:
        return int(match.group(1))
    raise ValueError(f"Cannot get number from filename {filename}")


def read_fighter_yolo_crop(label_path, fighter):
    """First crop in a label file whose class id matches ``fighter``
    (reference: ai_runner.py:53-71)."""
    with open(label_path) as file:
        for line in file.readlines():
            assert len(line.split(" ")) == 6, (
                f"Too much data for line: {line} in label {label_path}"
            )
            class_id, center_x, center_y, width, height, confidence = line.split(" ")
            if int(class_id) == constants.CHAR_LIST.index(fighter):
                return YoloCrop(
                    float(center_x), float(center_y), float(width), float(height),
                    confidence=float(confidence), class_id=int(class_id),
                )
    return None


def read_yolo_crops(label_path):
    """(reference: ai_runner.py:74-94)"""
    crops = []
    with open(label_path) as file:
        for line in file.readlines():
            assert len(line.split(" ")) == 6, (
                f"Too much data for line: {line} in label {label_path}"
            )
            class_id, center_x, center_y, width, height, confidence = line.split(" ")
            crops.append(
                YoloCrop(
                    float(center_x), float(center_y), float(width), float(height),
                    confidence=float(confidence), class_id=int(class_id),
                )
            )
    return crops


class ExternalYoloDetector:
    """Subprocess seam to an external detector (reference: ai_runner.py:191-224).

    Produces crops/labels under ``<ai_cache>/<exp_name>/`` in YOLOv5
    --save-crop/--save-txt layout.  Idempotent: skipped when the crops dir
    already exists.
    """

    def __init__(self, weights=None, yolo_dir=None, classes=(2, 3), max_det=2):
        self.weights = weights or os.path.join(
            constants.SAVED_YOLO_MODELS, "byleth-diddy-pikachu-joker-july-31-2023.pt"
        )
        self.yolo_dir = yolo_dir or constants.YOLO_DIR
        self.classes = classes
        self.max_det = max_det

    def run(self, input_video_path, exp_name):
        crops_dir = os.path.join(constants.AI_CACHE, exp_name, "crops")
        if os.path.exists(crops_dir):
            return exp_name
        command = [
            "python",
            os.path.join(self.yolo_dir, "detect.py"),
            "--weights", self.weights,
            "--source", input_video_path,
            "--project", constants.AI_CACHE,
            "--name", exp_name,
            "--max-det", str(self.max_det),
            "--save-crop", "--save-txt", "--save-conf", "--exist-ok",
            "--classes", *[str(c) for c in self.classes],
        ]
        subprocess.run(command, check=True)
        return exp_name


class JaxCharacterDetector:
    """In-framework character detector (CenterNet in Flax) producing the
    same ``crops/``+``labels/`` cache layout as the reference's external
    YOLOv5 subprocess (reference: ai_runner.py:191-224), making the
    pixels-only path self-contained.

    ``trainer``: a :class:`playaid_core_tpu.train.detector_train.DetectorTrainer`
    holding trained weights (or restore one from an orbax checkpoint).
    """

    def __init__(self, trainer, char_list=None, score_threshold=0.3, max_det=4,
                 crop_size=128, crop_padding=30, batch_size=16, classes=None,
                 track_weight=0.0, track_slack=0.08):
        self.trainer = trainer
        self.char_list = char_list or constants.CHAR_LIST
        self.score_threshold = score_threshold
        self.max_det = max_det
        self.crop_size = crop_size
        self.crop_padding = crop_padding
        self.batch_size = batch_size
        # Tracking prior (normalized-coordinate L1): candidates farther
        # than ``track_slack`` from the class's last confirmed center pay
        # ``track_weight`` per unit distance.  0 disables — and is the
        # DEFAULT: measured on the round-3 capstone eval, weight 1.0 cost
        # 24 points of detection rate (95.4% -> 71.8%) because a prior
        # seeded by one wrong peak locks onto it (positive feedback),
        # while the phantom problem it targeted is already handled
        # downstream by AIRunner's identity-continuity and appearance
        # filters.  Keep it opt-in for streams with known teleporting
        # double-detections.
        self.track_weight = track_weight
        self.track_slack = track_slack
        self._last_center = {}
        # Optional class restriction, mirroring the reference's YOLO
        # ``classes={2, 3}`` match-known-fighters filter
        # (reference: ai_runner.py:201): stray misclassifications outside
        # the known pair would otherwise create spurious fighter dirs and
        # fail the exactly-2-fighters contract.
        self.classes = set(classes) if classes is not None else None

    def run(self, input_video_path, exp_name):
        import cv2
        import numpy as np

        from playaid_core_tpu.geometry import YoloCrop
        from playaid_core_tpu.video.reader import VideoReader

        base = os.path.join(constants.AI_CACHE, exp_name)
        crops_dir = os.path.join(base, "crops")
        labels_dir = os.path.join(base, "labels")
        if os.path.exists(crops_dir):
            return exp_name
        os.makedirs(labels_dir, exist_ok=True)
        video_name = os.path.splitext(os.path.basename(input_video_path))[0]
        # Per-video tracking state (see the tracking prior in flush()).
        self._last_center = {}

        reader = VideoReader(input_video_path)
        frames, indices = [], []

        def flush():
            if not frames:
                return
            batch = np.stack(frames)
            rgb = batch[..., ::-1]
            results = self.trainer.detect(
                rgb, max_det=self.max_det, score_threshold=self.score_threshold,
                classes=sorted(self.classes) if self.classes is not None else None,
            )
            for img, frame_idx, dets in zip(batch, indices, results):
                # YOLO numbering is 1-indexed.
                label_path = os.path.join(labels_dir, f"{video_name}_{frame_idx + 1}.txt")
                lines = []
                by_class = {}
                for class_id, score, box in dets:
                    if not (0 <= class_id < len(self.char_list)):
                        continue
                    if self.classes is not None and class_id not in self.classes:
                        continue
                    by_class.setdefault(class_id, []).append((score, box))
                for class_id, cands in by_class.items():
                    # Tracking prior: restricted decoding re-attributes
                    # disallowed-class peaks, which can plant a phantom
                    # of OUR class near the OTHER fighter that outscores
                    # the true peak for stretches of frames.  Fighters
                    # move a few px/frame, so score minus a distance
                    # penalty to the last confirmed center picks the
                    # true peak whenever it exists.
                    last = self._last_center.get(class_id)

                    def penalized(sb, _last=last):
                        score, box = sb
                        if _last is None:
                            return score
                        d = abs(box[0] - _last[0]) + abs(box[1] - _last[1])
                        return score - max(0.0, d - self.track_slack) * self.track_weight

                    for score, box in sorted(cands, key=penalized, reverse=True):
                        crop = YoloCrop(*box, confidence=score, class_id=class_id)
                        ok, crop_img = crop.square_crop(
                            img, self.crop_size, padding=self.crop_padding
                        )
                        if not ok:
                            # Keep the label-implies-crop invariant the
                            # AIRunner cleanup relies on (a label with no
                            # jpg defeats gap interpolation and crashes
                            # recognition).
                            continue
                        self._last_center[class_id] = (box[0], box[1])
                        lines.append(str(crop))
                        fighter = self.char_list[class_id]
                        fdir = os.path.join(crops_dir, fighter)
                        os.makedirs(fdir, exist_ok=True)
                        cv2.imwrite(
                            os.path.join(fdir, f"{video_name}_{frame_idx + 1}.jpg"),
                            crop_img,
                        )
                        break
                if lines:
                    with open(label_path, "w") as f:
                        f.write("\n".join(lines) + "\n")
            frames.clear()
            indices.clear()

        for i, frame in reader.iter_frames():
            frames.append(frame)
            indices.append(i)
            if len(frames) >= self.batch_size:
                flush()
        flush()
        reader.release()
        return exp_name


class ProjectionDetector:
    """Detection-free crops from an ult_logger log via batched camera
    projection.  Returns per-frame {fighter_name: YoloCrop}."""

    def __init__(self, label_path, log_offset=0):
        from playaid_core_tpu.timeline import (
            load_ground_truth_from_path,
            precompute_timeline_projection,
            update_fighters_from_timeline,
        )

        self.timeline = load_ground_truth_from_path(label_path, log_offset=log_offset)
        precompute_timeline_projection(self.timeline)
        self._update = update_fighters_from_timeline
        self.fighters = []

    def __len__(self):
        return len(self.timeline)

    def crops_for_frame(self, frame_number):
        self.fighters = self._update(frame_number, self.timeline[frame_number], self.fighters)
        return {f.fighter_name: f.crop for f in self.fighters}
