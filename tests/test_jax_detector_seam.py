"""JaxCharacterDetector writes the YOLOv5-compatible cache layout the
AIRunner cleanup stage consumes."""

import os

import cv2
import numpy as np
import pytest

from playaid_core_tpu import constants
from playaid_core_tpu.infer.detection import JaxCharacterDetector, read_yolo_crops


class FakeTrainer:
    """Stands in for a trained DetectorTrainer: two fixed detections."""

    def detect(self, images_rgb, max_det=4, score_threshold=0.3, classes=None):
        out = []
        for _ in range(images_rgb.shape[0]):
            out.append(
                [
                    (2, 0.9, (0.3, 0.5, 0.2, 0.3)),   # Pikachu
                    (3, 0.85, (0.7, 0.5, 0.2, 0.3)),  # Joker
                ]
            )
        return out


def test_jax_detector_cache_layout(tmp_path, monkeypatch):
    monkeypatch.setattr(constants, "AI_CACHE", str(tmp_path / "ai_cache"))
    video = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 60, (320, 180))
    for i in range(8):
        w.write(np.full((180, 320, 3), 80, np.uint8))
    w.release()

    det = JaxCharacterDetector(FakeTrainer(), batch_size=4)
    exp = det.run(video, "vids/clip")

    base = os.path.join(constants.AI_CACHE, exp)
    assert sorted(os.listdir(os.path.join(base, "crops"))) == ["Joker", "Pikachu"]
    labels = sorted(os.listdir(os.path.join(base, "labels")))
    assert len(labels) == 8
    crops = read_yolo_crops(os.path.join(base, "labels", "clip_1.txt"))
    assert {c.class_id for c in crops} == {2, 3}
    # 1-indexed crops exist per fighter.
    assert os.path.exists(os.path.join(base, "crops", "Pikachu", "clip_1.jpg"))
    img = cv2.imread(os.path.join(base, "crops", "Pikachu", "clip_8.jpg"))
    assert img.shape == (128, 128, 3)

    # Idempotent re-run.
    assert det.run(video, "vids/clip") == exp


def test_jax_detector_feeds_ai_runner(tmp_path, monkeypatch):
    from playaid_core_tpu.infer.pipeline import BatchedActionPipeline
    from playaid_core_tpu.infer.runner import AIRunner

    monkeypatch.setattr(constants, "AI_CACHE", str(tmp_path / "ai_cache"))
    video = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 60, (320, 180))
    for i in range(10):
        w.write(np.full((180, 320, 3), 90, np.uint8))
    w.release()

    pipe = BatchedActionPipeline(family="cnn", num_actions=63, sequence_length=3,
                                 frame_delta=1, crop_size=32)
    runner = AIRunner(
        input_video_path=video,
        detector=JaxCharacterDetector(FakeTrainer(), batch_size=4),
        pipeline=pipe,
    )
    runner.run_detection_setup()
    runner.run_action_recognition()
    runner.write_output()
    assert os.path.exists(runner.ai_output_file)
    assert runner.ai_output_data["Pikachu"][0].action in runner.actions


def test_tracking_prior_rejects_phantom(tmp_path, monkeypatch):
    """Restricted decoding can re-attribute a disallowed-class peak into
    a phantom of our class near the other fighter; when it briefly
    outscores the true peak, the tracking prior must keep the crop on
    the established track."""
    monkeypatch.setattr(constants, "AI_CACHE", str(tmp_path / "ai_cache"))
    video = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 60, (320, 180))
    for i in range(6):
        w.write(np.full((180, 320, 3), 80, np.uint8))
    w.release()

    class PhantomTrainer:
        def __init__(self):
            self.frame = -1

        def detect(self, images_rgb, max_det=4, score_threshold=0.3, classes=None):
            out = []
            for _ in range(images_rgb.shape[0]):
                self.frame += 1
                cands = [(2, 0.50, (0.3, 0.5, 0.2, 0.3))]
                if self.frame < 2:
                    cands.append((3, 0.60, (0.7, 0.5, 0.2, 0.3)))   # true Joker
                else:
                    # true Joker dips below a persistent phantom far away
                    cands.append((3, 0.35, (0.71, 0.51, 0.2, 0.3)))
                    cands.append((3, 0.45, (0.25, 0.85, 0.2, 0.3)))
                out.append(cands)
            return out

    # Opt-in since the round-3 measurement (default weight 1.0 cost 24
    # points of eval detection rate via prior lock-in; see detection.py).
    det = JaxCharacterDetector(PhantomTrainer(), batch_size=3, track_weight=1.0)
    exp = det.run(video, "vids/phantom")
    base = os.path.join(constants.AI_CACHE, exp)
    for i in range(3, 7):
        crops = read_yolo_crops(os.path.join(base, "labels", f"clip_{i}.txt"))
        joker = [c for c in crops if c.class_id == 3]
        assert joker and abs(joker[0].center_x - 0.71) < 0.02, (i, crops)
