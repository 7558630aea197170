"""CenterNet detector: targets, losses, decode round-trip, and a tiny
overfit run localizing synthetic sprites."""

import os

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from playaid_core_tpu.models.detector import (
    CenterNetDetector,
    build_targets,
    decode_detections,
    detector_loss,
    focal_loss,
    gaussian_radius,
)


def test_gaussian_radius_positive():
    assert gaussian_radius(10, 20) >= 1.0
    assert gaussian_radius(1, 1) >= 1.0


def test_build_targets_and_peak():
    boxes = np.array([[0.5, 0.5, 0.2, 0.3]], np.float32)
    classes = np.array([1], np.int32)
    valid = np.array([True])
    heat, size, offset, mask = build_targets(boxes, classes, valid, 32, 48, 3)
    ci, cj = int(0.5 * 32), int(0.5 * 48)
    assert heat[ci, cj, 1] == pytest.approx(1.0)
    assert heat[:, :, 0].max() == 0.0
    assert mask.sum() == 1.0
    np.testing.assert_allclose(size[ci, cj], (0.2 * 48, 0.3 * 32), rtol=1e-5)


def test_decode_recovers_targets():
    """Decoding ideal network outputs reproduces the encoded box."""
    boxes = np.array([[0.4, 0.6, 0.25, 0.2]], np.float32)
    classes = np.array([2], np.int32)
    valid = np.array([True])
    h, w, c = 32, 48, 3
    heat, size, offset, mask = build_targets(boxes, classes, valid, h, w, c)
    # Perfect logits: large where heat==1, very negative elsewhere.
    logits = np.where(heat >= 0.999, 10.0, -10.0).astype(np.float32)
    outputs = {
        "heatmap": jnp.asarray(logits)[None],
        "size": jnp.asarray(size)[None],
        "offset": jnp.asarray(offset)[None],
    }
    dec_boxes, scores, dec_classes = decode_detections(outputs, max_det=4)
    assert int(dec_classes[0, 0]) == 2
    np.testing.assert_allclose(np.asarray(dec_boxes[0, 0]), boxes[0], atol=1e-3)
    assert float(scores[0, 0]) > 0.9


def test_focal_loss_decreases_with_confidence():
    gt = np.zeros((1, 8, 8, 1), np.float32)
    gt[0, 4, 4, 0] = 1.0
    bad = jnp.zeros((1, 8, 8, 1))
    good = jnp.where(jnp.asarray(gt) >= 0.999, 6.0, -6.0)
    assert float(focal_loss(good, jnp.asarray(gt))) < float(
        focal_loss(bad, jnp.asarray(gt))
    )


def test_detector_forward_shapes():
    model = CenterNetDetector(num_classes=4)
    x = jnp.zeros((1, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["heatmap"].shape == (1, 16, 24, 4)
    assert out["size"].shape == (1, 16, 24, 2)
    assert out["offset"].shape == (1, 16, 24, 2)


@pytest.fixture(scope="module")
def det_tree(tmp_path_factory):
    """Tiny detection dataset: one bright sprite on dark background."""
    root = tmp_path_factory.mktemp("det")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    for i in range(12):
        img = rng.integers(0, 40, (128, 192, 3), dtype=np.uint8)
        cx, cy = 0.25 + 0.5 * (i % 4) / 4, 0.3 + 0.4 * (i % 3) / 3
        x, y = int(cx * 192), int(cy * 128)
        cv2.circle(img, (x, y), 14, (250, 250, 250), -1)
        cv2.imwrite(str(root / "images" / f"{i}.jpg"), img)
        with open(root / "labels" / f"{i}.txt", "w") as f:
            f.write(f"0 {cx} {cy} {28 / 192} {28 / 128}\n")
    return root


@pytest.mark.skipif(
    not os.environ.get("PLAYAID_SLOW_TESTS"),
    reason="~6 min CPU training run; set PLAYAID_SLOW_TESTS=1 to enable",
)
def test_detector_overfit_localizes(det_tree):
    from playaid_core_tpu.train.detector_train import DetectionDataset, DetectorTrainer

    ds = DetectionDataset(str(det_tree), input_hw=(128, 192), num_classes=1,
                          max_boxes=2, seed=0)
    trainer = DetectorTrainer(ds, num_classes=1, learning_rate=2e-3,
                              input_hw=(128, 192))
    trainer.fit(num_steps=150, batch_size=4, log_every=50)
    losses = [r["loss"] for r in trainer.metrics_log]
    assert losses[-1] < losses[0]

    # Localize a fresh sample: center must land near the sprite.
    img, _, (boxes, classes, valid) = ds.sample()
    results = trainer.detect((img[None] * 255).astype(np.uint8),
                             score_threshold=0.05)
    assert results[0], "no detections"
    _, score, box = results[0][0]
    gt = boxes[0]
    assert abs(box[0] - gt[0]) < 0.15 and abs(box[1] - gt[1]) < 0.15, (box, gt)
