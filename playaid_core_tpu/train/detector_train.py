"""Character-detector training: dataset over YOLO-format trees + jit loop.

Consumes the trees written by datagen/gen_synth_char_detection.py and
datagen/gen_gt_char_detection.py (``{split}/{images,labels}/*``), splats
CenterNet targets on the host, and trains
:class:`playaid_core_tpu.models.detector.CenterNetDetector` with the same
mesh/staging machinery as the action models.  This replaces the
reference's external-YOLOv5 training dependency
(reference: ai_runner.py:191-224).
"""

from __future__ import annotations

import json
import os
import time
from glob import glob

import click
import cv2
import numpy as np

import jax
import jax.numpy as jnp
import optax

from playaid_core_tpu import constants
from playaid_core_tpu.models.detector import (
    CenterNetDetector,
    build_targets,
    decode_detections,
    detector_loss,
)
from playaid_core_tpu.parallel.staging import BackgroundIterator
from playaid_core_tpu.train.train import TrainState


class DetectionDataset:
    """YOLO-format (images/, labels/) directory pair."""

    def __init__(self, root, input_hw=(256, 448), num_classes=6, max_boxes=8,
                 stride=4, seed=None):
        self.images = sorted(glob(os.path.join(root, "images", "*.jpg")))
        if not self.images:
            raise RuntimeError(f"no detection images under {root}")
        self.input_h, self.input_w = input_hw
        self.num_classes = num_classes
        self.max_boxes = max_boxes
        self.stride = stride
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.images)

    def _label_path(self, image_path):
        return image_path.replace(os.sep + "images" + os.sep,
                                  os.sep + "labels" + os.sep).replace(".jpg", ".txt")

    def sample(self, uint8=False):
        path = self.images[int(self.rng.integers(0, len(self.images)))]
        img = cv2.imread(path)
        img = cv2.resize(img, (self.input_w, self.input_h))
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if not uint8:
            img = img.astype(np.float32) / 255.0

        boxes = np.zeros((self.max_boxes, 4), np.float32)
        classes = np.zeros((self.max_boxes,), np.int32)
        valid = np.zeros((self.max_boxes,), bool)
        with open(self._label_path(path)) as f:
            for i, line in enumerate(f):
                parts = line.split()
                if len(parts) < 5 or i >= self.max_boxes:
                    continue
                classes[i] = int(float(parts[0]))
                boxes[i] = [float(v) for v in parts[1:5]]
                valid[i] = 0 <= classes[i] < self.num_classes

        out_h, out_w = self.input_h // self.stride, self.input_w // self.stride
        heat, size, offset, mask = build_targets(
            boxes, classes, valid, out_h, out_w, self.num_classes
        )
        return img, (heat, size, offset, mask), (boxes, classes, valid)

    def batches(self, batch_size, num_batches, uint8=True):
        """uint8 batches by default: images convert to float on device
        (4x fewer bytes over the host->device link)."""
        for _ in range(num_batches):
            imgs, heats, sizes, offsets, masks = [], [], [], [], []
            for _ in range(batch_size):
                img, (heat, size, offset, mask), _ = self.sample(uint8=uint8)
                imgs.append(img)
                heats.append(heat)
                sizes.append(size)
                offsets.append(offset)
                masks.append(mask)
            yield (
                np.stack(imgs),
                (np.stack(heats), np.stack(sizes), np.stack(offsets), np.stack(masks)),
            )


def make_detector_train_step(model):
    @jax.jit
    def train_step(state, images, targets):
        # uint8 batches convert on device: shipping uint8 costs 4x fewer
        # host->device bytes (the tunnel link is the training bottleneck
        # on 1-core hosts).
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0

        def compute_loss(params):
            outputs, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"],
            )
            loss, parts = detector_loss(outputs, targets)
            return loss, (parts, updates)

        (loss, (parts, updates)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads=grads)
        new_state = new_state.replace(batch_stats=updates["batch_stats"])
        return new_state, loss, parts

    return train_step


class DetectorTrainer:
    def __init__(self, dataset, num_classes=6, learning_rate=5e-4, input_hw=(256, 448),
                 dtype=jnp.float32):
        self.dataset = dataset
        self.model = CenterNetDetector(num_classes=num_classes, dtype=dtype)
        self.input_hw = input_hw
        rng = jax.random.PRNGKey(0)
        sample = jnp.zeros((1, input_hw[0], input_hw[1], 3), jnp.float32)
        variables = self.model.init(rng, sample)
        self.state = TrainState.create(
            apply_fn=self.model.apply,
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            tx=optax.adam(learning_rate),
        )
        self.train_step = make_detector_train_step(self.model)
        def _apply(params, stats, images):
            if images.dtype == jnp.uint8:
                images = images.astype(jnp.float32) / 255.0
            return self.model.apply(
                {"params": params, "batch_stats": stats}, images, train=False
            )

        self._apply_jit = jax.jit(_apply)
        self.metrics_log = []

    def fit(self, num_steps, batch_size=8, log_every=20, log_path=None,
            verbose=False):
        start = time.time()
        batches = BackgroundIterator(
            self.dataset.batches(batch_size, num_steps), maxsize=4
        )
        for step, (images, targets) in enumerate(batches):
            self.state, loss, parts = self.train_step(
                self.state, jnp.asarray(images),
                tuple(jnp.asarray(t) for t in targets),
            )
            if step % log_every == 0 or step == num_steps - 1:
                rec = {
                    "step": step,
                    "loss": float(loss),
                    **{k: float(v) for k, v in parts.items()},
                    "seconds": round(time.time() - start, 1),
                }
                self.metrics_log.append(rec)
                if verbose:
                    print(f"detector step {rec['step']}: loss {rec['loss']:.4f} "
                          f"({rec['seconds']}s)", flush=True)
                if log_path:
                    with open(log_path, "a") as f:
                        f.write(json.dumps(rec) + "\n")
        return self.state

    def detect(self, images_u8, max_det=8, score_threshold=0.3):
        """images [B, H, W, 3] uint8 RGB (any size; resized to the model
        input) -> list of per-image [(class, score, yolo_box), ...]."""
        b = images_u8.shape[0]
        resized = np.stack([
            cv2.resize(img, (self.input_hw[1], self.input_hw[0])) for img in images_u8
        ])  # stays uint8: 4x fewer bytes to the device; converts on-chip
        outputs = self._apply_jit(
            self.state.params, self.state.batch_stats, jnp.asarray(resized)
        )
        boxes, scores, classes = decode_detections(outputs, max_det=max_det)
        boxes, scores, classes = jax.device_get((boxes, scores, classes))
        results = []
        for i in range(b):
            keep = scores[i] >= score_threshold
            results.append(
                [
                    (int(classes[i, k]), float(scores[i, k]), tuple(boxes[i, k]))
                    for k in np.nonzero(keep)[0]
                ]
            )
        return results


@click.command()
@click.option("--data-root", default=None, help="YOLO-format tree (images/, labels/)")
@click.option("--num-steps", default=2000, type=int)
@click.option("--batch-size", default=8, type=int)
@click.option("--num-classes", default=len(constants.CHAR_LIST), type=int)
def main(data_root, num_steps, batch_size, num_classes):
    root = data_root or os.path.join(constants.COMPOSITES_DIR, "train")
    dataset = DetectionDataset(root, num_classes=num_classes)
    trainer = DetectorTrainer(dataset, num_classes=num_classes)
    trainer.fit(num_steps, batch_size=batch_size)
    print(trainer.metrics_log[-1])


if __name__ == "__main__":
    main()
