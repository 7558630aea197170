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
    """YOLO-format (images/, labels/) directory pair.

    ``sample_augment=True`` applies identity-safe photometric jitter +
    codec-style degradation per *draw* (after the resize to model
    input).  Composite pools are finite and each file's baked-in
    augmentation is frozen at generation time, so without per-draw
    variation a class head sees each exact pixel pattern dozens of
    times and memorizes instead of generalizing (round-3 diagnosis:
    98% loc+class on seen composites, chance on fresh ones)."""

    def __init__(self, root, input_hw=(256, 448), num_classes=6, max_boxes=8,
                 stride=4, seed=None, sample_augment=False):
        self.images = sorted(glob(os.path.join(root, "images", "*.jpg")))
        if not self.images:
            raise RuntimeError(f"no detection images under {root}")
        self.input_h, self.input_w = input_hw
        self.num_classes = num_classes
        self.max_boxes = max_boxes
        self.stride = stride
        self.sample_augment = sample_augment
        self.rng = np.random.default_rng(seed)

    def _augment_input(self, img):
        """Identity-safe per-draw jitter on the resized uint8 RGB input."""
        rng = self.rng
        # brightness/contrast
        if rng.random() < 0.6:
            a = rng.uniform(0.85, 1.15)
            b = rng.uniform(-25, 25)
            img = np.clip(img.astype(np.float32) * a + b, 0, 255).astype(np.uint8)
        # mild hue/sat drift (identity-safe bounds)
        if rng.random() < 0.4:
            hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.int16)
            hsv[..., 0] = (hsv[..., 0] + rng.integers(-6, 7)) % 180
            hsv[..., 1] = np.clip(hsv[..., 1] + rng.integers(-20, 21), 0, 255)
            img = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
        # codec-style degradation: downscale/upscale then JPEG roundtrip
        if rng.random() < 0.5:
            if rng.random() < 0.5:
                f = rng.uniform(0.6, 0.9)
                h, w = img.shape[:2]
                img = cv2.resize(cv2.resize(img, (int(w * f), int(h * f))), (w, h))
            q = int(rng.integers(40, 95))
            ok, buf = cv2.imencode(".jpg", img[:, :, ::-1],
                                   [cv2.IMWRITE_JPEG_QUALITY, q])
            if ok:
                img = cv2.imdecode(buf, cv2.IMREAD_COLOR)[:, :, ::-1]
        # sensor noise
        if rng.random() < 0.3:
            noise = rng.normal(0, rng.uniform(2, 9), img.shape)
            img = np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)
        return img

    def __len__(self):
        return len(self.images)

    def _label_path(self, image_path):
        return image_path.replace(os.sep + "images" + os.sep,
                                  os.sep + "labels" + os.sep).replace(".jpg", ".txt")

    def _augment_geom(self, img, boxes, valid):
        """Per-draw horizontal flip + zoom-crop on the source-resolution
        image, with normalized-box remapping.  Photometric jitter alone
        leaves sprite layout/scale identical across draws of a composite
        — geometry variation is what makes a finite pool behave like a
        large one for the class head."""
        rng = self.rng
        if rng.random() < 0.5:
            img = img[:, ::-1]
            boxes = boxes.copy()
            boxes[:, 0] = 1.0 - boxes[:, 0]
        if rng.random() < 0.7:
            z = float(rng.uniform(0.72, 0.97))
            h, w = img.shape[:2]
            cw, ch = int(w * z), int(h * z)
            x0 = int(rng.integers(0, w - cw + 1))
            y0 = int(rng.integers(0, h - ch + 1))
            img = img[y0:y0 + ch, x0:x0 + cw]
            nb = boxes.copy()
            nb[:, 0] = (boxes[:, 0] * w - x0) / cw
            nb[:, 1] = (boxes[:, 1] * h - y0) / ch
            nb[:, 2] = boxes[:, 2] / z
            nb[:, 3] = boxes[:, 3] / z
            inside = ((nb[:, 0] > 0.01) & (nb[:, 0] < 0.99)
                      & (nb[:, 1] > 0.01) & (nb[:, 1] < 0.99))
            valid = valid & inside
            boxes = nb
        return np.ascontiguousarray(img), boxes, valid

    def sample(self, uint8=False):
        path = self.images[int(self.rng.integers(0, len(self.images)))]
        img = cv2.imread(path)

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

        if self.sample_augment:
            img, boxes, valid = self._augment_geom(img, boxes, valid)
        img = cv2.resize(img, (self.input_w, self.input_h))
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if self.sample_augment:
            img = self._augment_input(np.ascontiguousarray(img))
        if not uint8:
            img = img.astype(np.float32) / 255.0

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
                 dtype=jnp.float32, weight_decay=1e-4):
        self.dataset = dataset
        self.num_classes = num_classes
        self.model = CenterNetDetector(num_classes=num_classes, dtype=dtype)
        self.input_hw = input_hw
        rng = jax.random.PRNGKey(0)
        sample = jnp.zeros((1, input_hw[0], input_hw[1], 3), jnp.float32)
        variables = self.model.init(rng, sample)
        self.state = TrainState.create(
            apply_fn=self.model.apply,
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            # Decoupled weight decay: composite pools are synthetic and
            # finite, so the class head overfits layout/appearance pairs
            # without explicit regularization (round-3 diagnosis: 98%
            # loc+class on train composites vs 43% held-out).
            tx=optax.adamw(learning_rate, weight_decay=weight_decay),
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

    def detect(self, images_u8, max_det=8, score_threshold=0.3, classes=None):
        """images [B, H, W, 3] uint8 RGB (any size; resized to the model
        input) -> list of per-image [(class, score, yolo_box), ...].

        ``classes``: optional iterable of allowed class ids; decoding is
        restricted to those heatmap channels (YOLO ``classes=`` filter
        semantics — see decode_detections)."""
        b = images_u8.shape[0]
        resized = np.stack([
            cv2.resize(img, (self.input_hw[1], self.input_hw[0])) for img in images_u8
        ])  # stays uint8: 4x fewer bytes to the device; converts on-chip
        outputs = self._apply_jit(
            self.state.params, self.state.batch_stats, jnp.asarray(resized)
        )
        mask = None
        if classes is not None:
            mask_np = np.zeros((self.num_classes,), np.float32)
            mask_np[list(classes)] = 1.0
            mask = jnp.asarray(mask_np)
        boxes, scores, classes = jax.device_get(
            decode_detections(outputs, max_det=max_det, class_mask=mask)
        )
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

    def evaluate(self, dataset, num_images=64, score_threshold=0.05,
                 tol=(0.06, 0.08)):
        """Center-localization and loc+class rates over ``num_images``
        sampled from a (held-out) DetectionDataset.  The per-draw
        augmentation of the dataset applies, so this measures the
        training distribution, not pristine files."""
        loc_hits, cls_hits, total = 0, 0, 0
        batch = 16
        done = 0
        while done < num_images:
            imgs, gts = [], []
            for _ in range(min(batch, num_images - done)):
                img, _t, (boxes, classes, valid) = dataset.sample(uint8=True)
                imgs.append(img)
                gts.append((boxes, classes, valid))
            done += len(imgs)
            dets = self.detect(np.stack(imgs), score_threshold=score_threshold)
            for d, (boxes, classes, valid) in zip(dets, gts):
                for m in range(len(valid)):
                    if not valid[m]:
                        continue
                    total += 1
                    for (c, _s, bb) in d:
                        if (abs(bb[0] - boxes[m][0]) < tol[0]
                                and abs(bb[1] - boxes[m][1]) < tol[1]):
                            loc_hits += 1
                            if c == int(classes[m]):
                                cls_hits += 1
                            break
        return {
            "loc": loc_hits / max(total, 1),
            "loc_class": cls_hits / max(total, 1),
            "boxes": total,
        }


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
