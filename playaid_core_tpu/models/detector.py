"""Character detector: CenterNet-style keypoint detection in Flax.

The reference shells out to an external YOLOv5 checkout for character
detection (reference: ai_runner.py:191-224, constants.py:6).  This module
makes the pixels-only path self-contained with a TPU-first detector:

* ResNet-18 trunk (stride 32) + three transpose-conv upsampling stages to
  stride 4;
* three heads on the shared feature map: class heatmap (sigmoid focal
  loss on Gaussian-splatted centers), box size (L1 at centers), and
  sub-pixel center offset (L1 at centers) — the CenterNet formulation
  ("Objects as Points"), which decodes without anchors or NMS machinery:
  peak extraction is a 3x3 max-pool equality test, entirely on device;
* static shapes throughout: top-k over the flattened heatmap, fixed
  max detections.

Training data comes from the synthetic composite generator
(datagen/gen_synth_char_detection.py) and/or the log-projected
ground-truth generator (datagen/gen_gt_char_detection.py).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from playaid_core_tpu.models.resnet import make_resnet


class ResNetTrunk(nn.Module):
    """ResNet-18 feature extractor without pooling/head: returns the
    stride-32 feature map (shares the ResNet implementation so backbone
    fixes apply everywhere)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return make_resnet(
            "resnet18", num_classes=0, dtype=self.dtype, return_feature_map=True,
            name="resnet",
        )(x, train=train)


class CenterNetDetector(nn.Module):
    num_classes: int
    head_channels: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        """images [B, H, W, 3] float -> dict of stride-4 maps:
        heatmap [B, H/4, W/4, C] (logits), size [B, H/4, W/4, 2] (w, h in
        output cells), offset [B, H/4, W/4, 2]."""
        norm = partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )
        feats = ResNetTrunk(dtype=self.dtype, name="trunk")(images, train=train)
        # Upsample stride 32 -> 4 with three transpose convs.
        x = feats
        for i, ch in enumerate((256, 128, self.head_channels)):
            x = nn.ConvTranspose(ch, (4, 4), strides=(2, 2), dtype=self.dtype,
                                 name=f"up_{i}")(x)
            x = norm(name=f"up_bn_{i}")(x)
            x = nn.relu(x)

        def head(name, out_ch, bias_init=0.0):
            y = nn.Conv(self.head_channels, (3, 3), dtype=self.dtype,
                        name=f"{name}_conv")(x)
            y = nn.relu(y)
            return nn.Conv(
                out_ch, (1, 1), dtype=self.dtype, name=f"{name}_out",
                bias_init=nn.initializers.constant(bias_init),
            )(y)

        return {
            # Heatmap bias prior ~ -2.19 => initial sigmoid ~ 0.1.
            "heatmap": head("heatmap", self.num_classes, bias_init=-2.19).astype(
                jnp.float32
            ),
            "size": head("size", 2).astype(jnp.float32),
            "offset": head("offset", 2).astype(jnp.float32),
        }


# ---------------------------------------------------------------------------
# Targets and losses
# ---------------------------------------------------------------------------

def gaussian_radius(height, width, min_overlap=0.7):
    """CenterNet's minimum Gaussian radius such that corner-shifted boxes
    keep IoU >= min_overlap."""
    a1 = 1
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 - np.sqrt(max(b1**2 - 4 * a1 * c1, 0))) / 2

    a2 = 4
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    r2 = (b2 - np.sqrt(max(b2**2 - 4 * a2 * c2, 0))) / 2

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    r3 = (b3 + np.sqrt(max(b3**2 - 4 * a3 * c3, 0))) / 2
    return max(1.0, min(r1, r2, r3))


def build_targets(boxes, classes, valid, out_h, out_w, num_classes):
    """Host-side target splatting for one image.

    boxes: [M, 4] normalized yolo (cx, cy, w, h); classes: [M]; valid [M].
    Returns (heatmap [out_h, out_w, C], size [out_h, out_w, 2],
    offset [out_h, out_w, 2], mask [out_h, out_w]).

    Gaussians are splatted only inside a (6*sigma)-radius window around
    each center (CenterNet's formulation) — a whole-grid exp per box would
    dominate the host data path.
    """
    heat = np.zeros((out_h, out_w, num_classes), np.float32)
    size = np.zeros((out_h, out_w, 2), np.float32)
    offset = np.zeros((out_h, out_w, 2), np.float32)
    mask = np.zeros((out_h, out_w), np.float32)

    for m in range(boxes.shape[0]):
        if not valid[m]:
            continue
        cx, cy, w, h = boxes[m]
        cxs, cys = cx * out_w, cy * out_h
        ws, hs = w * out_w, h * out_h
        ci, cj = int(cys), int(cxs)
        if not (0 <= ci < out_h and 0 <= cj < out_w):
            continue
        radius = gaussian_radius(hs, ws)
        sigma = radius / 3.0
        r = max(int(np.ceil(3 * radius)), 1)
        y0, y1 = max(ci - r, 0), min(ci + r + 1, out_h)
        x0, x1 = max(cj - r, 0), min(cj + r + 1, out_w)
        ys, xs = np.ogrid[y0:y1, x0:x1]
        g = np.exp(-(((ys - ci) ** 2) + ((xs - cj) ** 2)) / (2 * sigma**2))
        c = int(classes[m])
        heat[y0:y1, x0:x1, c] = np.maximum(heat[y0:y1, x0:x1, c], g)
        size[ci, cj] = (ws, hs)
        offset[ci, cj] = (cxs - cj, cys - ci)
        mask[ci, cj] = 1.0
    return heat, size, offset, mask


def focal_loss(pred_logits, gt_heat, alpha=2.0, beta=4.0):
    """CenterNet penalty-reduced pixel-wise focal loss."""
    pred = jax.nn.sigmoid(pred_logits)
    pred = jnp.clip(pred, 1e-6, 1 - 1e-6)
    pos = (gt_heat >= 0.999).astype(jnp.float32)
    neg = 1.0 - pos
    pos_loss = -pos * ((1 - pred) ** alpha) * jnp.log(pred)
    neg_loss = -neg * ((1 - gt_heat) ** beta) * (pred**alpha) * jnp.log(1 - pred)
    num_pos = jnp.maximum(pos.sum(), 1.0)
    return (pos_loss.sum() + neg_loss.sum()) / num_pos


def reg_l1_loss(pred, gt, mask):
    """L1 at annotated centers only."""
    m = mask[..., None]
    num = jnp.maximum(mask.sum(), 1.0)
    return (jnp.abs(pred - gt) * m).sum() / num


def detector_loss(outputs, targets, size_weight=0.1, offset_weight=1.0):
    heat, size, offset, mask = targets
    loss_h = focal_loss(outputs["heatmap"], heat)
    loss_s = reg_l1_loss(outputs["size"], size, mask)
    loss_o = reg_l1_loss(outputs["offset"], offset, mask)
    total = loss_h + size_weight * loss_s + offset_weight * loss_o
    return total, {"heatmap": loss_h, "size": loss_s, "offset": loss_o}


# ---------------------------------------------------------------------------
# Decoding
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_det",))
def decode_detections(outputs, max_det=8, class_mask=None):
    """Peak extraction: 3x3 max-pool NMS + top-k, fully on device.

    ``class_mask`` ([C] of 0/1) restricts decoding to the allowed class
    channels *before* peak extraction — the semantics of the reference's
    YOLO ``classes={2,3}`` match-known-fighters filter
    (reference: ai_runner.py:201).  Masking before the top-k matters: a
    location whose unrestricted argmax falls on a disallowed class is
    re-attributed to its best allowed class instead of being dropped.

    Returns (boxes [B, K, 4] normalized yolo, scores [B, K],
    classes [B, K]).
    """
    heat = jax.nn.sigmoid(outputs["heatmap"])  # [B, H, W, C]
    if class_mask is not None:
        heat = heat * class_mask.astype(heat.dtype)[None, None, None, :]
    b, h, w, c = heat.shape
    pooled = nn.max_pool(heat, (3, 3), strides=(1, 1), padding="SAME")
    peaks = jnp.where(jnp.abs(pooled - heat) < 1e-6, heat, 0.0)

    flat = peaks.reshape(b, h * w * c)
    scores, idx = jax.lax.top_k(flat, max_det)
    cls = idx % c
    cell = idx // c
    cy = cell // w
    cx = cell % w

    off = outputs["offset"].reshape(b, h * w, 2)
    sz = outputs["size"].reshape(b, h * w, 2)
    g_off = jnp.take_along_axis(off, cell[..., None], axis=1)
    g_sz = jnp.take_along_axis(sz, cell[..., None], axis=1)

    center_x = (cx.astype(jnp.float32) + g_off[..., 0]) / w
    center_y = (cy.astype(jnp.float32) + g_off[..., 1]) / h
    bw = g_sz[..., 0] / w
    bh = g_sz[..., 1] / h
    boxes = jnp.stack([center_x, center_y, bw, bh], axis=-1)
    return boxes, scores, cls
