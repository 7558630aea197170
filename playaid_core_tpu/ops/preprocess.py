"""Device-side batched frame preprocessing.

Replaces the reference's per-crop host loop — cv2 imread/cvtColor +
imutils aspect resize + PIL letterbox, one crop at a time
(reference: ai_runner.py:443-464, fighter.py:323-381) — with a single
fused device op over a whole batch of frames:

    frames [N, H, W, 3] uint8  +  boxes [N, 4] normalized yolo
        -> crops [N, S, S, 3] float, letterboxed square, /255-normalized,
           optional BGR->RGB flip.

The resample is expressed as two small matmuls per crop (separable
bilinear interpolation as weight matrices), which is the MXU-native way to
write a dynamic-window resize: no gathers, no data-dependent shapes.  Out
of-image regions contribute zero weight -> black letterbox.

Known deviations from the reference's host path (fighter.py:336-381):
content at the frame edge stays at its true geometric offset with black
where the frame ends, whereas ImageOps.pad re-centered the clipped region
(shifting edge-clipped fighters by up to side/4); and interpolation is
bilinear, not imutils/cv2 INTER_AREA.  Interior crops agree to
interpolation tolerance (tested).

Two implementations with identical numerics:
* :func:`batched_square_crop_resize` — pure jax.numpy (vmapped), runs
  anywhere, used as the reference implementation and CPU fallback;
* :func:`pallas_square_crop_resize` (ops/pallas_kernels.py) — explicit
  Pallas kernel that DMAs each crop window HBM->VMEM and runs the two
  resample matmuls on-chip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def square_window_params(boxes, frame_h, frame_w, padding=0):
    """Normalized yolo boxes -> square source windows.

    boxes: [N, 4] (center_x, center_y, w, h) in [0, 1].
    Returns (y0, x0, side): float32 top-left corner and side length in
    pixels of the square (possibly out-of-bounds) source window, matching
    YoloCrop.square_crop's geometry: side = max(w_px, h_px) + 2*padding,
    centered on the integer center pixel.
    """
    cx = jnp.floor(boxes[:, 0] * frame_w)
    cy = jnp.floor(boxes[:, 1] * frame_h)
    w_px = jnp.floor(boxes[:, 2] * frame_w)
    h_px = jnp.floor(boxes[:, 3] * frame_h)
    square_dim = jnp.maximum(w_px, h_px)
    half = jnp.floor(square_dim / 2)
    side = 2 * (half + padding)
    y0 = cy - half - padding
    x0 = cx - half - padding
    return y0.astype(jnp.float32), x0.astype(jnp.float32), side.astype(jnp.float32)


def _axis_weights(origin, side, src_len, out_size):
    """Bilinear interpolation weights for one axis.

    Maps output pixel i to source coordinate
        src = origin + (i + 0.5) * side / out_size - 0.5
    and returns a dense [out_size, src_len] weight matrix with two
    non-zeros per row; rows whose source coordinate falls outside
    [0, src_len) get zero weight (black letterbox).
    """
    i = jnp.arange(out_size, dtype=jnp.float32)
    src = origin + (i + 0.5) * side / out_size - 0.5
    lo = jnp.floor(src)
    frac = src - lo
    k = jnp.arange(src_len, dtype=jnp.float32)
    # weight[i, k] = (1-frac) if k == lo else frac if k == lo+1 else 0
    w_lo = jnp.where(k[None, :] == lo[:, None], 1.0 - frac[:, None], 0.0)
    w_hi = jnp.where(k[None, :] == lo[:, None] + 1.0, frac[:, None], 0.0)
    w = w_lo + w_hi
    valid = (src >= 0.0) & (src <= src_len - 1.0)
    # Clamp-to-edge inside the frame, black outside: rows at the very edge
    # (src between -1 and 0 or len-1 and len) still blend toward black via
    # the missing neighbor weight, matching a zero-padded source.
    outside = (src < -1.0) | (src > src_len)
    w = jnp.where(outside[:, None], 0.0, w)
    del valid
    return w


def _crop_one(frame_f32, y0, x0, side, out_size):
    """Resample one [H, W, 3] frame's window to [S, S, 3] via two matmuls.

    Channel-first internally: with channels (3) as a batch dim, the matmul
    lane dimensions are W and S — MXU-tileable — instead of the 3-wide
    channel axis.
    """
    h, w = frame_f32.shape[0], frame_f32.shape[1]
    wy = _axis_weights(y0, side, h, out_size)  # [S, H]
    wx = _axis_weights(x0, side, w, out_size)  # [S, W]
    chw = jnp.transpose(frame_f32, (2, 0, 1))  # [C, H, W]
    # [S, H] x [C, H, W] -> [C, S, W]
    tmp = jnp.einsum("sh,chw->csw", wy, chw, preferred_element_type=jnp.float32)
    # [C, S, W] x [T, W] -> [C, S, T]
    out = jnp.einsum("csw,tw->cst", tmp, wx, preferred_element_type=jnp.float32)
    return jnp.transpose(out, (1, 2, 0))


@partial(jax.jit, static_argnames=("out_size", "padding", "bgr_to_rgb", "normalize"))
def batched_square_crop_resize(
    frames,
    boxes,
    out_size: int = 128,
    padding: int = 0,
    bgr_to_rgb: bool = False,
    normalize: bool = True,
):
    """Fused crop + square letterbox + resize + colorspace + normalize.

    frames: [N, H, W, 3] uint8 (or float), boxes: [N, 4] normalized yolo.
    Returns [N, out_size, out_size, 3] float32 in [0, 1] (if normalize).
    """
    n, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    y0, x0, side = square_window_params(boxes, h, w, padding)
    side = jnp.maximum(side, 1.0)
    frames_f = frames.astype(jnp.float32)
    if bgr_to_rgb:
        frames_f = frames_f[..., ::-1]
    out = jax.vmap(_crop_one, in_axes=(0, 0, 0, 0, None))(frames_f, y0, x0, side, out_size)
    if normalize:
        out = out / 255.0
    return out


@partial(jax.jit, static_argnames=("out_size", "padding", "bgr_to_rgb", "normalize"))
def batched_crop_resize_shared_frame(
    frame,
    boxes,
    out_size: int = 128,
    padding: int = 0,
    bgr_to_rgb: bool = False,
    normalize: bool = True,
):
    """Multiple crops out of ONE frame (the two-fighters-per-frame case).

    frame: [H, W, 3], boxes: [M, 4] -> [M, S, S, 3].
    """
    h, w = frame.shape[0], frame.shape[1]
    y0, x0, side = square_window_params(boxes, h, w, padding)
    side = jnp.maximum(side, 1.0)
    frame_f = frame.astype(jnp.float32)
    if bgr_to_rgb:
        frame_f = frame_f[..., ::-1]
    out = jax.vmap(_crop_one, in_axes=(None, 0, 0, 0, None))(frame_f, y0, x0, side, out_size)
    if normalize:
        out = out / 255.0
    return out


@partial(jax.jit, static_argnames=("out_size", "normalize"))
def batched_window_resize(windows, y0, x0, side, out_size: int = 128, normalize: bool = True):
    """Resample pre-extracted source windows to square outputs.

    The host-side VOD pipeline extracts fixed-size uint8 windows around
    each crop (cheap memcpy; ~7x less host->device traffic than raw
    frames); this op maps output pixels back through the window-relative
    origin (y0, x0) and side length — the same separable-matmul bilinear
    resample as :func:`batched_square_crop_resize`, minus the cropping.

    windows: [B, W, W, 3] uint8 (black where out-of-frame),
    y0/x0/side: [B] float window-relative crop geometry.
    """
    out = jax.vmap(_crop_one, in_axes=(0, 0, 0, 0, None))(
        windows.astype(jnp.float32), y0, x0, jnp.maximum(side, 1.0), out_size
    )
    if normalize:
        out = out / 255.0
    return out


def middle_out_frame_indices(middle_frame, num_frames_per_sample, frame_delta, max_frames,
                             min_frame=0):
    """Vectorized middle-out window sampler.

    Reproduces the reference's quadratic spacing with edge clamping exactly
    (reference: dataset_utils.py:109-138): offsets are
    delta * (mid - i)^2, clamped to [min_frame, max_frames-1].

    middle_frame: scalar or [B] array.  Returns [..., T] int32 indices.
    """
    middle_frame = jnp.asarray(middle_frame)
    t = num_frames_per_sample
    mid = t // 2
    i = jnp.arange(t)
    offset = jnp.abs(frame_delta * (mid - i) ** 2)
    below = jnp.maximum(min_frame, middle_frame[..., None] - offset)
    above = jnp.minimum(max_frames - 1, middle_frame[..., None] + offset)
    # The reference's float comparison routes i == mid (offset 0) through the
    # "below" branch, so the center frame is also clamped to min_frame
    # (reference: dataset_utils.py:125-128).
    idx = jnp.where(i <= mid, below, above)
    return idx.astype(jnp.int32)
