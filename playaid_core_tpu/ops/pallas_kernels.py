"""Pallas TPU kernels for the preprocessing front-end.

``pallas_square_crop_resize`` is the on-chip version of
:func:`playaid_core_tpu.ops.preprocess.batched_square_crop_resize`: for
each (crop, channel) grid cell it DMAs a fixed-size source window from the
frame plane in HBM into VMEM, builds the two separable bilinear weight
matrices from iota (no gathers), and resamples with two MXU matmuls:

    out[SxS] = Wy[SxK] @ window[KxK] @ Wx^T[KxS]

Out-of-image source coordinates get zero weight, which produces the black
letterbox of the reference's ImageOps.pad path (reference:
fighter.py:346-373) for free.

The window size K is static (must cover the largest crop); window DMA
starts are clamped to the frame so the transfer is always in-bounds, and
the weight matrices are expressed in absolute frame coordinates so
clamping never shifts content.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from playaid_core_tpu.ops.preprocess import square_window_params


def _axis_weight_matrix(origin_abs, window_start, side, frame_len, out_size, max_win):
    """[out_size, max_win] bilinear weights in window coordinates.

    origin_abs: float start of the (possibly out-of-bounds) source window.
    window_start: int row/col where the DMA'd window begins in the frame.
    """
    # Mosaic iota must be integer-typed; cast to f32 afterwards.
    i = jax.lax.broadcasted_iota(jnp.int32, (out_size, max_win), 0).astype(jnp.float32)
    k = jax.lax.broadcasted_iota(jnp.int32, (out_size, max_win), 1).astype(jnp.float32)
    src_abs = origin_abs + (i + 0.5) * side / out_size - 0.5
    lo = jnp.floor(src_abs)
    frac = src_abs - lo
    k_abs = k + window_start
    w = jnp.where(k_abs == lo, 1.0 - frac, 0.0) + jnp.where(k_abs == lo + 1.0, frac, 0.0)
    outside = (src_abs < -1.0) | (src_abs > frame_len)
    return jnp.where(outside, 0.0, w)


def _crop_kernel(params_ref, starts_ref, planes_ref, out_ref, win_ref, sem,
                 *, out_size, win_h, win_w, frame_h, frame_w, normalize):
    n = pl.program_id(0)
    c = pl.program_id(1)

    y0 = params_ref[n, 0]
    x0 = params_ref[n, 1]
    side = params_ref[n, 2]
    # Window starts are pre-aligned to the uint8 tile grid (32 sublanes x
    # 128 lanes) by the host wrapper; the hints let Mosaic prove the DMA
    # slice is tile-aligned.
    ys = pl.multiple_of(starts_ref[n, 0], 32)
    xs = pl.multiple_of(starts_ref[n, 1], 128)

    dma = pltpu.make_async_copy(
        planes_ref.at[n, c, pl.ds(ys, win_h), pl.ds(xs, win_w)],
        win_ref,
        sem,
    )
    dma.start()

    wy = _axis_weight_matrix(y0, ys, side, frame_h, out_size, win_h)
    wx = _axis_weight_matrix(x0, xs, side, frame_w, out_size, win_w)

    dma.wait()
    # Mosaic can't lower uint8 -> f32 directly; hop through int32.
    window = win_ref[:]
    if window.dtype == jnp.uint8:
        window = window.astype(jnp.int32)
    window = window.astype(jnp.float32)

    tmp = jnp.dot(wy, window, preferred_element_type=jnp.float32)  # [S, K]
    out = jax.lax.dot_general(
        tmp, wx, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [S, S]
    if normalize:
        out = out * (1.0 / 255.0)
    out_ref[0, 0] = out


@partial(
    jax.jit,
    static_argnames=("out_size", "padding", "win_h", "win_w", "bgr_to_rgb",
                     "normalize", "interpret"),
)
def pallas_square_crop_resize(
    frames,
    boxes,
    out_size: int = 128,
    padding: int = 0,
    win_h: int = 384,
    win_w: int = 512,
    bgr_to_rgb: bool = False,
    normalize: bool = True,
    interpret: bool = False,
):
    """Pallas-fused batched crop/letterbox/resize/normalize.

    frames: [N, H, W, 3] uint8; boxes: [N, 4] normalized yolo boxes.

    Window sizing: DMA starts are aligned down to the uint8 tile grid
    (32 sublanes x 128 lanes), so the static window must cover the largest
    crop plus slack and fit in the (alignment-padded) frame:
        side_max + 34  <= win_h <= H + 32
        side_max + 130 <= win_w <= W + 128
    The defaults (384 x 512) cover fighter crops up to ~350 px on 720p+
    frames; use (512, 640) for 1080p crops up to ~470 px.
    Returns [N, out_size, out_size, 3] float32.
    """
    n, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    y0, x0, side = square_window_params(boxes, h, w, padding)
    side = jnp.maximum(side, 1.0)
    params = jnp.stack([y0, x0, side], axis=1)  # [N, 3] f32

    # Zero-pad the planes by one alignment unit so a tile-aligned window
    # start can always cover the bottom/right frame edge (without padding,
    # clamping to h - win_h and aligning down leaves the last
    # (h - win_h) % 32 rows unreachable -> silently black crops there).
    # The weight matrices mask by absolute frame coordinates, so the
    # zero padding is never sampled as real content.
    h_pad, w_pad = h + 32, w + 128

    # Align window starts DOWN to the uint8 tile grid (32 x 128) so the
    # HBM DMA slice is provably tile-aligned; the weight matrices are in
    # absolute coordinates, so extra leading slack never shifts content.
    # The window must therefore cover side + alignment slack (+2 for the
    # bilinear high neighbor).
    ys = jnp.clip(jnp.floor(y0), 0, max(h_pad - win_h, 0)).astype(jnp.int32)
    xs = jnp.clip(jnp.floor(x0), 0, max(w_pad - win_w, 0)).astype(jnp.int32)
    ys = (ys // 32) * 32
    xs = (xs // 128) * 128
    starts = jnp.stack([ys, xs], axis=1)  # [N, 2] i32

    planes = jnp.transpose(frames, (0, 3, 1, 2))  # [N, 3, H, W]
    if bgr_to_rgb:
        planes = planes[:, ::-1]
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, h_pad - h), (0, w_pad - w)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n, 3),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 1, out_size, out_size), lambda i, j, *_: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((win_h, win_w), frames.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )

    out = pl.pallas_call(
        partial(
            _crop_kernel,
            out_size=out_size,
            win_h=win_h,
            win_w=win_w,
            frame_h=h,
            frame_w=w,
            normalize=normalize,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 3, out_size, out_size), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * 3 * (out_size * win_h * win_w + out_size * out_size * win_w),
            bytes_accessed=n * 3 * (win_h * win_w + out_size * out_size * 4),
            transcendentals=0,
        ),
    )(params, starts, planes)

    return jnp.transpose(out, (0, 2, 3, 1))  # NHWC
