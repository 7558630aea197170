"""Pallas fused ResNet tail block — the granularity-wall experiment.

PERFORMANCE.md's roofline analysis found the 128px ResNet embed pinned at
~35-45% MFU by KERNEL GRANULARITY, not compute or HBM peak: the deep tail
stages decompose into many small convolutions (4x4x512 spatial extents)
whose per-kernel work can't fill the MXU between launches.  The round-4
experiments only re-parametrized things XLA already handles (space-to-
depth stem, bf16 feeds) and measured neutral; the round-5 verdict asked
for a REAL fused-kernel attempt at the tail.

This kernel fuses one identity BasicBlock at the 4x4x512 stage —
conv3x3 + folded-BN + ReLU + conv3x3 + folded-BN + residual add + ReLU —
into a single Pallas program:

* the whole block's weights (2 x 9 x 512 x 512 bf16 ~ 9.4 MB) are held
  in VMEM across the batch tile loop — no per-conv HBM re-reads and no
  launch gaps between the seven fused ops;
* each 3x3 tap is one MXU matmul [TB*16, 512] x [512, 512] over the
  statically shifted (zero-padded) activation tile, accumulated in f32;
* batch is the only grid dimension (TB samples per program), so the
  matmul rows are TB*16 — MXU-aligned at TB >= 8.

BN is inference-folded (scale = gamma / sqrt(var + eps), bias = beta -
mean * scale), matching how the embed pipeline runs BN at inference.

Measured against the identical XLA-compiled computation by
tools/measure_pallas_block.py; the verdict's table lives in
PERFORMANCE.md.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _block_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                  out_ref):
    """One batch tile: fused conv-bn-relu-conv-bn-add-relu at 4x4x512."""
    x = x_ref[:]  # [TB, 4, 4, C] bf16
    tb = x.shape[0]
    c = x.shape[3]

    def conv9(inp, w_ref):
        """3x3 same-padding conv as 9 shifted matmuls, f32 accumulation.

        inp: [TB, 4, 4, C]; w_ref: [9, C, C] (tap-major).  Static shifts:
        pad to 6x6 once, slice per tap — no gathers, no dynamic shapes.
        """
        padded = jnp.pad(inp, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((tb * 16, c), jnp.float32)
        for tap in range(9):
            dy, dx = tap // 3, tap % 3
            shifted = padded[:, dy : dy + 4, dx : dx + 4, :]
            acc = acc + jnp.dot(
                shifted.reshape(tb * 16, c), w_ref[tap],
                preferred_element_type=jnp.float32,
            )
        return acc  # [TB*16, C] f32

    y = conv9(x, w1_ref)
    y = jnp.maximum(y * s1_ref[:] + b1_ref[:], 0.0)
    y = conv9(y.reshape(tb, 4, 4, c).astype(x.dtype), w2_ref)
    y = y * s2_ref[:] + b2_ref[:]
    y = y + x.reshape(tb * 16, c).astype(jnp.float32)
    out_ref[:] = jnp.maximum(y, 0.0).reshape(tb, 4, 4, c).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("tile_b", "interpret"))
def pallas_residual_block(x, w1, s1, b1, w2, s2, b2, tile_b: int = 64,
                          interpret: bool = False):
    """Fused identity BasicBlock at spatial 4x4.

    x: [B, 4, 4, C] (bf16 recommended); w1/w2: [3, 3, C, C]; s/b: [C]
    folded-BN scale/bias (f32).  B must divide by tile_b.
    """
    b_total, h, w, c = x.shape
    assert (h, w) == (4, 4), "kernel is specialized to the 4x4 tail stage"
    assert b_total % tile_b == 0, (b_total, tile_b)
    w1_t = w1.reshape(9, c, c).astype(x.dtype)
    w2_t = w2.reshape(9, c, c).astype(x.dtype)
    grid = (b_total // tile_b,)
    return pl.pallas_call(
        _block_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, 4, 4, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, c, c), lambda i: (0, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((9, c, c), lambda i: (0, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((tile_b, 4, 4, c), lambda i: (i, 0, 0, 0)),
        interpret=interpret,
    )(x, w1_t, s1, b1, w2_t, s2, b2)


def xla_residual_block(x, w1, s1, b1, w2, s2, b2):
    """The identical computation, left to XLA (the baseline)."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w1.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = jnp.maximum(y * s1 + b1, 0.0)
    y = jax.lax.conv_general_dilated(
        y.astype(x.dtype).astype(jnp.float32), w2.astype(jnp.float32),
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y * s2 + b2
    return jnp.maximum(y + x.astype(jnp.float32), 0.0).astype(x.dtype)
