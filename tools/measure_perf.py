#!/usr/bin/env python
"""Measure per-stage device throughput on the attached TPU; prints JSON.

Feeds docs/PERFORMANCE.md.  Run: python tools/measure_perf.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _force_sync(out):
    """Device->host readback of a reduction — through tunneled devices,
    block_until_ready can return at dispatch-ack rather than completion,
    so only a data readback is a trustworthy fence."""
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.asarray(leaves[0]).astype(jnp.float32).sum())


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _force_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force_sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    from playaid_core_tpu.infer.pipeline import BatchedActionPipeline
    from playaid_core_tpu.models.resnet_transformer import ResnetTransformerDetector
    from playaid_core_tpu.ops.pallas_kernels import pallas_square_crop_resize

    results = {"backend": jax.default_backend(), "device": str(jax.devices()[0])}
    batch = 256
    crops = jnp.zeros((batch, 128, 128, 3), jnp.float32)

    for family in ("cnn", "resformer", "rnn"):
        pipe = BatchedActionPipeline(family=family, dtype=jnp.bfloat16)
        v = pipe.init(jax.random.PRNGKey(0))
        dt = timeit(lambda c: pipe.embed_crops(v, c), crops)
        results[f"embed_{family}_crops_per_s"] = round(batch / dt)

    # Pallas fused crop from 720p frames.
    frames = jnp.zeros((64, 720, 1280, 3), jnp.uint8)
    boxes = jnp.tile(jnp.array([[0.5, 0.5, 0.2, 0.3]]), (64, 1))
    dt = timeit(
        lambda f, b: pallas_square_crop_resize(f, b, out_size=128, padding=30), frames,
        boxes,
    )
    results["pallas_crop_720p_crops_per_s"] = round(64 / dt)

    # Fused YUV420->RGB + embed (the VOD pipeline's transfer format).
    pipe_yuv = BatchedActionPipeline(family="cnn", dtype=jnp.bfloat16)
    v_yuv = pipe_yuv.init(jax.random.PRNGKey(0))
    crops_yuv = jnp.zeros((batch, 128 * 128 * 3 // 2), jnp.uint8)
    dt = timeit(lambda c: pipe_yuv.embed_crops_yuv(v_yuv, c), crops_yuv)
    results["embed_cnn_yuv_crops_per_s"] = round(batch / dt)

    # Full monolithic ResFormer forward (window-at-a-time baseline).
    model = ResnetTransformerDetector(num_actions=63, sequence_length=7,
                                      dtype=jnp.bfloat16)
    x = jnp.zeros((16, 7, 128, 128, 3), jnp.float32)
    mv = model.init(jax.random.PRNGKey(0), x)
    apply = jax.jit(lambda v, x: model.apply(v, x))
    dt = timeit(apply, mv, x)
    results["resformer_windows_per_s"] = round(16 / dt)

    # Temporal-head classify over a long embedding sequence.
    pipe = BatchedActionPipeline(family="cnn", dtype=jnp.bfloat16)
    v = pipe.init(jax.random.PRNGKey(0))
    seq = jnp.zeros((4096, 1000), jnp.float32)
    dt = timeit(lambda s: pipe.classify_sequence(v, s)[0], seq)
    results["cnn_head_frames_per_s"] = round(4096 / dt)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
