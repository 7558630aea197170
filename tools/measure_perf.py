#!/usr/bin/env python
"""Measure per-stage device throughput AND MFU on the attached TPU.

For every hot device stage this reports achieved items/s, the XLA
cost-analysis FLOP count of the compiled program, achieved TFLOP/s and
MFU (% of the chip's bf16 peak).  FLOPs come from the compiled
executable's own cost analysis, so they are the program actually run —
no hand-derived per-layer arithmetic.  Feeds docs/PERFORMANCE.md.

Run: python tools/measure_perf.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

try:  # clear tunnel staleness before the first device touch (no-op on CPU)
    from playaid_core_tpu.tpu_warmup import warm_tunnel

    warm_tunnel(log=lambda m: print(m, file=sys.stderr, flush=True))
except Exception:
    pass

import jax
import jax.numpy as jnp


# Dense bf16 peak FLOP/s per chip by TPU generation (public spec sheets).
# Device kind strings as PJRT reports them.
_CHIP_PEAKS = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,        # v5p
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
    "TPU v6e": 918e12,
}


def chip_peak_flops(device=None):
    """bf16 peak FLOP/s for the attached chip (None when unknown, e.g.
    the CPU backend in tests)."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", str(device))
    # Longest matching prefix wins ("TPU v5 lite" before "TPU v5").
    best = None
    for name, peak in _CHIP_PEAKS.items():
        if kind.startswith(name) and (best is None or len(name) > len(best[0])):
            best = (name, peak)
    return best[1] if best else None


def compiled_flops(fn, *args):
    """FLOP count of the compiled program per XLA's own cost analysis.
    Returns None when the backend doesn't expose it."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = ca.get("flops")
        return float(flops) if flops else None
    except Exception:
        return None


def _force_sync(out):
    """Device->host readback of a reduction — through tunneled devices,
    block_until_ready can return at dispatch-ack rather than completion,
    so only a data readback is a trustworthy fence."""
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.asarray(leaves[0]).astype(jnp.float32).sum())


def timeit(fn, *args, iters=20):
    """Best-of-2 timed loops: a tunnel stall mid-loop (observed: one
    ~2.5 s hiccup turning a 3 ms stage into a 2500 ms reading) poisons a
    single mean; the min of two loop means discards it."""
    out = fn(*args)
    _force_sync(out)
    means = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _force_sync(out)
        means.append((time.perf_counter() - t0) / iters)
    return min(means)


def stage_stats(results, key, fn, *args, items=None, iters=20):
    """Time ``fn`` and record items/s + FLOPs + TFLOP/s + MFU under
    ``key`` in ``results``."""
    print(f"[measure] {key}...", file=sys.stderr, flush=True)
    dt = timeit(fn, *args, iters=iters)
    if items:
        results[f"{key}_per_s"] = round(items / dt)
    results[f"{key}_ms"] = round(dt * 1e3, 3)
    flops = compiled_flops(fn, *args)
    if flops:
        results[f"{key}_gflops"] = round(flops / 1e9, 2)
        tps = flops / dt
        results[f"{key}_tflops_per_s"] = round(tps / 1e12, 1)
        peak = chip_peak_flops()
        if peak:
            results[f"{key}_mfu"] = round(tps / peak, 3)
    print(f"[measure] {key}: "
          f"{ {k: v for k, v in results.items() if k.startswith(key)} }",
          file=sys.stderr, flush=True)
    return dt


def main():
    from playaid_core_tpu.infer.pipeline import BatchedActionPipeline
    from playaid_core_tpu.models.resnet_transformer import ResnetTransformerDetector
    from playaid_core_tpu.ops.pallas_kernels import pallas_square_crop_resize

    results = {"backend": jax.default_backend(), "device": str(jax.devices()[0])}
    peak = chip_peak_flops()
    if peak:
        results["chip_bf16_peak_tflops"] = round(peak / 1e12)
    batch = int(os.environ.get("PERF_BATCH", "256"))
    crops = jnp.zeros((batch, 128, 128, 3), jnp.float32)

    for family in ("cnn", "resformer", "rnn"):
        pipe = BatchedActionPipeline(family=family, dtype=jnp.bfloat16)
        v = pipe.init(jax.random.PRNGKey(0))
        stage_stats(results, f"embed_{family}_crops",
                    lambda c, _v=v, _p=pipe: _p.embed_crops(_v, c), crops,
                    items=batch)
        if family == "cnn":
            big = jnp.zeros((1024, 128, 128, 3), jnp.float32)
            stage_stats(results, "embed_cnn_crops_b1024",
                        lambda c, _v=v, _p=pipe: _p.embed_crops(_v, c), big,
                        items=1024, iters=8)

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
    stage_stats(results, "embed_cnn_yuv_crops",
                lambda c: pipe_yuv.embed_crops_yuv(v_yuv, c), crops_yuv,
                items=batch)

    # Full monolithic ResFormer forward (window-at-a-time baseline).
    model = ResnetTransformerDetector(num_actions=63, sequence_length=7,
                                      dtype=jnp.bfloat16)
    x = jnp.zeros((16, 7, 128, 128, 3), jnp.float32)
    mv = model.init(jax.random.PRNGKey(0), x)
    rf_apply = jax.jit(lambda v_, x_: model.apply(v_, x_))
    stage_stats(results, "resformer_windows", rf_apply, mv, x, items=16)

    # Temporal-head classify over a long embedding sequence.
    pipe = BatchedActionPipeline(family="cnn", dtype=jnp.bfloat16)
    v = pipe.init(jax.random.PRNGKey(0))
    seq = jnp.zeros((4096, 1000), jnp.float32)
    dt = timeit(lambda s: pipe.classify_sequence(v, s)[0], seq)
    results["cnn_head_frames_per_s"] = round(4096 / dt)

    # Flagship ResFormer train step (fwd+bwd+adam): the capstone batch
    # (16) and the saturating batch (128).  MFU methodology: XLA's
    # cost_analysis undercounts gradient programs (measured train-step
    # "flops" ~= the forward count alone), so train FLOPs use the
    # standard 3x-forward accounting against the monolithic model's
    # compiled forward FLOPs at the same shape.
    if os.environ.get("PERF_TRAIN", "1") == "1":
        from playaid_core_tpu.train.train import (
            create_train_state, make_train_step, build_model,
        )

        tt = 7
        tmodel, tloss = build_model("resformer", 47, tt, jnp.bfloat16)
        tstep = make_train_step(tmodel, tloss)
        rng = jax.random.PRNGKey(1)
        for tb in (16, 128):
            tstate = create_train_state(
                tmodel, jax.random.PRNGKey(0),
                jnp.zeros((1, tt, 128, 128, 3), jnp.float32), 3e-4,
            )
            tframes = jnp.zeros((tb, tt, 128, 128, 3), jnp.uint8)
            tlabels = jnp.zeros((tb, tt), jnp.int32)

            def train_fn(state, frames, labels):
                return tstep(state, frames, labels, rng)

            key = f"train_resformer_b{tb}"
            print(f"[measure] {key}...", file=sys.stderr, flush=True)
            dt = timeit(lambda s: train_fn(s, tframes, tlabels)[1], tstate,
                        iters=10)
            results[f"{key}_steps_per_s"] = round(1 / dt, 2)
            results[f"{key}_crops_per_s"] = round(tb * tt / dt)
            fwd_flops = compiled_flops(
                lambda v_, x_: tmodel.apply(v_, x_, train=False),
                {"params": tstate.params, "batch_stats": tstate.batch_stats},
                jnp.zeros((tb, tt, 128, 128, 3), jnp.float32),
            )
            if fwd_flops:
                flops = 3.0 * fwd_flops
                results[f"{key}_gflops_3xfwd"] = round(flops / 1e9, 2)
                results[f"{key}_tflops_per_s"] = round(flops / dt / 1e12, 1)
                if peak:
                    results[f"{key}_mfu"] = round(flops / dt / peak, 3)
            print(f"[measure] {key}: "
                  f"{ {k: v for k, v in results.items() if k.startswith(key)} }",
                  file=sys.stderr, flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
