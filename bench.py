#!/usr/bin/env python
"""Headline benchmark: 1080p60 VOD analysis throughput on one chip.

Measures the full AI-path pipeline on synthetic 1080p video through
playaid_core_tpu.infer.vod_pipeline.VodAnalyzer:
  bounded parallel host decode + per-frame window extraction
  -> device separable-matmul resize/normalize (2 fighters/frame)
  -> ResNet-18 embedding (embed-once, bf16, large batches)
  -> middle-out window gather over embeddings
  -> CNN temporal head -> per-frame action labels for both fighters.

Baseline: the target from BASELINE.md — 20x real-time 1080p60 analysis
(1200 frames/sec).  vs_baseline = achieved_fps / 1200.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

# Persistent compile cache: remote AOT compiles through the TPU tunnel cost
# ~10-25s per program, so cache them across runs.  Must be set before jax
# imports.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_test_video(path, num_frames, width=1920, height=1080, fps=60):
    import cv2

    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (width, height))
    rng = np.random.default_rng(0)
    base = rng.integers(0, 60, (height, width, 3), dtype=np.uint8)
    for i in range(num_frames):
        frame = base.copy()
        x = int((0.2 + 0.6 * (i / num_frames)) * width)
        cv2.circle(frame, (x, height // 2), 90, (0, 200, 255), -1)
        cv2.circle(frame, (width - x, height // 2 + 60), 90, (255, 80, 0), -1)
        cv2.putText(frame, f"{i}", (40, 80), 0, 2.0, (255, 255, 255), 3)
        writer.write(frame)
    writer.release()


def fighter_boxes(num_frames, width=1920, height=1080, box_px=260):
    boxes = np.zeros((num_frames, 2, 4), np.float32)
    for i in range(num_frames):
        x = 0.2 + 0.6 * (i / num_frames)
        boxes[i, 0] = (x, 0.5, box_px / width, box_px / height)
        boxes[i, 1] = (1.0 - x, 0.5 + 60 / 1080, box_px / width, box_px / height)
    return boxes


def main():
    num_frames = int(os.environ.get("BENCH_FRAMES", "600"))
    chunk = int(os.environ.get("BENCH_CHUNK", "48"))

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from playaid_core_tpu.infer.pipeline import BatchedActionPipeline
    from playaid_core_tpu.infer.vod_pipeline import VodAnalyzer

    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}, host cores: {os.cpu_count()}")

    video_path = os.path.join(tempfile.gettempdir(), f"bench_1080p_{num_frames}.mp4")
    if not os.path.exists(video_path):
        log("generating synthetic 1080p60 VOD...")
        make_test_video(video_path, num_frames)

    boxes = fighter_boxes(num_frames)
    dtype = jnp.bfloat16 if backend == "tpu" else jnp.float32
    pipe = BatchedActionPipeline(
        family="cnn", num_actions=63, sequence_length=7, frame_delta=3, dtype=dtype
    )
    analyzer = VodAnalyzer(pipe, window=384, padding=30, chunk=chunk, host_resize=True)
    analyzer.ensure_variables()

    # Warm up compiles outside the timed region (full length so every
    # program shape the timed run needs is already compiled).
    log("warming up (compile)...")
    warm = analyzer.analyze(video_path, boxes)
    log(f"warm-up fps: {warm['fps']:.1f}")

    log("running timed pipeline (best of 2)...")
    results = [analyzer.analyze(video_path, boxes) for _ in range(2)]
    result = max(results, key=lambda r: r["fps"])
    fps = result["fps"]
    log(f"frames: {result['frames']}, elapsed: {result['seconds']:.2f}s, "
        f"fps: {fps:.1f}, realtime-x: {fps / 60:.2f} "
        f"(runs: {[round(r['fps'], 1) for r in results]})")

    baseline_fps = 1200.0  # 20x real-time 1080p60 (BASELINE.md target)
    print(json.dumps({
        "metric": "1080p60 frames/sec/chip (decode+preprocess+2-fighter action detect)",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
