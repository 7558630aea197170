#!/usr/bin/env python
"""Decompose the e2e-vs-decode-ceiling gap into CPU costs.

On a 1-core host, overlap hides network WAIT but not CPU: every
millisecond of transfer serialization or dispatch CPU is a millisecond
stolen from the decoder.  This tool measures, via process CPU time
(immune to ambient tunnel load):

  1. decode-only          — the ceiling's CPU cost per frame
  2. device_put only      — serialization CPU per chunk (pre-decoded data)
  3. dispatch only        — embed+scatter dispatch CPU per chunk
  4. full pipeline        — e2e CPU per frame (sum check)

Run: python tools/profile_transfer.py
"""

import os
import statistics
import sys
import tempfile
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timed(fn, *a, **kw):
    c0, w0 = time.process_time(), time.perf_counter()
    out = fn(*a, **kw)
    return out, time.process_time() - c0, time.perf_counter() - w0


def main():
    from bench import make_test_video, fighter_boxes
    from playaid_core_tpu.tpu_warmup import warm_tunnel

    try:
        warm_tunnel(log=log)
    except RuntimeError as e:
        log(f"tunnel warm-up failed ({e})")

    import jax
    import jax.numpy as jnp

    from playaid_core_tpu.infer.pipeline import BatchedActionPipeline
    from playaid_core_tpu.infer.vod_pipeline import VodAnalyzer
    from playaid_core_tpu.video.native_decoder import NativeVideoDecoder
    from playaid_core_tpu.video import native_encoder

    num_frames = int(os.environ.get("BENCH_FRAMES", "600"))
    chunk = int(os.environ.get("BENCH_CHUNK", "48"))
    stride = 2

    video_path = os.path.join(tempfile.gettempdir(), f"bench_1080p_{num_frames}.mp4")
    if not os.path.exists(video_path):
        make_test_video(video_path, num_frames)
    h264_path = video_path.replace(".mp4", "_h264.mp4")
    if not os.path.exists(h264_path):
        native_encoder.transcode(video_path, h264_path, crf=20)
    boxes = fighter_boxes(num_frames)

    backend = jax.default_backend()
    dtype = jnp.bfloat16 if backend == "tpu" else jnp.float32
    pipe = BatchedActionPipeline(family="cnn", num_actions=63, sequence_length=7,
                                 frame_delta=3, dtype=dtype)
    analyzer = VodAnalyzer(pipe, window=384, padding=30, chunk=chunk,
                           host_resize=True, lowres="auto", stride=stride)
    analyzer.ensure_variables()
    variables = analyzer.variables

    # ---- 1. decode-only (CPU + wall per frame) -------------------------
    def decode_all():
        dec = NativeVideoDecoder(h264_path, lowres=0, fast=True)
        chunks = []
        try:
            total = 0
            for c0 in range(0, num_frames, chunk):
                stop = min(c0 + chunk, num_frames)
                cb = np.zeros((chunk, 2, 4), np.float32)
                cb[: stop - c0] = boxes[c0:stop]
                n, crops = dec.decode_crops(c0, cb, 128, 30, stride=stride,
                                            fmt="yuv420", dense=True)
                total += min(n, stop - c0)
                chunks.append(crops)
            return total, chunks
        finally:
            dec.close()

    (total, chunks), cpu, wall = timed(decode_all)
    log(f"decode-only: {total} frames, CPU {cpu*1e3/total:.3f} ms/f, "
        f"wall {wall*1e3/total:.3f} ms/f  ({total/wall:.0f} fps)")
    decode_cpu_ms = cpu * 1e3 / total

    # ---- 2. device_put serialization CPU per chunk ---------------------
    samples = chunk // stride
    flats = [c.reshape((samples * 2,) + c.shape[2:]) for c in chunks]
    nbytes = flats[0].nbytes
    # warm
    d = jax.device_put(flats[0]); d.block_until_ready()

    def put_all(sync):
        handles = []
        for f in flats:
            h = jax.device_put(f)
            if sync:
                h.block_until_ready()
            handles.append(h)
        for h in handles:
            h.block_until_ready()
        return handles

    for sync in (False, True):
        for trial in range(3):
            handles, cpu, wall = timed(put_all, sync)
            log(f"device_put sync={sync} trial{trial}: "
                f"CPU {cpu*1e3/len(flats):.2f} ms/chunk, "
                f"wall {wall*1e3/len(flats):.2f} ms/chunk "
                f"({nbytes/1e3:.0f} KB/chunk, "
                f"CPU {cpu*1e3/total:.3f} ms/frame)")

    # ---- 3. dispatch CPU per chunk (data already on device) ------------
    dev_flats = [jax.device_put(f) for f in flats]
    for f in dev_flats:
        f.block_until_ready()
    buf = pipe.make_embedding_buffer(len(flats) * samples)
    emb0 = pipe.embed_crops_yuv(variables, dev_flats[0])
    buf = pipe.scatter_embeddings(buf, emb0, 0)
    jax.block_until_ready(buf)

    def dispatch_all(buf):
        for i, f in enumerate(dev_flats):
            emb = pipe.embed_crops_yuv(variables, f)
            buf = pipe.scatter_embeddings(buf, emb, i * samples * 2 % (len(flats) * samples))
        jax.block_until_ready(buf)
        return buf

    for trial in range(3):
        buf, cpu, wall = timed(dispatch_all, buf)
        log(f"dispatch trial{trial}: CPU {cpu*1e3/len(flats):.2f} ms/chunk, "
            f"wall {wall*1e3/len(flats):.2f} ms/chunk "
            f"(CPU {cpu*1e3/total:.3f} ms/frame)")

    # ---- 4. full pipeline (CPU + wall per frame) -----------------------
    for trial in range(3):
        r, cpu, wall = timed(analyzer.analyze, h264_path, boxes)
        log(f"e2e trial{trial}: {r['fps']:.1f} fps, "
            f"CPU {cpu*1e3/r['frames']:.3f} ms/f, wall {wall*1e3/r['frames']:.3f} ms/f")

    log(f"--- decode CPU {decode_cpu_ms:.3f} ms/f is the floor; "
        f"everything above it in e2e CPU is overhead to kill ---")


if __name__ == "__main__":
    main()
