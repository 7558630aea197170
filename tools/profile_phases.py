#!/usr/bin/env python
"""Phase-timestamp the VodAnalyzer hot path to find the idle wall time.

profile_transfer.py showed e2e CPU/frame == decode-only CPU/frame but
e2e wall/frame ~0.4-0.7 ms higher: the pipeline is *waiting*, not
computing.  This instruments where (startup probe, first-chunk latency,
steady-state, tail classify+readback).
"""

import os
import sys
import tempfile
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from bench import make_test_video, fighter_boxes
    from playaid_core_tpu.tpu_warmup import warm_tunnel

    try:
        warm_tunnel(log=log)
    except RuntimeError:
        pass

    import jax
    import jax.numpy as jnp

    from playaid_core_tpu.infer.pipeline import BatchedActionPipeline
    from playaid_core_tpu.infer import vod_pipeline as vp
    from playaid_core_tpu.video.native_decoder import NativeVideoDecoder
    from playaid_core_tpu.video import native_encoder

    num_frames = 600
    chunk = 48
    stride = 2
    video_path = os.path.join(tempfile.gettempdir(), f"bench_1080p_{num_frames}.mp4")
    if not os.path.exists(video_path):
        make_test_video(video_path, num_frames)
    h264_path = video_path.replace(".mp4", "_h264.mp4")
    if not os.path.exists(h264_path):
        native_encoder.transcode(video_path, h264_path, crf=20)
    boxes = fighter_boxes(num_frames)

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    pipe = BatchedActionPipeline(family="cnn", num_actions=63, sequence_length=7,
                                 frame_delta=3, dtype=dtype)
    analyzer = vp.VodAnalyzer(pipe, window=384, padding=30, chunk=chunk,
                              host_resize=True, lowres="auto", stride=stride)
    analyzer.ensure_variables()
    variables = analyzer.variables

    # warm compiles
    analyzer.analyze(h264_path, boxes)

    # --- manual replication of analyze() with phase stamps --------------
    for trial in range(3):
        t0 = time.perf_counter()
        bxs, padding = vp.resolve_padding(boxes, 30)
        with NativeVideoDecoder(h264_path, lowres=3, fast="auto") as probe:
            eff_fast = probe.fast
            lowres = vp.auto_lowres(bxs, probe.width, probe.height, 128, padding, probe.lowres)
        t_probe = time.perf_counter()

        decoder = vp.NativeChunkDecoder(h264_path, num_frames, chunk, bxs, 128,
                                        padding, lowres=lowres, stride=stride,
                                        fmt="yuv420", fast="auto")
        samples = chunk // stride
        buf = pipe.make_embedding_buffer(decoder.num_chunks * samples)
        t_setup = time.perf_counter()

        import queue, threading
        stage_q = queue.Queue(maxsize=4)
        first_chunk = [None]

        def _stage():
            for start, (n, wins, _o) in decoder:
                if first_chunk[0] is None:
                    first_chunk[0] = time.perf_counter()
                if n == 0:
                    continue
                flat = wins.reshape((samples * 2,) + wins.shape[2:])
                stage_q.put((start, n, jax.device_put(flat)))
            stage_q.put(None)

        th = threading.Thread(target=_stage, daemon=True)
        th.start()
        decoded = 0
        extent = 0
        consume_waits = 0.0
        while True:
            w0 = time.perf_counter()
            item = stage_q.get()
            consume_waits += time.perf_counter() - w0
            if item is None:
                break
            start, n, flat = item
            emb = pipe.embed_crops_yuv(variables, flat)
            buf = pipe.scatter_embeddings(buf, emb, (start // stride) * 2)
            decoded += n
            extent = max(extent, (start + n + stride - 1) // stride)
        t_decoded = time.perf_counter()
        labels, conf = pipe.classify_buffer(variables, buf, extent)
        t_classify_dispatch = time.perf_counter()
        labels, conf = jax.device_get((labels, conf))
        t_done = time.perf_counter()
        decoder.close()
        th.join()

        total = t_done - t0
        log(f"trial{trial}: total {total*1e3:.0f} ms = {decoded/total:.1f} fps | "
            f"probe {(t_probe-t0)*1e3:.1f} | setup {(t_setup-t_probe)*1e3:.1f} | "
            f"first-chunk {(first_chunk[0]-t_setup)*1e3:.1f} | "
            f"decode-loop {(t_decoded-first_chunk[0])*1e3:.0f} | "
            f"classify-dispatch {(t_classify_dispatch-t_decoded)*1e3:.1f} | "
            f"classify+readback {(t_done-t_classify_dispatch)*1e3:.1f} | "
            f"consumer-wait-total {consume_waits*1e3:.0f}")


if __name__ == "__main__":
    main()
