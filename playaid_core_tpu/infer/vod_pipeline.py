"""End-to-end VOD analysis pipeline: decode -> windows -> TPU -> labels.

The throughput-critical composition for the headline workload (1080p60
two-fighter action detection).  Stage layout chosen from measured
bottlenecks on TPU-attached hosts:

* **decode** — bounded parallel segment decoding (cv2), scaled to host
  cores; each worker immediately extracts the two fixed-size uint8 crop
  windows per frame and discards the full frame, so buffered chunks cost
  ~1 MB/frame instead of ~6 MB and host->device traffic drops ~7x (raw
  1080p frames would cap the pipeline at the PCIe/tunnel bandwidth);
* **device** — windows resample to 128x128 via the separable-matmul
  bilinear op, ResNet embeddings computed once per crop (bf16, big
  batches), then middle-out windows over the *embedding* sequence feed the
  temporal head (see :mod:`playaid_core_tpu.infer.pipeline`);
* stages overlap through JAX async dispatch + a bounded decode queue.

This replaces the reference's per-frame seek + per-window batch-1 torch
loop (reference: ai_runner.py:426-520, manuscript.py:154).
"""

from __future__ import annotations

import os
import queue
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

from playaid_core_tpu.infer.pipeline import BatchedActionPipeline
from playaid_core_tpu.ops.preprocess import batched_window_resize


def extract_windows(frame, boxes, window, padding):
    """Slice per-box square windows out of one BGR frame.

    boxes: [K, 4] normalized yolo.  Returns (windows [K, window, window, 3]
    uint8 BGR with black out-of-frame fill, origins [K, 3] = window-relative
    (y0, x0, side) for the device resample), matching
    YoloCrop.square_crop geometry (reference: fighter.py:323-344).
    """
    h, w = frame.shape[:2]
    k = boxes.shape[0]
    wins = np.zeros((k, window, window, 3), np.uint8)
    origins = np.zeros((k, 3), np.float32)
    for j in range(k):
        cx, cy, bw, bh = boxes[j]
        cxp, cyp = int(cx * w), int(cy * h)
        half = int(max(int(bw * w), int(bh * h)) / 2)
        side = 2 * (half + padding)
        if side > window - 2:
            # Crop exceeds the static window: shrink around the same
            # center rather than silently truncating the bottom/right
            # (the device resample paints out-of-window coords black).
            half = (window - 2) // 2 - padding
            side = 2 * (half + padding)
        y0 = cyp - half - padding
        x0 = cxp - half - padding
        ys, xs = y0, x0
        vy0, vy1 = max(0, ys), min(h, ys + window)
        vx0, vx1 = max(0, xs), min(w, xs + window)
        if vy1 > vy0 and vx1 > vx0:
            wins[j, vy0 - ys : vy1 - ys, vx0 - xs : vx1 - xs] = frame[vy0:vy1, vx0:vx1]
        origins[j] = (0.0, 0.0, float(side))
    return wins, origins


def extract_crops(frame, boxes, out_size, padding):
    """Host-side square letterboxed crops (YoloCrop.square_crop semantics)
    for each box of one BGR frame -> [K, out_size, out_size, 3] uint8.

    Used on CPU-constrained hosts with a slow device link, where shipping
    pre-resized crops (98 KB/frame) beats shipping raw windows: the link
    serialization itself costs CPU and starves the decoder.
    """
    import cv2

    h, w = frame.shape[:2]
    k = boxes.shape[0]
    out = np.zeros((k, out_size, out_size, 3), np.uint8)
    for j in range(k):
        cx, cy, bw, bh = boxes[j]
        cxp, cyp = int(cx * w), int(cy * h)
        half = int(max(int(bw * w), int(bh * h)) / 2)
        side = 2 * (half + padding)
        if side <= 0:
            continue
        y0, x0 = cyp - half - padding, cxp - half - padding
        canvas = np.zeros((side, side, 3), np.uint8)
        vy0, vy1 = max(0, y0), min(h, y0 + side)
        vx0, vx1 = max(0, x0), min(w, x0 + side)
        if vy1 > vy0 and vx1 > vx0:
            canvas[vy0 - y0 : vy1 - y0, vx0 - x0 : vx1 - x0] = frame[vy0:vy1, vx0:vx1]
        out[j] = cv2.resize(canvas, (out_size, out_size), interpolation=cv2.INTER_AREA)
    return out


class BoundedSegmentDecoder:
    """Decode a video with N workers over frame segments, run a per-frame
    host transform in the worker, and emit ordered chunks through a
    bounded buffer (at most ``ahead`` chunks in flight)."""

    def __init__(self, path, num_frames, chunk, transform, workers=None, ahead=6,
                 collate=None):
        import cv2

        self.path = path
        self.num_frames = num_frames
        self.chunk = chunk
        self.transform = transform
        self.collate = collate
        self.num_chunks = (num_frames + chunk - 1) // chunk
        workers = workers or max(1, min((os.cpu_count() or 1), 6))
        self.workers_n = min(workers, self.num_chunks)

        self._results = {}
        self._error = None
        self._closed = False
        self._cond = threading.Condition()
        self._next_emit = 0
        self._task_q = queue.Queue()
        for t in range(self.num_chunks):
            self._task_q.put(t)
        self._ahead = ahead
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(self.workers_n)
        ]
        for t in self._threads:
            t.start()

    def close(self):
        """Stop workers: drain pending tasks and release backpressure
        waiters.  Safe to call from the consumer's error path — without
        it, a consumer that dies mid-iteration leaves workers decoding
        (and, in ``analyze_many``, leaks threads + decoder handles for
        the life of the process)."""
        with self._cond:
            self._closed = True
            try:
                while True:
                    self._task_q.get_nowait()
            except queue.Empty:
                pass
            self._cond.notify_all()

    def _worker(self):
        try:
            self._worker_loop()
        except BaseException as e:  # propagate into the consumer
            with self._cond:
                self._error = e
                self._cond.notify_all()

    def _worker_loop(self):
        import cv2

        cap = cv2.VideoCapture(self.path)
        pos = -10**9
        while True:
            try:
                chunk_idx = self._task_q.get_nowait()
            except queue.Empty:
                cap.release()
                return
            # Backpressure: don't decode more than `ahead` chunks past the
            # consumer.
            with self._cond:
                while (chunk_idx > self._next_emit + self._ahead
                       and not self._closed):
                    self._cond.wait()
                if self._closed:
                    cap.release()
                    return
            start = chunk_idx * self.chunk
            stop = min(start + self.chunk, self.num_frames)
            if start != pos:
                cap.set(cv2.CAP_PROP_POS_FRAMES, start)
            out = []
            for i in range(start, stop):
                ok, frame = cap.read()
                if not ok:
                    break
                out.append(self.transform(i, frame))
            pos = stop
            # Chunk assembly happens here in the worker thread, keeping the
            # consumer thread free for device dispatch.
            if self.collate is not None:
                out = self.collate(start, out)
            with self._cond:
                self._results[chunk_idx] = (start, out)
                self._cond.notify_all()

    def __iter__(self):
        for idx in range(self.num_chunks):
            with self._cond:
                while idx not in self._results:
                    if self._error is not None:
                        raise self._error
                    if self._closed:
                        return
                    self._cond.wait()
                item = self._results.pop(idx)
                self._next_emit = idx + 1
                self._cond.notify_all()
            yield item


class NativeChunkDecoder:
    """Chunk-level decoder over the native (libavcodec) crop extractor.

    Same iterator contract as :class:`BoundedSegmentDecoder` with the
    host-resize collate — yields ``(start, (n, crops[chunk//stride, K,
    S, S, 3], None))``, dense layout: sampled frame j in row j//stride —
    but the whole decode+crop+letterbox+resize for a chunk is
    ONE C call that never converts full frames to BGR (see
    native/video_decoder.cpp).  ``lowres`` decodes at 1/2^n resolution on
    codecs that support it; ``stride`` extracts crops only every
    stride-th frame (frames in between are still decoded — codec
    reference chains require it — but skip all conversion work; with
    stride-skip, unreferenced ones skip reconstruction too).

    ``sink`` mode: pass ``sink=fn`` and the workers call
    ``fn(chunk_idx, start, n, crops)`` inline instead of buffering
    ordered results for an iterating consumer; await completion with
    :meth:`wait`.  For consumers whose per-chunk work is a handful of
    async dispatches (the VOD pipeline: device_put + embed + scatter,
    ~30 us of CPU), this removes the whole queue/condition-variable
    handoff machinery — on a 1-core host those cross-thread wakeups
    were stealing ~0.2 ms/frame from the decode thread.
    """

    def __init__(self, path, num_frames, chunk, boxes, crop_size, padding,
                 workers=None, ahead=6, lowres=0, stride=1, fmt="bgr",
                 fast=False, sink=None):
        self.path = path
        self.num_frames = num_frames
        self.chunk = chunk
        self.boxes = boxes
        self.crop_size = crop_size
        self.padding = padding
        self.lowres = lowres
        self.stride = stride
        self.fmt = fmt
        self.fast = fast
        self.sink = sink
        self.num_chunks = (num_frames + chunk - 1) // chunk
        workers = workers or max(1, min((os.cpu_count() or 1), 6))
        self.workers_n = min(workers, self.num_chunks)

        self._results = {}
        self._error = None
        self._closed = False
        self._cond = threading.Condition()
        self._next_emit = 0
        self._done = 0
        self._task_q = queue.Queue()
        for t in range(self.num_chunks):
            self._task_q.put(t)
        self._ahead = ahead
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(self.workers_n)
        ]
        for t in self._threads:
            t.start()

    close = BoundedSegmentDecoder.close

    def wait(self, timeout=None):
        """Sink mode: block until every chunk has been decoded and passed
        through the sink (or an error/close occurred).  Re-raises worker
        exceptions — including those the sink itself threw."""
        with self._cond:
            while (self._done < self.num_chunks and self._error is None
                   and not self._closed):
                if not self._cond.wait(timeout=timeout):
                    raise TimeoutError("decode did not finish in time")
            if self._error is not None:
                raise self._error

    def _worker(self):
        try:
            self._worker_loop()
        except BaseException as e:
            with self._cond:
                self._error = e
                self._cond.notify_all()

    def _worker_loop(self):
        from playaid_core_tpu.video import native_decoder

        # Pooled acquire: reuses the analyzer's probe handle (or a prior
        # run's decoder) instead of re-opening the container — an h264
        # open costs ~45 ms of stream probing on a 1-core host, ~45
        # frames of decode budget.
        dec = native_decoder.acquire(self.path, lowres=self.lowres,
                                     fast=self.fast)
        k = self.boxes.shape[1]
        try:
            while True:
                try:
                    chunk_idx = self._task_q.get_nowait()
                except queue.Empty:
                    return
                if self.sink is None:
                    # Backpressure only matters when an iterating consumer
                    # can fall behind; a sink consumes inline.
                    with self._cond:
                        while (chunk_idx > self._next_emit + self._ahead
                               and not self._closed):
                            self._cond.wait()
                        if self._closed:
                            return
                elif self._closed:
                    return
                start = chunk_idx * self.chunk
                stop = min(start + self.chunk, self.num_frames)
                # Fixed-shape output (zero-padded tail chunk): every chunk
                # reuses the same compiled device programs.
                chunk_boxes = np.zeros((self.chunk, k, 4), np.float32)
                chunk_boxes[: stop - start] = self.boxes[start:stop]
                # dense=True packs extracted frames contiguously in the
                # output ([chunk//stride, K, ...]), so the consumer ships
                # the buffer without a strided host-side gather.
                n, crops = dec.decode_crops(
                    start, chunk_boxes, self.crop_size, self.padding,
                    stride=self.stride, fmt=self.fmt, dense=True,
                )
                n = min(n, stop - start)
                if self.sink is not None:
                    self.sink(chunk_idx, start, n, crops)
                    with self._cond:
                        self._done += 1
                        if self._done >= self.num_chunks:
                            self._cond.notify_all()
                else:
                    with self._cond:
                        self._results[chunk_idx] = (start, (n, crops, None))
                        self._cond.notify_all()
        finally:
            native_decoder.release(dec)

    def __iter__(self):
        for idx in range(self.num_chunks):
            with self._cond:
                while idx not in self._results:
                    if self._error is not None:
                        raise self._error
                    if self._closed:
                        return
                    self._cond.wait()
                item = self._results.pop(idx)
                self._next_emit = idx + 1
                self._cond.notify_all()
            yield item


def boxes_from_log(label_path, num_frames=None, log_offset=0):
    """Per-frame two-fighter boxes [F, 2, 4] from an ult_logger log via
    batched camera projection (no detector needed)."""
    from playaid_core_tpu.timeline import (
        load_ground_truth_from_path,
        precompute_timeline_projection,
        update_fighters_from_timeline,
    )

    timeline = load_ground_truth_from_path(label_path, log_offset=log_offset)
    precompute_timeline_projection(timeline)
    f_total = len(timeline) if num_frames is None else min(num_frames, len(timeline))
    boxes = np.zeros((f_total, 2, 4), np.float32)
    fighters = []
    for i in range(f_total):
        fighters = update_fighters_from_timeline(i, timeline[i], fighters)
        for k, fighter in enumerate(fighters[:2]):
            c = fighter.crop
            boxes[i, k] = (c.center_x, c.center_y, c.crop_width, c.crop_height)
    return boxes


def auto_lowres(boxes, video_w, video_h, crop_size, padding, max_lowres=2):
    """Pick the largest fractional-decode factor that is label-safe.

    Fractional (1/2^L) decode is only harmless when the decoded crop
    region is still at least the model's input size: the crop is
    downsampled to ``crop_size`` px either way, so decoding less than
    that throws away pixels the model would have seen (and mpeg4 lowres
    is a coefficient-truncating approximation, not a clean resample).
    Measured with the scaled 27-class capstone model
    (tools/validate_decode_backends.py): at sprite sizes where the
    decoded region falls below the input size, lowres=1 costs 4-46 pts
    of label agreement and lowres=2 collapses it — while full-res native
    decode matches cv2 at ~99.9%.

    The crop side per box mirrors the extractor's geometry
    (native/video_decoder.cpp: side = 2*(max(bw, bh)/2 + pad)); the
    policy requires the *smallest* real box's side to survive, so one
    far-zoom stretch can't silently flip labels.
    """
    b = np.asarray(boxes, np.float32).reshape(-1, 4)
    bw = (b[:, 2] * video_w).astype(np.int64)
    bh = (b[:, 3] * video_h).astype(np.int64)
    half = np.maximum(bw, bh) // 2
    side = 2 * (half + int(padding))
    # Degenerate boxes (absent fighter slots, zero-size placeholders)
    # produce side == 2*padding; they never reach the model.
    real = side[half > 0]
    if real.size == 0:
        return 0
    min_side = int(real.min())
    lowres = 0
    while lowres < max_lowres and (min_side >> (lowres + 1)) >= crop_size:
        lowres += 1
    return lowres


def resolve_padding(boxes, padding):
    """Normalize ``padding`` for the chunked decode paths.

    Integer padding (the reference's pixel semantics) passes through.  A
    float in (0, 1) means a FRACTION of each box's square dim — the
    geometry.square_crop semantics deployed by the capstone — which a
    single per-call integer pad can't express; it is realized exactly by
    inflating each box's w/h by (1 + 2*frac) instead (the extractors all
    compute side = 2*(half + pad), so pad = frac*2*half ≡ half *= 1+2frac)
    and padding 0.  Anything else (e.g. a stray 0.125 reaching the native
    decoder, where C truncation would silently drop the padding) is
    rejected.
    """
    if hasattr(padding, "item"):  # np.float32/np.int64 etc. from env/config parses
        padding = padding.item()
    if isinstance(padding, float) and 0.0 < padding < 1.0:
        out = np.array(boxes, np.float32, copy=True)
        out[..., 2:4] *= 1.0 + 2.0 * padding
        return out, 0
    if float(padding) != int(padding):
        raise ValueError(
            f"padding must be an int pixel pad or a fraction in (0,1); "
            f"got {padding!r}"
        )
    return boxes, int(padding)


class VodAnalyzer:
    """Analyze a VOD: per-frame action labels for both fighters."""

    def __init__(self, pipeline: BatchedActionPipeline | None = None, variables=None,
                 window=384, padding=30, chunk=48, decode_workers=None,
                 host_resize=True, mesh=None, decode_backend="auto", lowres=0,
                 stride=1, transfer_format="auto", fast_decode="auto",
                 decode="argmax", smooth_radius=0, switch_cost=4.0):
        self.pipeline = pipeline or BatchedActionPipeline(family="cnn")
        self.variables = variables
        self.window = window
        self.padding = padding
        self.chunk = chunk
        self.decode_workers = decode_workers
        # decode_backend: "native" = libavcodec crop-extracting decoder (no
        # full-frame BGR conversion, optional lowres fractional decode),
        # "cv2" = VideoCapture path, "auto" = native when the library
        # builds and host_resize is on.
        self.decode_backend = decode_backend
        # lowres: decode at 1/2^lowres resolution on codecs that support it
        # (mpeg4 yes, h264 no — silently clamped), or "auto" to pick the
        # largest label-safe factor from the measured box sizes (see
        # auto_lowres: the decoded crop region must stay >= the model
        # input size).  Crops are resampled to the model's input either
        # way; agreement under each mode is validated by
        # tests/test_decode_backend_agreement.py with trained weights.
        self.lowres = lowres
        # fast_decode: skip the codec's in-loop deblocking filter (native
        # backend only) — the reduced-cost decode mode for h264, which has
        # no fractional lowres.  "auto" (the deployed default) applies it
        # only on codecs that actually have an in-loop deblock (h264/hevc/
        # vp8/vp9/av1) and keeps every other codec spec-exact; True forces
        # it, False disables.  Label agreement validated by
        # tests/test_decode_backend_agreement.py with trained weights;
        # pixel deltas by tests/test_native_decoder.py.
        self.fast_decode = fast_decode
        # stride: classify every stride-th frame and propagate its label to
        # the frames in between (the reference's own GT videos are 30 fps
        # against a 60 fps log — reference: dataset_utils.py:94 — so
        # stride=2 matches its effective temporal resolution).  Middle-out
        # window offsets then count sampled frames, i.e. the effective
        # frame_delta in real frames is stride * frame_delta.
        if stride > 1 and chunk % stride != 0:
            raise ValueError(f"chunk ({chunk}) must be divisible by stride ({stride})")
        self.stride = stride
        # transfer_format: "yuv420" ships packed 4:2:0 crops (half the
        # host->device bytes; BT.601 conversion runs fused on device),
        # "bgr" ships BGR24, "auto" picks yuv420 whenever the native
        # decoder handles the decode.  Only the native backend can produce
        # yuv420.
        self.transfer_format = transfer_format
        # Optional jax.sharding.Mesh: chunk batches shard over its 'data'
        # axis (weights replicated), so embedding fans out across chips
        # with XLA inserting the collectives.  chunk*2 must divide by the
        # data-axis size.
        self.mesh = mesh
        # host_resize: crops are resized to model resolution in the decode
        # workers and shipped as uint8 (98 KB/frame) — right for few-core
        # hosts and tunneled devices, where link serialization costs CPU.
        # False ships raw windows and resizes on device (multi-core hosts
        # with fast PCIe links).
        self.host_resize = host_resize
        # Label decoding over the window posteriors: "argmax" (the
        # reference's per-window semantics, ai_runner.py:466-520) or
        # "viterbi" (MAP path under a switch_cost-nat Potts prior — the
        # capstone's deployed operating point); smooth_radius pools
        # log-posteriors over [i-r, i+r] first.  All run inside the same
        # classify program (see pipeline._two_fighter_tail).
        self.label_decode = decode
        self.smooth_radius = smooth_radius
        self.switch_cost = switch_cost

    def ensure_variables(self, seed=0):
        if self.variables is None:
            print(
                "WARNING: no trained weights provided; using random "
                "initialization (labels will be meaningless). Pass "
                "variables= or a --checkpoint.",
                file=__import__("sys").stderr,
            )
            self.variables = self.pipeline.init(jax.random.PRNGKey(seed))
        return self.variables

    def _resize_embed(self, wins, origins):
        """[B, 2, W, W, 3] BGR uint8 + [B, 2, 3] -> [B*2, D] embeddings.
        One fused device call (flip + resize + normalize + embed)."""
        b = wins.shape[0]
        flat = wins.reshape((b * 2,) + wins.shape[2:])
        org = origins.reshape(b * 2, 3)
        return self.pipeline.embed_windows(self.variables, flat, org)

    def analyze(self, video_path, boxes, num_frames=None, progress=False):
        """boxes: [F, 2, 4] normalized yolo boxes per frame.

        Returns dict with per-fighter labels/confidences [F] and timing.
        """
        self.ensure_variables()
        boxes, padding = resolve_padding(boxes, self.padding)
        f_total = boxes.shape[0] if num_frames is None else num_frames

        chunk = self.chunk
        crop_size = self.pipeline.crop_size
        stride = self.stride
        if stride > 1 and not self.host_resize:
            raise ValueError("stride>1 requires host_resize=True")

        use_native = False
        if self.host_resize and self.decode_backend in ("auto", "native"):
            from playaid_core_tpu.video import native_decoder

            use_native = native_decoder.available()
            if not use_native and self.decode_backend == "native":
                raise RuntimeError("native decode backend requested but unavailable")
        fmt = self.transfer_format
        if fmt == "auto":
            fmt = "yuv420" if use_native else "bgr"
        if fmt == "yuv420" and not use_native:
            raise ValueError("transfer_format='yuv420' requires the native decoder")

        lowres = self.lowres if isinstance(self.lowres, int) else 0
        eff_fast = 1 if self.fast_decode is True else 0
        if use_native and (self.lowres == "auto" or lowres > 0
                           or self.fast_decode == "auto"):
            # Cached stream probe (dims, the codec's lowres capability,
            # the effective fast mode for "auto").  The probe's handle
            # parks in the decoder pool, so the decode worker below
            # reuses it instead of re-opening the container; repeat
            # analyses of the same VOD skip the probe entirely.
            info = native_decoder.probe(video_path, fast=self.fast_decode)
            eff_fast = info["fast"]
            if self.lowres == "auto":
                lowres = auto_lowres(
                    boxes[:f_total], info["width"], info["height"],
                    crop_size, padding, max_lowres=info["max_lowres"],
                )
            elif self.lowres:
                lowres = min(self.lowres, info["max_lowres"])

        if self.host_resize:
            def transform(i, frame):
                if i % stride != 0:
                    return None
                return extract_crops(frame, boxes[i], crop_size, padding)

            def collate(start, items):
                # Dense layout (matching the native decoder's dense=True):
                # sampled frame j lands in row j//stride, so the consumer
                # reshapes without a strided gather.
                n = len(items)
                crops = np.zeros((chunk // stride, 2, crop_size, crop_size, 3),
                                 np.uint8)
                for j, c in enumerate(items):
                    if c is not None:
                        crops[j // stride] = c
                return n, crops, None
        else:
            def transform(i, frame):
                return extract_windows(frame, boxes[i], self.window, padding)

            def collate(start, items):
                """Assemble (and zero-pad to a fixed chunk size — one
                compiled shape for every chunk, no mid-run recompiles) in
                the worker."""
                n = len(items)
                wins = np.zeros((chunk, 2, self.window, self.window, 3), np.uint8)
                origins = np.zeros((chunk, 2, 3), np.float32)
                for j, (w, o) in enumerate(items):
                    wins[j] = w
                    origins[j] = o
                return n, wins, origins

        batch_sharding = None
        replicated_sharding = None
        scatter_fn = self.pipeline.scatter_embeddings
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sharding = NamedSharding(self.mesh, P("data"))
            replicated_sharding = NamedSharding(self.mesh, P())
            # Pin the scatter output replicated: otherwise GSPMD may pick a
            # sharded output, which both breaks the donation aliasing and
            # recompiles on the second chunk.
            scatter_fn = jax.jit(
                self.pipeline._scatter_impl,
                donate_argnums=0,
                out_shardings=replicated_sharding,
            )

        def to_device(arr):
            if batch_sharding is not None:
                return jax.device_put(arr, batch_sharding)
            # Explicit transfer even without a mesh: the staging thread
            # exists to move the host->device copy off the consumer
            # thread, and jit would otherwise transfer lazily at dispatch.
            return jax.device_put(arr)

        t0 = time.time()
        decoded = 0
        import contextlib

        mesh_ctx = self.mesh if self.mesh is not None else contextlib.nullcontext()
        # With stride, only every stride-th frame's crops are embedded and
        # classified; the buffer is indexed by sampled position.
        samples_per_chunk = chunk // stride
        num_chunks = (f_total + chunk - 1) // chunk
        with mesh_ctx:
            # Chunk embeddings accumulate into one preallocated (bucketed)
            # device buffer via a single reusable scatter program, so
            # program count and argument size stay constant regardless of
            # VOD length (a chunk-tuple epilogue would grow with the video).
            buf = self.pipeline.make_embedding_buffer(
                num_chunks * samples_per_chunk
            )
            if replicated_sharding is not None:
                buf = jax.device_put(buf, replicated_sharding)
            # The labeled extent is the highest frame index written, not
            # the count of frames read: a short mid-stream chunk must not
            # truncate later frames' labels.
            extent = 0
            if use_native:
                # Dispatcher-thread design.  The decode side only hands
                # chunks over a bounded queue (micro-seconds); ONE
                # dispatcher thread runs the whole device interaction per
                # chunk: explicit device_put, then embed + scatter
                # dispatched on the already-transferring handle.
                # Measured on a 1-core host with controlled interference
                # pumps + in-pipeline cadence stamps:
                #   * raw host->device transfers cost the decode thread
                #     ~nothing, and put-then-dispatch keeps it that way;
                #   * dispatching a jit directly on a NUMPY chunk
                #     serializes the argument inline in the dispatch path
                #     (~0.25 ms/frame of decode budget);
                #   * running the device calls inline in the decode loop
                #     stalls it on transfer flow control;
                #   * and a decode WORKER THREAD costs ~15% by itself
                #     when there is only one (GIL ping-pong with the
                #     consumer + condition-variable handoffs), so with
                #     one effective worker the chunk loop runs INLINE on
                #     this thread and only the dispatcher is a thread.
                # The bounded queue is the backpressure for multi-core
                # hosts whose aggregate decode outruns the link.
                embed = (
                    self.pipeline.embed_crops_yuv if fmt == "yuv420"
                    else self.pipeline.embed_crops_u8
                )
                state = {"buf": buf, "decoded": 0, "extent": 0}
                work_q = queue.Queue(maxsize=8)
                sink_stop = threading.Event()

                def sink(chunk_idx, start, n, crops):
                    while not sink_stop.is_set():
                        try:
                            work_q.put((start, n, crops), timeout=0.25)
                            return
                        except queue.Full:
                            continue

                def dispatcher():
                    while True:
                        item = work_q.get()
                        if item is None:
                            return
                        if state.get("error") is not None:
                            continue  # keep draining so producers unblock
                        start, n, crops = item
                        if n == 0:
                            continue
                        try:
                            flat = crops.reshape(
                                (samples_per_chunk * 2,) + crops.shape[2:]
                            )
                            emb = embed(self.variables, to_device(flat))
                            state["buf"] = scatter_fn(
                                state["buf"], emb, (start // stride) * 2
                            )
                            state["decoded"] += n
                            state["extent"] = max(
                                state["extent"],
                                (start + n + stride - 1) // stride,
                            )
                        except BaseException as e:  # surface after join
                            state["error"] = e

                disp_thread = threading.Thread(target=dispatcher, daemon=True)
                disp_thread.start()
                workers_eff = self.decode_workers or max(
                    1, min((os.cpu_count() or 1), 6)
                )
                try:
                    if workers_eff == 1:
                        # Inline chunk loop (the 1-core/1-worker fast
                        # path): decode on THIS thread, pooled handle.
                        from playaid_core_tpu.video import native_decoder

                        dec = native_decoder.acquire(
                            video_path, lowres=lowres, fast=self.fast_decode
                        )
                        try:
                            for c0 in range(0, f_total, chunk):
                                stop = min(c0 + chunk, f_total)
                                cb = np.zeros((chunk, boxes.shape[1], 4),
                                              np.float32)
                                cb[: stop - c0] = boxes[c0:stop]
                                n, crops = dec.decode_crops(
                                    c0, cb, crop_size, padding,
                                    stride=stride, fmt=fmt, dense=True,
                                )
                                sink(0, c0, min(n, stop - c0), crops)
                        finally:
                            native_decoder.release(dec)
                    else:
                        decoder = NativeChunkDecoder(
                            video_path, f_total, self.chunk, boxes,
                            crop_size, padding, workers=self.decode_workers,
                            lowres=lowres, stride=stride, fmt=fmt,
                            fast=self.fast_decode, sink=sink,
                        )
                        try:
                            decoder.wait()
                        finally:
                            sink_stop.set()
                            decoder.close()
                finally:
                    # Stop order matters on error paths: producers might
                    # be blocked in sink's put (full queue) — sink_stop
                    # drains them out, then the sentinel ends the
                    # dispatcher after the real items.
                    sink_stop.set()
                    work_q.put(None)
                    disp_thread.join(timeout=30.0)
                if state.get("error") is not None:
                    raise state["error"]
                buf = state["buf"]
                decoded = state["decoded"]
                extent = state["extent"]
            elif self.host_resize:
                decoder = BoundedSegmentDecoder(
                    video_path, f_total, self.chunk, transform,
                    workers=self.decode_workers, collate=collate,
                )
                # Dedicated transfer thread: device_put through a tunneled
                # device is mostly network WAIT, but issued from the main
                # thread it serializes with dispatch; staging it lets
                # decode, transfer and dispatch all overlap (+10-17%
                # measured on a 1-core host).
                stage_q = queue.Queue(maxsize=4)
                stage_stop = threading.Event()

                def _put(item):
                    # Guarded put: if the consumer died, its finally sets
                    # stage_stop and this returns instead of blocking
                    # forever on the full queue (thread-leak fix).
                    while not stage_stop.is_set():
                        try:
                            stage_q.put(item, timeout=0.25)
                            return True
                        except queue.Full:
                            continue
                    return False

                def _stage():
                    try:
                        for start, (n, wins, _o) in decoder:
                            if stage_stop.is_set():
                                return
                            if n == 0:
                                continue
                            # Both decode paths emit dense [chunk//stride,
                            # 2, ...] buffers — a contiguous reshape, no
                            # strided copy.
                            flat = wins.reshape(
                                (samples_per_chunk * 2,) + wins.shape[2:]
                            )
                            if not _put((start, n, to_device(flat))):
                                return
                        _put(None)
                    except BaseException as e:  # surface in the consumer
                        _put(e)

                stage_thread = threading.Thread(target=_stage, daemon=True)
                stage_thread.start()
                embed = (
                    self.pipeline.embed_crops_yuv if fmt == "yuv420"
                    else self.pipeline.embed_crops_u8
                )
                try:
                    while True:
                        item = stage_q.get()
                        if item is None:
                            break
                        if isinstance(item, BaseException):
                            raise item
                        start, n, flat = item
                        emb = embed(self.variables, flat)
                        buf = scatter_fn(buf, emb, (start // stride) * 2)
                        decoded += n
                        extent = max(extent, (start + n + stride - 1) // stride)
                finally:
                    # Stop producers whether we finished or raised: the
                    # staging thread exits its put, the decoder drains its
                    # task queue and closes its handles.
                    stage_stop.set()
                    decoder.close()
                    stage_thread.join(timeout=10.0)
            else:
                decoder = BoundedSegmentDecoder(
                    video_path, f_total, self.chunk, transform,
                    workers=self.decode_workers, collate=collate,
                )
                try:
                    for start, (n, wins, origins) in decoder:
                        if n == 0:
                            continue
                        emb = self._resize_embed(wins, origins)
                        buf = scatter_fn(buf, emb, start * 2)
                        decoded += n
                        extent = max(extent, start + n)
                finally:
                    decoder.close()

            labels, conf = self.pipeline.classify_buffer(
                self.variables, buf, extent, decode=self.label_decode,
                smooth_radius=self.smooth_radius,
                switch_cost=self.switch_cost,
            )
            labels, conf = jax.device_get((labels, conf))
        if stride > 1:
            # Propagate each sampled frame's label to the frames in between.
            labels = np.repeat(np.asarray(labels), stride, axis=0)[:f_total]
            conf = np.repeat(np.asarray(conf), stride, axis=0)[:f_total]
        elapsed = time.time() - t0
        return {
            "labels": np.asarray(labels),        # [F, 2]
            "confidences": np.asarray(conf),     # [F, 2]
            "frames": decoded,
            "seconds": elapsed,
            "fps": decoded / elapsed if elapsed > 0 else 0.0,
            # Effective decode mode this run (after "auto" resolution and
            # the codec's lowres clamp) — callers/benches report it.
            "lowres": lowres if use_native else 0,
            "fast": eff_fast if use_native else 0,
            "backend": "native" if use_native else "cv2",
        }


def analyze_many(jobs, pipeline=None, variables=None, workers=None,
                 **analyzer_kwargs):
    """Analyze several VODs concurrently on one device context.

    ``jobs``: list of ``(video_path, boxes)`` pairs, or
    ``(video_path, boxes, per_job_kwargs)`` triples whose dict overrides
    ``analyzer_kwargs`` for that job — mixed batches (an mpeg4 VOD at
    lowres=2 next to an h264 VOD at lowres=0) need per-VOD decode
    settings.  Each job gets its own :class:`VodAnalyzer` (own decoder,
    staging thread, embedding buffer) while the compiled device programs
    and weights are shared through one pipeline — the multi-VOD
    counterpart of the reference's 7-process shell fan-out (reference:
    multi_manuscript.sh) for the AI path: on a multi-core host, each
    job's decode rides its own cores and the chip (sustaining ~30k+ fps)
    interleaves every job's batches.

    Returns results in job order; a failed job's slot holds the exception.
    """
    from concurrent.futures import ThreadPoolExecutor

    pipe = pipeline or BatchedActionPipeline(family="cnn")
    shared = VodAnalyzer(pipe, variables=variables, **analyzer_kwargs)
    shared.ensure_variables()
    variables = shared.variables

    def run_one(job):
        video_path, boxes, *rest = job
        kwargs = {**analyzer_kwargs, **(rest[0] if rest else {})}
        analyzer = VodAnalyzer(pipe, variables=variables, **kwargs)
        return analyzer.analyze(video_path, boxes)

    workers = workers or min(len(jobs), max(os.cpu_count() or 1, 1))
    results = [None] * len(jobs)
    with ThreadPoolExecutor(max_workers=workers) as pool:
        futures = {pool.submit(run_one, job): i for i, job in enumerate(jobs)}
        for fut in futures:
            i = futures[fut]
            try:
                results[i] = fut.result()
            except Exception as e:  # surface per-job failures in order
                results[i] = e
    return results


def main():
    import click

    @click.command()
    @click.option("--video", "-v", required=True, help="Path to the VOD")
    @click.option("--log", "-l", "log_path", required=True, help="ult_logger log path")
    @click.option("--family", default="cnn",
                  type=click.Choice(["cnn", "resformer", "rnn"]))
    @click.option("--frames", default=None, type=int, help="limit analyzed frames")
    @click.option("--out", "-o", default=None, help="write labels CSV here")
    @click.option("--checkpoint", "-c", default=None,
                  help="orbax checkpoint dir (Trainer format)")
    @click.option("--backend", default="auto",
                  type=click.Choice(["auto", "native", "cv2"]),
                  help="decode backend (native = libavcodec crop extractor)")
    @click.option("--lowres", default="auto",
                  help="fractional decode: 0/1/2, or 'auto' to pick the "
                       "largest label-safe factor from the box sizes")
    @click.option("--stride", default=1, type=int,
                  help="classify every stride-th frame, propagate labels")
    def analyze_vod(video, log_path, family, frames, out, checkpoint,
                    backend, lowres, stride):
        """Batched TPU action recognition over a full VOD, with fighter
        boxes projected from the log (detection-free)."""
        from playaid_core_tpu.ontology import CLASS_ID_TO_MOVE

        if lowres != "auto":
            lowres = int(lowres)
        boxes = boxes_from_log(log_path, num_frames=frames)
        pipe = BatchedActionPipeline(family=family)
        variables = pipe.load_checkpoint(checkpoint) if checkpoint else None
        analyzer = VodAnalyzer(pipe, variables=variables,
                               decode_backend=backend, lowres=lowres,
                               stride=stride)
        result = analyzer.analyze(video, boxes)
        print(f"{result['frames']} frames in {result['seconds']:.2f}s "
              f"({result['fps']:.1f} fps)")
        if out:
            with open(out, "w") as f:
                f.write("frame,p0_action,p0_conf,p1_action,p1_conf\n")
                for i in range(result["frames"]):
                    l0, l1 = result["labels"][i]
                    c0, c1 = result["confidences"][i]
                    f.write(
                        f"{i},{CLASS_ID_TO_MOVE.get(int(l0), l0)},{c0:.2f},"
                        f"{CLASS_ID_TO_MOVE.get(int(l1), l1)},{c1:.2f}\n"
                    )
            print(f"wrote {out}")

    analyze_vod()


if __name__ == "__main__":
    main()
