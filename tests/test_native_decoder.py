"""Native (libavcodec) crop-extracting decoder: geometry + pipeline parity.

The native decoder must produce crops matching the cv2 host path
(``extract_crops``, YoloCrop.square_crop semantics — reference:
fighter.py:323-381) closely enough that downstream labels agree, and the
VodAnalyzer stride mode must propagate sampled labels correctly.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from playaid_core_tpu.video import native_decoder

pytestmark = pytest.mark.skipif(
    not native_decoder.available(), reason="native video decoder unavailable"
)


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    """Small mp4v clip with two moving high-contrast blobs + boxes."""
    path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
    w, h, n = 640, 360, 60
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 60, (w, h))
    rng = np.random.default_rng(7)
    base = rng.integers(0, 50, (h, w, 3), dtype=np.uint8)
    boxes = np.zeros((n, 2, 4), np.float32)
    for i in range(n):
        frame = base.copy()
        x0 = 0.25 + 0.4 * i / n
        x1 = 0.75 - 0.4 * i / n
        cv2.circle(frame, (int(x0 * w), h // 2), 40, (0, 220, 255), -1)
        cv2.circle(frame, (int(x1 * w), h // 2 + 30), 40, (255, 120, 0), -1)
        writer.write(frame)
        boxes[i, 0] = (x0, 0.5, 100 / w, 100 / h)
        boxes[i, 1] = (x1, 0.5 + 30 / h, 100 / w, 100 / h)
    writer.release()
    return path, boxes


def _cv2_crops(path, boxes, out_size=128, padding=30):
    from playaid_core_tpu.infer.vod_pipeline import extract_crops

    cap = cv2.VideoCapture(path)
    out = []
    for i in range(boxes.shape[0]):
        ok, frame = cap.read()
        assert ok
        out.append(extract_crops(frame, boxes[i], out_size, padding))
    cap.release()
    return np.stack(out)


def test_metadata(video):
    path, boxes = video
    with native_decoder.NativeVideoDecoder(path) as dec:
        assert (dec.width, dec.height) == (640, 360)
        assert abs(dec.fps - 60.0) < 0.5
        assert dec.num_frames == 60


def test_crops_match_cv2_path(video):
    path, boxes = video
    ref = _cv2_crops(path, boxes)
    with native_decoder.NativeVideoDecoder(path) as dec:
        n, crops = dec.decode_crops(0, boxes, 128, 30)
    assert n == 60
    # The YUV->BGR conversion is bit-exact (verified at 1:1 scale); the
    # residual is SWS_AREA vs cv2.INTER_AREA resampling phase, which only
    # shows at high-contrast edges.  The embedding-similarity test below is
    # the functional gate.
    diff = np.abs(ref.astype(np.int16) - crops.astype(np.int16))
    assert diff.mean() < 5.0, diff.mean()
    assert np.median(diff) <= 3.0


def test_identity_scale_crops_bit_exact(video):
    """At identity scale (side == out_size) the native crop must equal the
    cv2 path BIT-EXACTLY for every crop origin parity.  Regression: the
    decoder used to align odd origins down to even for 4:2:0 chroma
    addressing, shifting the whole crop by a pixel — enough to flip labels
    on far-zoom sprites (the two-stage odd-origin path fixes it)."""
    path, _ = video
    w, h = 640, 360
    n = 16
    # Boxes engineered so side == 2*(half+pad) == out_size exactly, with
    # origins sweeping all four (x, y) parities.
    out_size, pad = 64, 8
    boxes = np.zeros((n, 2, 4), np.float32)
    for i in range(n):
        for k in range(2):
            cx = (200 + 7 * i + k) / w      # odd/even x centers
            cy = (160 + 5 * i + 3 * k) / h  # odd/even y centers
            boxes[i, k] = (cx, cy, 48 / w, 48 / h)  # half=24 -> side=64
    ref = _cv2_crops(path, boxes, out_size=out_size, padding=pad)[:n]
    with native_decoder.NativeVideoDecoder(path) as dec:
        cnt, crops = dec.decode_crops(0, boxes, out_size, pad)
    assert cnt == n
    assert np.array_equal(ref, crops), (
        np.abs(ref.astype(np.int16) - crops.astype(np.int16)).mean())


def test_seek_matches_sequential(video):
    path, boxes = video
    with native_decoder.NativeVideoDecoder(path) as dec:
        _, seq = dec.decode_crops(0, boxes, 128, 30)
    with native_decoder.NativeVideoDecoder(path) as dec:
        n, part = dec.decode_crops(30, boxes[30:], 128, 30)
    assert n == 30
    diff = np.abs(seq[30:].astype(np.int16) - part.astype(np.int16))
    assert diff.mean() < 1.0


def test_lowres_crops_close(video):
    """Half-resolution decode feeds the same 128px model input closely
    enough for label agreement (validated here at the pixel level)."""
    path, boxes = video
    with native_decoder.NativeVideoDecoder(path, lowres=1) as dec:
        assert dec.lowres == 1
        n, crops_lr = dec.decode_crops(0, boxes, 128, 30)
    ref = _cv2_crops(path, boxes)
    assert n == 60
    diff = np.abs(ref.astype(np.int16) - crops_lr.astype(np.int16))
    # Lowres loses high-frequency detail; content must still match.
    # The fixture's random-noise background is the worst case for
    # half-resolution reconstruction (pure high frequency).
    assert diff.mean() < 10.0, diff.mean()
    assert np.median(diff) <= 6.0


def test_out_of_frame_letterbox(video):
    """Boxes hanging off the frame edge letterbox black, like the cv2
    path (YoloCrop.square_crop out-of-frame fill)."""
    path, _ = video
    boxes = np.zeros((4, 1, 4), np.float32)
    boxes[:, 0] = (0.02, 0.05, 0.2, 0.25)  # mostly off the top-left
    ref = _cv2_crops(path, boxes)[..., 0, :, :, :]
    with native_decoder.NativeVideoDecoder(path) as dec:
        n, crops = dec.decode_crops(0, boxes, 128, 30)
    diff = np.abs(ref.astype(np.int16) - crops[:, 0].astype(np.int16))
    assert diff.mean() < 3.0, diff.mean()


def test_stride_skips_extraction(video):
    path, boxes = video
    with native_decoder.NativeVideoDecoder(path) as dec:
        n, crops = dec.decode_crops(0, boxes, 128, 30, stride=2)
    assert n == 60
    assert crops[1::2].max() == 0  # skipped frames stay black
    assert crops[0::2].max() > 0


def test_dense_stride_matches_sparse(video):
    """dense=True packs the extracted frames contiguously and must hold
    exactly the sparse layout's extracted rows, for both output formats."""
    path, boxes = video
    for fmt in ("bgr", "yuv420"):
        with native_decoder.NativeVideoDecoder(path) as dec:
            n_s, sparse = dec.decode_crops(0, boxes, 128, 30, stride=3, fmt=fmt)
        with native_decoder.NativeVideoDecoder(path) as dec:
            n_d, dense = dec.decode_crops(0, boxes, 128, 30, stride=3, fmt=fmt,
                                          dense=True)
        assert n_d == n_s
        assert dense.shape[0] == (boxes.shape[0] + 2) // 3
        np.testing.assert_array_equal(dense, sparse[::3])


def test_yuv420_format_matches_bgr(video):
    """The packed YUV420 transfer format reconstructs to the same RGB as
    the BGR format (up to 4:2:0 chroma subsampling at color edges)."""
    path, boxes = video
    with native_decoder.NativeVideoDecoder(path) as dec:
        _, bgr = dec.decode_crops(0, boxes, 128, 30)
    with native_decoder.NativeVideoDecoder(path) as dec:
        n, yuv = dec.decode_crops(0, boxes, 128, 30, fmt="yuv420")
    assert n == 60
    assert yuv.shape == (60, 2, 128 * 128 * 3 // 2)
    # Reconstruct on host with the same BT.601 limited-range math the
    # device applies.
    s, yb, cb = 128, 128 * 128, 64 * 64
    y = yuv[..., :yb].reshape(60, 2, s, s).astype(np.float32)
    u = yuv[..., yb:yb + cb].reshape(60, 2, s // 2, s // 2).astype(np.float32)
    v = yuv[..., yb + cb:].reshape(60, 2, s // 2, s // 2).astype(np.float32)
    u = np.repeat(np.repeat(u, 2, axis=2), 2, axis=3)
    v = np.repeat(np.repeat(v, 2, axis=2), 2, axis=3)
    yc = 1.164383 * (y - 16.0)
    r = yc + 1.596027 * (v - 128.0)
    g = yc - 0.391762 * (u - 128.0) - 0.812968 * (v - 128.0)
    b = yc + 2.017232 * (u - 128.0)
    rgb = np.clip(np.stack([b, g, r], axis=-1), 0, 255)  # compare as BGR
    diff = np.abs(rgb - bgr.astype(np.float32))
    assert diff.mean() < 4.0, diff.mean()
    # Letterbox black must match exactly (prefill Y=16, U=V=128).
    assert float(rgb[0, 0, 0, 0, 0]) == pytest.approx(float(bgr[0, 0, 0, 0, 0]), abs=3)


def test_mjpg_full_range_source(tmp_path):
    """A full-range (yuvj420p) codec decodes correctly through BOTH output
    formats: sws normalizes the YUV420 crop planes to limited range, so
    the device's BT.601 limited-range conversion stays valid regardless
    of the source codec's range."""
    path = str(tmp_path / "clip_mjpg.avi")
    w, h, n = 320, 180, 16
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (w, h))
    rng = np.random.default_rng(3)
    base = rng.integers(0, 80, (h, w, 3), dtype=np.uint8)
    boxes = np.zeros((n, 1, 4), np.float32)
    for i in range(n):
        fr = base.copy()
        cv2.circle(fr, (100 + 5 * i, 90), 30, (0, 200, 255), -1)
        writer.write(fr)
        boxes[i, 0] = ((100 + 5 * i) / w, 0.5, 80 / w, 80 / h)
    writer.release()

    ref = _cv2_crops(path, boxes)
    with native_decoder.NativeVideoDecoder(path) as dec:
        n_bgr, bgr = dec.decode_crops(0, boxes, 128, 30)
    with native_decoder.NativeVideoDecoder(path) as dec:
        n_yuv, yuv = dec.decode_crops(0, boxes, 128, 30, fmt="yuv420")
    assert n_bgr == n_yuv == n
    diff = np.abs(ref.astype(np.int16) - bgr.astype(np.int16))
    assert diff.mean() < 8.0, diff.mean()  # jpeg artifacts + resample phase
    # YUV420 reconstruction (limited-range math) matches the BGR path.
    s, yb, cb = 128, 128 * 128, 64 * 64
    y = yuv[..., :yb].reshape(n, 1, s, s).astype(np.float32)
    u = yuv[..., yb:yb + cb].reshape(n, 1, s // 2, s // 2).astype(np.float32)
    v = yuv[..., yb + cb:].reshape(n, 1, s // 2, s // 2).astype(np.float32)
    u = np.repeat(np.repeat(u, 2, axis=2), 2, axis=3)
    v = np.repeat(np.repeat(v, 2, axis=2), 2, axis=3)
    yc = 1.164383 * (y - 16.0)
    rgb = np.clip(np.stack([
        yc + 2.017232 * (u - 128.0),                       # B
        yc - 0.391762 * (u - 128.0) - 0.812968 * (v - 128.0),  # G
        yc + 1.596027 * (v - 128.0),                       # R
    ], axis=-1), 0, 255)
    d2 = np.abs(rgb - bgr.astype(np.float32))
    assert d2.mean() < 5.0, d2.mean()


def test_fast_auto_resolves_by_codec(video, tmp_path):
    """fast="auto" must apply the fast flags only on codecs that have an
    in-loop deblocking filter: ON for h264, OFF (spec-exact) for mpeg4."""
    path, _boxes = video
    with native_decoder.NativeVideoDecoder(path, fast="auto") as dec:
        assert dec.fast == 0  # mp4v: no in-loop deblock -> exact decode
    with native_decoder.NativeVideoDecoder(path, fast=True) as dec:
        assert dec.fast == 1  # forced stays forced

    from playaid_core_tpu.video import native_encoder

    if not native_encoder.available():
        pytest.skip("native h264 encoder unavailable")
    h264 = str(tmp_path / "clip_h264_auto.mp4")
    native_encoder.transcode(path, h264, crf=20)
    with native_decoder.NativeVideoDecoder(h264, fast="auto") as dec:
        assert dec.fast == 1
    with native_decoder.NativeVideoDecoder(h264) as dec:
        assert dec.fast == 0  # default stays spec-exact


def test_h264_fast_decode_close_to_exact(video, tmp_path):
    """fast=True (skip in-loop deblocking + FAST flag) on an h264 stream —
    h264's reduced-cost decode mode, since it has no fractional lowres —
    must stay pixel-close to the spec-exact decode after the 128px crop
    resample."""
    from playaid_core_tpu.video import native_encoder

    if not native_encoder.available():
        pytest.skip("native h264 encoder unavailable")
    path, boxes = video
    h264 = str(tmp_path / "clip_h264.mp4")
    native_encoder.transcode(path, h264, crf=20)

    with native_decoder.NativeVideoDecoder(h264) as dec:
        n_exact, exact = dec.decode_crops(0, boxes, 128, 30)
    with native_decoder.NativeVideoDecoder(h264, fast=True) as dec:
        n_fast, fast = dec.decode_crops(0, boxes, 128, 30)
    assert n_exact == n_fast == boxes.shape[0]
    diff = np.abs(exact.astype(np.int16) - fast.astype(np.int16))
    # Deblocking deltas are sub-visible at crop scale; content identical.
    assert diff.mean() < 2.0, diff.mean()
    assert np.median(diff) == 0


def test_stride_skip_bit_identical_h264(video, tmp_path):
    """stride_skip (AVDISCARD_NONREF on non-extracted slots) must leave
    extracted crops BIT-identical and decoded counts equal: the codec
    only ever drops pictures nothing references, so reference chains —
    and therefore every extracted frame — are untouched.  The saving is
    the reconstruction cost of x264's non-ref B-frames on skipped slots
    (~20-25% of h264 decode wall time on the bench fixture)."""
    from playaid_core_tpu.video import native_encoder

    if not native_encoder.available():
        pytest.skip("native h264 encoder unavailable")
    path, boxes = video
    h264 = str(tmp_path / "clip_h264_skip.mp4")
    native_encoder.transcode(path, h264, crf=20)

    for stride in (2, 3):
        with native_decoder.NativeVideoDecoder(h264, stride_skip=False) as dec:
            n_off, off = dec.decode_crops(0, boxes, 128, 30, stride=stride)
        with native_decoder.NativeVideoDecoder(h264, stride_skip=True) as dec:
            n_on, on = dec.decode_crops(0, boxes, 128, 30, stride=stride)
        assert n_off == n_on == boxes.shape[0]
        ext = np.arange(0, boxes.shape[0], stride)
        assert np.array_equal(off[ext], on[ext]), f"stride {stride}"

    # Chunked decode (the VodAnalyzer access pattern) with a chunk size
    # that is NOT a stride multiple: per-chunk grids must stay honest.
    with native_decoder.NativeVideoDecoder(h264, stride_skip=False) as dec:
        off_chunks = [dec.decode_crops(s, boxes[s:s + 25], 128, 30, stride=2)
                      for s in range(0, boxes.shape[0], 25)]
    with native_decoder.NativeVideoDecoder(h264, stride_skip=True) as dec:
        on_chunks = [dec.decode_crops(s, boxes[s:s + 25], 128, 30, stride=2)
                     for s in range(0, boxes.shape[0], 25)]
    for (n_a, a), (n_b, b), s in zip(off_chunks, on_chunks,
                                     range(0, boxes.shape[0], 25)):
        assert n_a == n_b
        ext = np.arange(0, a.shape[0], 2)
        assert np.array_equal(a[ext], b[ext]), f"chunk at {s}"

    # stride=1 must be a strict no-op (skip window never armed).
    with native_decoder.NativeVideoDecoder(h264, stride_skip=True) as dec:
        n1, all_on = dec.decode_crops(0, boxes, 128, 30, stride=1)
    with native_decoder.NativeVideoDecoder(h264, stride_skip=False) as dec:
        n0, all_off = dec.decode_crops(0, boxes, 128, 30, stride=1)
    assert n1 == n0 and np.array_equal(all_on, all_off)


class TestVodAnalyzerNative:
    @pytest.fixture(scope="class")
    def pipeline(self):
        import jax
        from playaid_core_tpu.infer.pipeline import BatchedActionPipeline

        pipe = BatchedActionPipeline(family="cnn", num_actions=16,
                                     sequence_length=5, frame_delta=2)
        variables = pipe.init(jax.random.PRNGKey(0))
        return pipe, variables

    def test_embeddings_match_cv2_backend(self, video, pipeline):
        """Same VOD through the native and cv2 decode backends produces
        near-identical embeddings (labels therefore agree except at
        decision boundaries)."""
        import jax.numpy as jnp
        from playaid_core_tpu.infer.vod_pipeline import VodAnalyzer

        path, boxes = video
        pipe, variables = pipeline
        ref = _cv2_crops(path, boxes)
        with native_decoder.NativeVideoDecoder(path) as dec:
            _, crops = dec.decode_crops(0, boxes, 128, 30)
        e1 = np.asarray(pipe.embed_crops_u8(
            variables, jnp.asarray(ref.reshape(-1, 128, 128, 3))))
        e2 = np.asarray(pipe.embed_crops_u8(
            variables, jnp.asarray(crops.reshape(-1, 128, 128, 3))))
        num = (e1 * e2).sum(-1)
        den = np.linalg.norm(e1, axis=-1) * np.linalg.norm(e2, axis=-1) + 1e-9
        assert (num / den).min() > 0.995

    def test_native_backend_runs_and_labels_shape(self, video, pipeline):
        from playaid_core_tpu.infer.vod_pipeline import VodAnalyzer

        path, boxes = video
        pipe, variables = pipeline
        analyzer = VodAnalyzer(pipe, variables=variables, chunk=12,
                               decode_backend="native")
        result = analyzer.analyze(path, boxes)
        assert result["labels"].shape == (60, 2)
        assert result["frames"] == 60

    def test_yuv_transfer_embeddings_match(self, video, pipeline):
        """YUV420 transfer + device conversion gives embeddings matching
        the BGR-transfer path."""
        import jax.numpy as jnp

        path, boxes = video
        pipe, variables = pipeline
        with native_decoder.NativeVideoDecoder(path) as dec:
            _, bgr = dec.decode_crops(0, boxes, 128, 30)
        with native_decoder.NativeVideoDecoder(path) as dec:
            _, yuv = dec.decode_crops(0, boxes, 128, 30, fmt="yuv420")
        e1 = np.asarray(pipe.embed_crops_u8(
            variables, jnp.asarray(bgr.reshape(-1, 128, 128, 3))))
        e2 = np.asarray(pipe.embed_crops_yuv(
            variables, jnp.asarray(yuv.reshape(-1, 128 * 128 * 3 // 2))))
        num = (e1 * e2).sum(-1)
        den = np.linalg.norm(e1, axis=-1) * np.linalg.norm(e2, axis=-1) + 1e-9
        assert (num / den).min() > 0.995

    def test_yuv_transfer_analyze(self, video, pipeline):
        from playaid_core_tpu.infer.vod_pipeline import VodAnalyzer

        path, boxes = video
        pipe, variables = pipeline
        analyzer = VodAnalyzer(pipe, variables=variables, chunk=12,
                               decode_backend="native",
                               transfer_format="yuv420")
        result = analyzer.analyze(path, boxes)
        assert result["labels"].shape == (60, 2)
        assert result["frames"] == 60

    def test_stride_label_propagation(self, video, pipeline):
        """stride=2 labels are the sampled frames' labels, propagated."""
        from playaid_core_tpu.infer.vod_pipeline import VodAnalyzer

        path, boxes = video
        pipe, variables = pipeline
        analyzer = VodAnalyzer(pipe, variables=variables, chunk=12,
                               decode_backend="native", stride=2)
        result = analyzer.analyze(path, boxes)
        labels = result["labels"]
        assert labels.shape == (60, 2)
        assert np.array_equal(labels[0::2], labels[1::2])

    def test_short_vod_single_partial_chunk(self, video, pipeline):
        """Fewer frames than one chunk still labels every frame."""
        from playaid_core_tpu.infer.vod_pipeline import VodAnalyzer

        path, boxes = video
        pipe, variables = pipeline
        analyzer = VodAnalyzer(pipe, variables=variables, chunk=48,
                               decode_backend="native")
        result = analyzer.analyze(path, boxes[:10], num_frames=10)
        assert result["labels"].shape == (10, 2)
        assert result["frames"] == 10

    def test_stride_with_partial_tail(self, video, pipeline):
        """stride=2 with a frame count not divisible by chunk or stride."""
        from playaid_core_tpu.infer.vod_pipeline import VodAnalyzer

        path, boxes = video
        pipe, variables = pipeline
        analyzer = VodAnalyzer(pipe, variables=variables, chunk=12,
                               decode_backend="native", stride=2)
        result = analyzer.analyze(path, boxes[:31], num_frames=31)
        assert result["labels"].shape == (31, 2)

    def test_staging_thread_propagates_errors(self, pipeline):
        """A decode failure mid-stream surfaces in the caller, not a hang."""
        from playaid_core_tpu.infer.vod_pipeline import VodAnalyzer

        pipe, variables = pipeline
        analyzer = VodAnalyzer(pipe, variables=variables, chunk=12,
                               decode_backend="native")
        boxes = np.zeros((24, 2, 4), np.float32)
        with pytest.raises(Exception):
            analyzer.analyze("/nonexistent/video.mp4", boxes)

    def test_analyze_many_matches_sequential(self, video, pipeline):
        """Concurrent multi-VOD analysis produces the same labels as
        sequential runs and isolates per-job failures."""
        from playaid_core_tpu.infer.vod_pipeline import VodAnalyzer, analyze_many

        path, boxes = video
        pipe, variables = pipeline
        single = VodAnalyzer(pipe, variables=variables, chunk=12)
        ref = single.analyze(path, boxes)

        results = analyze_many(
            [(path, boxes), ("/nonexistent.mp4", boxes), (path, boxes[:24]),
             # per-job kwargs override the shared ones (mixed-codec
             # batches need per-VOD decode settings)
             (path, boxes, {"stride": 2})],
            pipeline=pipe, variables=variables, chunk=12,
        )
        assert np.array_equal(results[0]["labels"], ref["labels"])
        assert isinstance(results[1], Exception)
        assert results[2]["labels"].shape == (24, 2)
        assert results[3]["labels"].shape == ref["labels"].shape
        assert np.array_equal(results[3]["labels"][0::2],
                              results[3]["labels"][1::2])

    def test_stride_cv2_backend(self, video, pipeline):
        from playaid_core_tpu.infer.vod_pipeline import VodAnalyzer

        path, boxes = video
        pipe, variables = pipeline
        analyzer = VodAnalyzer(pipe, variables=variables, chunk=12,
                               decode_backend="cv2", stride=2)
        result = analyzer.analyze(path, boxes)
        labels = result["labels"]
        assert labels.shape == (60, 2)
        assert np.array_equal(labels[0::2], labels[1::2])


def test_consumer_failure_stops_producers(tmp_path):
    """A consumer that dies mid-run must not leave the staging thread
    blocked on its queue or decoder workers decoding (ADVICE r2:
    analyze_many leaked a thread + decoder handles per failed job)."""
    import threading
    import time

    import jax
    from playaid_core_tpu.infer.pipeline import BatchedActionPipeline
    from playaid_core_tpu.infer.vod_pipeline import VodAnalyzer

    path = str(tmp_path / "v.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 60,
                             (320, 180))
    for _ in range(120):
        writer.write(np.full((180, 320, 3), 60, np.uint8))
    writer.release()
    boxes = np.tile(np.array([0.5, 0.5, 0.3, 0.3], np.float32), (120, 2, 1))

    pipe = BatchedActionPipeline(family="cnn", num_actions=4,
                                 sequence_length=3, frame_delta=1)
    variables = pipe.init(jax.random.PRNGKey(0))
    analyzer = VodAnalyzer(pipe, variables=variables, chunk=12,
                           decode_backend="native")

    calls = {"n": 0}

    def make_failing(real):
        def failing_embed(v, x):
            calls["n"] += 1
            if calls["n"] >= 2:
                raise RuntimeError("injected device failure")
            return real(v, x)
        return failing_embed

    real_u8, real_yuv = pipe.embed_crops_u8, pipe.embed_crops_yuv
    pipe.embed_crops_u8 = make_failing(real_u8)
    pipe.embed_crops_yuv = make_failing(real_yuv)
    before = threading.active_count()
    try:
        with pytest.raises(RuntimeError, match="injected device failure"):
            analyzer.analyze(path, boxes)
    finally:
        pipe.embed_crops_u8, pipe.embed_crops_yuv = real_u8, real_yuv
    # Producers must wind down promptly (staging thread joined in the
    # consumer's finally; decoder workers exit via close()).
    deadline = time.time() + 15.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.1)
    assert threading.active_count() <= before, (
        f"leaked threads: {threading.enumerate()}"
    )


def test_fractional_padding_rejected_by_native_binding(video):
    """A fractional pad must fail loudly — int() truncation in the C call
    would silently decode with zero padding (divergent geometry vs the
    square_crop fraction-of-box semantics)."""
    from playaid_core_tpu.video.native_decoder import NativeVideoDecoder

    path, _ = video
    boxes = np.full((2, 1, 4), 0.25, np.float32)
    with NativeVideoDecoder(path) as d:
        with pytest.raises(ValueError, match="integer pixel padding"):
            d.decode_crops(0, boxes, padding=0.125, out_size=64)


def test_resolve_padding_fraction_matches_pixel_pad():
    """resolve_padding realizes square_crop's fraction-of-square-dim
    semantics by box inflation: the extractor geometry
    (side = 2*(half + pad)) must come out identical to an explicit pixel
    pad of frac * square_dim."""
    from playaid_core_tpu.infer.vod_pipeline import extract_crops, resolve_padding

    rng = np.random.default_rng(3)
    frame = rng.integers(0, 255, (360, 640, 3), dtype=np.uint8)
    # 80x64 px box at an interior center: square_dim 80, frac 0.125 -> pad 10.
    boxes = np.array([[0.5, 0.5, 80 / 640, 64 / 360]], np.float32)

    ref = extract_crops(frame, boxes, out_size=64, padding=10)
    inflated, pad = resolve_padding(boxes, 0.125)
    got = extract_crops(frame, inflated, out_size=64, padding=pad)
    assert pad == 0
    np.testing.assert_array_equal(got, ref)

    # Integer padding passes through untouched.
    same, pad30 = resolve_padding(boxes, 30)
    assert pad30 == 30 and same is boxes

    # Junk (float >= 1 that is not integral) is rejected, not truncated.
    with pytest.raises(ValueError):
        resolve_padding(boxes, 1.5)


def test_resolve_padding_numpy_scalar():
    """np.float32/np.int64 paddings (env/config parses) resolve like
    their Python equivalents instead of erroring (round-3 advice)."""
    from playaid_core_tpu.infer.vod_pipeline import resolve_padding

    boxes = np.array([[[0.5, 0.5, 0.1, 0.2]]], np.float32)
    b1, p1 = resolve_padding(boxes, 0.125)
    b2, p2 = resolve_padding(boxes, np.float32(0.125))
    assert p1 == p2 == 0
    np.testing.assert_allclose(b1, b2)
    _, p3 = resolve_padding(boxes, np.int64(30))
    assert p3 == 30
