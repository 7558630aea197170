import os

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from playaid_core_tpu.infer.ocr import TemplateDigitOCR, render_digit_templates
from playaid_core_tpu.infer.pipeline import BatchedActionPipeline
from playaid_core_tpu.infer.vod_pipeline import (
    VodAnalyzer,
    extract_crops,
    extract_windows,
)

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def cnn_pipe():
    pipe = BatchedActionPipeline(family="cnn", num_actions=8, sequence_length=5,
                                 frame_delta=2, crop_size=32)
    variables = pipe.init(KEY)
    return pipe, variables


def test_embed_and_classify_shapes(cnn_pipe):
    pipe, variables = cnn_pipe
    crops = jnp.zeros((6, 32, 32, 3), jnp.float32)
    emb = pipe.embed_crops(variables, crops)
    assert emb.shape == (6, 1000)

    seq = jax.random.normal(KEY, (20, 1000))
    labels, conf = pipe.classify_sequence(variables, seq, pad_bucket=32)
    assert labels.shape == (20,) and conf.shape == (20,)
    assert (np.asarray(conf) >= 0).all() and (np.asarray(conf) <= 100).all()


def test_classify_padding_invariance(cnn_pipe):
    """Bucket padding must not change results for the real frames."""
    pipe, variables = cnn_pipe
    seq = jax.random.normal(KEY, (11, 1000))
    l1, c1 = pipe.classify_sequence(variables, seq, pad_bucket=16)
    l2, c2 = pipe.classify_sequence(variables, seq, pad_bucket=64)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-5)


def test_classify_matches_per_window_head(cnn_pipe):
    """The batched window gather equals applying the head to manually
    gathered middle-out windows."""
    from playaid_core_tpu.ops.preprocess import middle_out_frame_indices

    pipe, variables = cnn_pipe
    f = 13
    seq = jax.random.normal(KEY, (f, 1000))
    labels, conf = pipe.classify_sequence(variables, seq, pad_bucket=16)

    idx = np.asarray(middle_out_frame_indices(jnp.arange(f), 5, 2, f))
    for frame in (0, 6, 12):
        window = seq[idx[frame]][None]  # [1, T, D]
        logp = pipe._head_jit(variables["head"], window)
        assert int(np.argmax(np.asarray(logp))) == int(labels[frame])


def test_classify_smoothing_pools_evidence(cnn_pipe):
    """smooth_radius pools window log-posteriors over a neighborhood:
    the smoothed labels equal the argmax of the numpy mean of per-frame
    log-probs over the clamped window, and padding never leaks in."""
    from playaid_core_tpu.ops.preprocess import middle_out_frame_indices

    pipe, variables = cnn_pipe
    f, r = 14, 3
    seq = jax.random.normal(KEY, (f, 1000))

    idx = np.asarray(middle_out_frame_indices(jnp.arange(f), 5, 2, f))
    logp = np.asarray(
        pipe._head_jit(variables["head"], jnp.asarray(seq)[idx])
    )  # [F, A]
    expect = []
    for i in range(f):
        lo, hi = max(i - r, 0), min(i + r, f - 1)
        expect.append(int(np.argmax(logp[lo : hi + 1].mean(axis=0))))

    labels, conf = pipe.classify_sequence(
        variables, seq, pad_bucket=16, smooth_radius=r
    )
    np.testing.assert_array_equal(np.asarray(labels), expect)

    # pad-bucket invariance holds under smoothing too
    l2, _ = pipe.classify_sequence(variables, seq, pad_bucket=64, smooth_radius=r)
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(l2))

    # smooth_radius=0 stays the raw per-window path
    raw, _ = pipe.classify_sequence(variables, seq, pad_bucket=16)
    np.testing.assert_array_equal(
        np.asarray(raw), np.argmax(logp, axis=-1)
    )


def test_classify_buffer_smoothing_matches_sequence(cnn_pipe):
    pipe, variables = cnn_pipe
    f, r = 9, 2
    emb = jax.random.normal(KEY, (f, 2, 1000))
    buf = pipe.make_embedding_buffer(f)
    buf = pipe.scatter_embeddings(
        buf, jnp.asarray(np.asarray(emb).reshape(f * 2, 1000)), 0
    )
    labels, _ = pipe.classify_buffer(variables, buf, f, smooth_radius=r)
    for k in range(2):
        l_ref, _ = pipe.classify_sequence(
            variables, emb[:, k, :], pad_bucket=16, smooth_radius=r
        )
        np.testing.assert_array_equal(np.asarray(labels)[:, k], np.asarray(l_ref))


def test_epilogue_matches_classify_sequence(cnn_pipe):
    pipe, variables = cnn_pipe
    chunk = 4
    f = 10
    emb = jax.random.normal(KEY, (f, 2, 1000))
    # Build padded chunks like the VOD loop does: [chunk*2, D] each.
    chunks = []
    for start in range(0, f, chunk):
        n = min(chunk, f - start)
        block = np.zeros((chunk, 2, 1000), np.float32)
        block[:n] = np.asarray(emb[start : start + n])
        chunks.append(jnp.asarray(block.reshape(chunk * 2, 1000)))
    labels, conf = pipe.classify_chunked(variables, chunks, n_last=f % chunk or chunk)
    assert labels.shape == (f, 2)

    for k in range(2):
        l_ref, c_ref = pipe.classify_sequence(variables, emb[:, k, :], pad_bucket=16)
        np.testing.assert_array_equal(np.asarray(labels)[:, k], np.asarray(l_ref))


def test_extract_windows_geometry():
    frame = np.zeros((720, 1280, 3), np.uint8)
    frame[300:420, 600:680] = 200
    boxes = np.array([[0.5, 0.5, 0.0625, 0.1667]])  # 80x120 box at center
    wins, origins = extract_windows(frame, boxes, window=256, padding=10)
    assert wins.shape == (1, 256, 256, 3)
    side = origins[0, 2]
    assert side == 2 * (60 + 10)  # max(80,120)//2 + padding
    # Content present in the window.
    assert wins[0].max() == 200


def test_extract_crops_matches_square_crop():
    from playaid_core_tpu.geometry import YoloCrop

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:720, 0:1280]
    frame = np.stack([yy % 255, xx % 255, (yy + xx) % 255], axis=-1).astype(np.uint8)
    box = np.array([[0.5, 0.5, 0.1, 0.15]])
    fast = extract_crops(frame, box, out_size=128, padding=20)[0]
    ok, slow = YoloCrop(0.5, 0.5, 0.1, 0.15).square_crop(frame, 128, padding=20)
    assert ok
    err = np.abs(fast.astype(int) - slow.astype(int)).mean()
    assert err < 3.0, err


def test_vod_analyzer_end_to_end(tmp_path, cnn_pipe):
    pipe, variables = cnn_pipe
    video = str(tmp_path / "v.mp4")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 30, (320, 180))
    for i in range(40):
        frame = np.full((180, 320, 3), i * 3 % 255, np.uint8)
        w.write(frame)
    w.release()

    boxes = np.tile(np.array([[0.3, 0.5, 0.2, 0.2], [0.7, 0.5, 0.2, 0.2]],
                             np.float32), (40, 1, 1))
    analyzer = VodAnalyzer(pipe, variables=variables, chunk=16, host_resize=True)
    result = analyzer.analyze(video, boxes)
    assert result["frames"] == 40
    assert result["labels"].shape == (40, 2)
    assert result["fps"] > 0


def test_vod_analyzer_device_window_mode(tmp_path, cnn_pipe):
    pipe, variables = cnn_pipe
    video = str(tmp_path / "v2.mp4")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 30, (320, 180))
    for i in range(20):
        w.write(np.full((180, 320, 3), 90, np.uint8))
    w.release()
    boxes = np.tile(np.array([[0.3, 0.5, 0.2, 0.2], [0.7, 0.5, 0.2, 0.2]],
                             np.float32), (20, 1, 1))
    analyzer = VodAnalyzer(pipe, variables=variables, chunk=8, window=128,
                           host_resize=False)
    result = analyzer.analyze(video, boxes)
    assert result["labels"].shape == (20, 2)


def test_ocr_reads_rendered_numbers():
    templates = render_digit_templates()
    assert len(templates) == 10
    ocr = TemplateDigitOCR(templates)

    from PIL import Image, ImageDraw, ImageFont

    from playaid_core_tpu.constants import TEXT_FONT_PATH

    font = ImageFont.truetype(TEXT_FONT_PATH, 40)
    for text, expected in (("42", 42.0), ("117", 117.0), ("0", 0.0)):
        img = Image.new("RGB", (200, 64), (0, 0, 0))
        ImageDraw.Draw(img).text((10, 5), text, font=font, fill=(255, 255, 255))
        bgr = np.array(img)[:, :, ::-1].copy()
        ok, (value, raw, conf, details) = ocr(bgr)
        assert ok, (text, raw)
        assert value == expected, (text, value, raw)


def test_ocr_empty_crop():
    ocr = TemplateDigitOCR()
    ok, (value, raw, conf, details) = ocr(np.zeros((60, 130, 3), np.uint8))
    assert not ok
    assert value == -1


def test_ocr_segmentation_bridges_codec_fragmentation():
    """Video codecs quantize thin glyph strokes to pieces; each fragment
    must not read as an extra digit (regression: '143.1' -> '14.0631')."""
    from PIL import Image, ImageDraw, ImageFont

    from playaid_core_tpu.constants import TEXT_FONT_PATH
    from playaid_core_tpu.infer.ocr import TemplateDigitOCR, segment_digit_components

    font = ImageFont.truetype(TEXT_FONT_PATH, 40)
    img = Image.new("RGB", (200, 64), (0, 0, 0))
    ImageDraw.Draw(img).text((10, 5), "143", font=font, fill=(255, 255, 255))
    bgr = np.array(img)[:, :, ::-1].copy()

    # Knock out a 2px horizontal stripe through the glyph midline —
    # the codec-style stroke break that used to split digits into
    # several connected components.
    h = bgr.shape[0]
    bgr[h // 2 : h // 2 + 2, :] = 0

    comps, _ = segment_digit_components(bgr)
    assert len(comps) == 3, [(c["x"], c["w"], c["h"]) for c in comps]

    ok, (value, raw, conf, details) = TemplateDigitOCR()(bgr)
    assert ok
    assert value == 143.0, raw


def test_auto_lowres_policy():
    from playaid_core_tpu.infer.vod_pipeline import auto_lowres

    w, h, crop, pad = 1920, 1080, 128, 30

    def boxes(px):
        b = np.zeros((10, 2, 4), np.float32)
        b[..., 2] = px / w
        b[..., 3] = px / h
        b[..., :2] = 0.5
        return b

    # side = px + 2*pad.  600px box -> side 660: /2=330 >= 128, /4=165 >= 128
    assert auto_lowres(boxes(600), w, h, crop, pad) == 2
    # 260px box -> side 320: /2=160 >= 128, /4=80 < 128
    assert auto_lowres(boxes(260), w, h, crop, pad) == 1
    # 120px box -> side 180: /2=90 < 128 -> full-res only
    assert auto_lowres(boxes(120), w, h, crop, pad) == 0
    # codec clamp wins
    assert auto_lowres(boxes(600), w, h, crop, pad, max_lowres=1) == 1
    # the SMALLEST real box governs: one far-zoom stretch disables lowres
    mixed = boxes(600)
    mixed[7, 1, 2:] = (120 / w, 120 / h)
    assert auto_lowres(mixed, w, h, crop, pad) == 0
    # degenerate (absent-fighter) boxes are ignored, empty set -> 0
    mixed[7, 1, 2:] = 0.0
    assert auto_lowres(mixed, w, h, crop, pad) == 2
    assert auto_lowres(np.zeros((4, 2, 4), np.float32), w, h, crop, pad) == 0


def test_return_raw_single_pass_matches_separate_raw_call(cnn_pipe):
    """return_raw captures the pre-smoothing/pre-decode argmax from the
    SAME head forward — it must equal what a separate raw call returns."""
    pipe, variables = cnn_pipe
    seq = jax.random.normal(jax.random.PRNGKey(7), (24, 1000))

    labels, conf, raw = pipe.classify_sequence(
        variables, seq, pad_bucket=16, smooth_radius=3, decode="viterbi",
        switch_cost=2.0, return_raw=True,
    )
    raw_ref, _ = pipe.classify_sequence(variables, seq, pad_bucket=16)
    np.testing.assert_array_equal(np.asarray(raw), np.asarray(raw_ref))
    assert labels.shape == raw.shape == (24,)

    # With no smoothing/decode, raw IS the decoded label stream.
    l0, _, r0 = pipe.classify_sequence(variables, seq, pad_bucket=16,
                                       return_raw=True)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(r0))
