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
import statistics
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


# Fixture GT: each fighter holds a move for this many video frames (two
# 16-frame animation cycles at the deployed 48-video-frames-per-cycle
# rate — reference temporal geometry, dataset_utils.py:94).
SEGMENT_FRAMES = 96
FIXTURE_FIGHTERS = ("Byleth", "Pikachu")
FIXTURE_VARIANT = 17  # the capstone's HELD-OUT appearance variant


def make_sprite_video(path, num_frames, width=1920, height=1080, fps=60,
                      seed=7, sprite_px=250):
    """Bench fixture with REAL content + known labels: two skeletal-sprite
    fighters (held-out appearance variant) performing a deterministic
    move schedule over the same noise background and trajectories as the
    legacy circles fixture (same box sizes -> comparable decode cost).

    Returns (boxes [F, 2, 4], gt_class_ids [F, 2]) — gt ids in the
    63-class MOVE_TO_CLASS_ID space the headline pipeline labels in, so
    the bench can assert the working system's label sanity in-run.
    """
    import cv2

    from playaid_core_tpu.datagen import skeletal_sprites as sk
    from playaid_core_tpu.ontology import MOVE_TO_CLASS_ID

    rng = np.random.default_rng(seed)
    base = rng.integers(0, 60, (height, width, 3), dtype=np.uint8)
    n_segments = (num_frames + SEGMENT_FRAMES - 1) // SEGMENT_FRAMES
    schedule = [
        [sk.MOVES[int(rng.integers(0, len(sk.MOVES)))] for _ in range(n_segments)]
        for _ in FIXTURE_FIGHTERS
    ]

    # Pre-render each (fighter, move) cycle once at the fixture scale.
    cache = {}

    def sprite_for(k, move, phase_idx):
        key = (k, move, phase_idx)
        if key not in cache:
            img = sk.render_sprite(
                FIXTURE_FIGHTERS[k], move, phase_idx / 16.0, size=352,
                facing=1 if k == 0 else -1, variant_seed=FIXTURE_VARIANT,
            )
            img = sk.tight_crop(img, min_size=1)
            h, w = img.shape[:2]
            scale = sprite_px / max(h, w)
            cache[key] = cv2.resize(
                img, (max(1, int(w * scale)), max(1, int(h * scale))),
                interpolation=cv2.INTER_AREA,
            )
        return cache[key]

    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (width, height))
    boxes = np.zeros((num_frames, 2, 4), np.float32)
    gt = np.zeros((num_frames, 2), np.int32)
    box_px = 260
    for i in range(num_frames):
        frame = base.copy()
        x_frac = 0.2 + 0.6 * (i / num_frames)
        centers = (
            (x_frac, 0.5),
            (1.0 - x_frac, 0.5 + 60 / 1080),
        )
        for k in range(2):
            move = schedule[k][i // SEGMENT_FRAMES]
            # 16-frame cycle over 48 video frames (anim advances every 3rd
            # video frame, the deployed frame_delta=3 geometry).
            spr = sprite_for(k, move, (i // 3) % 16)
            cx = int(centers[k][0] * width)
            cy = int(centers[k][1] * height)
            sh, sw = spr.shape[:2]
            y0, x0 = cy - sh // 2, cx - sw // 2
            vy0, vy1 = max(0, y0), min(height, y0 + sh)
            vx0, vx1 = max(0, x0), min(width, x0 + sw)
            if vy1 > vy0 and vx1 > vx0:
                tile = spr[vy0 - y0 : vy1 - y0, vx0 - x0 : vx1 - x0]
                alpha = tile[:, :, 3:4].astype(np.float32) / 255.0
                roi = frame[vy0:vy1, vx0:vx1].astype(np.float32)
                frame[vy0:vy1, vx0:vx1] = (
                    tile[:, :, :3] * alpha + roi * (1.0 - alpha)
                ).astype(np.uint8)
            boxes[i, k] = (centers[k][0], centers[k][1],
                           box_px / width, box_px / height)
            gt[i, k] = MOVE_TO_CLASS_ID[move]
        writer.write(frame)
    writer.release()
    np.savez(path + ".gt.npz", boxes=boxes, gt=gt)
    return boxes, gt


def load_bench_weights(pipe):
    """Committed small trained weights for the headline pipeline (CNN
    family, 63 classes — trained by tools/train_bench_weights.py on the
    skeletal-sprite synth distribution).  Returns the split {embed, head}
    variables, or None when the asset isn't present."""
    import io

    from playaid_core_tpu import constants  # noqa: F401  (package root)

    asset = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "playaid_core_tpu", "assets", "bench_cnn63.npz",
    )
    if not os.path.exists(asset):
        return None
    from flax.traverse_util import unflatten_dict

    with np.load(asset) as z:
        flat = {tuple(k.split("/")): np.asarray(z[k], np.float32)
                for k in z.files}
    return unflatten_dict(flat)


def measure_decode_only_fps(path, boxes, chunk, lowres, stride, fast,
                            crop_size=128, padding=30, runs=3):
    """Host decode ceiling for the EXACT headline configuration: the
    native decoder run standalone (decode + NONREF stride-skip + crop
    extract + letterbox resize + yuv420 packing, dense layout), no
    device, no transfers.  This is the number the 1-core host bounds the
    e2e pipeline by; bench publishes it as `decode_only_fps` and the
    ratio e2e/ceiling as `e2e_over_ceiling`."""
    from playaid_core_tpu.video.native_decoder import NativeVideoDecoder

    num_frames = boxes.shape[0]

    def one_run():
        dec = NativeVideoDecoder(path, lowres=lowres if isinstance(lowres, int)
                                 else 0, fast=fast)
        try:
            t0 = time.perf_counter()
            total = 0
            for c0 in range(0, num_frames, chunk):
                stop = min(c0 + chunk, num_frames)
                cb = np.zeros((chunk, boxes.shape[1], 4), np.float32)
                cb[: stop - c0] = boxes[c0:stop]
                n, _ = dec.decode_crops(c0, cb, crop_size, padding,
                                        stride=stride, fmt="yuv420",
                                        dense=True)
                total += min(n, stop - c0)
            return total / (time.perf_counter() - t0)
        finally:
            dec.close()

    return round(statistics.median(one_run() for _ in range(runs)), 1)


def measure_device_crops_per_sec(pipe, variables, batch=512, iters=12):
    """Device-only capability: fused BGR->RGB + normalize + ResNet embed
    throughput (crops/s) on synthetic uint8 crops.  Fenced by a data
    readback (block_until_ready through tunneled devices can ack at
    dispatch)."""
    import jax.numpy as jnp

    crops = jnp.zeros((batch, 128, 128, 3), jnp.uint8)
    out = pipe.embed_crops_u8(variables, crops)
    float(jnp.sum(out.astype(jnp.float32)))  # warm + fence
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipe.embed_crops_u8(variables, crops)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    num_frames = int(os.environ.get("BENCH_FRAMES", "600"))
    chunk = int(os.environ.get("BENCH_CHUNK", "48"))
    # Scale-at-decode: mpeg4 supports fractional (1/2^n) decode; crops are
    # resampled to the model's 128px input regardless.  Fractional decode
    # is only label-safe while the decoded crop region stays >= the model
    # input size (measured with the scaled 27-class capstone model:
    # below that, lowres=1 costs 4-46 pts of agreement and lowres=2
    # collapses it — tools/validate_decode_backends.py).  The default is
    # therefore the DEPLOYED policy, lowres="auto"
    # (vod_pipeline.auto_lowres): pick the largest safe factor from the
    # measured box sizes.  On this fixture's 260px boxes auto resolves to
    # lowres=1.  BENCH_LOWRES=0/1/2 forces a fixed factor.
    lowres_env = os.environ.get("BENCH_LOWRES", "auto")
    lowres = lowres_env if lowres_env == "auto" else int(lowres_env)
    # Label every 2nd frame and propagate (matches the reference's own
    # effective temporal resolution: its GT videos are 30 fps against a
    # 60 fps log — reference: dataset_utils.py:94).  BENCH_STRIDE=1 for
    # per-frame classification.
    stride = int(os.environ.get("BENCH_STRIDE", "2"))
    timed_runs = int(os.environ.get("BENCH_RUNS", "3"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    # Tunneled devices wedge the FIRST client after an idle window or a
    # back-to-back session handoff (observed: a trivial first dispatch
    # taking 75+ s, or hanging outright past a 580 s timeout).  Probe
    # from throwaway subprocesses until the tunnel answers, BEFORE this
    # process's own first device touch.
    from playaid_core_tpu.tpu_warmup import warm_tunnel

    try:
        warm_tunnel(log=log)
    except RuntimeError as e:
        log(f"tunnel warm-up failed ({e}); proceeding anyway")

    import jax
    import jax.numpy as jnp

    from playaid_core_tpu.infer.pipeline import BatchedActionPipeline
    from playaid_core_tpu.infer.vod_pipeline import VodAnalyzer
    from playaid_core_tpu.video import native_decoder

    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}, host cores: {os.cpu_count()}")
    log(f"native decoder available: {native_decoder.available()}, "
        f"lowres: {lowres}, stride: {stride}")

    # Headline fixture: skeletal-sprite fighters with a KNOWN move
    # schedule (held-out appearance variant) over the same noise
    # background/trajectories/box sizes as the legacy circles fixture —
    # so the run demonstrates the working system (labels checked against
    # GT below when trained weights are present), at comparable decode
    # cost.
    video_path = os.path.join(tempfile.gettempdir(),
                              f"bench_sprites_1080p_{num_frames}.mp4")
    gt_path = video_path + ".gt.npz"
    if not (os.path.exists(video_path) and os.path.exists(gt_path)):
        log("generating synthetic 1080p60 sprite VOD (known GT)...")
        make_sprite_video(video_path, num_frames)
    with np.load(gt_path) as z:
        gt_ids = z["gt"]
        fixture_boxes = z["boxes"]

    # Real VODs are h264 (the reference ingests h264 via cv2,
    # manuscript.py:70), so the HEADLINE runs on an h264 fixture through
    # the deployed defaults: auto-lowres (h264 has no fractional decode —
    # clamps to full-res) + auto fast-decode (skip the in-loop deblock,
    # label-validated in tests/test_decode_backend_agreement.py) +
    # label-stride.  The mpeg4 (mp4v) fixture rides alongside, where
    # fractional lowres does apply.
    h264_path = None
    try:
        from playaid_core_tpu.video import native_encoder

        if native_encoder.available():
            h264_path = video_path.replace(".mp4", "_h264.mp4")
            if not os.path.exists(h264_path):
                log("transcoding bench VOD to h264 (one-time fixture)...")
                native_encoder.transcode(video_path, h264_path, crf=20)
    except Exception as e:  # noqa: BLE001
        log(f"h264 fixture unavailable ({e}); headline falls back to mpeg4")
    headline_path = h264_path or video_path
    headline_codec = "h264" if h264_path else "mpeg4"

    boxes = fixture_boxes
    dtype = jnp.bfloat16 if backend == "tpu" else jnp.float32
    pipe = BatchedActionPipeline(
        family="cnn", num_actions=63, sequence_length=7, frame_delta=3, dtype=dtype
    )
    analyzer = VodAnalyzer(pipe, window=384, padding=30, chunk=chunk, host_resize=True,
                           lowres=lowres, stride=stride)
    trained = load_bench_weights(pipe)
    if trained is not None:
        analyzer.variables = trained
        log("loaded trained bench weights (assets/bench_cnn63.npz)")
    else:
        log("no committed bench weights found; headline runs random-init "
            "(labels unchecked)")
    analyzer.ensure_variables()

    # Device-only capability metric (the e2e number is host-decode-bound on
    # few-core hosts; the chip itself sustains far more).
    device_cps = measure_device_crops_per_sec(pipe, analyzer.variables)
    log(f"device-only embed throughput: {device_cps:,.0f} crops/s "
        f"({device_cps / 2:,.0f} fps at 2 fighters/frame)")

    # Warm up compiles outside the timed region (full length so every
    # program shape the timed run needs is already compiled).
    log("warming up (compile)...")
    warm = analyzer.analyze(headline_path, boxes)
    log(f"warm-up fps: {warm['fps']:.1f}")

    # Label sanity against the fixture's known GT (the working system, not
    # just its throughput): interior frames only — label-stride
    # propagation and temporal-window context legitimately blur the
    # ~segment boundaries.
    label_agreement = None
    label_agreement_viterbi = None
    if trained is not None:
        margin = 12
        pos = np.arange(num_frames) % SEGMENT_FRAMES
        interior = (pos >= margin) & (pos < SEGMENT_FRAMES - margin)
        agree = (warm["labels"][:num_frames] == gt_ids[:num_frames])
        label_agreement = round(float(agree[interior].mean()), 4)
        # The deployed decode (capstone operating point): Viterbi MAP path
        # under the switching prior, same embeddings, one extra pass.
        an_vit = VodAnalyzer(pipe, variables=analyzer.variables, window=384,
                             padding=30, chunk=chunk, host_resize=True,
                             lowres=lowres, stride=stride, decode="viterbi",
                             switch_cost=16.0)
        vit = an_vit.analyze(headline_path, boxes)
        agree_v = (vit["labels"][:num_frames] == gt_ids[:num_frames])
        label_agreement_viterbi = round(float(agree_v[interior].mean()), 4)
        log(f"label agreement vs fixture GT (interior): raw argmax "
            f"{label_agreement:.4f}, viterbi {label_agreement_viterbi:.4f}")
        # Label-sanity floor: chance on this 46-move schedule is ~0.02, so
        # anything near it means the pipeline is mislabeling its own
        # fixture and the perf number shouldn't be trusted.  Exact values
        # ride in the JSON for the record.
        assert label_agreement_viterbi >= 0.5, (
            f"trained-weights viterbi label agreement "
            f"{label_agreement_viterbi} < 0.5 — the headline pipeline is "
            "mislabeling its own fixture"
        )

    # Timed e2e runs INTERLEAVED with decode-only ceiling runs: ambient
    # tunnel/host load moves absolute numbers ±15% over minutes, so the
    # e2e/ceiling ratio is only meaningful when each pair is measured
    # back-to-back under the same conditions.  The published ratio is the
    # median of the per-pair ratios.
    log(f"running timed pipeline on {headline_codec} "
        f"(median of {timed_runs}, interleaved with decode-only ceiling)...")
    results = []
    ceilings = []
    ratios = []
    eff_lowres = warm.get("lowres", 0)
    eff_fast = warm.get("fast", 0)
    for _ in range(timed_runs):
        r = analyzer.analyze(headline_path, boxes)
        results.append(r)
        try:
            c = measure_decode_only_fps(
                headline_path, boxes, chunk, r.get("lowres", 0), stride,
                True if r.get("fast", 0) else False, runs=1,
            )
            ceilings.append(c)
            ratios.append(round(r["fps"] / c, 3))
        except Exception as e:  # noqa: BLE001
            log(f"decode-only pair skipped: {e}")
    run_fps = sorted(round(r["fps"], 1) for r in results)
    fps = round(statistics.median(run_fps), 1)
    # Effective decode modes after "auto" resolution / codec clamp.
    eff_lowres = results[0].get("lowres", 0)
    eff_fast = results[0].get("fast", 0)
    log(f"frames: {results[0]['frames']}, fps median: {fps:.1f}, "
        f"realtime-x: {fps / 60:.2f} (runs: {run_fps}, "
        f"effective lowres: {eff_lowres}, fast: {eff_fast})")
    decode_only_fps = None
    e2e_over_ceiling = None
    if ceilings:
        decode_only_fps = round(statistics.median(ceilings), 1)
        e2e_over_ceiling = round(statistics.median(ratios), 3)
        log(f"decode-only ceiling: {decode_only_fps:.1f} fps "
            f"(paired e2e/ceiling ratios: {ratios}, median: "
            f"{e2e_over_ceiling:.3f})")

    def median_fps(an, path, bxs, runs=2):
        an.variables = analyzer.variables  # share weights + compiled embeds
        an.analyze(path, bxs)  # warm (compile for this shape/mode)
        rs = [round(an.analyze(path, bxs)["fps"], 1) for _ in range(runs)]
        # statistics.median averages the middle pair on even counts —
        # sorted[n//2] would record best-of-2 as "median".
        return round(statistics.median(rs), 1)

    # Per-frame classification (stride=1), same codec/decode mode as the
    # headline: the honest per-frame number the round-2 verdict asked to
    # carry in the JSON rather than only in docs.
    log("measuring stride=1 per-frame configuration...")
    stride1_fps = median_fps(
        VodAnalyzer(pipe, window=384, padding=30, chunk=chunk,
                    host_resize=True, lowres=lowres, stride=1),
        headline_path, boxes,
    )
    log(f"stride=1 fps: {stride1_fps:.1f}")

    # Spec-exact decode on the headline codec (fast-decode off): what the
    # deblock skip is worth, and the conservative number.
    exact_fps = None
    if headline_codec == "h264":
        log("measuring spec-exact h264 (fast-decode off)...")
        exact_fps = median_fps(
            VodAnalyzer(pipe, window=384, padding=30, chunk=chunk,
                        host_resize=True, lowres=lowres, stride=stride,
                        fast_decode=False),
            headline_path, boxes,
        )
        log(f"h264 spec-exact fps: {exact_fps:.1f}")

    # mpeg4 (mp4v) rows: the codec where fractional lowres decode applies
    # (auto picks the largest label-safe factor from the box sizes).
    mpeg4_fps = mpeg4_stride1_fps = None
    mpeg4_lowres = None
    try:
        log("measuring mpeg4 (fractional-lowres codec)...")
        an4 = VodAnalyzer(pipe, window=384, padding=30, chunk=chunk,
                          host_resize=True, lowres=lowres, stride=stride)
        an4.variables = analyzer.variables
        r4 = an4.analyze(video_path, boxes)  # warm
        mpeg4_lowres = r4.get("lowres", 0)
        rs = [round(an4.analyze(video_path, boxes)["fps"], 1)
              for _ in range(2)]
        mpeg4_fps = round(statistics.median(rs), 1)
        mpeg4_stride1_fps = median_fps(
            VodAnalyzer(pipe, window=384, padding=30, chunk=chunk,
                        host_resize=True, lowres=lowres, stride=1),
            video_path, boxes,
        )
        log(f"mpeg4 fps: {mpeg4_fps:.1f} (stride=1: {mpeg4_stride1_fps:.1f}, "
            f"lowres: {mpeg4_lowres})")
    except Exception as e:  # noqa: BLE001
        log(f"mpeg4 measurement skipped: {e}")

    # Flagship-family (ResFormer, the capstone's deployed model) VOD e2e
    # in the same headline configuration: the embed-once factorization
    # serves ResNet-50+transformer at the same host-bound envelope.
    resformer_fps = None
    try:
        log("measuring ResFormer-family VOD e2e (embed-once)...")
        pipe_rf = BatchedActionPipeline(
            family="resformer", num_actions=63, sequence_length=7,
            frame_delta=3, dtype=dtype,
        )
        an_rf = VodAnalyzer(pipe_rf, window=384, padding=30, chunk=chunk,
                            host_resize=True, lowres=lowres, stride=stride)
        an_rf.ensure_variables()
        an_rf.analyze(headline_path, boxes)  # warm (compile)
        rs = [round(an_rf.analyze(headline_path, boxes)["fps"], 1)
              for _ in range(2)]
        resformer_fps = round(statistics.median(rs), 1)
        log(f"resformer VOD fps: {resformer_fps:.1f}")
    except Exception as e:  # noqa: BLE001
        log(f"resformer measurement skipped: {e}")

    # Multi-VOD aggregate (the reference's scale story is 7 concurrent
    # VOD processes, multi_manuscript.sh): N jobs through analyze_many
    # sharing one device context.  Replaces the round-2 extrapolated
    # "one chip serves dozens" claim with a measurement.
    multivod = {}
    try:
        from playaid_core_tpu.infer.vod_pipeline import analyze_many

        for n_jobs in (2, 4):
            jobs = [(headline_path, boxes)] * n_jobs
            t0 = time.perf_counter()
            rs = analyze_many(jobs, pipeline=pipe, variables=analyzer.variables,
                              chunk=chunk, host_resize=True, lowres=lowres,
                              stride=stride)
            dt = time.perf_counter() - t0
            frames_total = sum(r["frames"] for r in rs
                               if not isinstance(r, Exception))
            multivod[f"aggregate_{n_jobs}vod_fps"] = round(frames_total / dt, 1)
        log(f"multi-VOD aggregate: {multivod}")
    except Exception as e:  # noqa: BLE001
        log(f"multi-VOD measurement skipped: {e}")

    baseline_fps = 1200.0  # 20x real-time 1080p60 (BASELINE.md target)
    print(json.dumps({
        # Mode folded into the headline metric name (round-2 advice): the
        # headline is the DEPLOYED configuration on the codec real VODs
        # use (h264); per-frame, spec-exact and mpeg4 numbers ride
        # alongside.
        "metric": ("1080p60 frames/sec/chip (decode+preprocess+2-fighter "
                   f"action detect; {headline_codec}"
                   f"{', fast-decode' if eff_fast else ''}"
                   f", lowres={eff_lowres}"
                   f"{' auto-policy' if lowres == 'auto' else ''}, "
                   f"label-stride={stride})"),
        "value": fps,
        "unit": "frames/sec",
        "vs_baseline": round(fps / baseline_fps, 3),
        "runs": run_fps,
        "spread": round(run_fps[-1] - run_fps[0], 1),
        # Host decode ceiling (same codec/fast/lowres/stride, no device):
        # the 1-core bound on the e2e number, and the claimed fraction.
        "decode_only_fps": decode_only_fps,
        "e2e_over_ceiling": e2e_over_ceiling,
        "stride1_fps": stride1_fps,
        "h264_exact_fps": exact_fps,
        "mpeg4_fps": mpeg4_fps,
        "mpeg4_stride1_fps": mpeg4_stride1_fps,
        "mpeg4_lowres": mpeg4_lowres,
        # Flagship (ResFormer) family e2e under the same configuration.
        "resformer_fps": resformer_fps,
        **multivod,
        # Working-system evidence: trained weights + fixture-GT agreement
        # (interior frames; None = no committed weights, random init).
        "weights": "trained" if trained is not None else "random",
        "label_agreement_interior": label_agreement,
        "label_agreement_viterbi": label_agreement_viterbi,
        "device_only_crops_per_sec": round(device_cps),
        "device_only_fps_2fighters": round(device_cps / 2),
        "decode_backend": "native" if native_decoder.available() else "cv2",
        "codec": headline_codec,
        "lowres": eff_lowres,
        "lowres_policy": str(lowres),
        "fast_decode": eff_fast,
        "stride": stride,
        # Mode disclosure: stride>1 propagates each classified frame's
        # label to the frames in between (the reference's GT videos are
        # 30 fps vs the 60 fps log); lowres>0 is fractional decode where
        # the codec supports it (mpeg4 yes, h264 no — h264 decodes
        # full-res), applied only while the decoded crop region stays >=
        # the model input size (label-safe by measurement, see
        # vod_pipeline.auto_lowres); fast-decode skips h264's in-loop
        # deblock (label agreement gated in
        # tests/test_decode_backend_agreement.py).  BENCH_STRIDE=1
        # BENCH_LOWRES=0 measures the conservative configuration e2e;
        # h264_exact_fps is the spec-exact-decode headline-codec number.
        "mode": (f"{headline_codec} fast={eff_fast}, scale-at-decode "
                 f"lowres={eff_lowres} (policy {lowres}), "
                 f"label-stride={stride}"),
    }))


if __name__ == "__main__":
    main()
