#!/usr/bin/env python
"""Pixels-only capstone at the reference's operating point.

Round 2 proved the self-contained pixels path on a 3-move / 2-shape toy
(tools/e2e_pixels_demo.py).  This driver scales it to the scale the
reference actually deploys at (reference: ai_runner.py:164-168 trained
checkpoint over its action list; anim_ontology.py:612-659 46-move
trained subset; constants.py:51 six characters):

* the COMPLETE 46-move trained subset + Unknown (47 action classes),
  6 fighters;
* skeletal-sprite animation sets (pose+motion class signal, not color);
* CenterNet detector over all 6 characters, class-restricted per match
  like the reference's YOLO ``classes={2,3}`` (ai_runner.py:201);
* flagship ResFormer (T=7, frame_delta=3, 128px) action model;
* HELD-OUT eval distribution: unseen appearance-variant seed, unseen
  stage texture family, unseen motion/jitter seeds;
* HUD damage counters rendered in a foreign-foundry font and read
  end-to-end by the conv OCR (reference: ai_runner.py:537-590);
* a far-zoom small-sprite eval for the lowres/small-box hard case.

Run on TPU:  python -u tools/pixels_capstone.py [workdir]
Env budget knobs: DET_STEPS, DET_COMPOSITES, ACT_EPOCHS, ACT_STEPS,
EVAL_FRAMES, EVAL_PAIRS, SMALL_EVAL (0/1).
Warm-restart fine-tune (``--phase finetune``): ACT_FT_EPOCHS,
ACT_FT_LR, ACT_FT_DIFFICULTY — continues action_state.pkl on a second
lower-peak cosine cycle, then re-run ``--phase eval``.
Appends a scored record to docs/pixels_stack_runs.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from playaid_core_tpu.datagen import skeletal_sprites as sk  # noqa: E402

ACTIONS = sk.MOVES + ["Unknown"]
# 5 appearance-variant seeds: style_variant spans hue +/-28deg +
# proportion +/-7% per seed, and 3 point samples left the held-out
# variant 17 under-covered (round-3 diagnosis).
TRAIN_VARIANTS = (0, 1, 2, 3, 4)
EVAL_VARIANT = 17            # never generated into the training pool
ANIM_FRAMES = 16             # frames per move cycle in the sprite sets
PHASE_STEP = 1.0 / 48.0      # eval video: one 16-frame cycle per 48 frames
                             # => frame_delta=3 sampling sees 1 anim frame/step
EVAL_PAIR_SETS = [
    ("Byleth", "Pikachu"),
    ("Joker", "Donkey Kong"),
    ("Diddy Kong", "Jigglypuff"),
]
HUD_FONT = "cmr10.ttf"       # Computer Modern: foreign foundry vs the OCR
                             # training pool (DejaVu/STIX).  cmr10 reads at
                             # 100% per-digit; cmb10 (Didone bold "3") is the
                             # one known-weak face at ~92%.


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------

def make_stage(path, seed, kind):
    """Procedural 1280x720 stage texture.  Train kinds: 'noise',
    'platforms', 'blobs', 'tiles'.  Eval kind 'bands' (diagonal
    sinusoid gradient + vignette) is a texture family the training
    composites never see."""
    rng = np.random.default_rng(seed)
    h, w = 720, 1280
    if kind == "noise":
        img = rng.integers(20, 90, (h, w, 3), dtype=np.uint8)
    elif kind == "blobs":
        # large smooth color blobs: low-frequency content without the
        # eval family's banded structure
        small = rng.integers(15, 120, (6, 10, 3)).astype(np.float32)
        img = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
        noise = rng.integers(-10, 11, img.shape)
        img = np.clip(img + noise, 0, 255).astype(np.uint8)
    elif kind == "tiles":
        img = np.zeros((h, w, 3), np.uint8)
        base = rng.integers(20, 80, 3)
        tw, thh = int(rng.integers(80, 200)), int(rng.integers(60, 160))
        for ty in range(0, h, thh):
            for tx in range(0, w, tw):
                c = np.clip(base + rng.integers(-25, 26, 3), 0, 255)
                img[ty:ty + thh, tx:tx + tw] = c
        img = cv2.GaussianBlur(img, (9, 9), 0)
    elif kind == "platforms":
        base = np.zeros((h, w, 3), np.uint8)
        base[:] = rng.integers(25, 70, 3)
        img = base
        for _ in range(6):
            x0, y0 = rng.integers(0, w - 200), rng.integers(0, h - 80)
            ww, hh = rng.integers(120, 420), rng.integers(24, 90)
            color = rng.integers(30, 110, 3).tolist()
            cv2.rectangle(img, (x0, y0), (x0 + ww, y0 + hh), color, -1)
        img = cv2.GaussianBlur(img, (7, 7), 0)
        noise = rng.integers(-12, 13, img.shape)
        img = np.clip(img.astype(int) + noise, 0, 255).astype(np.uint8)
    else:  # "bands": smooth diagonal gradient bands + vignette (eval-only)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        phase = (xx * 0.006 + yy * 0.004)
        img = np.stack([
            45 + 30 * np.sin(phase + i * 2.1) for i in range(3)
        ], axis=-1)
        cx, cy = w / 2, h / 2
        vign = 1.0 - 0.5 * (((xx - cx) / cx) ** 2 + ((yy - cy) / cy) ** 2)
        img = np.clip(img * vign[..., None], 0, 255).astype(np.uint8)
        noise = rng.integers(-8, 9, img.shape)
        img = np.clip(img.astype(int) + noise, 0, 255).astype(np.uint8)
    cv2.imwrite(path, img)
    return path


# ---------------------------------------------------------------------------
# eval match generator (held-out distribution)
# ---------------------------------------------------------------------------

def schedule_moves(rng, num_frames, seg_lo=48, seg_hi=96, unknown_frac=0.05,
                   moves=None):
    """Per-frame (move_for_render, label, phase, segment_id) schedule."""
    moves = list(moves) if moves is not None else sk.MOVES
    out = []
    seg_id = 0
    while len(out) < num_frames:
        if rng.random() < unknown_frac:
            move = rng.choice(sk.EXTRA_MOVES)
            label = "Unknown"
        else:
            move = rng.choice(moves)
            label = move
        # segment lengths snap to whole anim cycles so attack envelopes
        # restart cleanly
        seg = int(rng.integers(seg_lo // 48, seg_hi // 48 + 1)) * 48
        for t in range(seg):
            out.append((move, label, (t * PHASE_STEP) % 1.0, seg_id))
        seg_id += 1
    return out[:num_frames]


def _draw_hud_damage(frame, damage, region, font_path, cache={}):
    """Render a Smash-style damage readout (big integer digits, smaller
    decimal digit, white->red with damage, dim % sign) into the
    normalized HUD region the damage reader crops
    (PLAYER_DAMAGE_CROPS, reference: ai_runner.py:537-563)."""
    from PIL import Image, ImageDraw, ImageFont

    h, w = frame.shape[:2]
    cx, cy = region["center_x"] * w, region["center_y"] * h
    rw, rh = region["crop_width"] * w, region["crop_height"] * h
    x0, y0 = int(cx - rw / 2), int(cy - rh / 2)

    key = (font_path, int(rh))
    if key not in cache:
        big = int(rh * 0.78)
        cache[key] = (ImageFont.truetype(font_path, big),
                      ImageFont.truetype(font_path, int(big * 0.62)))
    f_big, f_small = cache[key]

    frac = min(max(damage, 0.0), 999.9) / 150.0
    fill = (255, int(255 * (1 - 0.85 * min(frac, 1.0))),
            int(255 * (1 - 0.95 * min(frac, 1.0))))  # RGB
    whole = int(damage)
    dec = int(round((damage - whole) * 10)) % 10

    img = Image.new("RGB", (int(rw), int(rh)), (8, 8, 12))
    draw = ImageDraw.Draw(img)
    tx = int(rw * 0.06)
    ty = int(rh * 0.06)
    s = str(whole)
    draw.text((tx + 2, ty + 2), s, font=f_big, fill=(15, 10, 10))
    draw.text((tx, ty), s, font=f_big, fill=fill, stroke_width=2,
              stroke_fill=(25, 20, 30))
    bb = draw.textbbox((tx, ty), s, font=f_big)
    dx = bb[2] + int(rh * 0.06)
    dy = ty + int(rh * 0.30)
    draw.text((dx + 1, dy + 1), str(dec), font=f_small, fill=(15, 10, 10))
    draw.text((dx, dy), str(dec), font=f_small, fill=fill, stroke_width=1,
              stroke_fill=(25, 20, 30))
    db = draw.textbbox((dx, dy), str(dec), font=f_small)
    # % drawn dim (below the reader's segmentation threshold), like a
    # stylized HUD ornament
    draw.text((db[2] + 2, dy + 2), "%", font=f_small, fill=(90, 90, 95))

    arr = np.array(img)[:, :, ::-1]  # RGB -> BGR
    y1, x1 = y0 + arr.shape[0], x0 + arr.shape[1]
    frame[y0:y1, x0:x1] = arr


def make_eval_video(path, pair, num_frames=1800, sprite_px=(88, 150),
                    seed=1000, variant_seed=EVAL_VARIANT, stage_path=None,
                    width=1280, height=720, hud=True, moves=None,
                    unknown_frac=0.05):
    """Composite a held-out 2-fighter match; returns per-frame GT.

    Unlike the round-2 toy (procedural shapes, fixed sprite size, train
    stage), every appearance axis here is held out: variant seed, stage
    texture family, motion seed, per-segment sprite scale.
    """
    rng = np.random.default_rng(seed)
    stage = cv2.imread(stage_path)
    stage = cv2.resize(stage, (width, height))
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 60,
                             (width, height))
    from playaid_core_tpu.infer.ocr import PLAYER_DAMAGE_CROPS

    font_path = _hud_font_path()

    schedules = [schedule_moves(rng, num_frames, moves=moves,
                                unknown_frac=unknown_frac) for _ in pair]
    # per-segment sprite sizes (a segment = run of identical move)
    seg_px = []
    for k in range(2):
        px, cur, cur_seg = [], None, None
        for (_m, _l, _p, seg_id) in schedules[k]:
            if seg_id != cur_seg:
                cur = int(rng.integers(sprite_px[0], sprite_px[1] + 1))
                cur_seg = seg_id
            px.append(cur)
        seg_px.append(px)

    # smooth wandering positions, kept apart
    t = np.arange(num_frames)
    xs, ys = [], []
    for k in range(2):
        f1, f2 = rng.uniform(0.004, 0.010), rng.uniform(0.010, 0.02)
        p1, p2 = rng.uniform(0, TAU := 2 * np.pi), rng.uniform(0, TAU)
        cx = width * (0.30 + 0.40 * k) + 90 * np.sin(TAU * f1 * t + p1) \
            + 40 * np.sin(TAU * f2 * t + p2)
        cy = height * 0.52 + 55 * np.cos(TAU * f1 * 0.7 * t + p2) \
            + 25 * np.sin(TAU * f2 * 1.3 * t + p1)
        xs.append(cx)
        ys.append(cy)

    # damage trajectories: monotone random-walk with hit jumps
    dmg = np.zeros((num_frames, 2), np.float32)
    cur = [float(rng.uniform(0, 20)), float(rng.uniform(0, 20))]
    for i in range(num_frames):
        for k in range(2):
            if rng.random() < 0.01:
                cur[k] = min(cur[k] + float(rng.uniform(1.5, 18.0)), 999.9)
            dmg[i, k] = round(cur[k], 1)

    gt_boxes = np.zeros((num_frames, 2, 4), np.float32)
    gt_labels = np.empty((num_frames, 2), object)
    styles = {f: sk.style_variant(sk.FIGHTER_STYLES[f], variant_seed)
              for f in pair}

    for i in range(num_frames):
        frame = stage.copy()
        order = [0, 1]
        for k in order:
            fighter = pair[k]
            move, label, phase, _seg = schedules[k][i]
            facing = 1 if xs[k][i] < xs[1 - k][i] else -1
            sprite = sk.render_sprite(fighter, move, phase, size=176,
                                      facing=facing, style=styles[fighter])
            sprite = sk.tight_crop(sprite, min_size=1)
            hgt, wdt = sprite.shape[:2]
            target = seg_px[k][i]
            sc = target / max(hgt, wdt)
            sprite = cv2.resize(sprite, (max(1, int(wdt * sc)),
                                         max(1, int(hgt * sc))))
            sh, sw = sprite.shape[:2]
            cx = int(np.clip(xs[k][i], sw / 2 + 2, width - sw / 2 - 2))
            cy = int(np.clip(ys[k][i], sh / 2 + 2, height - sh / 2 - 2))
            x0, y0 = cx - sw // 2, cy - sh // 2
            alpha = sprite[:, :, 3:4].astype(np.float32) / 255.0
            roi = frame[y0:y0 + sh, x0:x0 + sw]
            frame[y0:y0 + sh, x0:x0 + sw] = (
                sprite[:, :, :3] * alpha + roi * (1 - alpha)
            ).astype(np.uint8)
            gt_boxes[i, k] = (cx / width, cy / height, sw / width, sh / height)
            gt_labels[i, k] = label
        if hud:
            for pid in (0, 1):
                _draw_hud_damage(frame, float(dmg[i, pid]),
                                 PLAYER_DAMAGE_CROPS[pid], font_path)
        writer.write(frame)
    writer.release()
    return {"boxes": gt_boxes, "labels": gt_labels, "damage": dmg}


def _hud_font_path():
    import matplotlib

    return os.path.join(os.path.dirname(matplotlib.__file__), "mpl-data",
                        "fonts", "ttf", HUD_FONT)


# ---------------------------------------------------------------------------
# scoring
# ---------------------------------------------------------------------------

def _boundary_distance(labels_col):
    """Per-frame distance (in frames) to the nearest GT label change."""
    n = len(labels_col)
    dist = np.full(n, n, np.int32)
    changes = [i for i in range(1, n) if labels_col[i] != labels_col[i - 1]]
    for c in changes:
        lo = max(0, c - 64)
        hi = min(n, c + 64)
        idx = np.arange(lo, hi)
        dist[lo:hi] = np.minimum(dist[lo:hi],
                                 np.minimum(abs(idx - c), abs(idx - (c - 1))))
    return dist


def score_run(runner, pair, gt, boundary=9):
    """Detection localization + per-frame action agreement + damage
    accuracy vs the generator's ground truth (same contract as the
    round-2 toy scorer, plus damage).

    Also reports: the raw (unsmoothed) agreement when the runner ran
    with smooth_radius > 0, the interior/boundary split (a frame is
    'boundary' when its middle-out window crosses a GT move change,
    i.e. distance < ``boundary`` frames), and a GT->pred confusion map
    of the misclassified frames for diagnosis."""
    from playaid_core_tpu.infer.detection import read_fighter_yolo_crop

    det_hits, act_hits, raw_hits, total = 0, 0, 0, 0
    int_hits, int_total, bnd_hits, bnd_total = 0, 0, 0, 0
    per_move = {}
    confusion = {}
    det_miss = {"no_label": 0, "near": 0, "far": 0, "on_other": 0}
    dmg_hits, dmg_total = 0, 0
    bdist = [
        _boundary_distance([gt["labels"][i, k] for i in range(len(gt["labels"]))])
        for k in range(2)
    ]
    for i in range(1, runner.max_frames):
        for k, fighter in enumerate(pair):
            gt_box = gt["boxes"][i - 1, k]
            label = gt["labels"][i - 1, k]
            total += 1
            crop = read_fighter_yolo_crop(runner.get_label_path(i), fighter)
            if crop is not None and abs(crop.center_x - gt_box[0]) < 0.06 \
                    and abs(crop.center_y - gt_box[1]) < 0.08:
                det_hits += 1
            elif crop is None:
                det_miss["no_label"] += 1
            else:
                # Classify the miss: near-threshold center error, a crop
                # sitting on the OTHER fighter's GT box (identity error),
                # or far from both (spurious/interp drift).
                ex = abs(crop.center_x - gt_box[0])
                ey = abs(crop.center_y - gt_box[1])
                other = gt["boxes"][i - 1, 1 - k]
                if abs(crop.center_x - other[0]) < 0.06 and \
                        abs(crop.center_y - other[1]) < 0.08:
                    det_miss["on_other"] += 1
                elif ex < 0.12 and ey < 0.16:
                    det_miss["near"] += 1
                else:
                    det_miss["far"] += 1
            frame_data = runner.ai_output_data[fighter][i - 1]
            pred = frame_data.action
            stats = per_move.setdefault(label, [0, 0])
            stats[1] += 1
            hit = pred == label
            if hit:
                act_hits += 1
                stats[0] += 1
            else:
                key = f"{label}->{pred}"
                confusion[key] = confusion.get(key, 0) + 1
            raw = frame_data.get("action_raw", None)
            if (raw if raw is not None else pred) == label:
                raw_hits += 1
            if bdist[k][i - 1] < boundary:
                bnd_total += 1
                bnd_hits += int(hit)
            else:
                int_total += 1
                int_hits += int(hit)
            d = frame_data.get("damage", None)
            if d is not None:
                dmg_total += 1
                if abs(float(d) - float(gt["damage"][i - 1, k])) < 0.051:
                    dmg_hits += 1
    top_confusions = dict(sorted(confusion.items(), key=lambda kv: -kv[1])[:12])
    return {
        "det_rate": det_hits / max(total, 1),
        "det_miss": det_miss,
        "act_rate": act_hits / max(total, 1),
        "act_rate_raw": raw_hits / max(total, 1),
        "act_rate_interior": int_hits / max(int_total, 1),
        "act_rate_boundary": bnd_hits / max(bnd_total, 1),
        "per_move": {m: round(h / t, 4) for m, (h, t) in sorted(per_move.items())},
        "top_confusions": top_confusions,
        "damage_acc": dmg_hits / max(dmg_total, 1) if dmg_total else None,
        "frames": runner.max_frames - 1,
    }


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def _warm_tunnel(attempts=5):
    """Clear tunnel staleness before real work (see
    playaid_core_tpu.tpu_warmup — shared with bench.py)."""
    from playaid_core_tpu.tpu_warmup import warm_tunnel

    return warm_tunnel(attempts=attempts,
                       log=lambda m: print(m, flush=True))


def _heartbeat():
    """Tunneled-TPU keep-alive (session goes stale after ~10 min of
    device idleness; the next op then hangs forever)."""
    import threading

    def beat():
        import jax.numpy as jnp

        while True:
            try:
                # Must be a DATA READBACK: block_until_ready through the
                # tunnel can ack at dispatch, which does not refresh the
                # far side's idle timer (r4 wedged after a 10-min
                # host-only phase despite a block_until_ready heartbeat).
                float(jnp.zeros((2,)).sum())
            except Exception:
                pass
            time.sleep(60)

    threading.Thread(target=beat, daemon=True).start()


def analyze_match(video_path, pair, det_trainer, pipe, split_vars, workdir,
                  gt, damage=True, crop_padding=None, smooth_radius=16,
                  decode="argmax", switch_cost=4.0, overwrite=False):
    """Full pixels path on one eval video: detector -> crops cache ->
    cleanup -> batched action recognition -> damage OCR -> score."""
    import jax  # noqa: F401  (keeps device context warm)

    from playaid_core_tpu import constants
    from playaid_core_tpu.infer.detection import JaxCharacterDetector
    from playaid_core_tpu.infer.runner import AIRunner

    if crop_padding is None:
        # Fractional padding (fraction of the box's square dim): subject
        # fill of the crop window is scale-invariant at 1/(1+2*0.125)=0.80
        # — inside the training fill range (0.70, 0.98) at EVERY sprite
        # scale.  The round-3 fixed 16 px pad left 40-64 px far-zoom
        # sprites at ~0.56-0.67 fill, outside everything training showed.
        raw = os.environ.get("CROP_PAD", "0.125")
        crop_padding = float(raw) if "." in raw else int(raw)
    classes = {constants.CHAR_LIST.index(f) for f in pair}
    runner = AIRunner(
        input_video_path=video_path,
        detector=JaxCharacterDetector(
            det_trainer, score_threshold=0.05, crop_size=128,
            crop_padding=crop_padding, batch_size=24, classes=classes,
            track_weight=float(os.environ.get("TRACK_WEIGHT", "0.0")),
        ),
        pipeline=pipe,
        variables=split_vars,
        crop_padding=crop_padding,
        num_frames_per_sample=pipe.sequence_length,
        frame_delta=pipe.frame_delta,
        # Pool window posteriors over +/-16 frames (1/3 of the shortest
        # eval segment): one middle-out window spans only ~3/8 of an anim
        # cycle, so per-window argmax confuses moves that share
        # sub-windows; pooling reads the rest of the cycle.  The raw
        # per-window agreement is still scored (act_rate_raw).
        smooth_radius=smooth_radius,
        decode=decode,
        switch_cost=switch_cost,
    )
    def _rss():
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return line.split()[1]
        return "?"

    runner.actions = ACTIONS
    runner.run_detection_setup()
    print(f"  [detection done, rss {_rss()} kB]", flush=True)
    runner.run_action_recognition(overwrite=overwrite)
    print(f"  [recognition done, rss {_rss()} kB]", flush=True)
    if damage:
        runner.run_damage_detection()
        print(f"  [damage done, rss {_rss()} kB]", flush=True)
    runner.write_output()
    return score_run(runner, pair, gt)


def phase_assets(workdir):
    """Skeletal sprite sets + stage textures (idempotent)."""
    fighters = list(sk.FIGHTER_STYLES)
    clean = os.path.join(workdir, "clean")
    stages = os.path.join(workdir, "stages")
    os.makedirs(stages, exist_ok=True)
    if not os.path.isdir(clean):
        print("generating skeletal sprite sets "
              f"({len(fighters)} fighters x {len(sk.MOVES)}+{len(sk.EXTRA_MOVES)} moves "
              f"x {len(TRAIN_VARIANTS)} variants x 2 facings x {ANIM_FRAMES} frames)...")
        # stagger sub-frame phase across variants so the pool contains
        # the eval renderer's continuous 1/48-cycle phases
        offsets = {v: (k % 3) / 3.0 for k, v in enumerate(TRAIN_VARIANTS)}
        n = sk.generate_sprite_set(
            clean, fighters=fighters, moves=sk.MOVES + sk.EXTRA_MOVES,
            frames_per_move=ANIM_FRAMES, variant_seeds=TRAIN_VARIANTS,
            phase_offsets=offsets,
        )
        print(f"  {n} sprites")
    train_kinds = ["noise", "platforms", "blobs", "tiles"]
    for i in range(8):
        make_stage(os.path.join(stages, f"train_{i}.jpg"), seed=i,
                   kind=train_kinds[i % len(train_kinds)])
    return clean, stages


def phase_detector(workdir, det_steps, det_composites, verbose=True):
    """Train the 6-class CenterNet detector; save detector_state.pkl."""
    import pickle

    import jax
    import jax.numpy as jnp

    from playaid_core_tpu import constants
    from playaid_core_tpu.datagen.gen_synth_char_detection import (
        generate_stage_char_compositions,
    )
    from playaid_core_tpu.train.detector_train import DetectionDataset, DetectorTrainer

    _warm_tunnel()
    _heartbeat()
    clean, stages = phase_assets(workdir)
    print("generating detection composites...")
    # DET_SEED: composite generation is append-only (existing images are
    # kept and new ones continue the numbering), so a top-up run MUST use
    # a fresh seed or it replays the first pool's draw sequence.
    generate_stage_char_compositions(
        "train", det_composites, seed=int(os.environ.get("DET_SEED", "0")),
        output_root=os.path.join(workdir, "composites"),
        stages_dir=stages, clean_char_dir=clean,
        char_list=list(constants.CHAR_LIST),
        # identity_safe: sprite identity is color-coded, full-range hue
        # rotation makes the class head unlearnable (round-3 diagnosis:
        # loc 96% / loc+class 12% on eval video).  degrade: mpeg4-decoded
        # eval frames are soft; pristine-JPEG-only training collapses
        # heatmap confidence 0.9 -> 0.2 on video frames.
        # hud_distractors: eval frames carry HUD damage text and the
        # detector must not fire on it (measured: a never-seen-HUD
        # detector locks a phantom Jigglypuff onto the player-0 damage
        # readout at conf 0.52, losing the real fighter for 90-frame
        # runs whenever its ball poses score lower).
        augment=True, identity_safe=True, degrade=0.3, hud_distractors=0.5,
    )
    det_ds = DetectionDataset(
        os.path.join(workdir, "composites", "train"), input_hw=(256, 448),
        num_classes=len(constants.CHAR_LIST), seed=0,
        # per-draw photometric + geometric jitter: finite pools with
        # baked-in augmentation are memorized by the class head
        sample_augment=True,
    )
    print("training detector...")
    det_trainer = DetectorTrainer(det_ds, num_classes=len(constants.CHAR_LIST),
                                  input_hw=(256, 448), dtype=jnp.bfloat16)
    det_trainer.fit(det_steps, batch_size=8, log_every=200, verbose=verbose)
    with open(os.path.join(workdir, "detector_state.pkl"), "wb") as f:
        pickle.dump(jax.device_get({
            "params": det_trainer.state.params,
            "batch_stats": det_trainer.state.batch_stats,
        }), f)
    print("detector saved")


def _make_action_dataset(workdir, num_samples, difficulty=1):
    from playaid_core_tpu.train.dataset import UltActionRecogDataset

    clean, stages = phase_assets(workdir)
    fighters = list(sk.FIGHTER_STYLES)
    # Device-side synth generation (train/device_synth.py): sprite/stage
    # banks live on the chip and every pixel of batch assembly runs
    # there — the host's 1 core was capping training at ~2.7 steps/s vs
    # ~52 steps/s device capability (round-4 telemetry).  SYNTH_DEVICE=0
    # restores the host (PIL/cv2) generator.
    if os.environ.get("SYNTH_DEVICE", "1") == "1":
        from playaid_core_tpu.train.device_synth import DeviceSynthDataset

        return DeviceSynthDataset(
            anim_subset=ACTIONS, characters=fighters,
            clean_char_dir=clean, stages_dir=stages,
            num_samples=num_samples, num_frames_per_sample=7,
            synth_sprite_fill=(0.70, 0.98), synth_center_jitter=10,
            synth_frame_degrade=0.5,
            synth_window=os.environ.get("SYNTH_WINDOW", "middleout"),
            synth_cycle_repeats=(1, 2), synth_difficulty=difficulty,
            seed=0,
        )
    return UltActionRecogDataset(
        split="synth", num_samples=num_samples, img_dimension=128,
        anim_subset=ACTIONS, num_frames_per_sample=7, frame_delta=[3],
        char_subset=fighters, crop_size=128, seed=0,
        gt_root_train=os.path.join(workdir, "none"),
        gt_root_val=os.path.join(workdir, "none"),
        gt_root_test=os.path.join(workdir, "none"),
        stages_dir=stages, clean_char_dir=clean,
        # detector crops leave the sprite at ~75-95% of the window;
        # center jitter matches detector center error
        synth_sprite_fill=(0.70, 0.98),
        synth_center_jitter=10,
        synth_frame_degrade=0.5,
        # Train windows with the DEPLOYED temporal geometry: quadratic
        # middle-out offsets (delta=1 mini-timeline frame == the eval's
        # frame_delta=3 over 60fps video at 16 frames/48-frame cycles),
        # move cycles repeated 1-2x like the eval's 48/96-frame segments.
        # Consecutive-frame windows (the reference's synth sampling) teach
        # the head motion at 1/3 the deployed rate with uniform spacing.
        synth_window=os.environ.get("SYNTH_WINDOW", "middleout"),
        # Start WITH sprite augmentation: difficulty 0 trains on raw
        # sprites, so appearance generalization (held-out variant 17)
        # is never exercised until the curriculum bumps — and a late
        # bump at decayed LR collapsed train acc 0.90 -> 0.40 with no
        # time to re-converge (round-3 r3 run).
        synth_difficulty=difficulty,
    )


def phase_action(workdir, act_epochs, act_steps, act_batch):
    """Train the flagship ResFormer (T=7, delta=3, 128px); save
    action_state.pkl."""
    import pickle

    import jax
    import jax.numpy as jnp

    from playaid_core_tpu.train.train import Trainer, TrainerConfig

    _warm_tunnel()
    _heartbeat()
    action_ds = _make_action_dataset(workdir, act_steps * act_batch)
    config = TrainerConfig(
        family="resformer", num_actions=len(ACTIONS), sequence_length=7,
        batch_size=act_batch, learning_rate=3e-4,
        num_samples=act_steps * act_batch, crop_size=128,
        # Bump difficulty early (while LR is still high) so the
        # difficulty-2 distribution has the whole remaining budget to
        # converge.
        curriculum_threshold=0.88, dtype=jnp.bfloat16,
        lr_decay_steps=act_epochs * act_steps,
        verbose=True,
    )
    print("training flagship ResFormer action model...")
    act_trainer = Trainer(config, action_ds)
    act_trainer.init_state()
    act_trainer.fit(num_epochs=act_epochs, steps_per_epoch=act_steps)
    accs = [round(r["train_acc"], 3) for r in act_trainer.metrics_log]
    # Train-throughput record (BASELINE #5 perf evidence): median
    # steps/s + crops/s over the run's epochs, on the real chip.
    sps = sorted(r.get("steps_per_sec", 0) for r in act_trainer.metrics_log)
    throughput = {
        "steps_per_sec_median": sps[len(sps) // 2] if sps else 0,
        "crops_per_sec_median": sorted(
            r.get("crops_per_sec", 0) for r in act_trainer.metrics_log
        )[len(sps) // 2] if sps else 0,
        "grad_norm_last": act_trainer.metrics_log[-1].get("grad_norm_last"),
    }
    print("action train acc:", accs[-10:])
    print("action train throughput:", throughput)
    with open(os.path.join(workdir, "action_state.pkl"), "wb") as f:
        pickle.dump({
            "params": jax.device_get(act_trainer.state.params),
            "batch_stats": jax.device_get(act_trainer.state.batch_stats),
            "train_accs": accs,
            "train_throughput": throughput,
        }, f)
    print("action model saved")


def phase_action_finetune(workdir, ft_epochs, act_steps, act_batch, ft_lr):
    """Continue training action_state.pkl on a second, lower-peak cosine
    cycle.

    The from-scratch phase plateaus at train acc ~0.87 with its cosine
    budget exhausted, and the remaining eval errors are persistent
    per-(fighter, move) blocks — model error, not decode error (capstone
    r6: DownAir->Wait x91, Dash->DashAttack x67 on one pair survive every
    decode config).  A warm restart at a reduced peak LR buys additional
    fit without re-running the full from-scratch phase.  The previous
    state is kept as action_state_pre_ft.pkl.
    """
    import pickle
    import shutil

    import jax
    import jax.numpy as jnp

    from playaid_core_tpu.train.train import Trainer, TrainerConfig

    _warm_tunnel()
    _heartbeat()
    path = os.path.join(workdir, "action_state.pkl")
    with open(path, "rb") as f:
        saved = pickle.load(f)
    accs_prev = saved.get("train_accs") or []
    print(f"fine-tuning from action_state.pkl "
          f"(prev train acc tail: {accs_prev[-5:]})")

    action_ds = _make_action_dataset(
        workdir, act_steps * act_batch,
        difficulty=int(os.environ.get("ACT_FT_DIFFICULTY", "1")),
    )
    config = TrainerConfig(
        family="resformer", num_actions=len(ACTIONS), sequence_length=7,
        batch_size=act_batch, learning_rate=ft_lr,
        num_samples=act_steps * act_batch, crop_size=128,
        curriculum_threshold=0.88, dtype=jnp.bfloat16,
        lr_decay_steps=ft_epochs * act_steps,
        warmup_steps=100,
        verbose=True,
    )
    trainer = Trainer(config, action_ds)
    trainer.init_state()
    trainer.state = trainer.state.replace(
        params=jax.device_put(saved["params"]),
        batch_stats=jax.device_put(saved["batch_stats"]),
    )
    trainer.fit(num_epochs=ft_epochs, steps_per_epoch=act_steps)
    accs = [round(r["train_acc"], 3) for r in trainer.metrics_log]
    print("fine-tune train acc:", accs[-10:])

    backup = os.path.join(workdir, "action_state_pre_ft.pkl")
    if not os.path.exists(backup):
        shutil.copyfile(path, backup)
    sps = sorted(r.get("steps_per_sec", 0) for r in trainer.metrics_log)
    with open(path, "wb") as f:
        pickle.dump({
            "params": jax.device_get(trainer.state.params),
            "batch_stats": jax.device_get(trainer.state.batch_stats),
            "train_accs": accs_prev + accs,
            "train_throughput": {
                "steps_per_sec_median": sps[len(sps) // 2] if sps else 0,
                "crops_per_sec_median": sorted(
                    r.get("crops_per_sec", 0) for r in trainer.metrics_log
                )[len(sps) // 2] if sps else 0,
                "grad_norm_last": trainer.metrics_log[-1].get("grad_norm_last"),
            },
        }, f)
    print("fine-tuned action model saved")


def phase_eval(workdir, det_steps, det_composites, act_epochs, act_steps,
               eval_frames, eval_pairs, small_eval, reuse_detector=None):
    import pickle

    import jax
    import jax.numpy as jnp

    from playaid_core_tpu import constants
    from playaid_core_tpu.infer.pipeline import BatchedActionPipeline
    from playaid_core_tpu.train.detector_train import DetectorTrainer

    _warm_tunnel()
    _heartbeat()
    t0 = time.time()
    fighters = list(sk.FIGHTER_STYLES)
    # Label-decode configuration for the official record (rescore_capstone
    # measures these post-hoc).  Defaults are the round-3 sweep winner:
    # Viterbi MAP decode with a 16-nat switch cost and no posterior
    # pooling beat every argmax/smoothing combination (mean act 95.9% vs
    # 93.8% for argmax+radius-16 on the same trained states).
    smooth_radius = int(os.environ.get("SMOOTH_RADIUS", "0"))
    decode = os.environ.get("DECODE", "viterbi")
    switch_cost = float(os.environ.get("SWITCH_COST", "16.0"))
    pad_raw = os.environ.get("CROP_PAD", "0.125")
    crop_padding = float(pad_raw) if "." in pad_raw else int(pad_raw)

    det_src = reuse_detector or os.path.join(workdir, "detector_state.pkl")
    with open(det_src, "rb") as f:
        det_payload = pickle.load(f)
    if "detector" in det_payload:  # a combined trained_states.pkl
        det_payload = det_payload["detector"]
    det_trainer = DetectorTrainer(None, num_classes=len(constants.CHAR_LIST),
                                  input_hw=(256, 448), dtype=jnp.bfloat16)
    det_trainer.state = det_trainer.state.replace(
        params=jax.device_put(det_payload["params"]),
        batch_stats=jax.device_put(det_payload["batch_stats"]),
    )
    with open(os.path.join(workdir, "action_state.pkl"), "rb") as f:
        act_payload = pickle.load(f)
    accs = act_payload.get("train_accs", [])

    pipe = BatchedActionPipeline(
        family="resformer", num_actions=len(ACTIONS), sequence_length=7,
        frame_delta=3, crop_size=128,
    )
    split_vars = pipe.from_monolithic({
        "params": act_payload["params"],
        "batch_stats": act_payload["batch_stats"],
    })

    # combined pickle for post-hoc tooling (tools/rescore_capstone.py)
    with open(os.path.join(workdir, "trained_states.pkl"), "wb") as f:
        pickle.dump({
            "action": {"params": act_payload["params"],
                       "batch_stats": act_payload["batch_stats"]},
            "detector": det_payload,
            "meta": {
                "family": "resformer", "num_actions": len(ACTIONS),
                "sequence_length": 7, "frame_delta": 3, "crop_size": 128,
                "actions": ACTIONS, "capstone": "scaled-v3",
            },
        }, f)

    # --- held-out eval matches -----------------------------------------
    # Cached detections are only valid for the detector that produced
    # them: tag each cache dir with the detector pickle's fingerprint and
    # rotate to a fresh dir when it changed.  Cached action labels are
    # always recomputed (overwrite=True below).
    import hashlib

    with open(det_src, "rb") as f:
        # Cached crops bake in the crop padding too: a padding change must
        # rotate the detection cache just like a detector change.
        det_tag = hashlib.md5(f.read(1 << 20)).hexdigest()[:12] + f"-pad{pad_raw}"
    cache = os.path.join(workdir, "ai_cache")
    n_cache = 0
    while os.path.isdir(cache):
        marker = os.path.join(cache, "detector.tag")
        if os.path.exists(marker) and open(marker).read() == det_tag:
            break
        cache = os.path.join(workdir, f"ai_cache_{n_cache}")
        n_cache += 1
    os.makedirs(cache, exist_ok=True)
    with open(os.path.join(cache, "detector.tag"), "w") as f:
        f.write(det_tag)
    constants.AI_CACHE = cache
    eval_stage = make_stage(os.path.join(workdir, "eval_stage.jpg"),
                            seed=991, kind="bands")

    def cached_eval(video_path, gt_key, render):
        """Eval renders are deterministic in (seed, frames); re-rendering
        1800 frames costs minutes of the 1-core host per match.  Cache
        (video, gt) under the same key scheme tools/rescore_capstone.py
        uses so the two tools share fixtures.  The frame count is baked
        into the VIDEO filename too (not just the gt key): the position/
        damage schedules unroll differently per num_frames, so a video
        rendered at one count must never be scored against a gt rebuilt
        at another."""
        gt_path = os.path.join(workdir, f"{gt_key}.gt.pkl")
        if os.path.exists(gt_path) and os.path.exists(video_path):
            import pickle as _p

            with open(gt_path, "rb") as f:
                return _p.load(f)
        gt = render()
        import pickle as _p

        with open(gt_path, "wb") as f:
            _p.dump(gt, f)
        return gt

    match_scores = []
    for m, pair in enumerate(EVAL_PAIR_SETS[:eval_pairs]):
        video_path = os.path.join(workdir, f"eval_match_{m}_{eval_frames}.mp4")
        print(f"eval match {m}: {pair[0]} vs {pair[1]}...")
        gt = cached_eval(
            video_path, f"eval_match_{m}_{eval_frames}",
            lambda: make_eval_video(video_path, pair, num_frames=eval_frames,
                                    seed=2000 + m, stage_path=eval_stage))
        s = analyze_match(video_path, pair, det_trainer, pipe, split_vars,
                          workdir, gt, crop_padding=crop_padding,
                          smooth_radius=smooth_radius,
                          decode=decode, switch_cost=switch_cost,
                          overwrite=True)
        s["pair"] = list(pair)
        print(f"  det {s['det_rate']:.2%}  act {s['act_rate']:.2%} "
              f"(raw {s['act_rate_raw']:.2%}, interior {s['act_rate_interior']:.2%}, "
              f"boundary {s['act_rate_boundary']:.2%})  "
              f"damage {s['damage_acc']:.2%}")
        print(f"  top confusions: {s['top_confusions']}")
        print(f"  det misses: {s['det_miss']}")
        match_scores.append(s)

    # --- far-zoom small-sprite eval (hard case for small boxes) ---------
    small_score = None
    if small_eval:
        pair = EVAL_PAIR_SETS[0]
        small_frames = min(eval_frames, 900)
        video_path = os.path.join(workdir, f"eval_small_{small_frames}.mp4")
        print("far-zoom eval (40-64px sprites)...")
        gt = cached_eval(
            video_path, f"eval_small_{small_frames}",
            lambda: make_eval_video(video_path, pair,
                                    num_frames=small_frames,
                                    sprite_px=(40, 64), seed=3000,
                                    stage_path=eval_stage))
        small_score = analyze_match(video_path, pair, det_trainer, pipe,
                                    split_vars, workdir, gt, damage=False,
                                    crop_padding=crop_padding,
                                    smooth_radius=smooth_radius, decode=decode,
                                    switch_cost=switch_cost, overwrite=True)
        small_score["pair"] = list(pair)
        print(f"  det {small_score['det_rate']:.2%}  "
              f"act {small_score['act_rate']:.2%}")

    # --- aggregate + record --------------------------------------------
    agg = lambda key: float(np.mean([s[key] for s in match_scores]))  # noqa: E731
    per_move_all = {}
    for s in match_scores:
        for mv, r in s["per_move"].items():
            per_move_all.setdefault(mv, []).append(r)
    record = {
        "capstone": "scaled-v3",
        "action_classes": len(ACTIONS),
        "fighters": len(fighters),
        "moves": len(sk.MOVES),
        "family": "resformer",
        "sequence_length": 7,
        "frame_delta": 3,
        "crop_size": 128,
        "det_steps": det_steps,
        "det_composites": det_composites,
        "act_epochs": act_epochs,
        "act_steps_per_epoch": act_steps,
        "eval_frames": eval_frames,
        "eval_pairs": [s["pair"] for s in match_scores],
        "heldout": {"variant_seed": EVAL_VARIANT, "stage_kind": "bands",
                    "hud_font": HUD_FONT},
        "det_rate": round(agg("det_rate"), 4),
        "act_rate": round(agg("act_rate"), 4),
        "act_rate_raw": round(agg("act_rate_raw"), 4),
        "act_rate_interior": round(agg("act_rate_interior"), 4),
        "act_rate_boundary": round(agg("act_rate_boundary"), 4),
        "smooth_radius": smooth_radius,
        "decode": decode,
        "switch_cost": switch_cost if decode == "viterbi" else None,
        "crop_padding": os.environ.get("CROP_PAD", "0.125"),
        "synth_window": os.environ.get("SYNTH_WINDOW", "middleout"),
        "train_acc_last10": accs[-10:],
        "train_throughput": act_payload.get("train_throughput"),
        "damage_acc": round(agg("damage_acc"), 4),
        "per_move_agreement": {m: round(float(np.mean(v)), 4)
                               for m, v in sorted(per_move_all.items())},
        "per_match": [{k: v for k, v in s.items() if k != "per_move"}
                      for s in match_scores],
        "smallbox": (None if small_score is None else
                     {k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in small_score.items() if k != "per_move"}),
        "seconds": round(time.time() - t0, 1),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "docs", "pixels_stack_runs.jsonl")
    with open(os.path.abspath(path), "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record, indent=2))
    print(f"workdir: {workdir}")
    return record


def run_capstone(workdir):
    """Orchestrate the three heavy phases as SUBPROCESSES.

    The tunneled TPU client leaks every host->device transfer's host
    bytes for the life of the process (measured ~5.4 MB per training
    batch regardless of deletion/gc — see docs/STATUS.md), so a full
    in-process run accumulates >100 GB across detector + action training
    and OOMs mid-eval (round-3 r5).  Per-phase processes bound the leak
    to one phase's transfer volume (<~30 GB) and release it at exit.

    Completed phases are skipped when their state pickle already exists,
    so a crashed run resumes where it stopped (delete the pickle to force
    retrain).
    """
    import subprocess

    reuse_det = os.environ.get("REUSE_DET") or None
    phases = []
    if not reuse_det and not os.path.exists(
            os.path.join(workdir, "detector_state.pkl")):
        phases.append("detector")
    if not os.path.exists(os.path.join(workdir, "action_state.pkl")):
        phases.append("action")
    phases.append("eval")
    print(f"phases to run: {phases}")
    for phase in phases:
        print(f"=== phase {phase} ===", flush=True)
        r = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__), workdir,
             "--phase", phase],
            env=os.environ.copy(),
        )
        if r.returncode != 0:
            raise RuntimeError(f"phase {phase} failed with code {r.returncode}")


def main():
    import tempfile

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    workdir = args[0] if args else tempfile.mkdtemp(prefix="pixels_capstone_")
    os.makedirs(workdir, exist_ok=True)
    phase = None
    if "--phase" in sys.argv:
        phase = sys.argv[sys.argv.index("--phase") + 1]

    env = os.environ.get
    det_steps = int(env("DET_STEPS", "8000"))
    det_composites = int(env("DET_COMPOSITES", "2400"))
    act_epochs = int(env("ACT_EPOCHS", "100"))
    act_steps = int(env("ACT_STEPS", "64"))
    act_batch = int(env("ACT_BATCH", "16"))

    if phase is None:
        run_capstone(workdir)
    elif phase == "detector":
        phase_detector(workdir, det_steps, det_composites)
    elif phase == "action":
        phase_action(workdir, act_epochs, act_steps, act_batch)
    elif phase == "finetune":
        phase_action_finetune(
            workdir,
            ft_epochs=int(env("ACT_FT_EPOCHS", "80")),
            act_steps=act_steps, act_batch=act_batch,
            ft_lr=float(env("ACT_FT_LR", "1.2e-4")),
        )
    elif phase == "eval":
        phase_eval(
            workdir, det_steps, det_composites, act_epochs, act_steps,
            eval_frames=int(env("EVAL_FRAMES", "1800")),
            eval_pairs=int(env("EVAL_PAIRS", "3")),
            small_eval=env("SMALL_EVAL", "1") == "1",
            reuse_detector=env("REUSE_DET") or None,
        )
    else:
        raise SystemExit(f"unknown phase {phase}")


if __name__ == "__main__":
    main()
