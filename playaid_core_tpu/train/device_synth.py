"""Device-side synthetic training-data generation.

The host synth pipeline (:class:`playaid_core_tpu.train.dataset.
UltActionRecogDataset` ``split="synth"`` — rebuilt from reference:
ult_action_dataset.py:569-689) decodes sprite PNGs, augments them with
cv2/PIL and composites every frame on the host.  On a 1-core TPU host
that caps flagship training at ~2.7 steps/s against a ~52 steps/s device
capability — the chip idles ~95% waiting for samples (round-4 capstone
telemetry, docs/pixels_stack_runs.jsonl).

This module is the TPU-first answer.  The split of labor:

* **Host (cheap integers only)**: clip assembly keeps the EXACT
  ``get_synth`` semantics — mini-timelines of repeated move cycles,
  middle-out or consecutive windows, per-clip fill/jitter/difficulty
  draws — but manipulates bank ROW INDICES instead of image arrays.
  A batch's host work is a few hundred microseconds.
* **Device (all pixel work, one fused jit per batch)**: gather the
  window's sprite frames from a resident uint8 sprite bank, mirror for
  facing, scale+translate via the separable-matmul resampler
  (:func:`playaid_core_tpu.ops.preprocess._crop_one` weights), apply
  per-clip photometric augmentation as ONE 3x3 color matrix + bias
  (brightness/contrast/hue/saturation composed on host), per-clip
  noise / pixel-dropout / coarse-dropout / channel-dropout masks,
  alpha-composite over a per-clip stage patch, and an optional
  codec-degrade blur.  Output feeds the train step without ever
  touching the host.

Known augmentation deviations from the host pipeline (training-data
distribution only — eval assets are rendered by the unchanged host
renderer, and the capstone accuracy gate is the regression test):

* hue rotation is the RGB gray-axis rotation rather than cv2's HSV hue
  walk (both are full-range hue scrambles);
* ``downscale`` (nearest-neighbor pixelation) is approximated by a box
  blur of comparable bandwidth;
* ``random_sized_crop``'s canvas truncation is folded into the
  geometric zoom (no hard cut — coarse dropout supplies occlusion).

Per-clip consistency matches the host pipeline's ``aug_rng`` contract
(one appearance, one framing per temporal window; small per-frame
drift rides on top) — the property that capped round-3 training when
violated.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from playaid_core_tpu.ops.preprocess import _crop_one


# ---------------------------------------------------------------------------
# Asset banks
# ---------------------------------------------------------------------------


def _normalize_sprite(rgba, size):
    """Tight sprite -> [size, size, 4]: long side scaled to ``size``,
    centered.  Matches the host compositor's aspect-resize-by-long-side
    (dataset.load_and_composite_sprite) with fill=1.0, so the device's
    per-clip fill factor reproduces the same on-screen sprite extent."""
    import cv2

    h, w = rgba.shape[:2]
    if h >= w:
        nh, nw = size, max(1, round(w * size / h))
    else:
        nh, nw = max(1, round(h * size / w)), size
    resized = cv2.resize(rgba, (nw, nh), interpolation=cv2.INTER_AREA)
    canvas = np.zeros((size, size, 4), np.uint8)
    y0 = (size - nh) // 2
    x0 = (size - nw) // 2
    canvas[y0 : y0 + nh, x0 : x0 + nw] = resized
    return canvas


class SpriteBank:
    """All sprite frames as one device-resident uint8 tensor plus the
    host-side index: ``sequences`` is a list of dicts with keys
    ``char``/``body``/``move``/``cam``/``rows`` (bank row ids in cycle
    order), mirroring one (char, body, anim, cam) sequence of
    ``get_character_actions_animations_dict``."""

    def __init__(self, clean_char_dir, characters, sprite_size=128,
                 device=None):
        import cv2

        from playaid_core_tpu.train.dataset import (
            get_character_actions_animations_dict,
        )

        self.sprite_size = sprite_size
        anim_dict = get_character_actions_animations_dict(clean_char_dir)
        rows = []
        self.sequences = []
        # char -> move -> body -> [sequence index]
        self.by_char_move_body = {}
        for char in characters:
            if char not in anim_dict:
                continue
            for move, bodies in sorted(anim_dict[char].items()):
                for body, anims in sorted(bodies.items()):
                    for anim, cams in sorted(anims.items()):
                        for cam, paths in sorted(cams.items()):
                            row_ids = []
                            for p in paths:
                                img = cv2.imread(p, cv2.IMREAD_UNCHANGED)
                                if img is None:
                                    continue
                                if img.shape[2] == 3:
                                    img = cv2.cvtColor(img, cv2.COLOR_BGR2BGRA)
                                rows.append(
                                    _normalize_sprite(img, sprite_size)
                                )
                                row_ids.append(len(rows) - 1)
                            if not row_ids:
                                continue
                            seq_id = len(self.sequences)
                            self.sequences.append({
                                "char": char, "move": move, "body": body,
                                "anim": anim, "cam": cam, "rows": row_ids,
                            })
                            self.by_char_move_body.setdefault(
                                char, {}
                            ).setdefault(move, {}).setdefault(body, []).append(
                                seq_id
                            )
        if not rows:
            raise RuntimeError(
                f"no sprites found under {clean_char_dir!r}"
            )
        bank = np.stack(rows)  # [M, S, S, 4] uint8
        self.num_sprites = bank.shape[0]
        self.nbytes = bank.nbytes
        self.bank = jax.device_put(bank, device) if device else jax.device_put(bank)

    def chars(self):
        return sorted(self.by_char_move_body.keys())

    def moves_for(self, char):
        return sorted(self.by_char_move_body[char].keys())


class StageBank:
    """Random stage patches as a device tensor [K, P, P, 3] uint8 (the
    device random-crops the training canvas out of a patch, so a modest
    patch pool covers the host pipeline's random stage crops)."""

    def __init__(self, stages_dir, patch=192, patches_per_stage=48, seed=0,
                 device=None):
        import cv2
        import glob

        paths = sorted(
            glob.glob(os.path.join(stages_dir, "**/*.jpg"), recursive=True)
        )
        if not paths:
            raise RuntimeError(f"no stage textures under {stages_dir!r}")
        rng = np.random.default_rng(seed)
        out = []
        for p in paths:
            img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
            h, w = img.shape[:2]
            for _ in range(patches_per_stage):
                if h <= patch or w <= patch:
                    crop = cv2.resize(img, (patch, patch))
                else:
                    y = int(rng.integers(0, h - patch))
                    x = int(rng.integers(0, w - patch))
                    crop = img[y : y + patch, x : x + patch]
                out.append(crop)
        bank = np.stack(out)
        self.patch = patch
        self.num_patches = bank.shape[0]
        self.bank = jax.device_put(bank, device) if device else jax.device_put(bank)


# ---------------------------------------------------------------------------
# The fused device op
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("out_size", "t"))
def synth_composite(sprite_bank, stage_bank, ints, floats, rng_key,
                    out_size: int = 128, t: int = 7):
    """One training batch of composited clips, entirely on device.

    The per-batch parameters arrive PACKED into two arrays — ``ints``
    [B, T+2] (bank rows [T], stage_idx, flip) and ``floats`` [B, 3T+25]
    (sprite-resample windows, stage window, color matrix+bias, noise/
    dropout/blur knobs) — because each jit argument is its own
    host->device upload, and through a high-latency tunnel 17 small
    uploads per step serialize into hundreds of ms while 2 cost one
    round trip.  See ``DeviceSynthDataset._sample_batch_params`` for the
    layout.  Returns frames [B, T, S, S, 3] uint8.
    """
    rows = ints[:, :t]
    stage_idx = ints[:, t]
    flip = ints[:, t + 1].astype(bool)
    o = 0
    sp_oy, o = floats[:, o : o + t], o + t
    sp_ox, o = floats[:, o : o + t], o + t
    sp_side, o = floats[:, o : o + t], o + t
    st_oy, st_ox, st_side = floats[:, o], floats[:, o + 1], floats[:, o + 2]
    o += 3
    color_mat, o = floats[:, o : o + 9].reshape(-1, 3, 3), o + 9
    color_bias, o = floats[:, o : o + 3], o + 3
    noise_sigma, pix_drop, blur_amt = (floats[:, o], floats[:, o + 1],
                                       floats[:, o + 2])
    o += 3
    coarse_rect, o = floats[:, o : o + 4], o + 4
    chan_keep = floats[:, o : o + 3]

    b = rows.shape[0]
    s = out_size
    spr = jnp.take(sprite_bank, rows.reshape(-1), axis=0)  # [B*T, S, S, 4]
    spr = spr.astype(jnp.float32)
    flip_bt = jnp.repeat(flip, t)
    spr = jnp.where(flip_bt[:, None, None, None], spr[:, :, ::-1, :], spr)
    # Geometric placement: separable resample of a (possibly
    # out-of-canvas) window; outside contributes zero = transparent.
    canvas = jax.vmap(_crop_one, in_axes=(0, 0, 0, 0, None))(
        spr, sp_oy.reshape(-1), sp_ox.reshape(-1),
        jnp.maximum(sp_side.reshape(-1), 1.0), s,
    )  # [B*T, S, S, 4] float
    rgb = canvas[..., :3].reshape(b, t, s, s, 3)
    alpha = jnp.clip(canvas[..., 3:4].reshape(b, t, s, s, 1) / 255.0, 0.0, 1.0)

    # Per-clip photometrics as one matrix multiply (+ bias), identical
    # across the clip's frames.
    rgb = jnp.einsum("bthwc,bdc->bthwd", rgb, color_mat) + (
        color_bias[:, None, None, None, :]
    )

    # Per-clip masks/noise (consistent across frames, like the host
    # pipeline's same-seeded aug_rng).
    k_noise, k_drop = jax.random.split(rng_key)
    noise = jax.random.normal(k_noise, (b, 1, s, s, 3)) * (
        noise_sigma[:, None, None, None, None]
    )
    rgb = rgb + noise
    drop_u = jax.random.uniform(k_drop, (b, 1, s, s, 1))
    keep = drop_u >= pix_drop[:, None, None, None, None]
    yy = jnp.arange(s, dtype=jnp.float32)
    in_y = (yy[None, :] >= coarse_rect[:, 0:1]) & (
        yy[None, :] < coarse_rect[:, 0:1] + coarse_rect[:, 2:3]
    )
    in_x = (yy[None, :] >= coarse_rect[:, 1:2]) & (
        yy[None, :] < coarse_rect[:, 1:2] + coarse_rect[:, 3:4]
    )
    hole = in_y[:, None, :, None, None] & in_x[:, None, None, :, None]
    keep = keep & ~hole
    rgb = jnp.where(keep, rgb, 0.0)
    alpha = jnp.where(keep, alpha, 0.0)
    rgb = rgb * chan_keep[:, None, None, None, :]

    # Stage patch -> canvas (one crop per clip, constant across frames).
    st = jnp.take(stage_bank, stage_idx, axis=0).astype(jnp.float32)
    stc = jax.vmap(_crop_one, in_axes=(0, 0, 0, 0, None))(
        st, st_oy, st_ox, jnp.maximum(st_side, 1.0), s
    )  # [B, S, S, 3]

    out = rgb * alpha + stc[:, None] * (1.0 - alpha)

    # Codec-degrade approximation: 3x3 box blur, mixed in per clip.
    blurred = (
        out
        + jnp.roll(out, 1, axis=2) + jnp.roll(out, -1, axis=2)
        + jnp.roll(out, 1, axis=3) + jnp.roll(out, -1, axis=3)
        + jnp.roll(jnp.roll(out, 1, axis=2), 1, axis=3)
        + jnp.roll(jnp.roll(out, 1, axis=2), -1, axis=3)
        + jnp.roll(jnp.roll(out, -1, axis=2), 1, axis=3)
        + jnp.roll(jnp.roll(out, -1, axis=2), -1, axis=3)
    ) / 9.0
    mix = blur_amt[:, None, None, None, None]
    out = out * (1.0 - mix) + blurred * mix
    return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)


def _hue_sat_matrix(hue_rad, sat, contrast):
    """3x3 color matrix: rotation by ``hue_rad`` about the gray axis,
    saturation scale, contrast scale (numpy, per clip on host)."""
    c, s = np.cos(hue_rad), np.sin(hue_rad)
    one3 = np.full((3, 3), 1.0 / 3.0)
    ident = np.eye(3)
    cross = np.array([
        [0.0, -1.0, 1.0],
        [1.0, 0.0, -1.0],
        [-1.0, 1.0, 0.0],
    ]) / np.sqrt(3.0)
    rot = one3 + c * (ident - one3) + s * cross
    gray = np.array([0.299, 0.587, 0.114])
    sat_m = sat * ident + (1.0 - sat) * np.outer(np.ones(3), gray)
    return contrast * (rot @ sat_m)


class DeviceSynthDataset:
    """Drop-in stand-in for ``UltActionRecogDataset(split="synth")`` whose
    batches are generated on device.

    Exposes the Trainer's protocol (``num_frames_per_sample``,
    ``synth_difficulty``, curriculum hooks, ``batches``) plus
    ``device_batches`` which the Trainer prefers when present: it yields
    (frames [B, T, S, S, 3] uint8 ON DEVICE, char_ids [B], labels [B, T])
    with all pixel work dispatched asynchronously, so the host's per-batch
    cost is integer clip assembly (~hundreds of microseconds).
    """

    def __init__(self, anim_subset, characters, clean_char_dir, stages_dir,
                 num_samples=1024, num_frames_per_sample=7,
                 synth_sprite_fill=(0.70, 0.98), synth_center_jitter=10,
                 synth_frame_degrade=0.0, synth_window="middleout",
                 synth_window_delta=1, synth_cycle_repeats=(1, 2),
                 synth_difficulty=1, crop_size=128, seed=0,
                 stage_patch=192, identity_safe=False):
        self.animations = list(anim_subset)
        self.characters = list(characters)
        self.num_samples = num_samples
        self.num_frames_per_sample = num_frames_per_sample
        self.num_frames_per_sample_options = [num_frames_per_sample]
        self.synth_sprite_fill = synth_sprite_fill
        self.synth_center_jitter = synth_center_jitter
        self.synth_frame_degrade = synth_frame_degrade
        self.synth_window = synth_window
        self.synth_window_delta = synth_window_delta
        self.synth_cycle_repeats = synth_cycle_repeats
        self.synth_difficulty = synth_difficulty
        self.crop_size = crop_size
        self.identity_safe = identity_safe
        self.rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)

        self.sprites = SpriteBank(clean_char_dir, self.characters,
                                  sprite_size=crop_size)
        self.stages = StageBank(stages_dir, patch=stage_patch, seed=seed)
        self._avail_chars = [c for c in self.characters
                             if c in self.sprites.by_char_move_body]
        if not self._avail_chars:
            raise RuntimeError("no sprite assets for requested characters")

    # ---- curriculum hooks (Trainer protocol) ----

    def make_synth_more_challenging(self):
        if self.synth_difficulty < 2:
            self.synth_difficulty += 1

    def switch_num_frames_per_sample(self):
        pass  # single-T training (flagship families are T-fixed)

    def __len__(self):
        return self.num_samples

    # ---- clip assembly (host, integers only) ----

    def _label_id(self, action):
        if action in self.animations:
            return self.animations.index(action)
        return self.animations.index("Unknown")

    def _sample_clip_rows(self):
        """One clip's (window bank rows [T], labels [T], char) — the
        get_synth mini-timeline logic over row indices."""
        rng = self.rng
        char = rng.choice(self._avail_chars)
        char_moves = self.sprites.by_char_move_body[char]
        body_types = sorted({b for m in char_moves.values() for b in m})
        body = rng.choice(body_types)

        t = self.num_frames_per_sample
        mid = t // 2
        max_off = self.synth_window_delta * mid * mid
        min_len = (2 * max_off + 1) if self.synth_window == "middleout" else t

        mini_rows, mini_labels = [], []
        i = 0
        while i < 2 or len(mini_rows) < min_len:
            action = None
            while not action:
                selected = rng.choice(self.animations)
                if selected == "Unknown":
                    extra = sorted(set(char_moves) - set(self.animations))
                    if extra:
                        action = rng.choice(extra)
                elif selected in char_moves:
                    action = selected
            node = char_moves[action]
            if body not in node:
                body = rng.choice(sorted(node.keys()))
            seq_ids = node[body]
            seq = self.sprites.sequences[
                seq_ids[int(rng.integers(0, len(seq_ids)))]
            ]
            rows = seq["rows"]
            lo, hi = self.synth_cycle_repeats
            repeats = (int(rng.integers(lo, hi + 1))
                       if self.synth_window == "middleout" and hi > lo else 1)
            label = action if action in self.animations else "Unknown"
            for _ in range(repeats):
                mini_rows.extend(rows)
                mini_labels.extend([label] * len(rows))
            i += 1

        n = len(mini_rows)
        if self.synth_window == "middleout":
            center = int(rng.integers(max_off, n - max_off))
            offs = [self.synth_window_delta * (mid - j) ** 2 for j in range(t)]
            idx = [center - offs[j] if j <= mid else center + offs[j]
                   for j in range(t)]
        else:
            last = int(rng.integers(t, n + 1))
            idx = list(range(last - t, last))
        clip_rows = [mini_rows[j] for j in idx]
        clip_labels = [self._label_id(mini_labels[j]) for j in idx]
        return clip_rows, clip_labels, char

    def _sample_batch_params(self, batch_size):
        """All per-batch host sampling: indices + augmentation params."""
        rng = self.rng
        b, t, s = batch_size, self.num_frames_per_sample, self.crop_size
        d = self.synth_difficulty

        rows = np.zeros((b, t), np.int32)
        labels = np.zeros((b, t), np.int32)
        chars = np.zeros((b,), np.int32)
        for i in range(b):
            r, l, char = self._sample_clip_rows()
            rows[i] = r
            labels[i] = l
            chars[i] = self.characters.index(char)

        fill_lo, fill_hi = self.synth_sprite_fill
        fill = rng.uniform(fill_lo, fill_hi, b)
        # difficulty "shrink-in-canvas" (p=0.4, x0.75-1.0) folds into fill
        if d:
            shrink = np.where(rng.random(b) < 0.4,
                              rng.uniform(0.75, 1.0, b), 1.0)
            fill = fill * shrink
        # random_sized_crop zoom fold (p = 0.1 at d1 / 0.3 at d2)
        if d:
            rp = 0.1 if d < 2 else 0.3
            zoom = np.where(rng.random(b) < rp,
                            1.0 / rng.uniform(0.55, 1.0, b), 1.0)
            fill = np.clip(fill * zoom, 0.05, 3.0)
        # per-frame fill jitter (host: +/-0.04 around the clip base)
        if fill_hi > fill_lo:
            fill_t = np.clip(fill[:, None] + rng.uniform(-0.04, 0.04, (b, t)),
                             0.03, 3.5)
        else:
            fill_t = np.repeat(fill[:, None], t, axis=1)

        jit_lim = self.synth_center_jitter if self.synth_center_jitter else (
            40 if d else 0
        )
        base_jit = (rng.integers(-jit_lim, jit_lim + 1, (b, 2))
                    if jit_lim else np.zeros((b, 2)))
        drift = rng.integers(-3, 4, (b, t, 2))
        jy = base_jit[:, None, 0] + drift[..., 0]
        jx = base_jit[:, None, 1] + drift[..., 1]

        # output-pixel -> sprite-canvas mapping: src = (p - c(1-sigma) - j)
        # / sigma realized through _axis_weights' origin/side form
        # (src = o + (p + 0.5) * side / S - 0.5).
        sigma = fill_t
        side = s / sigma
        sp_oy = (s / 2.0) - (s / 2.0 + jy) / sigma - 0.5 / sigma + 0.5
        sp_ox = (s / 2.0) - (s / 2.0 + jx) / sigma - 0.5 / sigma + 0.5

        flip = np.zeros(b, bool)  # facing is carried by the cam sequences

        stage_idx = rng.integers(0, self.stages.num_patches, b).astype(np.int32)
        margin = self.stages.patch - s
        st_oy = rng.uniform(0, max(margin, 1), b)
        st_ox = rng.uniform(0, max(margin, 1), b)
        st_side = np.full(b, float(s))

        # photometrics (difficulty-gated, matching the host pipeline's
        # probabilities; one draw per clip)
        contrast = np.ones(b)
        bias = np.zeros((b, 3))
        hue = np.zeros(b)
        sat = np.ones(b)
        if d:
            bc = rng.random(b) < 0.3
            contrast = np.where(bc, 1.0 + rng.uniform(-0.2, 0.2, b), 1.0)
            blim = 0.3 if self.identity_safe else 0.6
            bright = np.where(bc, rng.uniform(-0.2, blim, b), 0.0)
            bias = np.repeat((bright * 255.0)[:, None], 3, axis=1)
            if self.identity_safe:
                hue = rng.uniform(-0.3, 0.3, b)
                sat = 1.0 + rng.uniform(-0.12, 0.12, b)
            else:
                hue = rng.uniform(-np.pi, np.pi, b)
                sat = 1.0 + rng.uniform(-0.26, 0.26, b)
        color_mat = np.stack(
            [_hue_sat_matrix(hue[i], sat[i], contrast[i]) for i in range(b)]
        ).astype(np.float32)

        noise_sigma = np.zeros(b)
        if d:
            noise_sigma = np.where(rng.random(b) < 0.2,
                                   np.sqrt(rng.uniform(427.63, 500.0, b)), 0.0)
        pix_drop = np.zeros(b)
        coarse = np.zeros((b, 4))
        chan_keep = np.ones((b, 3))
        if d >= 2:
            pix_drop = np.where(rng.random(b) < 0.2, 0.1, 0.0)
            cd = rng.random(b) < 0.2
            hgt = rng.integers(8, 96, b)
            wdt = rng.integers(8, 96, b)
            coarse = np.stack([
                rng.integers(0, s - 8, b), rng.integers(0, s - 8, b),
                np.where(cd, hgt, 0), np.where(cd, wdt, 0),
            ], axis=1).astype(np.float32)
            if not self.identity_safe:
                ch = rng.random(b) < 0.2
                which = rng.integers(0, 3, b)
                chan_keep = np.ones((b, 3))
                chan_keep[np.arange(b)[ch], which[ch]] = 0.0

        blur_amt = np.zeros(b)
        if d:
            dsp = 0.1 if d < 2 else 0.3
            blur_amt = np.where(rng.random(b) < dsp,
                                rng.uniform(0.5, 1.0, b), 0.0)
        if self.synth_frame_degrade:
            deg = rng.random(b) < self.synth_frame_degrade
            blur_amt = np.maximum(
                blur_amt, np.where(deg, rng.uniform(0.3, 0.9, b), 0.0)
            )

        # Pack into the two-array wire layout synth_composite unpacks
        # (each jit arg is its own upload; see the kernel docstring).
        ints = np.concatenate(
            [rows, stage_idx[:, None], flip.astype(np.int32)[:, None]],
            axis=1,
        ).astype(np.int32)
        floats = np.concatenate([
            sp_oy, sp_ox, side,
            np.stack([st_oy, st_ox, st_side], axis=1),
            color_mat.reshape(b, 9), bias,
            np.stack([noise_sigma, pix_drop, blur_amt], axis=1),
            coarse, chan_keep,
        ], axis=1).astype(np.float32)
        return dict(ints=ints, floats=floats, labels=labels, chars=chars)

    # ---- batch iterators ----

    def device_batches(self, batch_size, num_batches=None):
        """Yield (frames_device, char_ids, labels) with frames generated
        on device (async dispatch; the host never sees pixels)."""
        total = (num_batches if num_batches is not None
                 else max(self.num_samples // batch_size, 1))
        for _ in range(total):
            p = self._sample_batch_params(batch_size)
            self._key, sub = jax.random.split(self._key)
            frames = synth_composite(
                self.sprites.bank, self.stages.bank, p["ints"], p["floats"],
                sub, out_size=self.crop_size,
                t=self.num_frames_per_sample,
            )
            yield frames, p["chars"], p["labels"]

    def batches(self, batch_size, num_batches=None):
        """Host-array variant of the Trainer protocol (pulls the device
        frames back — for debugging/visualization, not the hot path)."""
        for frames, chars, labels in self.device_batches(batch_size, num_batches):
            yield np.asarray(jax.device_get(frames)), chars, labels
