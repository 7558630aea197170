"""AI inference pipeline: detection cleanup + batched TPU action
recognition + damage OCR.

Rebuild of the reference AIRunner (reference: ai_runner.py:136-620) with
the same file-level contract — YOLO crops/labels cache layout, duplicate
suppression, missed-detection interpolation, tail fill, ``ai_output.yaml``
— but a device-batched recognition core: all crops are embedded once in
large batches, middle-out windows are gathered over the embedding
sequence, and the temporal head classifies every frame at once
(see :mod:`playaid_core_tpu.infer.pipeline`), replacing the reference's
batch-1, 7-disk-reads-per-prediction hot loop
(reference: ai_runner.py:426-520).
"""

from __future__ import annotations

import os
import shutil
from collections import defaultdict
from datetime import datetime

import click
import cv2
import numpy as np
import yaml

import jax.numpy as jnp

from playaid_core_tpu import constants
from playaid_core_tpu.adict import Dict
from playaid_core_tpu.geometry import YoloCrop, aspect_resize
from playaid_core_tpu.infer.detection import (
    ExternalYoloDetector,
    extract_number_from_filename,
    read_fighter_yolo_crop,
    read_yolo_crops,
)
from playaid_core_tpu.infer.ocr import (
    PLAYER_DAMAGE_CROPS,
    TemplateDigitOCR,
    default_reader,
)
from playaid_core_tpu.infer.pipeline import BatchedActionPipeline
from playaid_core_tpu.ontology import MOVE_TO_CLASS_ID
from playaid_core_tpu.video.reader import VideoReader


class AIRunner:
    """Runs e2e tracking and action recognition for one VOD."""

    def __init__(
        self,
        input_video_path: str,
        debug: bool = False,
        detector=None,
        pipeline: BatchedActionPipeline | None = None,
        variables=None,
        fighters=None,
        crop_padding=30,
        max_center_jump=0.08,
        fix_swaps=False,
        appearance_check=True,
        smooth_radius=0,
        decode="argmax",
        switch_cost=4.0,
        **dataset_args,
    ):
        # crop_padding: square_crop padding for re-cropped (interpolated)
        # frames — must match the detector's crop framing (reference used a
        # fixed 30, ai_runner.py:404).
        # max_center_jump: per-frame normalized center-distance budget for
        # the identity-continuity filter (see suppress_center_jumps);
        # None/0 disables.
        self.input_video_path = input_video_path
        self.src_folder, self.file_name = os.path.split(input_video_path)
        self.video_name, _ = os.path.splitext(self.file_name)
        parent_folder = os.path.basename(self.src_folder)
        self.exp_name = os.path.join(parent_folder, self.video_name)
        self.yolo_output_dir = os.path.join(constants.AI_CACHE, self.exp_name)
        self.ai_output_file = os.path.join(self.yolo_output_dir, "ai_output.yaml")
        self.crops_dir = os.path.join(self.yolo_output_dir, "crops")
        self.labels_dir = os.path.join(self.yolo_output_dir, "labels")
        self.dataset_args = dataset_args

        self.actions = list(MOVE_TO_CLASS_ID.keys())
        self.pipeline = pipeline or BatchedActionPipeline(
            family="cnn",
            num_actions=len(self.actions),
            sequence_length=dataset_args.get("num_frames_per_sample", 7),
            frame_delta=dataset_args.get("frame_delta", 3),
        )
        self.variables = variables

        self.crop_padding = crop_padding
        self.max_center_jump = max_center_jump
        # fix_swaps: opt-in joint identity-swap rewriting (see
        # fix_identity_swaps).  Off by default: on detector outputs whose
        # identity errors are gradual drift rather than clean jumps, the
        # per-fighter continuity filter alone measures better.
        self.fix_swaps = fix_swaps
        # appearance_check: reject detections whose crop color signature
        # decisively matches the OTHER fighter (identity drift position
        # continuity can't see); stands down automatically when the two
        # fighters' appearances aren't separable.
        self.appearance_check = appearance_check
        # smooth_radius: pool window log-posteriors over [i-r, i+r] frames
        # before the per-frame argmax (BatchedActionPipeline._smooth_log_probs).
        # Actions persist for many frames; any one middle-out window sees
        # only part of the animation cycle.  When > 0 the unsmoothed
        # per-window prediction is preserved as ``action_raw``.
        self.smooth_radius = smooth_radius
        # decode: "argmax" (per-frame) or "viterbi" (MAP path under a
        # switch_cost-nat move-switching penalty); composes with
        # smooth_radius.  Viterbi keeps the persistence prior without
        # blurring move boundaries by the pooling radius.
        self.decode = decode
        self.switch_cost = switch_cost
        self.detector = detector or ExternalYoloDetector()
        res, self.ai_output_data = self.load_ai_output()

        self.debug = debug
        date_time_str = datetime.now().strftime("%Y-%m-%d-%H:%M:%S")
        self.debug_path = os.path.join(self.yolo_output_dir, f"debug-{date_time_str}")
        if self.debug and not os.path.exists(self.debug_path):
            os.makedirs(self.debug_path)

        self.reader = VideoReader(input_video_path)
        self._forced_fighters = fighters
        self.fighters = []
        self.max_frames = 0

    # ------------------------------------------------------------------
    # Detection + crop cleanup (reference: ai_runner.py:181-424)
    # ------------------------------------------------------------------

    def run_detection_setup(self):
        self.detector.run(self.input_video_path, self.exp_name)
        self.fighters = self._forced_fighters or [
            f for f in os.listdir(self.crops_dir)
            if os.path.isdir(os.path.join(self.crops_dir, f))
        ]
        self.clean_yolo_crops()

    def clean_yolo_crops(self):
        num_fighters = len(
            [f for f in os.listdir(self.crops_dir)
             if os.path.isdir(os.path.join(self.crops_dir, f))]
        )
        if num_fighters != 2:
            raise RuntimeError(
                f"Detected {num_fighters} characters; exactly 2 are required"
            )

        last_frame_path = self.get_label_paths()[-1]
        self.max_frames = extract_number_from_filename(last_frame_path)

        # Remove spurious high-numbered crops left by double-detections
        # (reference: ai_runner.py:246-257).
        for fighter in self.fighters:
            for crop_path in reversed(self.get_crop_paths(fighter)):
                if extract_number_from_filename(crop_path) <= self.max_frames:
                    break
                os.unlink(crop_path)

        # Ensure a label file exists for every frame (reference: :259-265).
        for i in range(1, self.max_frames):
            path = self.get_label_path(i)
            if not os.path.exists(path):
                with open(path, "w"):
                    pass

        if self.appearance_check and len(self.fighters) == 2:
            self.appearance_identity_filter()
        if self.fix_swaps and self.max_center_jump and len(self.fighters) == 2:
            self.fix_identity_swaps()
        for fighter in self.fighters:
            if self.max_center_jump:
                self.suppress_center_jumps(fighter)
            self.clean_yolo_crops_for_fighter(fighter)

        # Tail fill: duplicate the last crop to the global max frame
        # (reference: :271-289).
        fighter_to_max = {
            fighter: extract_number_from_filename(self.get_crop_paths(fighter)[-1])
            for fighter in self.fighters
        }
        max_frames = max(fighter_to_max.values())
        for fighter, last_frame_num in fighter_to_max.items():
            num_remaining = max_frames - last_frame_num
            if not num_remaining:
                continue
            last_frame = cv2.imread(self.get_crop_paths(fighter)[-1])
            for i in range(last_frame_num, last_frame_num + num_remaining):
                cv2.imwrite(self.get_crop_path(fighter, i), last_frame)

        # Head fill (mirror of tail fill): a fighter first detected at
        # frame k > 1 has no crops for frames 1..k-1, and action
        # recognition loads every frame's crop unconditionally — the
        # reference crashed here on late first detections.  Duplicate the
        # first crop backwards.
        for fighter in self.fighters:
            first_path = self.get_crop_paths(fighter)[0]
            first_frame_num = extract_number_from_filename(first_path)
            if first_frame_num <= 1:
                continue
            first_frame = cv2.imread(first_path)
            for i in range(1, first_frame_num):
                cv2.imwrite(self.get_crop_path(fighter, i), first_frame)

    def get_label_path(self, frame_num):
        return os.path.join(self.labels_dir, f"{self.video_name}_{frame_num}.txt")

    def get_crop_path(self, fighter, frame_num):
        return os.path.join(self.crops_dir, fighter, f"{self.video_name}_{frame_num}.jpg")

    def get_label_paths(self):
        import glob

        label_paths = glob.glob(os.path.join(self.labels_dir, "*.txt"))
        return sorted(label_paths, key=extract_number_from_filename)

    def get_crop_paths(self, fighter):
        import glob

        crop_paths = glob.glob(os.path.join(self.crops_dir, fighter, "*.jpg"))
        return sorted(crop_paths, key=extract_number_from_filename)

    def _crop_signature(self, path):
        """Coarse color signature (4x4x4 histogram of the crop's center
        region) for appearance-based identity checks."""
        img = cv2.imread(path)
        if img is None:
            return None
        h, w = img.shape[:2]
        center = img[h // 4 : 3 * h // 4, w // 4 : 3 * w // 4]
        hist = cv2.calcHist([center], [0, 1, 2], None, [4, 4, 4],
                            [0, 256, 0, 256, 0, 256]).flatten()
        total = hist.sum()
        return hist / total if total else None

    def appearance_identity_filter(self, margin=0.25):
        """Majority-appearance consistency check: a detection whose crop
        looks decisively like the OTHER fighter is an identity error.

        Position continuity (suppress_center_jumps) can't catch identity
        drift that tracks smoothly; appearance can.  Each fighter's median
        color signature over all its detections is the reference (the
        majority of detections are correct); crops closer to the other
        fighter's median by ``margin`` (L1 on normalized histograms, range
        [0, 2]) are removed so gap interpolation refills them.  When the
        two fighters' appearances aren't separable (median signatures
        within ``margin`` of each other), the filter stands down.
        """
        f0, f1 = self.fighters
        sigs = {f0: [], f1: []}
        per_frame = {f0: {}, f1: {}}
        for f in (f0, f1):
            for crop_path in self.get_crop_paths(f):
                frame = extract_number_from_filename(crop_path)
                s = self._crop_signature(crop_path)
                if s is not None:
                    sigs[f].append(s)
                    per_frame[f][frame] = s
        if len(sigs[f0]) < 8 or len(sigs[f1]) < 8:
            return
        med = {}
        for f in (f0, f1):
            m = np.median(np.stack(sigs[f]), axis=0)
            t = m.sum()
            med[f] = m / t if t else m

        def dist(a, b):
            return float(np.abs(a - b).sum())

        if dist(med[f0], med[f1]) < margin:
            return  # appearances not separable; appearance says nothing
        removed = {f0: 0, f1: 0}
        for f, other in ((f0, f1), (f1, f0)):
            for frame, s in per_frame[f].items():
                if dist(s, med[other]) + margin < dist(s, med[f]):
                    label_path = self.get_label_path(frame)
                    if os.path.exists(label_path):
                        self._remove_fighter_line(label_path, f)
                    crop_path = self.get_crop_path(f, frame)
                    if os.path.exists(crop_path):
                        os.unlink(crop_path)
                    removed[f] += 1
                    # Never strip a fighter's track entirely.
                    if removed[f] >= len(per_frame[f]) - 8:
                        break

    def _remove_fighter_line(self, label_path, fighter):
        class_id = constants.CHAR_LIST.index(fighter)
        crops = [c for c in read_yolo_crops(label_path) if c.class_id != class_id]
        with open(label_path, "w") as f:
            f.write("\n".join(str(c) for c in crops) + ("\n" if crops else ""))

    def _swap_frame_labels(self, label_path, frame):
        """Exchange the two fighters' class ids in one frame's labels and
        swap the corresponding crop files."""
        f0, f1 = self.fighters
        id0 = constants.CHAR_LIST.index(f0)
        id1 = constants.CHAR_LIST.index(f1)
        crops = read_yolo_crops(label_path)
        for c in crops:
            if c.class_id == id0:
                c.class_id = id1
            elif c.class_id == id1:
                c.class_id = id0
        with open(label_path, "w") as f:
            f.write("\n".join(str(c) for c in crops) + "\n")
        p0 = self.get_crop_path(f0, frame)
        p1 = self.get_crop_path(f1, frame)
        if os.path.exists(p0) and os.path.exists(p1):
            tmp = p0 + ".swap"
            os.rename(p0, tmp)
            os.rename(p1, p0)
            os.rename(tmp, p1)
        elif os.path.exists(p0):
            os.rename(p0, p1)
        elif os.path.exists(p1):
            os.rename(p1, p0)

    def fix_identity_swaps(self, margin=0.05, max_run=20):
        """Joint two-fighter identity assignment by track continuity.

        When the detector swaps BOTH fighters' classes at once (each
        detection landing where the other fighter was), per-fighter outlier
        rejection can't see it — each track's jump looks like a teleport to
        a spot no other class occupies.  Jointly, a crossing is obvious:
        the crossed assignment is closer to both tracks' previous
        positions.

        Two further disambiguators, because continuity alone is wrong in
        both directions:

        * fighters legitimately PASS THROUGH each other — positions move
          smoothly through the meeting point.  A label swap makes both
          tracks JUMP discontinuously, so a crossing is only flagged when
          both fighters' per-frame motion also exceeds the
          ``max_center_jump`` budget;
        * continuity is BISTABLE — once the track state is crossed it
          would "correct" appearance-correct detections forever.  Crossed
          frames are buffered per run: a SHORT run (<= ``max_run``) is a
          transient detector flip and gets rewritten (labels swapped, crop
          files exchanged); a PERSISTENT run means the track state itself
          is wrong — the detector's appearance evidence wins, the buffer
          is dropped, and the track re-anchors.

        Frames with duplicate detections or both detections on one
        fighter are ambiguous and never update the track.
        """
        f0, f1 = self.fighters
        id0 = constants.CHAR_LIST.index(f0)
        id1 = constants.CHAR_LIST.index(f1)

        def dist(a, b):
            return abs(a.center_x - b.center_x) + abs(a.center_y - b.center_y)

        last = {f0: None, f1: None}
        last_frame = None
        run = []  # [(label_path, frame)] of buffered crossed frames

        def flush_run(apply):
            if apply:
                for path, fr in run:
                    self._swap_frame_labels(path, fr)
            run.clear()

        for label_path in self.get_label_paths():
            frame = extract_number_from_filename(label_path)
            all_crops = read_yolo_crops(label_path)
            per_class = {id0: [], id1: []}
            for c in all_crops:
                if c.class_id in per_class:
                    per_class[c.class_id].append(c)
            # Skip ambiguous frames entirely: duplicates (first-line order
            # is arbitrary pre-dedup) or both detections on one fighter.
            if len(per_class[id0]) != 1 or len(per_class[id1]) != 1:
                continue
            c0, c1 = per_class[id0][0], per_class[id1][0]
            if dist(c0, c1) < 0.1:
                continue
            if last[f0] and last[f1]:
                gap = max(frame - last_frame, 1)
                budget = self.max_center_jump * gap + 0.02
                direct = dist(c0, last[f0]) + dist(c1, last[f1])
                swapped = dist(c0, last[f1]) + dist(c1, last[f0])
                crossed = (
                    direct > 0.2
                    and swapped < 0.5 * direct
                    and swapped + margin < direct
                    # Both tracks must move DISCONTINUOUSLY (label swap),
                    # not smoothly through a legitimate pass-through.
                    # Only gate run ENTRY on this: `last` is frozen during
                    # a buffered run, so the gap-scaled budget would
                    # otherwise balloon and falsely end long swap runs.
                    and (run or (dist(c0, last[f0]) > budget
                                 and dist(c1, last[f1]) > budget))
                )
                if crossed:
                    run.append((label_path, frame))
                    if len(run) > max_run:
                        # Persistent: the track is wrong, not the frames.
                        flush_run(apply=False)
                        last[f0], last[f1] = c0, c1
                        last_frame = frame
                    continue  # crossed frames never update the track
                flush_run(apply=True)  # transient flip ended: rewrite it
            last[f0], last[f1] = c0, c1
            last_frame = frame
        flush_run(apply=len(run) <= max_run)

    def suppress_center_jumps(self, fighter, stable_n=8):
        """Identity-continuity filter: reject detections whose center jumps
        implausibly far from the previous accepted position.

        The detector occasionally fires a fighter's class on the OTHER
        fighter's location (a whole-screen jump between adjacent frames —
        physically impossible at 60 fps).  Such frames are cleared so the
        standard gap interpolation fills them from the surrounding good
        detections.  Two disambiguators for long rejection runs:

        * a rejected detection sitting on top of ANOTHER class's detection
          in the same frame is an identity flip, never a teleport — it is
          always rejected;
        * otherwise, once ``stable_n`` consecutive rejected positions form
          a mutually-consistent track, the new track is accepted
          (re-anchor after KOs/respawns).

        Extends the reference's nearest-to-previous duplicate suppression
        (ai_runner.py:313-358) to single-detection outliers.
        """
        class_id = constants.CHAR_LIST.index(fighter)
        last = None
        last_frame = None
        pending = None  # (crop, frame) of the last rejected detection
        pending_run = 0
        for label_path in self.get_label_paths():
            frame = extract_number_from_filename(label_path)
            mine = [c for c in read_yolo_crops(label_path)
                    if c.class_id == class_id]
            if not mine:
                continue
            if len(mine) > 1:
                # Pre-dedup duplicate: first-line order is arbitrary, and
                # removing the line would discard the good detection along
                # with the bad one.  Leave the frame for the
                # nearest-to-previous dedup pass to resolve.
                continue
            crop = mine[0]
            if last is not None:
                gap = max(frame - last_frame, 1)
                allowed = self.max_center_jump * gap + 0.02
                dist = abs(crop.center_x - last.center_x) + abs(
                    crop.center_y - last.center_y
                )
                if dist > allowed:
                    on_other = any(
                        abs(crop.center_x - o.center_x)
                        + abs(crop.center_y - o.center_y) < 0.04
                        for o in read_yolo_crops(label_path)
                        if o.class_id != crop.class_id
                    )
                    if on_other:
                        pending, pending_run = None, 0
                    else:
                        consistent = pending is not None and (
                            abs(crop.center_x - pending[0].center_x)
                            + abs(crop.center_y - pending[0].center_y)
                            <= self.max_center_jump
                            * max(frame - pending[1], 1) + 0.02
                        )
                        pending_run = pending_run + 1 if consistent else 1
                        pending = (crop, frame)
                        if pending_run >= stable_n:
                            # A stable new track: accept it (teleport).
                            last, last_frame = crop, frame
                            pending, pending_run = None, 0
                            continue
                    self._remove_fighter_line(label_path, fighter)
                    crop_path = self.get_crop_path(fighter, frame)
                    if os.path.exists(crop_path):
                        os.unlink(crop_path)
                    continue
            last, last_frame = crop, frame
            pending, pending_run = None, 0

    def clean_yolo_crops_for_fighter(self, fighter):
        """Duplicate suppression + gap interpolation
        (reference: ai_runner.py:306-424)."""
        crop_paths = self.get_crop_paths(fighter)
        label_paths = self.get_label_paths()

        # Nearest-to-previous-center duplicate suppression.
        previous_class_id_to_crop = {}
        for label_path in label_paths:
            class_id_to_crop = defaultdict(list)
            yolo_crops = read_yolo_crops(label_path)
            for crop in yolo_crops:
                class_id_to_crop[crop.class_id].append(crop)

            found_duplicate = False
            for class_id, crops in class_id_to_crop.items():
                if len(crops) > 1 and class_id in previous_class_id_to_crop:
                    found_duplicate = True
                    prev = previous_class_id_to_crop[class_id]
                    nearest = min(
                        crops,
                        key=lambda c: abs(c.center_x - prev.center_x)
                        + abs(c.center_y - prev.center_y),
                    )
                    class_id_to_crop[class_id] = [nearest]

            new_yolo_strings = []
            for class_id, crops in class_id_to_crop.items():
                if len(crops) > 1:
                    # No previous reference: keep the first.
                    crops = crops[:1]
                    class_id_to_crop[class_id] = crops
                new_yolo_strings.append(str(crops[0]))
                previous_class_id_to_crop[class_id] = crops[0]

            if not found_duplicate:
                continue
            with open(label_path, "w") as f:
                f.write("\n".join(new_yolo_strings) + "\n")

        # Interpolate missed detections.
        latest_seen_frame = extract_number_from_filename(label_paths[0])
        for crop_path in crop_paths:
            current_frame = extract_number_from_filename(crop_path)
            if current_frame - latest_seen_frame > 1:
                latest_label = self.get_label_path(latest_seen_frame)
                current_label = self.get_label_path(current_frame)
                start_crop = read_fighter_yolo_crop(latest_label, fighter)
                end_crop = read_fighter_yolo_crop(current_label, fighter)
                assert end_crop, f"missing end crop {current_label} for {fighter}"
                if start_crop is None:
                    # Leading gap: the fighter's first detections were
                    # removed (identity filters) or absent; backfill from
                    # the first surviving detection (mirror of tail fill).
                    start_crop = end_crop

                for j in range(latest_seen_frame + 1, current_frame):
                    if read_fighter_yolo_crop(self.get_label_path(j), fighter):
                        continue
                    interp_percent = (current_frame - j) / (current_frame - latest_seen_frame)
                    interp_crop = start_crop.interp(end_crop, percent=interp_percent)

                    with open(self.get_label_path(j), "a") as f:
                        f.write(str(interp_crop) + "\n")

                    ok, input_frame = self.reader.read_at(j)
                    if not ok:
                        shutil.copy(
                            self.get_crop_path(fighter, j - 1),
                            self.get_crop_path(fighter, j),
                        )
                        continue
                    ok, crop = interp_crop.square_crop(
                        input_frame, self.pipeline.crop_size,
                        padding=self.crop_padding,
                    )
                    assert ok, f"Failed to get square crop from frame {j}"
                    cv2.imwrite(self.get_crop_path(fighter, j), crop)

            latest_seen_frame = current_frame

    # ------------------------------------------------------------------
    # Batched action recognition (replaces reference: ai_runner.py:426-520)
    # ------------------------------------------------------------------

    def _load_crop(self, path, output_size=None):
        """Load a cached crop at the MODEL's input size.  output_size must
        track pipeline.crop_size: a fixed 128 here silently fed 2x-scale
        crops to models trained at other sizes (the ResNet's global pool
        accepts any spatial size, so nothing crashed — accuracy just
        collapsed; this was the round-1 pixels-capstone's 56%)."""
        if output_size is None:
            output_size = self.pipeline.crop_size
        frame = cv2.imread(path)
        assert frame is not None, f"Failed to read crop {path}"
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        frame = aspect_resize(frame, width=output_size)
        if frame.shape[0] != output_size or frame.shape[1] != output_size:
            from PIL import Image, ImageOps

            frame = np.array(
                ImageOps.pad(Image.fromarray(frame), (output_size, output_size),
                             color="black")
            )
        return frame

    def ensure_variables(self, rng_seed=0):
        if self.variables is None:
            import sys

            import jax

            print(
                "WARNING: no trained weights provided; using random "
                "initialization (predicted actions will be meaningless). "
                "Pass variables= or a --checkpoint.",
                file=sys.stderr,
            )
            self.variables = self.pipeline.init(jax.random.PRNGKey(rng_seed))
        return self.variables

    def run_action_recognition(self, overwrite=False, embed_batch=256):
        """Classify every frame of every fighter in device-sized batches."""
        self.ensure_variables()
        for fighter in self.fighters:
            if not overwrite and self.ai_output_data[fighter][0].action:
                continue

            # Embed once, streaming crops in embed_batch-sized uint8 slices
            # (RGB flip + /255 run fused on device) so host memory stays
            # bounded regardless of VOD length.
            frame_nums = list(range(1, self.max_frames))
            embeddings = []
            for start in range(0, len(frame_nums), embed_batch):
                batch_nums = frame_nums[start : start + embed_batch]
                crops_u8 = np.stack([
                    # _load_crop returns RGB; embed_crops_u8 flips BGR->RGB,
                    # so hand it BGR.
                    self._load_crop(self.get_crop_path(fighter, i))[..., ::-1]
                    for i in batch_nums
                ])
                embeddings.append(
                    np.asarray(
                        self.pipeline.embed_crops_u8(self.variables, jnp.asarray(crops_u8))
                    )
                )
            embeddings = jnp.asarray(np.concatenate(embeddings, axis=0))

            # 3) classify all windows at once (min_frame=1 in crop-file space
            #    -> index 0 of the embedding sequence).
            labels, conf, raw = self.pipeline.classify_sequence(
                self.variables, embeddings, min_frame=0,
                smooth_radius=self.smooth_radius, decode=self.decode,
                switch_cost=self.switch_cost, return_raw=True,
            )
            labels = np.asarray(labels)
            conf = np.asarray(conf)
            # Raw (pre-smoothing/pre-decode) view comes from the same head
            # forward; only record it when it can differ.
            raw_labels = (np.asarray(raw)
                          if self.smooth_radius or self.decode != "argmax"
                          else None)

            last_crop = None
            for pos, frame_num in enumerate(frame_nums):
                crop = read_fighter_yolo_crop(self.get_label_path(frame_num), fighter)
                # Tail-filled frames have crops but no label entry; carry the
                # last known crop forward (the reference wrote the string
                # "None" here and crashed downstream, ai_runner.py:478-518).
                crop = crop or last_crop
                last_crop = crop
                frame_data = self.ai_output_data[fighter][frame_num - 1]
                if crop is not None:
                    frame_data.crop = str(crop)
                frame_data.action = self.actions[int(labels[pos])]
                frame_data.predicted_action_confidence = float(conf[pos])
                if raw_labels is not None:
                    frame_data.action_raw = self.actions[int(raw_labels[pos])]

    # ------------------------------------------------------------------
    # Damage OCR (reference: ai_runner.py:522-590)
    # ------------------------------------------------------------------

    def determine_player_id_to_fighter(self):
        """Left-most detection in the first labeled frame is player 0
        (generalising the reference's hardcoded Pikachu/Joker map,
        ai_runner.py:522-535)."""
        self.player_id_to_fighter = {}
        label_paths = self.get_label_paths()
        for path in label_paths:
            crops = read_yolo_crops(path)
            if len(crops) == 2:
                ordered = sorted(crops, key=lambda c: c.center_x)
                for pid, crop in enumerate(ordered):
                    if 0 <= crop.class_id < len(constants.CHAR_LIST):
                        self.player_id_to_fighter[pid] = constants.CHAR_LIST[crop.class_id]
                if len(self.player_id_to_fighter) == 2:
                    return self.player_id_to_fighter
        # Fallback to the detected fighter dirs.
        for pid, fighter in enumerate(self.fighters[:2]):
            self.player_id_to_fighter[pid] = fighter
        return self.player_id_to_fighter

    def run_damage_detection(self, ocr=None, smooth=5):
        self.determine_player_id_to_fighter()
        # Default: the trained conv digit classifier (handles stylized/
        # tinted HUD glyphs; falls back to template matching when its
        # committed weights are absent).
        ocr = ocr or default_reader()
        num_confident = 0
        for i, input_frame in self.reader.iter_frames(0, self.max_frames):
            for player_id, params in PLAYER_DAMAGE_CROPS.items():
                damage_img = YoloCrop(**params).crop_img(input_frame)
                res, (damage, raw, confidence, details) = ocr(damage_img)
                num_confident += int(res)
                if self.debug:
                    cv2.imwrite(
                        os.path.join(
                            self.debug_path,
                            f"{i}_p{player_id}_{'_' if res else 'FAIL_'}{damage}_{raw}.jpg",
                        ),
                        damage_img,
                    )
                fighter = self.player_id_to_fighter[player_id]
                self.ai_output_data[fighter][i].damage = damage
        if smooth and smooth > 1:
            self.smooth_damage(window=smooth)
        return num_confident

    def smooth_damage(self, window=5):
        """Temporal median over the per-fighter damage track.

        HUD damage is a step function that holds for many frames between
        hits, so an odd-window median is exact at every step boundary
        (for runs >= (window+1)//2 + 1) and erases isolated OCR
        misreads — it cannot smear a legitimate jump the way a mean
        would.  The reference read each frame independently
        (ai_runner.py:537-590) and inherited PaddleOCR's per-frame
        noise."""
        half = window // 2
        for fighter, per_frame in self.ai_output_data.items():
            frames = sorted(k for k, v in per_frame.items()
                            if isinstance(v, dict) and "damage" in v)
            vals = {i: per_frame[i].damage for i in frames}
            usable = [i for i in frames if vals[i] is not None]
            if len(usable) < window:
                continue
            smoothed = {}
            for i in frames:
                neigh = [vals[j] for j in range(i - half, i + half + 1)
                         if j in vals and vals[j] is not None]
                if neigh:
                    smoothed[i] = float(np.median(neigh))
            for i, v in smoothed.items():
                per_frame[i].damage = v

    # ------------------------------------------------------------------
    # ai_output.yaml cache (reference: ai_runner.py:592-608)
    # ------------------------------------------------------------------

    def load_ai_output(self):
        if not os.path.exists(self.ai_output_file):
            return False, Dict()
        with open(self.ai_output_file, "r") as f:
            try:
                return True, Dict(yaml.safe_load(f))
            except Exception:
                return False, Dict()

    def write_output(self):
        os.makedirs(self.yolo_output_dir, exist_ok=True)
        with open(self.ai_output_file, "w") as f:
            yaml.dump(self.ai_output_data.to_dict(), f)


@click.command()
@click.option("--video", "-v", help="Path to video")
@click.option("--checkpoint", "-c", default=None,
              help="orbax checkpoint dir for the action model (Trainer format)")
@click.option("--family", default="cnn", type=click.Choice(["cnn", "resformer", "rnn"]))
def ai_runner(video, checkpoint, family):
    """Entrypoint to AIRunner (reference: ai_runner.py:611-622)."""
    pipeline = BatchedActionPipeline(family=family, num_actions=len(MOVE_TO_CLASS_ID))
    variables = pipeline.load_checkpoint(checkpoint) if checkpoint else None
    runner = AIRunner(input_video_path=video, debug=True, pipeline=pipeline,
                      variables=variables)
    runner.run_detection_setup()
    runner.run_action_recognition()
    runner.write_output()
    runner.run_damage_detection()
    runner.write_output()
    print("🎉 COMPLETED 🎉")


if __name__ == "__main__":
    ai_runner()
