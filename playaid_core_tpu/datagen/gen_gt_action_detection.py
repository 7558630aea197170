"""Generate the per-fighter action-crop training tree from (video, log)
pairings.

Rebuild of the reference generator (reference:
data_gen_scripts/gen_gt_action_detection.py:26-116): for each pairing,
replay the timeline and write
``<split>/<video>/<fighter_id>_<fighter_name>/{images,labels}/NNNNNN.{jpg,txt}``
with 128px square crops and action-string labels.  Idempotent per video
directory.

Parallelism: thread pool over pairings (decode releases the GIL), sized
to host cores — replacing the reference's ``Pool(cpu_count - 4)``.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import click
import cv2

from playaid_core_tpu import constants
from playaid_core_tpu.timeline import (
    load_ground_truth_from_path,
    load_ground_truth_pairings_from_file,
    precompute_timeline_projection,
    update_fighters_from_timeline,
)
from playaid_core_tpu.video.reader import VideoReader

OUTPUT_DIMENSION = 128
CROP_PADDING = 30


def process_pairing(sub_dir, pairing, ground_truth_dir=None, overwrite=False):
    ground_truth_dir = ground_truth_dir or constants.GROUND_TRUTH_DIR
    dir_name, video_name, log_name, log_offset = pairing
    video_path = os.path.join(ground_truth_dir, dir_name, video_name)
    label_path = os.path.join(ground_truth_dir, dir_name, log_name)

    reader = VideoReader(video_path)
    timeline = load_ground_truth_from_path(label_path, log_offset=log_offset)
    precompute_timeline_projection(timeline)
    max_frames = min(reader.frame_count, len(timeline))

    fighters = []
    written = 0
    for i, input_frame in reader.iter_frames(0, max_frames):
        fighters = update_fighters_from_timeline(i, timeline[i], fighters)

        for j, fighter in enumerate(fighters):
            anim_dir = os.path.join(
                sub_dir, dir_name,
                f"{fighter.fighter_id}_{fighter.fighter_name.lower().replace(' ', '_')}",
            )
            if i == 0 and j == 0 and os.path.exists(anim_dir) and not overwrite:
                reader.release()
                return 0

            ok, crop = fighter.crop.square_crop(
                input_frame, OUTPUT_DIMENSION, padding=CROP_PADDING
            )
            if not ok:
                # Fighter offscreen.
                continue

            images_dir = os.path.join(anim_dir, "images")
            labels_dir = os.path.join(anim_dir, "labels")
            os.makedirs(images_dir, exist_ok=True)
            os.makedirs(labels_dir, exist_ok=True)

            cv2.imwrite(os.path.join(images_dir, f"{str(i).zfill(6)}.jpg"), crop)
            with open(os.path.join(labels_dir, f"{str(i).zfill(6)}.txt"), "w") as f:
                f.write(fighter.action or "Undefined")
            written += 1
    reader.release()
    return written


def generate_data(pairings_file, sub_dir_name, output_root=None, workers=None):
    output_root = output_root or constants.ACTION_GROUND_TRUTH_DIR
    sub_dir = os.path.join(output_root, sub_dir_name)
    pairings = load_ground_truth_pairings_from_file(pairings_file)
    workers = workers or max(os.cpu_count() or 1, 1)
    with ThreadPoolExecutor(max_workers=workers) as pool:
        results = list(pool.map(lambda p: process_pairing(sub_dir, p), pairings))
    return sum(results)


@click.command()
@click.option("--workers", default=None, type=int)
def main(workers):
    generate_data(constants.GROUND_TRUTH_TRAIN, "train", workers=workers)
    generate_data(constants.GROUND_TRUTH_VAL, "validation", workers=workers)
    generate_data(constants.GROUND_TRUTH_TEST, "test", workers=workers)
    print("🎉 COMPLETED 🎉")


if __name__ == "__main__":
    main()
