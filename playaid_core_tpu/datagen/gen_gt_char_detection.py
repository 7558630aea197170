"""Generate full-frame character-detection training data (YOLO format).

Rebuild of the reference generator (reference:
data_gen_scripts/gen_gt_char_detection.py:24-99): full frames + square
normalized bboxes from the log-projected crops, with per-split sampling
intervals (train every 5 frames, validation every 600, test every 900).
"""

from __future__ import annotations

import os

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


def write_yolo_output(output_path, yolo_data):
    """(reference: gen_gt_char_detection.py:24-34)"""
    with open(output_path, "w") as f:
        for class_id, bbox_yolo in yolo_data:
            f.write(f"{class_id} {bbox_yolo[0]} {bbox_yolo[1]} {bbox_yolo[2]} {bbox_yolo[3]}\n")


def generate_data(pairings_file, sub_dir_name, interval=1, offset=0, max_frames=None,
                  overwrite=False, output_root=None, ground_truth_dir=None):
    output_root = output_root or constants.GROUND_TRUTH_CHAR_DETECTION_DIR
    ground_truth_dir = ground_truth_dir or constants.GROUND_TRUTH_DIR
    sub_dir = os.path.join(output_root, sub_dir_name)
    images_dir = os.path.join(sub_dir, "images")
    labels_dir = os.path.join(sub_dir, "labels")
    os.makedirs(images_dir, exist_ok=True)
    os.makedirs(labels_dir, exist_ok=True)

    written = 0
    for pairing in load_ground_truth_pairings_from_file(pairings_file):
        dir_name, video_name, log_name, log_offset = pairing
        video_path = os.path.join(ground_truth_dir, dir_name, video_name)
        label_path = os.path.join(ground_truth_dir, dir_name, log_name)
        reader = VideoReader(video_path)
        limit = max_frames if max_frames else reader.frame_count
        timeline = load_ground_truth_from_path(label_path, log_offset=log_offset)
        precompute_timeline_projection(timeline)
        limit = min(limit, len(timeline))

        fighters = []
        for i, input_frame in reader.iter_frames(offset, limit):
            fighters = update_fighters_from_timeline(i, timeline[i], fighters)
            if (i + offset) % interval != 0:
                continue

            output_img_path = os.path.join(images_dir, f"{dir_name}-{i}.jpg")
            if not overwrite and os.path.exists(output_img_path):
                break

            yolo_data = [
                (
                    constants.CHAR_LIST.index(f.fighter_name)
                    if f.fighter_name in constants.CHAR_LIST else -1,
                    f.crop.square_yolo_crop(input_frame),
                )
                for f in fighters
            ]
            cv2.imwrite(output_img_path, input_frame)
            write_yolo_output(os.path.join(labels_dir, f"{dir_name}-{i}.txt"), yolo_data)
            written += 1
        reader.release()
    return written


@click.command()
def main():
    generate_data(constants.GROUND_TRUTH_TRAIN, "train", interval=5)
    generate_data(constants.GROUND_TRUTH_VAL, "validation", interval=60 * 10, offset=3)
    generate_data(constants.GROUND_TRUTH_TEST, "test", interval=60 * 15, offset=6)
    print("🎉 COMPLETED 🎉")


if __name__ == "__main__":
    main()
