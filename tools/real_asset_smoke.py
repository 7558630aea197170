#!/usr/bin/env python
"""Real-asset smoke test: validate the framework against one real VOD+log.

The test suite runs entirely on synthetic fixtures (the reference's game
assets are not distributable).  When a real ult_logger pairing IS
available (reference layout: ult_dataset/ground_truth/<match>/ with a
video and log — reference: timeline_test.py:9-48), this script exercises
every layer against it and reports what it found:

    python tools/real_asset_smoke.py --video match.mp4 --log log.txt \
        [--frames 600] [--offset 5] [--checkpoint ckpt_dir_or_.ckpt]

Checks: log parse + gap repair stats, fighter identification, camera
projection sanity (boxes on screen), full stats replay + narration,
a rendered annotated segment, and (with a checkpoint) the batched AI
path's label agreement against the log-derived actions.
"""

import os
import sys

import click
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@click.command()
@click.option("--video", required=True, help="real VOD path")
@click.option("--log", "log_path", required=True, help="ult_logger log path")
@click.option("--frames", default=600, type=int, help="frames to exercise")
@click.option("--offset", default=5, type=int, help="log offset (reference default 5)")
@click.option("--checkpoint", default=None,
              help="action model checkpoint (orbax dir or Lightning .ckpt)")
@click.option("--out", default="/tmp/real_smoke", help="output dir")
def main(video, log_path, frames, offset, checkpoint, out):
    import cv2

    from playaid_core_tpu.stats import Stats
    from playaid_core_tpu.timeline import (
        load_ground_truth_from_path,
        precompute_timeline_projection,
        update_fighters_from_timeline,
    )

    # --- 0) asset validation with actionable messages ---
    if not os.path.exists(video):
        raise SystemExit(
            f"ERROR: video not found: {video}\n"
            "  Pass the MP4 recorded alongside the ult_logger session "
            "(reference layout: ult_dataset/ground_truth/<match>/*.mp4)."
        )
    if not os.path.exists(log_path):
        raise SystemExit(
            f"ERROR: log not found: {log_path}\n"
            "  Pass the ult_logger output (one JSON record per fighter "
            "per frame; see README 'Real assets')."
        )
    if checkpoint and not os.path.exists(checkpoint):
        raise SystemExit(
            f"ERROR: checkpoint not found: {checkpoint}\n"
            "  Pass an orbax checkpoint directory saved by train/train.py "
            "or a reference Lightning .ckpt file."
        )
    os.makedirs(out, exist_ok=True)
    report = {}

    # --- 1) ingest + projection ---
    try:
        timeline = load_ground_truth_from_path(log_path, log_offset=offset)
    except Exception as e:
        raise SystemExit(
            f"ERROR: could not parse log {log_path}: {e}\n"
            "  Expected ult_logger format: one JSON object per line, two "
            "lines (fighters) per frame, with num_frames_left fields."
        )
    if not timeline:
        raise SystemExit(
            f"ERROR: log {log_path} parsed to 0 frames — wrong file, or "
            f"log_offset {offset} consumed the whole log (try --offset 0)."
        )
    report["log_frames"] = len(timeline)
    precompute_timeline_projection(timeline)
    cap = cv2.VideoCapture(video)
    if not cap.isOpened():
        raise SystemExit(
            f"ERROR: OpenCV cannot open {video} — unsupported container/"
            "codec? Re-mux with ffmpeg (`ffmpeg -i in -c copy out.mp4`)."
        )
    vid_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    w, h = int(cap.get(3)), int(cap.get(4))
    cap.release()
    report["video"] = f"{vid_frames} frames @ {w}x{h}"
    if vid_frames and abs(vid_frames - len(timeline)) > max(
        600, 0.5 * len(timeline)
    ):
        report["warning"] = (
            f"video ({vid_frames} frames) and log ({len(timeline)}) lengths "
            "differ a lot — check the pairing and --offset (the reference "
            "pairings CSV stores a per-match offset)"
        )
    n = min(frames, len(timeline))

    # --- 2) fighter replay + stats + box sanity ---
    stats = Stats()
    fighters = []
    onscreen = 0
    names = None
    for i in range(n):
        fighters = update_fighters_from_timeline(i, timeline[i], fighters)
        stats.record_frame(fighters)
        if names is None:
            names = [f.fighter_name for f in fighters]
        for f in fighters:
            c = f.crop
            if c and 0.0 <= c.center_x <= 1.0 and 0.0 <= c.center_y <= 1.0:
                onscreen += 1
    report["fighters"] = names
    report["projection_onscreen_rate"] = round(onscreen / (2 * n), 4)
    report["narration_events"] = len(stats.stats.history)
    stats_path = os.path.join(out, "stats_snapshot.yaml")
    import yaml

    with open(stats_path, "w") as f:
        yaml.safe_dump(
            __import__("json").loads(
                __import__("json").dumps(stats.stats.to_dict(), default=str)
            ),
            f,
        )
    report["stats_snapshot"] = stats_path

    # --- 3) annotated render of a short segment ---
    from playaid_core_tpu.pipeline.manuscript import Manuscript

    seg = min(n, 300)
    ms = Manuscript(
        input_video_path=video,
        output_video_path=os.path.join(out, "annotated.mp4"),
        max_frames=seg,
        ground_truth_path=log_path,
        log_offset=offset,
    )
    ms.render()
    report["annotated"] = os.path.join(out, "annotated.mp4")

    # --- 4) AI path label agreement (optional, needs trained weights) ---
    if checkpoint:
        from playaid_core_tpu.infer.pipeline import BatchedActionPipeline
        from playaid_core_tpu.infer.vod_pipeline import VodAnalyzer, boxes_from_log
        from playaid_core_tpu.ontology import CLASS_ID_TO_MOVE

        boxes = boxes_from_log(log_path, num_frames=n, log_offset=offset)
        pipe = BatchedActionPipeline(family="cnn")
        variables = pipe.load_checkpoint(checkpoint)
        analyzer = VodAnalyzer(pipe, variables=variables)
        result = analyzer.analyze(video, boxes)
        gt_actions = []
        fighters = []
        for i in range(n):
            fighters = update_fighters_from_timeline(i, timeline[i], fighters)
            gt_actions.append([f.action for f in fighters[:2]])
        gt = np.asarray(gt_actions, object)
        pred = np.vectorize(lambda l: CLASS_ID_TO_MOVE.get(int(l), "?"))(
            result["labels"][:n]
        )
        report["ai_fps"] = round(result["fps"], 1)
        report["ai_label_agreement"] = round(float((pred == gt).mean()), 4)

    print("\n=== real-asset smoke report ===")
    for k, v in report.items():
        print(f"{k}: {v}")
    ok = report["projection_onscreen_rate"] > 0.5 and report["narration_events"] > 0
    print("RESULT:", "OK" if ok else "SUSPICIOUS (check offset / stage id)")


if __name__ == "__main__":
    main()
