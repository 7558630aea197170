#!/usr/bin/env python
"""Benchmark the GT (manuscript) annotated-MP4 path.

Measures fps with charts on/off on a synthetic 720p VOD + scripted log,
using the Manuscript's own StageTimer for the per-stage split (VERDICT
round-1 asked for the GT path's numbers alongside the AI path's).

    python tools/bench_manuscript.py [frames]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    import cv2
    import numpy as np

    from synthlog import scripted_match, write_log
    from playaid_core_tpu.pipeline.manuscript import Manuscript

    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    log = "/tmp/bench_ms_log.txt"
    video = f"/tmp/bench_ms_vid_{frames}.mp4"  # fixture keyed by length
    write_log(log, scripted_match(frames))
    if not os.path.exists(video):
        w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 60, (1280, 720))
        rng = np.random.default_rng(0)
        base = rng.integers(20, 90, (720, 1280, 3), dtype=np.uint8)
        for i in range(frames):
            fr = base.copy()
            cv2.circle(fr, (300 + i % 600, 360), 60, (0, 200, 255), -1)
            w.write(fr)
        w.release()

    results = {}
    for label, skip_graphs, chart_refresh in (
        ("charts_on", False, 1),
        ("charts_refresh5", False, 5),
        ("charts_off", True, 1),
    ):
        ms = Manuscript(
            input_video_path=video,
            output_video_path=f"/tmp/bench_ms_out_{label}.mp4",
            max_frames=frames,
            ground_truth_path=log,
            skip_graphs=skip_graphs,
            skip_summaries=True,
            chart_refresh=chart_refresh,
            include_audio=False,
        )
        t0 = time.perf_counter()
        ms.render()
        dt = time.perf_counter() - t0
        # fps over frames actually rendered (the decode stage count is
        # rendered+1: the final read returns EOF), not the request.
        rendered = ms.timer.counts["charts"]
        results[label] = {
            "fps": round(rendered / dt, 1),
            "frames": rendered,
            "stages": ms.timer.report(),
        }
        print(f"{label}: {rendered / dt:.1f} fps | {ms.timer.report()}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
