#!/usr/bin/env python
"""Train the pixels-only stack at real budgets and score it.

Drives tools/e2e_pixels_demo.py's harness with production step counts
(the round-1 capstone used 600 detector steps / 5 action epochs and
scored 56% action agreement; this script exists to push the same
self-contained pipeline to >=99% detection and >=95% action agreement),
then writes metrics + diagnostics to a JSONL recipe record.

Run on TPU:  python tools/train_pixels_stack.py [workdir]
Env: DET_STEPS (default 4000), ACT_EPOCHS (default 20), EVAL_FRAMES (480).
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def diagnose(out):
    """Box-scale + per-move diagnostics for the scored demo run."""
    from playaid_core_tpu.infer.detection import read_fighter_yolo_crop

    from tools.e2e_pixels_demo import FIGHTERS

    runner, gt_boxes, gt_labels = out["runner"], out["gt_boxes"], out["gt_labels"]
    # gt_labels/gt_boxes columns are in FIGHTERS order; ai_output_data's
    # key order is detection-dependent, so index by name.
    fighters = list(FIGHTERS)
    size_ratios = []
    per_move = {}
    for i in range(1, runner.max_frames):
        for k, fighter in enumerate(fighters):
            crop = read_fighter_yolo_crop(runner.get_label_path(i), fighter)
            gt = gt_boxes[i - 1, k]
            if crop is not None and gt[2] > 0:
                size_ratios.append(max(crop.crop_width / gt[2], 1e-3))
            move = gt_labels[i - 1, k]
            stats = per_move.setdefault(move, [0, 0])
            stats[1] += 1
            if runner.ai_output_data[fighter][i - 1].action == move:
                stats[0] += 1
    ratios = np.array(size_ratios)
    diag = {
        "box_width_ratio_mean": float(ratios.mean()) if len(ratios) else None,
        "box_width_ratio_p10_p90": (
            [float(np.percentile(ratios, 10)), float(np.percentile(ratios, 90))]
            if len(ratios) else None
        ),
        "per_move_agreement": {
            m: round(h / t, 4) for m, (h, t) in sorted(per_move.items())
        },
    }
    return diag


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="pixels_stack_")
    det_steps = int(os.environ.get("DET_STEPS", "4000"))
    act_epochs = int(os.environ.get("ACT_EPOCHS", "20"))
    act_steps = int(os.environ.get("ACT_STEPS", "48"))
    eval_frames = int(os.environ.get("EVAL_FRAMES", "480"))
    det_composites = int(os.environ.get("DET_COMPOSITES", "300"))

    from tools.e2e_pixels_demo import run_demo

    # Keep-alive heartbeat: the tunneled TPU session goes stale after
    # ~10 min of device idleness (long host-side phases like composite
    # generation), after which the NEXT device op hangs forever rather
    # than reconnecting.  A tiny device op every minute keeps the session
    # warm.
    import threading

    def _heartbeat():
        import jax.numpy as jnp

        while True:
            try:
                jnp.zeros((1,)).block_until_ready()
            except Exception:
                pass
            time.sleep(60)

    threading.Thread(target=_heartbeat, daemon=True).start()

    t0 = time.time()
    out = run_demo(workdir, det_steps=det_steps, act_epochs=act_epochs,
                   act_steps=act_steps, eval_frames=eval_frames,
                   det_composites=det_composites)
    elapsed = time.time() - t0

    # Persist both trained states for post-hoc diagnosis / reuse.
    import pickle

    import jax

    with open(os.path.join(workdir, "trained_states.pkl"), "wb") as f:
        pickle.dump({
            "action": jax.device_get({
                "params": out["act_trainer"].state.params,
                "batch_stats": out["act_trainer"].state.batch_stats,
            }),
            "detector": jax.device_get({
                "params": out["det_trainer"].state.params,
                "batch_stats": out["det_trainer"].state.batch_stats,
            }),
        }, f)

    diag = diagnose(out)
    record = {
        "det_steps": det_steps,
        "det_composites": det_composites,
        "act_epochs": act_epochs,
        "act_steps_per_epoch": act_steps,
        "eval_frames": eval_frames,
        "det_rate": round(out["det_rate"], 4),
        "act_rate": round(out["act_rate"], 4),
        "seconds": round(elapsed, 1),
        **diag,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "docs", "pixels_stack_runs.jsonl")
    with open(os.path.abspath(path), "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record, indent=2))
    print(f"workdir: {workdir}")


if __name__ == "__main__":
    main()
