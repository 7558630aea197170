#!/usr/bin/env python
"""Re-score a finished pixels-capstone workdir without retraining.

Loads trained_states.pkl from a tools/pixels_capstone.py workdir, rebuilds
the deterministic eval ground truth (same seeds as the capstone driver),
and re-runs the inference + scoring path — so inference-side changes
(smoothing radius, identity filters, OCR, detector decode settings) can be
measured in minutes instead of re-running the ~1h training phases.

    python -u tools/rescore_capstone.py <workdir> [--smooth-radius N]
                                        [--pairs N] [--frames N] [--small]

Scores print per match; nothing is appended to docs/pixels_stack_runs.jsonl
(use the full driver for records).
"""

from __future__ import annotations

import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def load_states(workdir):
    with open(os.path.join(workdir, "trained_states.pkl"), "rb") as f:
        return pickle.load(f)


def rebuild_trainers(states):
    import jax
    import jax.numpy as jnp

    from playaid_core_tpu import constants
    from playaid_core_tpu.infer.pipeline import BatchedActionPipeline
    from playaid_core_tpu.train.detector_train import DetectorTrainer

    meta = states["meta"]
    pipe = BatchedActionPipeline(
        family=meta["family"], num_actions=meta["num_actions"],
        sequence_length=meta["sequence_length"], frame_delta=meta["frame_delta"],
        crop_size=meta["crop_size"],
    )
    split_vars = pipe.from_monolithic(states["action"])

    det_trainer = DetectorTrainer(
        dataset=None, num_classes=len(constants.CHAR_LIST),
        input_hw=(256, 448), dtype=jnp.bfloat16,
    )
    det_trainer.state = det_trainer.state.replace(
        params=jax.device_put(states["detector"]["params"]),
        batch_stats=jax.device_put(states["detector"]["batch_stats"]),
    )
    return pipe, split_vars, det_trainer, meta


def main():
    import argparse

    import pixels_capstone as cap
    from playaid_core_tpu import constants

    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--smooth-radius", type=int, default=16)
    ap.add_argument("--decode", choices=("argmax", "viterbi"), default="argmax")
    ap.add_argument("--switch-cost", type=float, default=4.0)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--frames", type=int, default=1800)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--fresh-cache", action="store_true",
                    help="redo detection (default reuses the ai_cache)")
    ap.add_argument("--no-damage", action="store_true",
                    help="skip damage OCR (decode sweeps don't touch it)")
    args = ap.parse_args()
    workdir = args.workdir

    cap._warm_tunnel()
    cap._heartbeat()
    states = load_states(workdir)
    pipe, split_vars, det_trainer, meta = rebuild_trainers(states)
    print(f"loaded {meta}")

    cache_root = os.path.join(workdir, "ai_cache")
    if args.fresh_cache:
        cache_root = os.path.join(workdir, "ai_cache_rescore")
    constants.AI_CACHE = cache_root

    eval_stage = cap.make_stage(os.path.join(workdir, "eval_stage.jpg"),
                                seed=991, kind="bands")
    def cached_gt(video_path, gt_key, render):
        """GT rebuild is deterministic but re-rendering 1800 frames costs
        minutes of host CPU per config; cache (video, gt) on first render
        and reuse for subsequent sweep configs."""
        gt_path = os.path.join(workdir, f"{gt_key}.gt.pkl")
        if os.path.exists(gt_path) and os.path.exists(video_path):
            with open(gt_path, "rb") as f:
                return pickle.load(f)
        gt = render()
        with open(gt_path, "wb") as f:
            pickle.dump(gt, f)
        return gt

    scores = []
    for m, pair in enumerate(cap.EVAL_PAIR_SETS[: args.pairs]):
        # Frame count in the video name (matching the capstone driver):
        # schedules unroll per num_frames, so a stale video at another
        # count must miss the cache rather than score mismatched content.
        video_path = os.path.join(workdir, f"eval_match_{m}_{args.frames}.mp4")
        gt = cached_gt(
            video_path, f"eval_match_{m}_{args.frames}",
            lambda: cap.make_eval_video(video_path, pair,
                                        num_frames=args.frames,
                                        seed=2000 + m, stage_path=eval_stage),
        )
        s = cap.analyze_match(video_path, pair, det_trainer, pipe, split_vars,
                              workdir, gt, smooth_radius=args.smooth_radius,
                              decode=args.decode, switch_cost=args.switch_cost,
                              damage=not args.no_damage, overwrite=True)
        s["pair"] = list(pair)
        print(f"match {m} {pair}: det {s['det_rate']:.2%} "
              f"act {s['act_rate']:.2%} (raw {s['act_rate_raw']:.2%}, "
              f"interior {s['act_rate_interior']:.2%}, "
              f"boundary {s['act_rate_boundary']:.2%}) "
              f"damage {s['damage_acc'] if s['damage_acc'] is None else round(s['damage_acc'], 4)}")
        print("  top confusions:", json.dumps(s["top_confusions"]))
        scores.append(s)

    if args.small:
        pair = cap.EVAL_PAIR_SETS[0]
        small_frames = min(args.frames, 900)
        video_path = os.path.join(workdir, f"eval_small_{small_frames}.mp4")
        gt = cached_gt(
            video_path, f"eval_small_{small_frames}",
            lambda: cap.make_eval_video(video_path, pair,
                                        num_frames=small_frames,
                                        sprite_px=(40, 64), seed=3000,
                                        stage_path=eval_stage),
        )
        s = cap.analyze_match(video_path, pair, det_trainer, pipe, split_vars,
                              workdir, gt, damage=False,
                              smooth_radius=args.smooth_radius,
                              decode=args.decode, switch_cost=args.switch_cost,
                              overwrite=True)
        print(f"far-zoom: det {s['det_rate']:.2%} act {s['act_rate']:.2%}")

    import numpy as np

    for key in ("det_rate", "act_rate", "act_rate_raw", "act_rate_interior",
                "act_rate_boundary"):
        print(f"mean {key}: {float(np.mean([s[key] for s in scores])):.4f}")


if __name__ == "__main__":
    main()
