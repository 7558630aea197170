#!/usr/bin/env python
"""Trained-weights label-agreement validation across decode backends.

Runs the same VOD through every decode configuration (cv2, native BGR,
native YUV420, fractional lowres 1/2, frame-stride 2) with a TRAINED
action model and ground-truth boxes, asserting the scale-at-decode and
stride modes change nothing: measured 100% ground-truth agreement and
100% label match vs the cv2 baseline on the pixels-capstone eval
(docs/PERFORMANCE.md).  Requires a tools/train_pixels_stack.py workdir
(default /tmp/pixels_run5) with trained_states.pkl.
"""

import sys, os, pickle, numpy as np
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")
from e2e_pixels_demo import FIGHTERS, MOVES, make_eval_video
ACTIONS = MOVES + ["Unknown"]
from playaid_core_tpu.infer.pipeline import BatchedActionPipeline
from playaid_core_tpu.infer.vod_pipeline import VodAnalyzer

workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pixels_run5"
with open(os.path.join(workdir, "trained_states.pkl"), "rb") as f:
    states = pickle.load(f)
pipe = BatchedActionPipeline(family="cnn", num_actions=len(ACTIONS),
                             sequence_length=3, frame_delta=1, crop_size=64)
variables = pipe.from_monolithic(states["action"])

video = os.path.join(workdir, "eval_match.mp4")
gt_boxes, gt_labels = make_eval_video("/tmp/regen9.mp4",
                                      os.path.join(workdir, "assets/stages"),
                                      num_frames=480)
# yolo boxes per frame from gt (perfect boxes; isolates the decode path)
def agreement(labels):
    hits = total = 0
    for i in range(480):
        for k in range(2):
            total += 1
            hits += int(ACTIONS[int(labels[i, k])] == gt_labels[i, k])
    return hits / total

results = {}
configs = [
    ("cv2", dict(decode_backend="cv2")),
    ("native", dict(decode_backend="native", transfer_format="bgr")),
    ("native+yuv", dict(decode_backend="native")),
    ("native+yuv+lowres1", dict(decode_backend="native", lowres=1)),
    ("native+yuv+lowres2", dict(decode_backend="native", lowres=2)),
    ("native+yuv+lowres1+stride2", dict(decode_backend="native", lowres=1, stride=2)),
]
base_labels = None
for name, kw in configs:
    an = VodAnalyzer(pipe, variables=variables, chunk=48, padding=8, **kw)
    res = an.analyze(video, gt_boxes)
    acc = agreement(res["labels"])
    same = None
    if base_labels is None:
        base_labels = res["labels"]
    else:
        same = float((res["labels"] == base_labels).mean())
    print(f"{name}: gt-agreement {acc:.2%}" +
          (f", label-match vs cv2 {same:.2%}" if same is not None else ""),
          flush=True)
