"""Cross-backend label agreement with a freshly mini-trained model.

The portable successor to the round-2 machine-pinned
tools/validate_decode_backends.py run: trains a small CNN in-test (on
the quick color-coded toy task — backend equivalence only needs a
CONFIDENT model, not the full skeletal capstone), then asserts every
DEPLOYED decode configuration (native BGR, YUV420 transfer, the
auto-lowres policy, stride 2) produces labels matching the cv2 baseline
— INCLUDING a far-zoom clip with ~48 px sprites, the small-box case
where fractional decode flips labels (round-2 verdict item 5; measured
at scale with the capstone model, lowres below the input size costs
4-46 pts — hence the auto policy, vod_pipeline.auto_lowres).

The full-scale skeletal validation (trained capstone weights, held-out
eval distribution) runs via tools/validate_decode_backends.py against a
tools/pixels_capstone.py workdir; results are recorded in
docs/PERFORMANCE.md.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from playaid_core_tpu.video import native_decoder

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not native_decoder.available(),
                       reason="native video decoder unavailable"),
]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    import jax

    from playaid_core_tpu.infer.pipeline import BatchedActionPipeline
    from playaid_core_tpu.train.dataset import UltActionRecogDataset
    from playaid_core_tpu.train.train import Trainer, TrainerConfig
    from tools.e2e_pixels_demo import ACTIONS, FIGHTERS, make_assets

    root = tmp_path_factory.mktemp("backend_agreement")
    stages, clean = make_assets(str(root / "assets"))

    # Budget tuned for a 1-core CPU host: ~3 min of training reaches
    # ~0.85 train acc on the color-coded toy — confident enough that
    # labels aren't sitting on decision boundaries, which is all a
    # backend-equivalence check needs.
    ds = UltActionRecogDataset(
        split="synth", num_samples=192, img_dimension=64, anim_subset=ACTIONS,
        num_frames_per_sample=3, frame_delta=[1],
        char_subset=list(FIGHTERS), crop_size=64, seed=0,
        gt_root_train=str(root / "none"), gt_root_val=str(root / "none"),
        gt_root_test=str(root / "none"),
        stages_dir=stages, clean_char_dir=clean,
        synth_sprite_fill=(0.72, 1.0), synth_center_jitter=8,
    )
    config = TrainerConfig(family="cnn", num_actions=len(ACTIONS),
                           sequence_length=3, batch_size=8,
                           learning_rate=2e-3, num_samples=192, crop_size=64,
                           curriculum_threshold=1.1,
                           # 48-step budget: the default 200-step warmup
                           # would keep the whole run inside the LR ramp
                           # and leave labels on decision boundaries.
                           warmup_steps=0)
    trainer = Trainer(config, ds)
    trainer.init_state()
    trainer.fit(num_epochs=2, steps_per_epoch=24)
    assert trainer.metrics_log[-1]["train_acc"] > 0.75, trainer.metrics_log

    pipe = BatchedActionPipeline(family="cnn", num_actions=len(ACTIONS),
                                 sequence_length=3, frame_delta=1, crop_size=64)
    variables = pipe.from_monolithic({
        "params": jax.device_get(trainer.state.params),
        "batch_stats": jax.device_get(trainer.state.batch_stats),
    })
    return str(root), stages, pipe, variables


@pytest.mark.parametrize("label,sprite_size,min_match,min_crosscodec", [
    ("normal", 110, 0.97, 0.90),
    # far-zoom: a crf-20 transcode generation on ~48px sprites
    # legitimately moves more boundary labels of the quickly-trained toy
    # model, so the cross-codec sanity bound is looser (the gated
    # quantity — fast-decode vs spec-exact on the SAME file — stays
    # at 0.99 for both clips).
    ("farzoom", 48, 0.95, 0.80),
])
def test_backends_agree(trained, label, sprite_size, min_match, min_crosscodec):
    root, stages, pipe, variables = trained
    from tools.e2e_pixels_demo import ACTIONS, make_eval_video
    from tools.validate_decode_backends import validate

    video = os.path.join(root, f"clip_{label}.mp4")
    gt_boxes, gt_labels = make_eval_video(video, stages, num_frames=96,
                                          sprite_size=sprite_size)
    out = validate(pipe, variables, ACTIONS, video, gt_boxes, gt_labels,
                   padding=8, chunk=48, log=lambda *_: None)
    # the trained model must actually be reading the clip (guards against
    # a vacuous all-Unknown comparison)
    assert out["cv2"]["gt_agreement"] > 0.7, out
    # Deployed configurations must match the cv2 baseline at the SAME
    # stride (validate() compares stride rows against cv2+stride2:
    # propagation vs per-frame differences at action boundaries belong
    # to the stride mode, not the backend under test).  The fixed
    # lowres1/lowres2 rows are diagnostics: they degrade by design when
    # the decoded crop region falls below the model input size (measured
    # at scale with the 27-class capstone model — that's what the auto
    # policy prevents), so they are reported but not gated here.
    for name in ("native", "native+yuv", "native+yuv+auto",
                 "native+yuv+auto+stride2"):
        r = out[name]
        assert r["vs_cv2"] >= min_match, (label, name, r)
    # h264 rows (present when the native encoder builds).  The deployed
    # fast-decode="auto" (skip in-loop deblock) is gated against the
    # spec-exact decode of the SAME h264 file — that isolates exactly
    # the deblock skip.  The cross-codec row (h264+exact vs the mpeg4
    # cv2 baseline) folds in one crf-20 encode generation, which
    # legitimately moves boundary labels of this quickly-trained toy
    # model, so it gets a looser sanity bound.
    if "h264+fast" in out:
        assert out["h264+fast"]["vs_exact"] >= 0.99, out["h264+fast"]
        assert out["h264+fast"]["fast"] == 1, out["h264+fast"]
        assert out["h264+exact"]["fast"] == 0, out["h264+exact"]
        assert out["h264+exact"]["vs_cv2"] >= min_crosscodec, out["h264+exact"]
    # far-zoom boxes must force full-res decode; the auto policy picking
    # lowres>0 here would be the exact silent-label-flip failure mode.
    if label == "farzoom":
        assert out["native+yuv+auto"]["lowres"] == 0, out
