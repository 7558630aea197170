"""End-to-end per-frame label agreement vs the reference inference loop.

The BASELINE target is ">= 99% per-frame action-label agreement with the
PyTorch reference".  The torch-parity suite proves logit-for-logit
equality of the converted architectures at single inputs; THIS test
closes the loop end to end:

* ONE torch model with the reference's exact CNN architecture
  (SpatialStreamCNN: ResNet-18 trunk + Conv1d temporal head, reference:
  models/cnn_action_detector.py:13-43) is instantiated and converted to
  this framework's weight tree;
* the reference's OWN batch-1 middle-out inference loop (reference:
  ai_runner.py:461-520 semantics — per (fighter, frame): middle-out crop
  JPEG reads via dataset_utils.action_sample_from_frame_middle_out,
  imutils resize + ImageOps letterbox, batch-1 torch forward, argmax)
  runs over a crops cache built with the reference's own
  YoloCrop.square_crop (reference: fighter.py:323-381, 1-indexed crop
  files like the YOLO detection stage writes);
* this framework's full VOD pipeline (native decode -> yuv420 transfer
  -> fused embed-once -> window gather -> temporal head) consumes the
  SAME synthetic clip with the SAME converted weights;
* per-frame labels are compared across both fighters.

Skipped when the reference checkout is absent.  Slow (torch runs ~600
batch-1 windows on the CPU).
"""

import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
torch = pytest.importorskip("torch")

REFERENCE = os.environ.get("PLAYAID_REFERENCE", "/root/reference")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REFERENCE, "playaid")),
        reason="reference checkout not available",
    ),
]

NUM_FRAMES = 300
W, H = 640, 360
NUM_ACTIONS = 63
SEQ, DELTA, PAD = 7, 3, 30


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, os.path.join(REPO, "tools", "ref_shims"))
    sys.path.insert(0, REFERENCE)
    import playaid.dataset_utils as ref_du
    import playaid.fighter as ref_fighter

    yield ref_fighter, ref_du
    sys.path.remove(os.path.join(REPO, "tools", "ref_shims"))
    sys.path.remove(REFERENCE)


def _make_clip(path, num_frames=NUM_FRAMES):
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 60, (W, H))
    rng = np.random.default_rng(7)
    base = rng.integers(0, 70, (H, W, 3), dtype=np.uint8)
    boxes = np.zeros((num_frames, 2, 4), np.float32)
    for i in range(num_frames):
        frame = base.copy()
        t = i / num_frames
        x0, y0 = int((0.2 + 0.55 * t) * W), int((0.4 + 0.2 * np.sin(t * 9)) * H)
        x1, y1 = int((0.8 - 0.55 * t) * W), int((0.55 + 0.2 * np.cos(t * 7)) * H)
        cv2.circle(frame, (x0, y0), 34, (0, 200, 255), -1)
        cv2.rectangle(frame, (x0 - 12, y0 - 40), (x0 + 12, y0 - 20), (255, 255, 0), -1)
        cv2.circle(frame, (x1, y1), 34, (255, 80, 0), -1)
        cv2.putText(frame, str(i % 10), (x1 - 10, y1 + 10), 0, 1.0, (255, 255, 255), 2)
        writer.write(frame)
        boxes[i, 0] = (x0 / W, y0 / H, 90 / W, 90 / H)
        boxes[i, 1] = (x1 / W, y1 / H, 90 / W, 90 / H)
    writer.release()
    return boxes


def _torch_model():
    """Reference-architecture SpatialStreamCNN at the deployed operating
    point (63 actions, T=7), randomized BN stats, eval mode."""
    from tests.test_torch_parity import TorchResNet18, _randomize_bn_stats
    import torch.nn as tnn

    torch.manual_seed(3)

    class TorchSpatialStreamCNN(tnn.Module):
        def __init__(self):
            super().__init__()
            self.cnn2d = TorchResNet18(num_classes=1000)
            self.cnn1d = tnn.Sequential(
                tnn.Conv1d(1000, 512, kernel_size=SEQ, stride=1), tnn.ReLU()
            )
            self.classifier = tnn.Sequential(
                tnn.Linear(512, 128), tnn.ReLU(), tnn.Linear(128, NUM_ACTIONS)
            )

        def forward(self, x):
            b, t, c, h, w = x.size()
            x = x.view(b * t, c, h, w)
            x = self.cnn2d(x)
            x = x.view(b, t, -1).permute(0, 2, 1)
            x = self.cnn1d(x)
            x = x.view(x.size(0), -1)
            return torch.log_softmax(self.classifier(x), dim=1)

    wrapper = tnn.Module()
    wrapper.model = TorchSpatialStreamCNN()
    with torch.no_grad():
        _randomize_bn_stats(wrapper)
    wrapper.eval()
    return wrapper


def _write_reference_crops(ref_fighter, video_path, boxes, crops_dir):
    """Build the crops cache the way the reference's detection stage does:
    1-indexed per-(fighter, frame) JPEGs of YoloCrop.square_crop output
    (reference: ai_runner.py:404-424)."""
    os.makedirs(crops_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    for i in range(boxes.shape[0]):
        ok, frame = cap.read()
        assert ok
        for k in range(2):
            cx, cy, bw, bh = boxes[i, k]
            crop = ref_fighter.YoloCrop(
                class_id=k, center_x=float(cx), center_y=float(cy),
                crop_width=float(bw), crop_height=float(bh),
            )
            ok_c, img = crop.square_crop(frame, 128, padding=PAD)
            assert ok_c
            cv2.imwrite(os.path.join(crops_dir, f"f{k}_{i + 1}.jpg"), img)
    cap.release()


def _reference_loop(ref_du, crops_dir, num_frames):
    """ai_runner.py:461-520 semantics: per frame, middle-out window of
    crop JPEGs, imutils resize + ImageOps pad, batch-1 torch forward,
    argmax.  Returns labels [F-1, 2] for video frames 0..F-2 (the frames
    the reference's loop labels, run_action_recognition's
    range(1, max_frames) over 1-indexed crops)."""
    import imutils
    from PIL import Image, ImageOps

    tmodel = _torch_model()
    labels = np.zeros((num_frames - 1, 2), np.int64)
    torch.set_num_threads(1)
    with torch.no_grad():
        for k in range(2):
            for frame_num in range(1, num_frames):
                frame_nums = ref_du.action_sample_from_frame_middle_out(
                    frame_num, num_frames_per_sample=SEQ, frame_delta=DELTA,
                    max_frames=num_frames, min_frame=1,
                )
                frames = []
                for fn in frame_nums:
                    img = cv2.imread(os.path.join(crops_dir, f"f{k}_{fn}.jpg"))
                    assert img is not None
                    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                    img = imutils.resize(img, width=128, height=128)
                    if img.shape[:2] != (128, 128):
                        img = np.array(ImageOps.pad(
                            Image.fromarray(img), (128, 128), color="black"))
                    frames.append(img)
                x = torch.tensor(np.array(frames))
                x = x.permute(0, 3, 1, 2).unsqueeze(0).float() / 255.0
                log_probs = tmodel.model(x)
                labels[frame_num - 1, k] = int(torch.argmax(log_probs))
    return labels


def test_vod_pipeline_agrees_with_reference_loop(ref_modules, tmp_path):
    ref_fighter, ref_du = ref_modules
    from playaid_core_tpu.infer.pipeline import BatchedActionPipeline
    from playaid_core_tpu.infer.vod_pipeline import VodAnalyzer
    from playaid_core_tpu.models.torch_convert import convert_cnn_action_detector

    video_path = str(tmp_path / "clip.mp4")
    boxes = _make_clip(video_path)

    # Reference side: its own crop cache + its own batch-1 loop.
    crops_dir = str(tmp_path / "crops")
    _write_reference_crops(ref_fighter, video_path, boxes, crops_dir)
    ref_labels = _reference_loop(ref_du, crops_dir, NUM_FRAMES)

    # This framework: same torch weights converted, full VOD pipeline on
    # the same clip (deployed defaults; stride=1 for per-frame labels).
    tmodel = _torch_model()
    sd = {key: v.numpy() for key, v in tmodel.state_dict().items()}
    variables = convert_cnn_action_detector(sd, sequence_length=SEQ)

    pipe = BatchedActionPipeline(family="cnn", num_actions=NUM_ACTIONS,
                                 sequence_length=SEQ, frame_delta=DELTA)
    split = pipe.from_monolithic(variables)
    analyzer = VodAnalyzer(pipe, variables=split, padding=PAD, stride=1)
    result = analyzer.analyze(video_path, boxes)
    my_labels = np.asarray(result["labels"])  # [F, 2], video-frame indexed

    # Compare the frames the reference labels (video frames 0..F-2).
    compare = my_labels[: NUM_FRAMES - 1]
    agree = float((compare == ref_labels).mean())
    per_fighter = [(compare[:, k] == ref_labels[:, k]).mean() for k in range(2)]
    print(f"e2e label agreement vs reference loop: {agree:.4f} "
          f"(per fighter: {per_fighter[0]:.4f}, {per_fighter[1]:.4f})")
    assert agree >= 0.99, (
        f"agreement {agree:.4f} below the 99% BASELINE target; "
        f"mismatches at {np.argwhere(compare != ref_labels)[:20].tolist()}"
    )
