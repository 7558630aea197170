"""AIRunner end-to-end: detector-output cleanup (duplicates, gaps, tail),
batched recognition, ai_output.yaml, and Manuscript consuming it —
SURVEY config #3 wired through on synthetic assets."""

import os

import cv2
import numpy as np
import pytest

import jax

from playaid_core_tpu import constants
from playaid_core_tpu.infer.pipeline import BatchedActionPipeline
from playaid_core_tpu.infer.runner import AIRunner


class FakeDetector:
    """Writes a YOLOv5-style crops/labels cache with injected defects:
    duplicate detections, missed frames, and a missing tail."""

    def __init__(self, num_frames=20, size=(320, 180)):
        self.num_frames = num_frames
        self.size = size

    def run(self, input_video_path, exp_name):
        base = os.path.join(constants.AI_CACHE, exp_name)
        crops = os.path.join(base, "crops")
        labels = os.path.join(base, "labels")
        if os.path.exists(crops):
            return exp_name
        video_name = os.path.splitext(os.path.basename(input_video_path))[0]
        rng = np.random.default_rng(0)
        for fighter in ("Pikachu", "Joker"):
            os.makedirs(os.path.join(crops, fighter), exist_ok=True)
        os.makedirs(labels, exist_ok=True)

        for i in range(1, self.num_frames + 1):
            lines = []
            for class_id, fighter in ((2, "Pikachu"), (3, "Joker")):
                # Pikachu misses frames 8-10 (gap) AND the head (1-2,
                # late first detection); Joker misses the tail.
                if fighter == "Pikachu" and (8 <= i <= 10 or i <= 2):
                    continue
                if fighter == "Joker" and i > self.num_frames - 3:
                    continue
                cx = 0.3 + 0.02 * i if fighter == "Pikachu" else 0.7 - 0.02 * i
                lines.append(f"{class_id} {cx} 0.5 0.2 0.3 0.9")
                # Duplicate detection defect on frame 5 for Pikachu.
                if fighter == "Pikachu" and i == 5:
                    lines.append(f"{class_id} {cx + 0.3} 0.8 0.2 0.3 0.4")
                crop = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
                cv2.imwrite(
                    os.path.join(crops, fighter, f"{video_name}_{i}.jpg"), crop
                )
            with open(os.path.join(labels, f"{video_name}_{i}.txt"), "w") as f:
                f.write("\n".join(lines) + ("\n" if lines else ""))
        return exp_name


@pytest.fixture(scope="module")
def runner_env(tmp_path_factory):
    d = tmp_path_factory.mktemp("ai_runner")
    video = d / "clip.mp4"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 60, (320, 180))
    for i in range(25):
        w.write(np.full((180, 320, 3), 60 + i, np.uint8))
    w.release()
    return d, str(video)


def _make_runner(d, video):
    pipe = BatchedActionPipeline(family="cnn", num_actions=63, sequence_length=3,
                                 frame_delta=1, crop_size=32)
    return AIRunner(
        input_video_path=video,
        detector=FakeDetector(num_frames=20),
        pipeline=pipe,
    )


def test_ai_runner_full_flow(runner_env, monkeypatch):
    d, video = runner_env
    monkeypatch.setattr(constants, "AI_CACHE", str(d / "ai_cache"))
    runner = _make_runner(d, video)
    runner.run_detection_setup()

    # Gap interpolation: Pikachu frames 8-10 got synthesized labels+crops.
    for i in (8, 9, 10):
        from playaid_core_tpu.infer.detection import read_fighter_yolo_crop

        crop = read_fighter_yolo_crop(runner.get_label_path(i), "Pikachu")
        assert crop is not None, i
        assert os.path.exists(runner.get_crop_path("Pikachu", i))

    # Duplicate suppression: frame 5 has exactly one Pikachu entry.
    from playaid_core_tpu.infer.detection import read_yolo_crops

    crops5 = [c for c in read_yolo_crops(runner.get_label_path(5)) if c.class_id == 2]
    assert len(crops5) == 1
    # Nearest-to-previous kept (cx ~0.4, not the 0.7 outlier).
    assert abs(crops5[0].center_x - 0.4) < 0.05

    # Tail fill: Joker crops extend to the max frame.
    assert os.path.exists(runner.get_crop_path("Joker", runner.max_frames - 1))

    # Head fill: Pikachu's first detection is frame 3; frames 1-2 got
    # back-filled crops (action recognition loads every frame's crop).
    for i in (1, 2):
        assert os.path.exists(runner.get_crop_path("Pikachu", i)), i

    # Batched recognition + output cache.
    runner.run_action_recognition()
    runner.write_output()
    assert os.path.exists(runner.ai_output_file)
    data = runner.ai_output_data
    fighters = sorted(data.keys())
    assert set(fighters) == {"Joker", "Pikachu"}
    frame0 = data["Pikachu"][0]
    assert frame0.action in runner.actions
    assert 0 <= frame0.predicted_action_confidence <= 100

    # Idempotency: second call skips (action already cached).
    before = dict(data["Pikachu"][0])
    runner.run_action_recognition()
    assert dict(runner.ai_output_data["Pikachu"][0]) == before


def test_center_jump_suppression(tmp_path, monkeypatch):
    """A detection that teleports to the other fighter's position for a
    few frames is rejected and re-interpolated from its neighbors."""
    d = tmp_path
    video = d / "clip.mp4"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 60, (320, 180))
    for i in range(25):
        w.write(np.full((180, 320, 3), 60 + i, np.uint8))
    w.release()
    monkeypatch.setattr(constants, "AI_CACHE", str(d / "ai_cache"))

    class FlippingDetector(FakeDetector):
        """Pikachu's detection teleports across the screen on frames 12-14."""

        def run(self, input_video_path, exp_name):
            out = super().run(input_video_path, exp_name)
            base = os.path.join(constants.AI_CACHE, exp_name, "labels")
            video_name = os.path.splitext(os.path.basename(input_video_path))[0]
            for i in (12, 13, 14):
                path = os.path.join(base, f"{video_name}_{i}.txt")
                lines = open(path).read().splitlines()
                fixed = []
                for line in lines:
                    parts = line.split(" ")
                    if parts[0] == "2":  # Pikachu -> far side of the screen
                        parts[1] = "0.92"
                    fixed.append(" ".join(parts))
                with open(path, "w") as f:
                    f.write("\n".join(fixed) + "\n")
            return out

    pipe = BatchedActionPipeline(family="cnn", num_actions=8, sequence_length=3,
                                 frame_delta=1, crop_size=32)
    runner = AIRunner(input_video_path=str(video), detector=FlippingDetector(20),
                      pipeline=pipe)
    runner.run_detection_setup()
    from playaid_core_tpu.infer.detection import read_fighter_yolo_crop

    for i in (12, 13, 14):
        crop = read_fighter_yolo_crop(runner.get_label_path(i), "Pikachu")
        assert crop is not None  # interpolation refilled the frame
        expected = 0.3 + 0.02 * i  # the true trajectory
        assert abs(crop.center_x - expected) < 0.05, (i, crop.center_x)


def test_identity_swap_correction(tmp_path, monkeypatch):
    """When BOTH fighters' class labels swap for a stretch (each detection
    on the other fighter's position), joint continuity assignment swaps
    them back."""
    d = tmp_path
    video = d / "clip.mp4"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 60, (320, 180))
    for i in range(25):
        w.write(np.full((180, 320, 3), 60 + i, np.uint8))
    w.release()
    monkeypatch.setattr(constants, "AI_CACHE", str(d / "ai_cache"))

    class SwappingDetector(FakeDetector):
        """Fighters on opposite screen sides; classes swapped frames 12-18."""

        def run(self, input_video_path, exp_name):
            out = super().run(input_video_path, exp_name)
            base = os.path.join(constants.AI_CACHE, exp_name, "labels")
            video_name = os.path.splitext(os.path.basename(input_video_path))[0]
            for i in range(1, self.num_frames + 1):
                path = os.path.join(base, f"{video_name}_{i}.txt")
                if not os.path.exists(path):
                    continue
                lines = open(path).read().splitlines()
                fixed = []
                for line in lines:
                    parts = line.split(" ")
                    # Spread the fighters far apart (swap detection only
                    # engages when a swap is decisively wrong).
                    if parts[0] == "2":
                        parts[1] = str(0.15 + 0.005 * i)
                    elif parts[0] == "3":
                        parts[1] = str(0.85 - 0.005 * i)
                    if 12 <= i <= 18:
                        parts[0] = {"2": "3", "3": "2"}.get(parts[0], parts[0])
                    fixed.append(" ".join(parts))
                with open(path, "w") as f:
                    f.write("\n".join(fixed) + "\n")
            return out

    pipe = BatchedActionPipeline(family="cnn", num_actions=8, sequence_length=3,
                                 frame_delta=1, crop_size=32)
    runner = AIRunner(input_video_path=str(video), detector=SwappingDetector(20),
                      pipeline=pipe, fix_swaps=True)
    runner.run_detection_setup()
    from playaid_core_tpu.infer.detection import read_fighter_yolo_crop

    for i in (13, 16):
        pik = read_fighter_yolo_crop(runner.get_label_path(i), "Pikachu")
        expected = 0.15 + 0.005 * i  # Pikachu's true trajectory
        assert pik is not None and abs(pik.center_x - expected) < 0.03, (
            i, pik and pik.center_x,
        )


def test_identity_swap_long_run_fully_rewritten(tmp_path, monkeypatch):
    """A 15-frame swap run (< max_run) is rewritten END TO END: the
    discontinuity guard gates only run entry — `last` freezes during a
    buffered run, so a gap-scaled budget would otherwise balloon and
    falsely terminate long runs partway."""
    d = tmp_path
    video = d / "clip.mp4"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 60, (320, 180))
    for i in range(30):
        w.write(np.full((180, 320, 3), 60, np.uint8))
    w.release()
    monkeypatch.setattr(constants, "AI_CACHE", str(d / "ai_cache"))

    class LongSwapDetector(FakeDetector):
        def run(self, input_video_path, exp_name):
            out = super().run(input_video_path, exp_name)
            base = os.path.join(constants.AI_CACHE, exp_name, "labels")
            video_name = os.path.splitext(os.path.basename(input_video_path))[0]
            for i in range(1, self.num_frames + 1):
                path = os.path.join(base, f"{video_name}_{i}.txt")
                if not os.path.exists(path):
                    continue
                lines = open(path).read().splitlines()
                fixed = []
                for line in lines:
                    parts = line.split(" ")
                    if parts[0] == "2":
                        parts[1] = str(0.12 + 0.004 * i)
                    elif parts[0] == "3":
                        parts[1] = str(0.88 - 0.004 * i)
                    if 5 <= i <= 19:  # 15 swapped frames
                        parts[0] = {"2": "3", "3": "2"}.get(parts[0], parts[0])
                    fixed.append(" ".join(parts))
                with open(path, "w") as f:
                    f.write("\n".join(fixed) + "\n")
            return out

    pipe = BatchedActionPipeline(family="cnn", num_actions=8, sequence_length=3,
                                 frame_delta=1, crop_size=32)
    runner = AIRunner(input_video_path=str(video), detector=LongSwapDetector(24),
                      pipeline=pipe, fix_swaps=True)
    runner.run_detection_setup()
    from playaid_core_tpu.infer.detection import read_fighter_yolo_crop

    for i in (6, 12, 18):  # early, middle, and LATE frames of the run
        pik = read_fighter_yolo_crop(runner.get_label_path(i), "Pikachu")
        expected = 0.12 + 0.004 * i
        assert pik is not None and abs(pik.center_x - expected) < 0.03, (
            i, pik and pik.center_x,
        )


def test_appearance_identity_filter(tmp_path, monkeypatch):
    """Crops that decisively look like the OTHER fighter are rejected and
    re-interpolated, even when their positions track smoothly (identity
    drift that position continuity can't see)."""
    d = tmp_path
    video = d / "clip.mp4"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 60, (320, 180))
    for i in range(25):
        w.write(np.full((180, 320, 3), 60, np.uint8))
    w.release()
    monkeypatch.setattr(constants, "AI_CACHE", str(d / "ai_cache"))

    PIKA_COLOR = (40, 220, 220)   # yellow-ish
    JOKER_COLOR = (160, 40, 40)   # dark blue-ish

    class ColoredDetector(FakeDetector):
        """Solid-color crops; Pikachu's crops at frames 10-14 show Joker's
        colors (identity error) while its box position stays smooth."""

        def run(self, input_video_path, exp_name):
            out = super().run(input_video_path, exp_name)
            base = os.path.join(constants.AI_CACHE, exp_name, "crops")
            video_name = os.path.splitext(os.path.basename(input_video_path))[0]
            for fighter, color in (("Pikachu", PIKA_COLOR), ("Joker", JOKER_COLOR)):
                for i in range(1, self.num_frames + 1):
                    p = os.path.join(base, fighter, f"{video_name}_{i}.jpg")
                    if not os.path.exists(p):
                        continue
                    use = JOKER_COLOR if (fighter == "Pikachu" and 10 <= i <= 14) \
                        else color
                    cv2.imwrite(p, np.full((128, 128, 3), use, np.uint8))
            return out

    pipe = BatchedActionPipeline(family="cnn", num_actions=8, sequence_length=3,
                                 frame_delta=1, crop_size=32)
    runner = AIRunner(input_video_path=str(video), detector=ColoredDetector(20),
                      pipeline=pipe)
    runner.run_detection_setup()

    # The offending frames were re-cropped from the (uniform gray) video
    # via interpolation — they no longer carry Joker's color.
    for i in (11, 13):
        crop = cv2.imread(runner.get_crop_path("Pikachu", i))
        assert crop is not None
        mean = crop.reshape(-1, 3).mean(axis=0)
        assert abs(mean[0] - JOKER_COLOR[0]) > 40, mean  # not Joker blue
    # Frames outside the window are untouched (frame 16: not in the
    # colored window, not in FakeDetector's built-in 8-10 gap).
    crop16 = cv2.imread(runner.get_crop_path("Pikachu", 16))
    assert abs(crop16.reshape(-1, 3).mean(axis=0)[1] - PIKA_COLOR[1]) < 30


def test_appearance_filter_stands_down_on_confusable_fighters(tmp_path,
                                                              monkeypatch):
    """Ditto-like matches: when the two fighters' appearances are NOT
    separable (near-identical palettes — two Pikachus, color-twin skins),
    the appearance filter must stand down rather than churn crops on
    histogram noise.  Round-2 verdict flagged that the filter was only
    ever exercised on maximally-distinguishable sprites."""
    d = tmp_path
    video = d / "clip.mp4"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 60, (320, 180))
    for i in range(25):
        w.write(np.full((180, 320, 3), 60, np.uint8))
    w.release()
    monkeypatch.setattr(constants, "AI_CACHE", str(d / "ai_cache"))

    # Two near-identical palettes: every channel lands in the same 64-wide
    # histogram bin, so the median signatures are not separable.
    COLOR_A = (45, 215, 215)
    COLOR_B = (55, 205, 205)

    class DittoDetector(FakeDetector):
        def run(self, input_video_path, exp_name):
            out = super().run(input_video_path, exp_name)
            base = os.path.join(constants.AI_CACHE, exp_name, "crops")
            video_name = os.path.splitext(os.path.basename(input_video_path))[0]
            rng = np.random.default_rng(1)
            for fighter, color in (("Pikachu", COLOR_A), ("Joker", COLOR_B)):
                for i in range(1, self.num_frames + 1):
                    p = os.path.join(base, fighter, f"{video_name}_{i}.jpg")
                    if not os.path.exists(p):
                        continue
                    img = np.full((128, 128, 3), color, np.int16)
                    img += rng.integers(-4, 5, img.shape, dtype=np.int16)
                    cv2.imwrite(p, np.clip(img, 0, 255).astype(np.uint8))
            return out

    pipe = BatchedActionPipeline(family="cnn", num_actions=8, sequence_length=3,
                                 frame_delta=1, crop_size=32)
    runner = AIRunner(input_video_path=str(video), detector=DittoDetector(20),
                      pipeline=pipe)
    runner.run_detection_setup()
    from playaid_core_tpu.infer.detection import read_fighter_yolo_crop

    # No detector-produced crop was rejected and refilled from the (gray)
    # video: every non-gap frame keeps its colored content, and labels
    # keep the original trajectories.
    for fighter, color in (("Pikachu", COLOR_A), ("Joker", COLOR_B)):
        for i in (4, 6, 12, 15):
            crop = cv2.imread(runner.get_crop_path(fighter, i))
            assert crop is not None, (fighter, i)
            mean = crop.reshape(-1, 3).mean(axis=0)
            assert abs(mean[2] - color[2]) < 20, (fighter, i, mean)
            got = read_fighter_yolo_crop(runner.get_label_path(i), fighter)
            expected = 0.3 + 0.02 * i if fighter == "Pikachu" else 0.7 - 0.02 * i
            assert got is not None and abs(got.center_x - expected) < 0.03, (
                fighter, i, got and got.center_x,
            )


def test_center_jump_reanchors_on_stable_teleport(tmp_path, monkeypatch):
    """A persistent position change (KO respawn) re-anchors instead of
    being rejected forever."""
    d = tmp_path
    video = d / "clip.mp4"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 60, (320, 180))
    for i in range(25):
        w.write(np.full((180, 320, 3), 60 + i, np.uint8))
    w.release()
    monkeypatch.setattr(constants, "AI_CACHE", str(d / "ai_cache"))

    class TeleportDetector(FakeDetector):
        def run(self, input_video_path, exp_name):
            out = super().run(input_video_path, exp_name)
            base = os.path.join(constants.AI_CACHE, exp_name, "labels")
            video_name = os.path.splitext(os.path.basename(input_video_path))[0]
            for i in range(10, 21):  # respawn platform from frame 10 on
                path = os.path.join(base, f"{video_name}_{i}.txt")
                if not os.path.exists(path):
                    continue
                lines = open(path).read().splitlines()
                fixed = []
                for line in lines:
                    parts = line.split(" ")
                    if parts[0] == "2":
                        parts[1], parts[2] = "0.9", "0.2"
                    fixed.append(" ".join(parts))
                with open(path, "w") as f:
                    f.write("\n".join(fixed) + "\n")
            return out

    pipe = BatchedActionPipeline(family="cnn", num_actions=8, sequence_length=3,
                                 frame_delta=1, crop_size=32)
    runner = AIRunner(input_video_path=str(video), detector=TeleportDetector(20),
                      pipeline=pipe)
    runner.run_detection_setup()
    from playaid_core_tpu.infer.detection import read_fighter_yolo_crop

    late = read_fighter_yolo_crop(runner.get_label_path(20), "Pikachu")
    assert late is not None
    assert abs(late.center_x - 0.9) < 0.02, late.center_x  # re-anchored


def test_load_crop_tracks_pipeline_size(runner_env, monkeypatch):
    """Regression: cached crops must load at the MODEL's input size.  A
    fixed 128 default silently fed 2x-scale crops to a crop_size=64 model
    (the ResNet pools over any spatial size, so accuracy collapsed
    instead of crashing)."""
    d, video = runner_env
    monkeypatch.setattr(constants, "AI_CACHE", str(d / "ai_cache"))
    runner = _make_runner(d, video)  # pipeline crop_size=32
    runner.run_detection_setup()
    crop = runner._load_crop(runner.get_crop_path("Pikachu", 1))
    assert crop.shape[:2] == (32, 32), crop.shape


def test_manuscript_consumes_ai_output(runner_env, monkeypatch, tmp_path):
    d, video = runner_env
    monkeypatch.setattr(constants, "AI_CACHE", str(d / "ai_cache"))
    runner = _make_runner(d, video)
    runner.run_detection_setup()
    runner.run_action_recognition()
    runner.write_output()

    from playaid_core_tpu.pipeline.manuscript import Manuscript

    out = str(tmp_path / "ai_annotated.mp4")
    m = Manuscript(
        input_video_path=video,
        output_video_path=out,
        ai_output_path=runner.ai_output_file,
        skip_graphs=True,
        skip_summaries=True,
        include_audio=False,
        progress=False,
    )
    m.render()
    assert os.path.exists(out)
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) > 0
    cap.release()


def test_damage_ocr_stage(runner_env, monkeypatch):
    d, video = runner_env
    monkeypatch.setattr(constants, "AI_CACHE", str(d / "ai_cache"))
    runner = _make_runner(d, video)
    runner.run_detection_setup()

    calls = []

    def fake_ocr(crop):
        calls.append(crop.shape)
        return True, (42.0, "42", 0.9, {})

    runner.run_damage_detection(ocr=fake_ocr)
    assert len(calls) == 2 * runner.max_frames
    assert runner.ai_output_data["Pikachu"][0].damage == 42.0
    # Player-id map derived from detections: Pikachu (class 2) starts left.
    assert runner.player_id_to_fighter[0] == "Pikachu"


def test_damage_median_smoothing(runner_env, monkeypatch):
    d, video = runner_env
    monkeypatch.setattr(constants, "AI_CACHE", str(d / "ai_cache2"))
    runner = _make_runner(d, video)
    runner.run_detection_setup()

    # Step function 10.0 -> 55.5 with an isolated misread on each side:
    # the median-5 must erase the misreads and keep the step boundary
    # frame-exact.
    n = runner.max_frames
    jump = n // 2
    seq = [10.0] * jump + [55.5] * (n - jump)
    seq[2] = 80.0           # isolated misread
    seq[jump + 3] = 5.0     # isolated misread
    it = {"i": -1}

    def fake_ocr(crop):
        # two crops per frame (both players) share the frame's value
        it["i"] += 1
        return True, (seq[it["i"] // 2], "x", 0.9, {})

    runner.run_damage_detection(ocr=fake_ocr, smooth=5)
    got = [runner.ai_output_data["Pikachu"][i].damage for i in range(n)]
    want = [10.0] * jump + [55.5] * (n - jump)
    assert got == want
