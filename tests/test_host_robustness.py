"""Regression tests for the host-layer robustness fixes (third review
round): GTVideo windowing, PrefetchingReader early stop, audio remux
degradation, thread-safe chart rendering, fighter frame-0 contract."""

import threading

import cv2
import numpy as np

from playaid_core_tpu.fighter import Fighter
from playaid_core_tpu.timeline import GTVideo
from playaid_core_tpu.video.reader import PrefetchingReader
from tests.synthlog import make_record, scripted_match, write_log


def _make_video(path, n, size=(160, 96)):
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30, size)
    for i in range(n):
        w.write(np.full((size[1], size[0], 3), i % 251, np.uint8))
    w.release()


def test_gtvideo_windowed_frames_and_labels(tmp_path):
    video = tmp_path / "v.mp4"
    _make_video(video, 40)
    log = tmp_path / "log.txt"
    write_log(log, scripted_match(40))
    gtv = GTVideo(str(video), str(log))
    frames, labels = gtv.get_frames_and_labels(start_frame=25, num_frames=5)
    assert len(frames) == 5 and len(labels) == 5
    # Labels align with the requested window (frame 25 onward).
    assert labels[0][0]["num_frames_left"] == 25200 - 25


def test_prefetching_reader_early_stop(tmp_path):
    video = tmp_path / "v.mp4"
    _make_video(video, 200)
    before = threading.active_count()
    r = PrefetchingReader(str(video), queue_size=4)
    it = iter(r)
    for _ in range(3):
        next(it)
    r.release()  # consumer stops early; must not hang or leak the thread
    assert not r._thread.is_alive()
    assert threading.active_count() <= before + 1


def test_add_audio_graceful_without_audio_stream(tmp_path):
    from playaid_core_tpu.video.writer import add_audio, ffmpeg_available

    video = tmp_path / "v.mp4"
    _make_video(video, 5)
    out = tmp_path / "out.mp4"
    _make_video(out, 5)
    # Either no ffmpeg (skip path) or a source without audio (failure
    # path): both must return False without raising.
    assert add_audio(str(out), str(video)) is False
    assert out.exists()
    del ffmpeg_available


def test_add_audio_success_path_with_stubbed_ffmpeg(tmp_path, monkeypatch):
    """Exercise the remux SUCCESS path without an ffmpeg binary: stub the
    subprocess, assert the reference's remux command semantics
    (-c:v copy, -map 0:v:0 -map 1:a:0 -shortest — reference:
    manuscript.py:256-276) and the tmp->output move."""
    from playaid_core_tpu.video import writer as writer_mod

    video = tmp_path / "src.mp4"
    out = tmp_path / "out.mp4"
    _make_video(video, 3)
    _make_video(out, 3)

    seen = {}

    def fake_run(command, capture_output=True, **kwargs):
        seen["command"] = command
        with open(command[-1], "wb") as f:
            f.write(b"remuxed")

        class R:
            returncode = 0
            stderr = b""

        return R()

    monkeypatch.setattr(writer_mod.shutil, "which", lambda name: "/usr/bin/ffmpeg")
    monkeypatch.setattr(writer_mod.subprocess, "run", fake_run)

    assert writer_mod.add_audio(str(out), str(video)) is True
    cmd = seen["command"]
    assert cmd[0] == "ffmpeg"
    assert cmd[cmd.index("-i") + 1] == str(out)  # rendered video first
    joined = " ".join(cmd)
    for semantics in ("-c:v copy", "-map 0:v:0", "-map 1:a:0", "-shortest"):
        assert semantics in joined, joined
    assert open(out, "rb").read() == b"remuxed"  # tmp moved over the output


def test_charts_render_concurrently(tmp_path):
    """The Figure-API chart stack renders correctly from multiple threads
    (the pyplot global registry would race here)."""
    from playaid_core_tpu.render import charts
    from playaid_core_tpu.stats import Stats
    from playaid_core_tpu.timeline import (
        load_ground_truth_from_path,
        update_fighters_from_timeline,
    )

    log = tmp_path / "log.txt"
    write_log(log, scripted_match(60))
    gt = load_ground_truth_from_path(str(log))
    stats = Stats()
    fighters = []
    for i in range(len(gt)):
        fighters = update_fighters_from_timeline(i, gt[i], fighters)
        stats.record_frame(fighters)

    errors = []

    def worker(fighter):
        try:
            for _ in range(6):
                _, img = charts.move_damage_graph(fighter, stats, width=300, height=200)
                assert img.shape == (200, 300, 4)
                # Force re-renders (cache hits would dodge the race) on
                # whichever rasterizer backend is active.
                if charts.get_chart_backend() == "mpl":
                    charts._success_vs_punished_image_mpl.cache_clear()
                else:
                    from playaid_core_tpu.render import fastcharts

                    fastcharts.success_vs_punished_image.cache_clear()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    # Both backends must be thread-safe: "mpl" (Figure-API, no pyplot
    # global registry) and "fast" (cv2+PIL on per-call arrays).
    for backend in ("fast", "mpl"):
        prev = charts.get_chart_backend()
        charts.set_chart_backend(backend)
        try:
            threads = [threading.Thread(target=worker, args=(f,))
                       for f in fighters * 3]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        finally:
            charts.set_chart_backend(prev)
    assert not errors, errors


def test_fighter_frame0_previous_contract():
    f = Fighter(frame_num=0, data=make_record(0, 0, "Byleth", "Wait", pos_x=5.0))
    # Every previous_* attribute exists before any update() call.
    for attr in (
        "previous_position_in_world", "previous_damage", "previous_facing",
        "previous_fighter_id", "previous_motion_kind", "previous_num_frames_left",
        "previous_pos_x", "previous_pos_y", "previous_shield_size",
        "previous_status_kind", "previous_stock_count", "previous_fighter_name",
        "previous_crop", "previous_motion_hex", "previous_action_string",
        "previous_attack_connected", "previous_action",
    ):
        assert hasattr(f, attr), attr
