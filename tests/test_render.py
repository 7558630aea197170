import numpy as np

from playaid_core_tpu.render import charts
from playaid_core_tpu.render.compositing import (
    is_ascii,
    make_white_transparent,
    paste_on_top,
)
from playaid_core_tpu.stats import Stats
from playaid_core_tpu.timeline import load_ground_truth_from_path, update_fighters_from_timeline
from tests.synthlog import scripted_match, write_log


def _match_stats(tmp_path):
    path = tmp_path / "log.txt"
    write_log(path, scripted_match(120))
    gt = load_ground_truth_from_path(str(path))
    stats = Stats()
    fighters = []
    for i in range(len(gt)):
        fighters = update_fighters_from_timeline(i, gt[i], fighters)
        stats.record_frame(fighters)
    return stats, fighters


def test_is_ascii():
    assert is_ascii("hello")
    assert not is_ascii("abc✅")


def test_paste_on_top_blends():
    dst = np.zeros((100, 100, 4), np.uint8)
    dst[..., :3] = 10
    dst[..., 3] = 255
    src = np.zeros((20, 20, 4), np.uint8)
    src[..., 0] = 200
    src[..., 3] = 255
    paste_on_top(src, dst, 10, 10)
    assert dst[15, 15, 0] == 200
    # Outside the paste region untouched.
    assert dst[50, 50, 0] == 10
    # Negative coords: no-op.
    before = dst.copy()
    paste_on_top(src, dst, -5, 0)
    assert np.array_equal(before, dst)


def test_paste_on_top_transparent_src_leaves_dst():
    dst = np.full((50, 50, 4), 99, np.uint8)
    src = np.zeros((10, 10, 4), np.uint8)  # alpha 0
    paste_on_top(src, dst, 0, 0)
    assert dst[5, 5, 0] == 99


def test_make_white_transparent():
    img = np.full((10, 10, 4), 255, np.uint8)
    img[0, 0] = (10, 10, 10, 255)
    out = make_white_transparent(img)
    assert out[5, 5, 3] == 0
    assert out[0, 0, 3] == 255


def test_data_to_ys(tmp_path):
    stats, fighters = _match_stats(tmp_path)
    moves = (("Jab", ""), ("Smash", "F"), ("Dash", ""), ("Grnd", ""))
    ys = charts.data_to_ys(
        stats.stats[0]["action_count"], charts.SYMBOL_TO_WORD, charts.ANIM_TO_CATEGORY, moves
    )
    assert ys[0] == 1  # Jab
    assert ys[1] == 1  # ForwardSmash
    assert ys[2] == 1  # Dash category -> DashAttack
    assert ys[3] == 4  # Grnd -> Wait+Squat+Turn+Roll = Wait count


def test_bar_chart_shapes():
    img = charts.bar_graph_image(("A", "B"), (1, 2), width=400, height=360)
    assert img.shape == (360, 400, 4)
    assert img.dtype == np.uint8


def test_pie_chart_render_and_cache():
    _, img1 = charts._move_pie_chart(1, 2, 3, 60)
    _, img2 = charts._move_pie_chart(1, 2, 3, 60)
    assert img1 is img2  # lru cached
    assert img1.shape == (60, 60, 4)


def test_move_pie_chart_fade(tmp_path):
    stats, fighters = _match_stats(tmp_path)
    chart, img = charts.move_pie_chart(fighters[0], stats, 60)
    # Fighter 0's last non-ignored move (DashAttack) ended at frame 70;
    # frame 119 is within the 60-frame fade window's tail -> faded alpha.
    assert img is not None
    assert img.shape == (60, 60, 4)
    alphas = np.unique(img[..., 3])
    assert alphas.max() < 255  # faded


def test_stat_charts_render(tmp_path):
    stats, fighters = _match_stats(tmp_path)
    f0 = fighters[0]
    _, dmg = charts.move_damage_graph(f0, stats, width=400, height=480)
    assert dmg.shape == (480, 400, 4)
    _, spm = charts.move_success_punished_missed_bar_graph(f0, stats, width=720, height=400)
    assert spm.shape == (400, 720, 4)
    _, d = charts.defensive_option_chart(f0, stats, width=400, height=320)
    assert d.shape == (320, 400, 4)
    _, t = charts.disadvantage_tech_option_chart(f0, stats, width=400, height=360)
    assert t.shape == (360, 400, 4)
    _, led = charts.disadvantage_ledge_option_chart(f0, stats, width=400, height=360)
    assert led.shape == (360, 400, 4)


def test_history_strips(tmp_path):
    stats, fighters = _match_stats(tmp_path)
    f1 = fighters[1]
    tech = charts.disadvantage_tech_history(f1, stats)
    ledge = charts.disadvantage_ledge_history(f1, stats)
    assert tech.shape == (120, 400, 3)
    assert ledge.shape == (120, 400, 3)
    # Fighter 1 tech-rolled and took ledge options: strips should not be
    # uniformly white.
    assert tech.std() > 0
    assert ledge.std() > 0


def test_charts_deterministic(tmp_path):
    stats, fighters = _match_stats(tmp_path)
    _, a = charts.move_damage_graph(fighters[0], stats, width=400, height=480)
    _, b = charts.move_damage_graph(fighters[0], stats, width=400, height=480)
    assert np.array_equal(a, b)


def test_fastcharts_edge_cases():
    """Array-native chart rasterizers: zero data, single bar, long label
    sets all render without error and at the requested geometry."""
    from playaid_core_tpu.render import fastcharts as fc

    img = fc.success_vs_punished_image(("A",), (0,), (0,), "t", width=200, height=150)
    assert img.shape == (150, 200, 4)
    labels = tuple(f"Move{i}" for i in range(24))
    img = fc.success_punished_missed_image(
        labels, tuple(range(24)), (0,) * 24, (1,) * 24, "many", width=720,
        height=400)
    assert img.shape == (400, 720, 4)
    img = fc.bar_graph_image(("OnlyOne",), (5,), width=120, height=100, title="x")
    assert img.shape == (100, 120, 4)
    pie = fc.move_pie_image(0, 0, 0, 60)
    assert pie.shape == (60, 60, 4) and pie[:, :, 3].max() == 255
