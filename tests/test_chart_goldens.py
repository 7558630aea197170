"""Golden chart-image regression: every chart renderer's pixel output on
the golden scripted-match stats is hashed and compared against committed
goldens, so silent pixel drift fails loudly (SURVEY §4's "deterministic
chart-image hashes"; goldens are self-generated per SURVEY §7).

Regenerate after an INTENTIONAL visual change:
    GOLDEN_REGEN=1 python -m pytest tests/test_chart_goldens.py
"""

import hashlib
import json
import os

import numpy as np
import pytest

from playaid_core_tpu.render import charts
from playaid_core_tpu.stats import Stats
from playaid_core_tpu.timeline import (
    load_ground_truth_from_path,
    update_fighters_from_timeline,
)
from tests.synthlog import scripted_match, write_log

# One golden set per rasterizer backend: "fast" (array-native, deployed
# default) and "mpl" (matplotlib).  chart_hashes.json keeps its historical
# name for the mpl set.
FIXTURES = {
    "mpl": os.path.join(os.path.dirname(__file__), "fixtures", "chart_hashes.json"),
    "fast": os.path.join(os.path.dirname(__file__), "fixtures",
                         "chart_hashes_fast.json"),
}


@pytest.fixture(scope="module")
def fighter_stats(tmp_path_factory):
    log = tmp_path_factory.mktemp("charts") / "log.txt"
    write_log(log, scripted_match(120))
    gt = load_ground_truth_from_path(str(log))
    stats = Stats()
    fighters = []
    for i in range(len(gt)):
        fighters = update_fighters_from_timeline(i, gt[i], fighters)
        stats.record_frame(fighters)
    return fighters[0], stats


def _hash(img) -> str:
    arr = np.ascontiguousarray(np.asarray(img))
    return hashlib.sha256(
        arr.tobytes() + str(arr.shape).encode() + str(arr.dtype).encode()
    ).hexdigest()[:32]


def _render_all(fighter, stats):
    # Most renderers return (chart_object, rgba_image) — hash the image.
    renders = {
        "move_pie_chart": charts.move_pie_chart(fighter, stats, 160)[1],
        "move_pie_chart_history": charts.move_pie_chart_history(fighter, stats, 160)[1],
        "defensive_option_chart": charts.defensive_option_chart(fighter, stats)[1],
        "move_damage_graph": charts.move_damage_graph(fighter, stats)[1],
        "move_success_punished_missed_bar_graph":
            charts.move_success_punished_missed_bar_graph(fighter, stats)[1],
        "disadvantage_tech_option_chart":
            charts.disadvantage_tech_option_chart(fighter, stats)[1],
        "disadvantage_ledge_option_chart":
            charts.disadvantage_ledge_option_chart(fighter, stats)[1],
        "action_chart": charts.action_chart(fighter, stats)[1],
        "disadvantage_tech_history": charts.disadvantage_tech_history(fighter, stats),
        "disadvantage_ledge_history": charts.disadvantage_ledge_history(fighter, stats),
        "bar_graph_image": charts.bar_graph_image(
            ("Jab", "FTilt"), (3, 1), title="test"
        ),
    }
    return {name: _hash(img) for name, img in renders.items() if img is not None}


@pytest.mark.parametrize("backend", ["fast", "mpl"])
def test_chart_pixels_match_goldens(fighter_stats, backend):
    fighter, stats = fighter_stats
    prev = charts.get_chart_backend()
    charts.set_chart_backend(backend)
    try:
        current = _render_all(fighter, stats)
    finally:
        charts.set_chart_backend(prev)
    fixture = FIXTURES[backend]
    if os.environ.get("GOLDEN_REGEN"):
        with open(fixture, "w") as f:
            json.dump(current, f, indent=2, sort_keys=True)
        pytest.skip("goldens regenerated")
    assert os.path.exists(fixture), (
        "chart goldens missing; run GOLDEN_REGEN=1 pytest tests/test_chart_goldens.py"
    )
    with open(fixture) as f:
        golden = json.load(f)
    assert current == golden, {
        k: (golden.get(k), current.get(k))
        for k in set(golden) | set(current)
        if golden.get(k) != current.get(k)
    }


def test_renders_are_images(fighter_stats):
    fighter, stats = fighter_stats
    _, img = charts.move_pie_chart(fighter, stats, 160)
    arr = np.asarray(img)
    assert arr.ndim == 3 and arr.shape[2] in (3, 4)
    assert arr.max() > 0
