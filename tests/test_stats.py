from playaid_core_tpu.stats import Stats
from playaid_core_tpu.timeline import load_ground_truth_from_path, update_fighters_from_timeline
from tests.synthlog import scripted_match, write_log


def _run_match(tmp_path, num_frames=120):
    frames = scripted_match(num_frames)
    path = tmp_path / "log.txt"
    write_log(path, frames)
    gt = load_ground_truth_from_path(str(path))
    stats = Stats()
    fighters = []
    for i in range(len(gt)):
        fighters = update_fighters_from_timeline(i, gt[i], fighters)
        stats.record_frame(fighters)
    return stats, fighters


def test_stats_constructible_without_video_path():
    # The reference's own stats_test called Stats() but its __init__
    # required a path (reference: stats_test.py:21 vs stats.py:59).
    s = Stats()
    assert s.stats == {}


def test_action_counts(tmp_path):
    stats, fighters = _run_match(tmp_path)
    s0 = stats.stats[0]
    # Fighter 0's script: Wait/FSmash/Wait/Jab/Wait/DashAttack/Wait.
    assert s0.action_count["ForwardSmash"] == 1
    assert s0.action_count["Jab"] == 1
    assert s0.action_count["DashAttack"] == 1
    assert s0.action_count["Wait"] == 4


def test_successful_actions_and_damage(tmp_path):
    stats, fighters = _run_match(tmp_path)
    s0 = stats.stats[0]
    assert s0.successful_action_count["ForwardSmash"] == 1
    assert s0.successful_action_count["Jab"] == 1
    assert s0.successful_action_count["DashAttack"] == 1
    assert s0.successful_action_damage["ForwardSmash"] == 12.5
    total = sum(s0.successful_action_damage.values())
    assert total == 37.5


def test_punished_actions_attributed_to_victim_move(tmp_path):
    stats, fighters = _run_match(tmp_path)
    s1 = stats.stats[1]
    # The victim was in "Wait" before each hit.
    assert s1.punished_action_count["Wait"] == 3
    assert s1.punished_action_damage["Wait"] == 37.5
    # Which move punished it.
    assert s1.punished_action_by_action_count["Wait"]["ForwardSmash"] == 1
    assert s1.punished_action_by_action_count["Wait"]["Jab"] == 1
    assert s1.punished_action_by_action_count["Wait"]["DashAttack"] == 1


def test_punish_and_success_history(tmp_path):
    stats, fighters = _run_match(tmp_path)
    s1 = stats.stats[1]
    hist = s1.punish_history["Wait"]
    assert len(hist) == 3
    entry = hist[20]
    assert entry["action"] == "ForwardSmash"
    assert entry["damage_delta"] == 12.5
    assert entry["frame_number"] == 20

    s0 = stats.stats[0]
    assert 20 in s0.success_history["ForwardSmash"]


def test_action_timeline_start_end(tmp_path):
    stats, fighters = _run_match(tmp_path)
    tl = stats.stats[0].action_timeline
    assert tl[10].action == "ForwardSmash"
    assert tl[10].start_frame == 10
    # Closed out when Wait starts at frame 25.
    assert tl[10].end_frame == 25
    # end_frame is an int (the reference stored a (frame, -1) tuple by
    # accident, reference: stats.py:116).
    assert isinstance(tl[10].end_frame, int)


def test_move_counters(tmp_path):
    stats, fighters = _run_match(tmp_path)
    success, punished, missed, total = stats.move_counters(fighters[0], "ForwardSmash")
    assert (success, punished, missed, total) == (1, 0, 0, 1)
    success, punished, missed, total = stats.move_counters(fighters[1], "Wait")
    assert punished == 3


def test_narration_history(tmp_path):
    stats, fighters = _run_match(tmp_path)
    history = stats.stats.history
    assert 20 in history
    assert "punish" in history[20]
    # Move-start narration for FSmash at frame 10.
    assert "started move ForwardSmash" in history[10]


def test_history_subset_and_instances(tmp_path):
    stats, fighters = _run_match(tmp_path)
    subset = stats.history_subset(0, 30)
    assert all(0 <= f <= 30 for f, _ in subset)
    inst = stats.instances_of("punish", offset=2)
    assert len(inst) >= 3


def test_snapshot_roundtrip(tmp_path, monkeypatch):
    stats, fighters = _run_match(tmp_path)
    stats.output_dir = str(tmp_path / "stats_out")
    import os

    os.makedirs(stats.output_dir, exist_ok=True)
    import yaml

    with open(stats.stats_path(5), "w") as f:
        yaml.dump(stats.stats.to_dict(), f)
    ok, loaded = stats.get_stats(5)
    assert ok
    assert loaded["history"].keys() == stats.stats["history"].keys()


def test_move_set(tmp_path):
    stats, fighters = _run_match(tmp_path)
    moves = stats.move_set(fighters[0], 0, 119)
    assert "ForwardSmash" in moves and "Jab" in moves and "Wait" in moves
