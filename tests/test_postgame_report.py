from playaid_core_tpu.viz.postgame_report import replay_stats, write_postgame_report
from tests.synthlog import scripted_match, write_log


def test_postgame_report(tmp_path):
    log = tmp_path / "log.txt"
    write_log(log, scripted_match(120))
    out = write_postgame_report(str(log), str(tmp_path / "report.html"))
    content = open(out).read()
    assert "Byleth move counters" in content
    assert "Pikachu move counters" in content
    assert content.count("data:image/png;base64") == 10  # 5 charts x 2 fighters
    assert "started move ForwardSmash" in content
    assert "<td>ForwardSmash</td><td>1</td>" in content


def test_replay_stats_max_frames(tmp_path):
    log = tmp_path / "log.txt"
    write_log(log, scripted_match(60))
    stats, fighters, total = replay_stats(str(log), max_frames=30)
    assert total == 30
    assert fighters[1].damage == 12.5  # only the frame-20 hit so far
