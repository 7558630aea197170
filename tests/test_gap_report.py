"""Gap report: requested-but-unprocessed replay diff.

The reference's data_gen_scripts/output_incomplete_games.py is
import-broken (it needs private server-side modules); this covers the
working rebuild's request parsing, store scanning, diff semantics, and
the reference's output format.
"""

import json
import os

from playaid_core_tpu.datagen.gap_report import (
    completed_replay_ids,
    format_report,
    incomplete_games,
    load_requests,
)


def test_load_requests_json_and_csv(tmp_path):
    j = tmp_path / "req.json"
    j.write_text(json.dumps({"rep_a": "a@x.com", "rep_b": "b@x.com"}))
    assert load_requests(str(j)) == {"rep_a": "a@x.com", "rep_b": "b@x.com"}

    c = tmp_path / "req.csv"
    c.write_text("# comment row, skipped like the pairings CSV\n"
                 "rep_a, a@x.com\n"
                 "\n"
                 "rep_b,b@x.com\n")
    assert load_requests(str(c)) == {"rep_a": "a@x.com", "rep_b": "b@x.com"}


def test_store_scan_and_diff(tmp_path):
    store = tmp_path / "out"
    store.mkdir()
    (store / "rep_a.mp4").write_bytes(b"")          # manuscript output
    (store / "rep_b.yaml").write_text("")            # ai_output cache
    (store / "rep_c").mkdir()                        # per-replay cache dir
    (store / "notes.txt").write_text("")             # ignored

    assert completed_replay_ids(str(store)) == {"rep_a", "rep_b", "rep_c"}

    requests = {"rep_a": "a@x", "rep_c": "c@x", "rep_d": "d@x", "rep_e": "e@x"}
    pairs = incomplete_games(requests, str(store))
    assert pairs == [("rep_d", "d@x"), ("rep_e", "e@x")]  # sorted, deterministic

    # missing store directory -> everything is incomplete
    assert incomplete_games(requests, str(tmp_path / "nope")) == sorted(
        requests.items())


def test_store_accepts_records_and_ids():
    class Replay:
        def __init__(self, rid):
            self.replay_id = rid

    # the reference's get_replays() rows carried .replay_id
    assert completed_replay_ids([Replay("x"), "y"]) == {"x", "y"}
    assert incomplete_games({"x": "a", "z": "b"}, [Replay("x")]) == [("z", "b")]


def test_format_matches_reference():
    # reference: output_incomplete_games.py:15-21
    out = format_report([("rep_d", "d@x"), ("rep_e", "e@x")])
    assert out == '    "rep_d", // d@x\n    "rep_e", // e@x'
