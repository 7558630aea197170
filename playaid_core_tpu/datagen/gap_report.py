"""Report requested replays that have not been processed yet.

Working rebuild of the reference's gap report (reference:
data_gen_scripts/output_incomplete_games.py:1-22), which diffs a
replay-id -> requester-email map against a store of completed replays
and prints the ids still owed, one per line in the reference's
copy-paste-into-config format (``    "<id>", // <email>``).

The reference's version is import-broken — it pulls ``ID_TO_EMAILS``
from ``playaid.pipeline`` and ``get_replays`` from
``playaid.postgres_connector``, neither of which exists in the repo
(they lived in a private server-side sibling).  This rebuild keeps the
exact diff semantics and output format but makes both sides pluggable:

* **requests**: a JSON object ``{replay_id: email}`` or a CSV of
  ``replay_id,email`` rows (``#`` comments skipped, like the pairings
  CSV the rest of the framework uses — reference: timeline.py:166-183).
* **completed store**: by default a filesystem scan of a pipeline
  output directory — a replay counts as completed when the analyzed
  artifact for its id exists (``<id>.mp4`` / ``<id>.yaml`` /
  ``<id>/ai_output.yaml`` / a ``<id>`` subdirectory), matching the
  framework's idempotent cache layout.  Programmatic callers can pass
  any iterable of completed ids (or records with a ``replay_id``
  attribute, the shape the reference's ``get_replays()`` rows had).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, List, Tuple

# A replay id counts as "completed" in a store directory when any of
# these artifacts exist (see completed_replay_ids): an annotated
# `<id>.mp4` from the manuscript path, an `<id>.yaml`/`<id>.yml` from
# the AI path (reference: ai_runner.py:592-608), or a per-replay cache
# subdirectory `<id>/`.


def load_requests(path: str) -> Dict[str, str]:
    """Load the replay_id -> email request map from JSON or CSV."""
    with open(path) as f:
        text = f.read()
    stripped = text.lstrip()
    if stripped.startswith("{"):
        data = json.loads(text)
        return {str(k): str(v) for k, v in data.items()}
    requests: Dict[str, str] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = [p.strip() for p in line.split(",")]
        if len(parts) < 2:
            raise ValueError(f"bad request row (want 'replay_id,email'): {line!r}")
        requests[parts[0]] = parts[1]
    return requests


def completed_replay_ids(store) -> set:
    """Normalize a completed-replay store to a set of replay ids.

    ``store`` is a directory path (scanned for the artifacts above), or
    any iterable of ids / records carrying ``replay_id``.
    """
    if isinstance(store, str):
        if not os.path.isdir(store):
            return set()
        names = os.listdir(store)
        done = set()
        for name in names:
            base, ext = os.path.splitext(name)
            full = os.path.join(store, name)
            if os.path.isdir(full):
                done.add(name)
            elif ext.lower() in (".mp4", ".yaml", ".yml"):
                done.add(base)
        return done
    out = set()
    for r in store:
        out.add(str(getattr(r, "replay_id", r)))
    return out


def incomplete_games(requests: Dict[str, str], completed) -> List[Tuple[str, str]]:
    """(replay_id, email) pairs requested but absent from the store.

    Same set-difference the reference computes
    (output_incomplete_games.py:8-14), returned sorted by replay id so
    the report is deterministic (the reference printed set order).
    """
    done = completed_replay_ids(completed)
    return sorted((rid, email) for rid, email in requests.items() if rid not in done)


def format_report(pairs: Iterable[Tuple[str, str]]) -> str:
    """The reference's copy-paste format (output_incomplete_games.py:15-21)."""
    return "\n".join(f'    "{rid}", // {email}' for rid, email in pairs)


def main():
    import click

    @click.command()
    @click.option("--requests", "requests_path", required=True,
                  help="JSON {replay_id: email} or CSV 'replay_id,email' rows")
    @click.option("--store", "store_dir", required=True,
                  help="directory of completed pipeline outputs to scan")
    def report(requests_path, store_dir):
        """Print replay ids requested but not yet processed."""
        pairs = incomplete_games(load_requests(requests_path), store_dir)
        out = format_report(pairs)
        if out:
            print(out)
        print(f"# {len(pairs)} incomplete", flush=True)

    report()


if __name__ == "__main__":
    main()
