#!/usr/bin/env python
"""Extract the reference's *game data* (not code) into JSON assets.

The reference stores pure game knowledge — the move ontology, fighter/stage
enums, status-kind enums and the per-fighter frame-data database — as Python
dict literals (reference: anim_ontology.py:7-788, frame_data.py:3).  The
rebuilt framework treats these as what they are: data.  This script imports
the reference modules once (with tiny dependency shims) and serialises the
dicts to ``playaid_core_tpu/game_data/*.json[.gz]``, which the new loaders
consume.  Run from the repo root:

    python tools/extract_reference_data.py
"""

import gzip
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("PLAYAID_REFERENCE", "/root/reference")
OUT = os.path.join(REPO, "playaid_core_tpu", "game_data")


def main():
    sys.path.insert(0, os.path.join(REPO, "tools", "ref_shims"))
    sys.path.insert(0, REPO)  # for playaid_core_tpu.adict used by the shim
    sys.path.insert(0, REFERENCE)

    from playaid import anim_ontology as ao  # type: ignore
    from playaid import frame_data as fd  # type: ignore

    os.makedirs(OUT, exist_ok=True)

    with open(os.path.join(OUT, "ontology.json"), "w") as f:
        json.dump(ao.ONTOLOGY, f, indent=1, sort_keys=True)

    with open(os.path.join(OUT, "fighters.json"), "w") as f:
        json.dump(ao.FIGHTER_ENUM_TO_NAME, f, indent=1)

    with open(os.path.join(OUT, "stages.json"), "w") as f:
        json.dump(ao.STAGE_ENUM_TO_DATA, f, indent=1)

    with open(os.path.join(OUT, "status_kinds.json"), "w") as f:
        json.dump(ao.STATUS_ENUM_TO_STRING, f, indent=1)

    with open(os.path.join(OUT, "fighter_status_kinds.json"), "w") as f:
        json.dump(ao.FIGHTER_STATUS_ENUM_TO_STRING, f, indent=1)

    with open(os.path.join(OUT, "fighter_special_names.json"), "w") as f:
        json.dump(ao.FIGHTER_SPECIAL_NAME_MAP, f, indent=1)

    with open(os.path.join(OUT, "trained_actions.json"), "w") as f:
        json.dump(ao.TRAINED_ACTIONS_2_17, f, indent=1)

    # Frame-data DB is large (~89 fighters x moves); store gzipped.
    frame_data = fd.FIGHTER_FRAME_DATA.to_dict()
    with gzip.open(os.path.join(OUT, "frame_data.json.gz"), "wt") as f:
        json.dump(frame_data, f, sort_keys=True)

    # The motion-hex -> param-string table is a CSV data file shipped with the
    # game-telemetry mod; copy it verbatim (it is data, not code).
    shutil.copy(
        os.path.join(REFERENCE, "playaid", "game_data", "params_labels.csv"),
        os.path.join(OUT, "params_labels.csv"),
    )

    print("ontology moves:", sum(len(v) for v in ao.ONTOLOGY.values()))
    print("fighters:", len(ao.FIGHTER_ENUM_TO_NAME))
    print("stages:", len(ao.STAGE_ENUM_TO_DATA))
    print("frame-data fighters:", len(frame_data))
    print("hex rows:", len(ao.HEX_TO_ACTION))
    print("done ->", OUT)


if __name__ == "__main__":
    main()
