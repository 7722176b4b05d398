#!/usr/bin/env python
"""Rotation alarm: is the driver-sample head slate due for rotation?

The pytest invariant (tests/test_pipeline.py::
test_driver_sample_head_slate_invariants) checks the head against the
CORRECTNESS ledger CAPPED at contract._SLATE_LEDGER_ROUND, so a
post-close driver ledger landing on disk never turns a fresh clone red
(r11 verdict "what's wrong" #1). This script is the UNCAPPED
complement the round protocol runs at round start: it recomputes the
required slate from EVERY CORRECTNESS_r*.json on disk and exits 1 with
the exact required head when the committed slate no longer matches —
i.e. when a newer ledger has shifted the oldest-verified frontier and
the head must rotate (and _SLATE_LEDGER_ROUND must be bumped to the
newest ledger round used).

Usage: python tools/check_head_rotation.py   (exit 0 = slate current)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> int:
    from _event_intelligence_data_warehouse_spark.contract import (
        _DRIVER_SAMPLE_HEAD,
        _SLATE_LEDGER_ROUND,
        QUERIES,
    )

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last_round: dict[str, int] = {}
    newest = 0
    for f in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        newest = max(newest, rnd)
        for k in json.load(open(f)):
            last_round[k] = max(last_round.get(k, 0), rnd)

    never = [n for n in QUERIES if n not in last_round]
    want = never + sorted(
        (n for n in QUERIES if n in last_round),
        key=lambda n: (last_round[n], n),
    )[: 50 - len(never)]

    ok = sorted(_DRIVER_SAMPLE_HEAD) == sorted(want)
    if ok and newest > _SLATE_LEDGER_ROUND:
        # The slate happens to still be correct under the newer ledger
        # (possible when the head's names were re-verified but remain
        # the oldest) — still flag the stale cap so the next rotation
        # doesn't silently compute from old data.
        print(
            f"head slate content OK but _SLATE_LEDGER_ROUND="
            f"{_SLATE_LEDGER_ROUND} < newest ledger r{newest}: bump it",
            file=sys.stderr,
        )
        return 1
    if ok:
        print(
            f"head slate current (ledger through r{newest}, "
            f"{len(never)} never-verified + {50 - len(never)} re-pins)"
        )
        return 0

    extra = sorted(set(_DRIVER_SAMPLE_HEAD) - set(want))
    missing = sorted(set(want) - set(_DRIVER_SAMPLE_HEAD))
    print(
        "ROTATION DUE: head slate != oldest-verified frontier under "
        f"the r{newest} ledger.\n  drop: {extra}\n  add:  {missing}\n"
        "Rotate _DRIVER_SAMPLE_HEAD in contract/__init__.py, bump "
        f"_SLATE_LEDGER_ROUND to {newest}, and pre-verify the new head "
        "50/50 with tools/check_oracle.py before the driver samples it.",
        file=sys.stderr,
    )
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
