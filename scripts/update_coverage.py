#!/usr/bin/env python
"""Regenerate COVERAGE.md — the driver-correctness freshness ledger.

Reads every CORRECTNESS_r*.json in the repo root plus the current
registry order in __spark_entry__.queries() and rewrites the table of
which round each key last got a driver value-level green row.  Run it
once per round after the driver publishes the new CORRECTNESS file.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def registry_keys() -> list[str]:
    src = open(os.path.join(ROOT, "__spark_entry__.py")).read()
    m = re.search(r"def queries\(\).*?return \{(.*?)\n    \}", src, re.S)
    return re.findall(r'"([a-z0-9_]+)":', m.group(1))


def driver_history() -> dict[str, list[str]]:
    hist: dict[str, list[str]] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = "r" + re.search(r"_r0*(\d+)", path).group(1)
        try:
            data = json.load(open(path))
        except Exception:
            continue
        for key, row in data.items():
            if not isinstance(row, dict) or row.get("err"):
                continue
            if row.get("hash_match") is False:
                continue
            hist.setdefault(key, []).append(rnd)
    return hist


def main() -> int:
    keys = registry_keys()
    hist = driver_history()
    lines = [
        "# Driver correctness coverage ledger",
        "",
        "Which round each registry key last received a *driver* value-level",
        "green row (CORRECTNESS_r{N}.json). The driver checks the registry's",
        "FIRST 50 keys only, so `queries()` is ordered in blocks:",
        "",
        "- **Block A** (r7: slots 1-34): keys whose last driver row is two",
        "  rounds old — rotated into the window so they stay inside the",
        "  freshness bar.",
        "- **Block B** (r7: slots 35-50): last-round-green keys refreshed as",
        "  space allows.",
        "- **Block C**: keys green last round; they re-enter the window as",
        "  space allows and stay within the 2-round freshness bar.",
        "",
        "Update this table each round from the new CORRECTNESS file",
        "(`python scripts/update_coverage.py` regenerates it).",
        "",
        "| # | key | driver-green rounds | last |",
        "|---|---|---|---|",
    ]
    stale = []
    for i, key in enumerate(keys, 1):
        rounds = hist.get(key, [])
        last = rounds[-1] if rounds else "never"
        lines.append(
            "| {} | `{}` | {} | {} |".format(
                i, key, ", ".join(rounds) if rounds else "—", last
            )
        )
        if not rounds:
            stale.append(key)
    open(os.path.join(ROOT, "COVERAGE.md"), "w").write("\n".join(lines) + "\n")
    in_window = set(keys[:50])
    missed = [k for k in stale if k not in in_window]
    print(
        "COVERAGE.md: {} keys, {} never driver-checked ({} of those outside "
        "the first-50 window)".format(len(keys), len(stale), len(missed))
    )
    if missed:
        print("WARNING outside window:", ", ".join(missed))
    return 1 if missed else 0


if __name__ == "__main__":
    sys.exit(main())
