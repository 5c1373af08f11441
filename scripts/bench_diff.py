"""Round-over-round bench diff: BENCH_r{N}.json snapshots + the local
BENCH/history.jsonl → BENCH/ROUND_DIFF.md per-query table.

The driver only keeps the latest per-round snapshot; history.jsonl
(appended by bench.py with git sha) lets any round reconstruct the
trend. For each query the diff uses the MIN across this round's
history rows (the sandbox shows 4-10x noise windows; min is the
noise-robust estimator the scaling bench already uses).
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_round_snapshots() -> dict[int, dict]:
    out = {}
    for p in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        with open(p) as f:
            data = json.load(f)
        parsed = data.get("parsed") or data
        if "queries" in parsed:
            out[int(m.group(1))] = parsed
    return out


def load_history_best(
    since_ts: str | None = None, sf: str | None = None
) -> dict | None:
    """Min per query over history rows; ``since_ts`` (ISO string)
    restricts to THIS round's runs so a previous round's fast outlier
    can't mask a real regression, and ``sf`` drops runs at other scale
    factors (tiny verify runs would otherwise fake improvements)."""
    path = os.path.join(REPO, "BENCH", "history.jsonl")
    if not os.path.exists(path):
        return None
    rows = []
    with open(path) as f:
        for line in f:
            if line.strip():
                rows.append(json.loads(line))
    if sf:
        rows = [r for r in rows if r.get("sf") == sf]
    if since_ts:
        newer = [r for r in rows if (r.get("ts") or "") >= since_ts]
        rows = newer or rows  # all-older: fall back rather than empty
    if not rows:
        return None
    best: dict[str, float] = {}
    for r in rows:
        for q, s in r.get("queries", {}).items():
            best[q] = min(best.get(q, s), s)
    return {
        "queries": best,
        "docs_per_sec": max(r.get("docs_per_sec", 0) for r in rows),
        "runs": len(rows),
    }


def round_since_ts(prev_round: int) -> str | None:
    """Earliest history timestamp belonging to the CURRENT round.

    Round boundary comes from git, not file mtime — the driver
    rewrites the BENCH_r{N}.json artifacts on session restarts, so
    mtime can sit hours into the current round and silently exclude
    its earlier runs. The driver commits "round {N}: verdict/..."
    when a round closes; every history row whose sha is a descendant
    of that marker belongs to this round.
    """
    try:
        import subprocess

        marker = subprocess.run(
            ["git", "-C", REPO, "log", "--format=%H",
             "--grep", f"^round {prev_round}:", "-1"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        if not marker:
            return None
        # Full SHAs, matched by prefix against history's short shas:
        # --abbrev-commit length is adaptive (grows with object count),
        # so exact set membership against a stored 7-char field would
        # silently stop matching once git moves to 8+ chars.
        fulls = subprocess.run(
            ["git", "-C", REPO, "rev-list", f"{marker}..HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.split()
        with open(os.path.join(REPO, "BENCH", "history.jsonl")) as f:
            ts = []
            for line in f:
                if not line.strip():
                    continue
                row = json.loads(line)
                short = row.get("git") or ""
                if short and any(full.startswith(short) for full in fulls):
                    ts.append(row["ts"])
        return min(ts) if ts else None
    except Exception:
        return None


def main() -> None:
    snaps = load_round_snapshots()
    if not snaps:
        print("nothing to diff")
        return
    prev_round = max(snaps)
    prev = snaps[prev_round]
    import time

    since = round_since_ts(prev_round)
    if since is None:
        snap_path = os.path.join(REPO, f"BENCH_r{prev_round:02d}.json")
        since = time.strftime(
            "%Y-%m-%dT%H:%M:%S", time.localtime(os.path.getmtime(snap_path))
        )
    cur = load_history_best(since_ts=since, sf=prev.get("sf"))
    if cur is None:
        print("nothing to diff")
        return
    lines = [
        "# Per-query bench diff\n",
        f"Previous round snapshot: BENCH_r{prev_round:02d}.json "
        f"(total {prev.get('value')}s, {prev.get('docs_per_sec')} docs/s).",
        f"Current round: min per query over {cur['runs']} local runs "
        f"(BENCH/history.jsonl; min-of-k counters the sandbox's 4-10x "
        f"noise windows), best flagship {cur['docs_per_sec']} docs/s.\n",
        "| query | r{:02d} (s) | now (s) | delta |".format(prev_round),
        "|---|---|---|---|",
    ]
    all_q = sorted(set(prev["queries"]) | set(cur["queries"]))
    for q in all_q:
        a = prev["queries"].get(q)
        b = cur["queries"].get(q)
        if a is None:
            delta = "NEW"
        elif b is None:
            delta = "removed"
        else:
            delta = f"{(b - a) / a * 100:+.0f}%"
        lines.append(f"| {q} | {a if a is not None else '—'} | "
                     f"{b if b is not None else '—'} | {delta} |")
    out = os.path.join(REPO, "BENCH", "ROUND_DIFF.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
