"""Fold N independent bench.py SESSIONS into per-query cross-session
minima — the BASELINE.md methodology (single-box timings swing with
GC/page cache and host load; the min over independent JVM sessions is
the reproducible number, and the round verdicts compare fold-vs-fold).

Each session is a fresh process (fresh JVM, fresh codegen cache) running
bench.py once; the per-session artifact bench_sf{sf}_latest.json is
snapshotted after each run, then the fold writes
measurements/bench_sf{sf}_r{ROUND}.json with per-query minima, the
session count, and each query's min/max spread so a reader can judge
host noise without re-deriving it.

Usage:
  SPARK_GRAFT_BENCH_SESSIONS=8 SPARK_GRAFT_ROUND=8 python scripts/bench_fold.py
Existing session snapshots under measurements/.bench_sessions_r{N}/ are
reused (crash-resumable: re-running tops up to the requested count).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SESSIONS = int(os.environ.get("SPARK_GRAFT_BENCH_SESSIONS", "8"))
ROUND = os.environ.get("SPARK_GRAFT_ROUND", "8")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
SNAP_DIR = ROOT / "measurements" / f".bench_sessions_r{ROUND}"
LATEST = ROOT / "measurements" / f"bench_sf{SF}_latest.json"
OUT = ROOT / "measurements" / f"bench_sf{SF}_r{int(ROUND):02d}.json"


def main() -> None:
    SNAP_DIR.mkdir(parents=True, exist_ok=True)
    have = sorted(SNAP_DIR.glob("session*.json"))
    for i in range(len(have), SESSIONS):
        print(f"# bench session {i + 1}/{SESSIONS}", file=sys.stderr)
        r = subprocess.run(
            [sys.executable, str(ROOT / "bench.py")],
            cwd=ROOT,
            # RUNS=2, the r5/r6 fold methodology: each query's in-session
            # min is its WARM pass, so per-query first-run analysis +
            # codegen (~0.5-3 s, measured) isn't billed as query cost.
            # The round-8 fold's first sessions ran RUNS=1 and probed
            # 15-20% high on exactly the cheap early-alphabet queries
            # before this was spotted — minima across the mixed fold are
            # still warm-pass-dominated once RUNS=2 sessions land.
            env={**os.environ, "SPARK_GRAFT_BENCH_RUNS": os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")},
            capture_output=True,
            text=True,
        )
        if r.returncode != 0:
            # keep completed snapshots; a failed session must not erase
            # the fold-in-progress
            sys.exit(f"bench session {i + 1} failed:\n{r.stderr[-2000:]}")
        (SNAP_DIR / f"session{i + 1:02d}.json").write_text(
            LATEST.read_text()
        )
    sessions = [
        json.loads(p.read_text()) for p in sorted(SNAP_DIR.glob("session*.json"))
    ]
    runs_mix = sorted(
        {s.get("runs") for s in sessions}, key=lambda x: (x is None, x)
    )
    folded: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for s in sessions:
        for q, sec in s["queries"].items():
            folded[q] = min(folded.get(q, sec), sec)
            spread.setdefault(q, []).append(sec)
    out = {
        "metric": f"bench_sf{SF}_fold_r{int(ROUND):02d}",
        "value": round(sum(folded.values()), 3),
        "unit": "sec",
        "sessions": len(sessions),
        "sf": sessions[0].get("sf"),
        "note": (
            f"per-query min over round-{ROUND} sessions "
            f"(scripts/bench_fold.py; runs_mix={runs_mix} passes/session "
            "— min-of-passes within a session excludes first-run "
            "analysis+codegen when runs >= 2)"
        ),
        "runs_mix": runs_mix,
        "queries": {q: folded[q] for q in sorted(folded)},
        "spread_max": {q: max(v) for q, v in sorted(spread.items())},
    }
    OUT.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    print(
        json.dumps(
            {
                "sessions": out["sessions"],
                "value": out["value"],
                "per_query": round(out["value"] / max(len(folded), 1), 3),
                "artifact": str(OUT.relative_to(ROOT)),
            }
        )
    )


if __name__ == "__main__":
    main()
