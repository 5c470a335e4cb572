"""Interleaved same-host A/B for dedup_ngram_sharded — the round-9
verdict's #1 ask (fold-grade adjudication of the 15.6 s r8-fold vs
44-47 s r9-standalone gap, and of the 44.0 vs 46.6/47.4 s same-host
residual between the r8 and r9 trees).

Methodology (BASELINE.md "Round-6 regression adjudication", upgraded to
the interleaved form the round-9 verdict prescribes): two pinned
worktrees — r8 tree c533bb3 and r9 tree 9380197 — measured in
ALTERNATING fresh-JVM sessions on the same box, ≥6 sessions per tree,
order flipped every session pair so slow host drift cancels.  Each
session times ONLY dedup_ngram_sharded at sf0.1 (bench.py's noop-write
end-to-end timing, min of 2 in-session passes = the warm number).

Snapshots under measurements/.ab_sharded_r10/ (crash-resumable); the
fold writes measurements/ab_sharded_r10.json with per-tree session
lists, minima, and the HEAD/r8 ratio.

Usage: python scripts/ab_sharded_r10.py [sessions_per_tree]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SNAP = ROOT / "measurements" / ".ab_sharded_r10"
OUT = ROOT / "measurements" / "ab_sharded_r10.json"
TREES = {"r8": "c533bb3", "r9": "9380197"}
WT = ROOT / ".abwt"

RUNNER = r"""
import sys, time, json
tree = sys.argv[1]
sys.path.insert(0, tree)
from mapreduceproject_spark import plans
from mapreduceproject_spark.session import get_spark
spark = get_spark(app_name="ab_sharded", master="local[32]")
spark.range(1_000_000).selectExpr("sum(id)").collect()
fn = plans.QUERIES["dedup_ngram_sharded"]
times = []
for _ in range(2):
    t0 = time.perf_counter()
    fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
    times.append(round(time.perf_counter() - t0, 3))
    spark.catalog.clearCache()
print("ABRESULT " + json.dumps({"times": times, "min": min(times)}))
"""


def ensure_worktrees() -> None:
    WT.mkdir(exist_ok=True)
    for name, sha in TREES.items():
        path = WT / name
        if not (path / "mapreduceproject_spark").is_dir():
            subprocess.run(
                ["git", "worktree", "add", "--detach", str(path), sha],
                cwd=ROOT,
                check=True,
            )


def run_session(tree: str, session: int) -> dict:
    snap = SNAP / f"session{session:02d}_{tree}.json"
    if snap.exists():
        return json.loads(snap.read_text())
    r = subprocess.run(
        [sys.executable, "-c", RUNNER, str(WT / tree)],
        cwd=WT / tree,
        capture_output=True,
        text=True,
        env={**os.environ},
    )
    line = next(
        (ln for ln in r.stdout.splitlines() if ln.startswith("ABRESULT ")), None
    )
    if r.returncode != 0 or line is None:
        sys.exit(f"session {session} tree {tree} failed:\n{r.stderr[-2000:]}")
    payload = json.loads(line[len("ABRESULT ") :])
    payload["tree"] = tree
    payload["session"] = session
    snap.write_text(json.dumps(payload))
    print(f"# ab session {session} {tree}: {payload['min']} s", file=sys.stderr)
    return payload


def main() -> None:
    sessions = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    ensure_worktrees()
    SNAP.mkdir(parents=True, exist_ok=True)
    results: list[dict] = []
    for s in range(1, sessions + 1):
        # flip order each session so any monotone host drift bills both
        # trees equally
        order = ("r8", "r9") if s % 2 == 1 else ("r9", "r8")
        for tree in order:
            results.append(run_session(tree, s))
    mins = {
        t: sorted(r["min"] for r in results if r["tree"] == t) for t in TREES
    }
    fold = {
        "query": "dedup_ngram_sharded",
        "sf": 0.1,
        "methodology": (
            "interleaved same-host A/B, alternating fresh-JVM sessions, "
            "order flipped per session pair, min-of-2 in-session passes; "
            "trees pinned at c533bb3 (r8) and 9380197 (r9)"
        ),
        "sessions_per_tree": sessions,
        "session_mins": mins,
        "fold_min": {t: min(v) for t, v in mins.items()},
        "fold_median": {t: v[len(v) // 2] for t, v in mins.items()},
        "ratio_r9_over_r8_min": round(min(mins["r9"]) / min(mins["r8"]), 4),
        "ratio_r9_over_r8_median": round(
            mins["r9"][len(mins["r9"]) // 2] / mins["r8"][len(mins["r8"]) // 2], 4
        ),
        "r8_fold_range_for_context": [15.621, 22.765],
    }
    OUT.write_text(json.dumps(fold, indent=1))
    print(json.dumps(fold, indent=1))


if __name__ == "__main__":
    main()
