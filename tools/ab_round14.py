#!/usr/bin/env python
"""Round-14 A/B: adjudicate the BROAD bench-window drift of BENCH_r12
-> BENCH_r13 (headline 2.21 -> 2.48 s, engine-only ratio 1.74 -> 1.85)
with the same evidentiary standard the d56 spike got in round 13
(tools/ab_round13.py): interleaved same-window sessions, one per code
checkout, alternated A/B/A/B.

Hypotheses (round-13 verdict, What's wrong #1):
  (a) something in the round-13 additive commits regressed shared
      infrastructure (session conf, loaders, layout helpers) even
      though no headliner plan changed;
  (b) host-load noise on the r13 measurement window (BASELINE.md
      documents 2-3x swings; the DuckDB denominators drifted UP in the
      same window, which only (b) predicts).

Design: a git worktree pins the ROUND-12-END checkout (commit
03a5f33); the orchestrator alternates subprocess sessions
r13,r12,r13,r12, each running the full paired headline set through
THAT checkout's own bench.run_interleaved (Spark and DuckDB legs
alternating rep by rep) plus its job floors. If (a), the r13 sessions
are slower than the r12 sessions inside this one window. If (b), the
two checkouts are indistinguishable and BOTH run at (or under) the
r12-official level, with the r13-official numbers explained by that
window's floors.

Usage: python tools/ab_round14.py              # orchestrate 2x2 procs
       python tools/ab_round14.py <checkout>   # one session (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R12_COMMIT = "03a5f33"
R12_TREE = "/tmp/spark_graft_ab14_r12"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 3  # per session; 2 sessions per variant -> best-of-6 per leg


def one_session(checkout: str) -> None:
    """Run the paired headline set inside ``checkout`` (cwd + sys.path
    already point there, set by the orchestrator)."""
    import bench  # the CHECKOUT's bench module

    from etl_cortex_spark.queries import ORACLE, QUERIES
    from etl_cortex_spark.session import get_spark

    sf_dir = bench.relayout(SF_DIR)
    spark = get_spark(app_name="ab14", extra_conf=bench.BENCH_CONF)
    spark.sparkContext.setLogLevel("ERROR")
    bench.warm_up(spark)
    ingest = bench.build_layouts(spark, sf_dir)
    bench.cache_dimensions(spark, sf_dir)
    con = bench.duck_connect(sf_dir)
    timings: dict[str, float] = {}
    duck: dict[str, float] = {}
    for name in bench.HEADLINE:
        if name not in QUERIES:
            continue
        duck_con = None
        if con is not None and name in ORACLE:
            try:
                con.execute(ORACLE[name]).fetchall()
                duck_con = con
            except Exception:
                duck_con = None
        s, d = bench.run_interleaved(spark, duck_con, name, sf_dir, runs=RUNS)
        timings[name] = round(s, 4)
        if d is not None:
            duck[name] = round(d, 4)
    floors = bench.job_floor_ms(spark)
    spark.stop()
    print(
        json.dumps(
            {
                "checkout": checkout,
                "spark": timings,
                "duck": duck,
                "floors": floors,
                "ingest": ingest,
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 1:
        one_session(sys.argv[1])
        return
    if not os.path.isdir(R12_TREE):
        subprocess.run(
            ["git", "-C", REPO, "worktree", "add", "--detach", R12_TREE, R12_COMMIT],
            check=True,
        )
    results = []
    t0 = time.time()
    for checkout in ["r13", "r12", "r13", "r12"]:
        cwd = REPO if checkout == "r13" else R12_TREE
        env = dict(os.environ)
        env["PYTHONPATH"] = cwd
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "ab_round14.py"), checkout],
            capture_output=True,
            text=True,
            check=True,
            cwd=cwd,
            env=env,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
        print(line, flush=True)
    agg: dict[str, dict] = {}
    for r in results:
        a = agg.setdefault(
            r["checkout"], {"spark": {}, "duck": {}, "floors": []}
        )
        for k, v in r["spark"].items():
            a["spark"].setdefault(k, []).append(v)
        for k, v in r["duck"].items():
            a["duck"].setdefault(k, []).append(v)
        a["floors"].append(r["floors"])
    summary = {}
    for co, a in agg.items():
        sbest = {k: min(v) for k, v in a["spark"].items()}
        dbest = {k: min(v) for k, v in a["duck"].items()}
        eng = [k for k in dbest if k != "d02_prefix_probe_pairs"]
        summary[co] = {
            "spark_total": round(sum(sbest.values()), 4),
            "paired_ratio": round(
                sum(sbest[k] for k in dbest) / sum(dbest.values()), 3
            ),
            "engine_only_ratio": round(
                sum(sbest[k] for k in eng) / sum(dbest[k] for k in eng), 3
            ),
            "floors": a["floors"],
            "spark_best": sbest,
            "duck_best": dbest,
        }
    print(
        json.dumps(
            {"summary": summary, "wall_secs": round(time.time() - t0, 1)}
        )
    )


if __name__ == "__main__":
    main()
