#!/usr/bin/env python
"""Round-12 floor decomposition (round-11 verdict #1 'or' branch): for
each headline floor-payer, count the JOBS and STAGES its one noop-write
execution schedules (statusTracker, job-group scoped) and set that
against the measured per-job/per-stage scheduler floor — the formal
record of how much of the remaining Spark-vs-DuckDB gap on sub-0.3 s
queries is fixed scheduling cost rather than plan inefficiency.

Method: same session + layouts + dim cache as bench.py; per query one
untimed warm run, then best-of-5 interleaved wall clock; job/stage/task
counts read back from the status tracker for a job-group-tagged run.
floor_est = jobs × one_task_floor + extra_stages × (two_stage_floor −
one_task_floor), where extra_stages = stages − jobs (each job pays the
one-task floor; each additional stage in a job pays the marginal
stage-to-stage handoff measured by the two-stage probe).

Prints one JSON line; the committed table goes to BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    BENCH_CONF,
    build_layouts,
    cache_dimensions,
    job_floor_ms,
    relayout,
    warm_up,
)
from etl_cortex_spark.queries import QUERIES  # noqa: E402
from etl_cortex_spark.session import get_spark  # noqa: E402

RUNS = 5
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TARGETS = [
    "tpch_q5_local_supplier_volume",
    "c10_join_inner_agg",
    "tpch_q3_shipping_priority",
    "c17_tpch_q1",
    "flagship_events_medallion",
    "a13_dedup_keep_latest",
    "d01_exact_dedup",
    "d03_cosine_topk",
]


def main() -> None:
    sf_dir = relayout(SF_DIR)
    spark = get_spark(app_name="floor_decomp_r12", extra_conf=BENCH_CONF)
    spark.sparkContext.setLogLevel("ERROR")
    warm_up(spark)
    cache_dimensions(spark, sf_dir)
    build_layouts(spark, sf_dir)
    sc = spark.sparkContext
    floors = job_floor_ms(spark)
    one = floors["one_task_noop"]
    two = floors["two_stage_32task_agg"]

    out: dict[str, dict] = {}
    for name in TARGETS:
        fn = QUERIES[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        group = f"fd_{name}"
        sc.setJobGroup(group, name)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        sc.setJobGroup("fd_idle", "idle")
        st = sc.statusTracker()
        job_ids = st.getJobIdsForGroup(group)
        stages = 0
        tasks = 0
        for jid in job_ids:
            info = st.getJobInfo(jid)
            if info is None:
                continue
            stages += len(info.stageIds)
            for sid in info.stageIds:
                sinfo = st.getStageInfo(sid)
                if sinfo is not None:
                    tasks += sinfo.numTasks
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        jobs = len(job_ids)
        floor_est_ms = jobs * one + max(stages - jobs, 0) * max(two - one, 0)
        out[name] = {
            "jobs": jobs,
            "stages": stages,
            "tasks": tasks,
            "best_sec": round(best, 4),
            "floor_est_sec": round(floor_est_ms / 1000.0, 4),
            "floor_share": round(floor_est_ms / 1000.0 / best, 2),
        }

    print(json.dumps({"tool": "floor_decomp_r12", "floors_ms": floors, "queries": out}))


if __name__ == "__main__":
    main()
