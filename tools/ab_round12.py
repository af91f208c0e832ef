#!/usr/bin/env python
"""Round-12 paired A/B: tpch_q5 variants, interleaved run-by-run in ONE
session (the only measurement this repo trusts — BASELINE.md). Round-11
verdict #1/#2: q5 printed 0.279 s (+23% r10→r11, 8.8× DuckDB) and is
the worst floor-payer; before touching the plan, measure (a) whether
the regression is real under interleaving, and (b) whether the
remaining exchanges can fold.

Variants:
  current   — the committed plan (3 broadcast subtrees: region → asia
              → supp; cust semi-probes asia, final join probes supp).
  fold      — cust semi-probes the SUPP broadcast on s_nationkey
              instead of asia (semantically equal: customers in
              nations with no ASIA supplier can't produce output rows
              because the final join needs c_nationkey==s_nationkey);
              the supp broadcast is then REUSED (ReuseExchange) and
              the asia broadcast has a single consumer.
  noaqe     — the committed plan with adaptive execution disabled for
              the run (AQE re-plans per exchange; on a 0.2 s query the
              re-plan round-trips are a candidate floor payer).
  nosemi    — the committed plan minus the customer semi join
              (control: how much the ASIA pre-cut of the SHJ build is
              worth at sf0.1).

Prints one JSON line with all runs per variant; adopt-or-reject goes
to BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import BENCH_CONF, build_layouts, cache_dimensions, relayout, warm_up  # noqa: E402
from etl_cortex_spark.session import get_spark  # noqa: E402

RUNS = 8
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def q5_variant(spark, sf_dir: str, mode: str):
    from etl_cortex_spark.inventory.tier_c_rel import _orders_by_custkey
    from etl_cortex_spark.inventory.tier_tpch import (
        T,
        _customer_by_custkey,
        _lineitem_by_orderkey,
    )

    if mode == "dim":
        # the committed round-12 plan: conformed supplier_geo dim,
        # single reused broadcast
        from etl_cortex_spark.queries import QUERIES

        return QUERIES["tpch_q5_local_supplier_volume"](spark, sf_dir)

    asia_nations = (
        T(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp_frame = (
        T(spark, sf_dir, "supplier")
        .join(
            F.broadcast(asia_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    supp = F.broadcast(supp_frame)
    cust = _customer_by_custkey(spark, sf_dir)
    if mode == "fold":
        cust = cust.join(
            supp,
            F.col("c_nationkey") == F.col("s_nationkey"),
            "left_semi",
        ).select("c_custkey", "c_nationkey")
    elif mode != "nosemi":
        cust = cust.join(
            F.broadcast(asia_nations),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left_semi",
        ).select("c_custkey", "c_nationkey")
    else:
        cust = cust.select("c_custkey", "c_nationkey")
    orders = _orders_by_custkey(spark, sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = _lineitem_by_orderkey(spark, sf_dir)
    co = cust.hint("shuffle_hash").join(
        orders, cust.c_custkey == orders.o_custkey
    ).select("o_orderkey", "c_nationkey")
    return (
        li.join(co.hint("shuffle_hash"), li.l_orderkey == co.o_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp_frame.s_suppkey)
            & (co.c_nationkey == supp_frame.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .coalesce(1)
        .sortWithinPartitions(F.desc("revenue"), "n_name")
    )


def main() -> None:
    sf_dir = relayout(SF_DIR)
    spark = get_spark(app_name="ab_round12", extra_conf=BENCH_CONF)
    spark.sparkContext.setLogLevel("ERROR")
    warm_up(spark)
    cache_dimensions(spark, sf_dir)
    build_layouts(spark, sf_dir)

    modes = ["current", "fold", "noaqe", "nosemi", "dim"]
    runs: dict[str, list[float]] = {m: [] for m in modes}
    # parity guard: every variant must agree with current on values
    base = [tuple(r) for r in q5_variant(spark, sf_dir, "current").collect()]
    for m in modes[1:]:
        got = [tuple(r) for r in q5_variant(spark, sf_dir, m).collect()]
        assert got == base, f"variant {m} output diverges"

    for _ in range(RUNS):
        for m in modes:
            if m == "noaqe":
                spark.conf.set("spark.sql.adaptive.enabled", "false")
            t0 = time.perf_counter()
            q5_variant(spark, sf_dir, "current" if m == "noaqe" else m).write.format(
                "noop"
            ).mode("overwrite").save()
            dt = time.perf_counter() - t0
            if m == "noaqe":
                spark.conf.set("spark.sql.adaptive.enabled", "true")
            runs[m].append(round(dt, 4))

    out = {
        "tool": "ab_round12_q5",
        "sf_dir": sf_dir,
        "runs": runs,
        "best": {m: min(v) for m, v in runs.items()},
        "median": {m: sorted(v)[len(v) // 2] for m, v in runs.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
