"""Physical-plan assertions (the 100 TB scale contract, SURVEY §4).

Correctness tests prove the engine computes the right answer; these
prove it computes it the way that survives a 1000× scale-up:

- filters reach the parquet scan (PushedFilters),
- projections prune the read schema (ReadSchema),
- small dimension tables broadcast instead of shuffling the fact side,
- hot paths stay inside WholeStageCodegen,
- the LSH band join never carries document payloads.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_cortex_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(QUERIES["c01_parquet_scan_pushdown"](spark, SF))
    assert "PushedFilters:" in plan
    # the quantity comparison is a pushable predicate
    assert "LessThan(l_quantity" in plan or "l_quantity" in plan.split("PushedFilters:")[1].split("\n")[0]


def test_column_pruning_reaches_scan(spark):
    plan = plan_of(QUERIES["c01_parquet_scan_pushdown"](spark, SF))
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    # only the filter + projection columns are read — never the 16-col row
    assert "l_comment" not in read_schema and "l_extendedprice" not in read_schema


def test_small_dims_broadcast(spark):
    """Joins against nation/region must be broadcast-hash, not
    sort-merge: shuffling a 100 TB fact table against a 25-row
    dimension is the canonical scale failure. q5 carries both dims
    (region→nation→customer/supplier): every one must broadcast, and
    no join in the query may fall to a sort-merge of fact rows."""
    plan = plan_of(QUERIES["tpch_q5_local_supplier_volume"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def _physical_body(plan: str) -> str:
    return plan.split("== Physical Plan ==")[1].split("===== Subqueries")[0]


def _n_shuffle_exchanges(plan: str) -> int:
    """Count real (hash/range/single-partition) Exchange nodes in a
    formatted plan's node details — BroadcastExchange deliberately
    excluded (broadcasts are the CHEAP movement; these pins bound the
    data-sized shuffles)."""
    import re as _re

    return len(_re.findall(r"\(\d+\) Exchange\b", _physical_body(plan)))


@pytest.mark.parametrize(
    ("name", "max_exchanges"),
    [
        # q3: the only shuffle is the customers⋈orders probe build —
        # bucketed lineitem feeds the join AND the (l_orderkey,
        # o_orderdate) aggregate exchange-free; top-10 is TakeOrdered.
        ("tpch_q3_shipping_priority", 1),
        # q5: the co probe build + the |nation|-row final agg.
        ("tpch_q5_local_supplier_volume", 2),
        # c10: ONLY the |segment|-row final agg — both sides stream
        # from their custkey buckets unshuffled (round 9).
        ("c10_join_inner_agg", 1),
    ],
)
def test_bucketed_fact_queries_never_shuffle_the_fact(spark, name, max_exchanges):
    """The round-8 warehouse-layout contract: q3/q5/c10 read their fact
    side through `layout.bucketed_fact`, so the fact table NEVER
    appears under an Exchange — the plan must show a bucketed scan and
    at most the small-side/final-agg shuffles counted above. If the
    layout write silently fell back to plain parquet, 'Bucketed: true'
    disappears and this fails — the pin covers both the plan shape and
    the loader actually working."""
    plan = plan_of(QUERIES[name](spark, SF))
    assert "Bucketed: true" in plan, f"{name}: fact scan is not bucketed"
    n = _n_shuffle_exchanges(plan)
    assert n <= max_exchanges, f"{name}: {n} shuffle exchanges\n{plan}"


def test_flagship_stays_in_codegen(spark):
    df = QUERIES["flagship_events_medallion"](spark, SF)
    plan = plan_of(df)
    # no Python evaluation anywhere in the flagship path
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # codegen wrappers are only visible on a non-AQE physical plan (AQE
    # defers them to runtime stage compilation)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df2 = QUERIES["flagship_events_medallion"](spark, SF)
        executed = df2._jdf.queryExecution().executedPlan().toString()
        # "*(n)" prefixes mark WholeStageCodegen stages in plan strings
        assert "*(1)" in executed
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_tpch_q1_single_shuffle(spark):
    """Q1 is scan → partial agg → exchange → final agg: exactly one
    exchange. A second exchange would mean the partial aggregation was
    lost — the map-side combine is what makes this query linear."""
    import re

    plan = plan_of(QUERIES["c17_tpch_q1"](spark, SF))
    body = plan.split("== Physical Plan ==")[1].split("===== Subqueries =====")[0]
    # formatted explain names each node once as "(n) Exchange"
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", body))
    # one for the groupBy, one for the final orderBy (range partitioning)
    assert n_exchanges <= 2, f"expected <=2 exchanges, saw {n_exchanges}:\n{body}"
    assert "partial_sum" in body  # map-side combine present


def test_minhash_band_join_carries_no_payload(spark):
    """The LSH self-join must exchange only (id, band, bucket) — if the
    shingle arrays ever cross that shuffle the operator dies at scale."""
    df = QUERIES["d02_minhash_lsh_pairs"](spark, SF)
    plan = plan_of(df)
    body = plan.split("== Physical Plan ==")[1]
    # find the hashpartitioning exchanges feeding the band join: none of
    # them may carry __shingles
    for frag in body.split("Exchange")[1:]:
        header = frag.split("\n")[0]
        if "band" in header and "bucket" in header:
            assert "__shingles" not in header


def test_dedup_agg_partitions_on_keys(spark):
    """a13 runs the max_by-aggregate dedup (round 5): partial_max_by on
    the map side, ONE hash exchange on the dedup keys, no Window."""
    import re

    plan = plan_of(QUERIES["a13_dedup_keep_latest"](spark, SF))
    assert "max_by" in plan
    assert "partial_max_by" in plan  # map-side combine before the exchange
    body = plan.split("== Physical Plan ==")[1]
    assert len(re.findall(r"\(\d+\) Exchange", body)) <= 1


def test_events_scan_prunes_props(spark):
    """Queries not touching the JSON props column must not read it —
    it dominates the events table's bytes."""
    from etl_cortex_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    q = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    read_schema = plan_of(q).split("ReadSchema:")[1].split("\n")[0]
    assert "props" not in read_schema


def test_ivf_partition_pruning(spark, tmp_path):
    """The IVF claim, demonstrated: against a bucket-partitioned index,
    the ANN query's scan carries a PartitionFilters entry on __bucket
    and reads files from exactly one partition directory."""
    from etl_cortex_spark.operators import similarity as SIM
    from etl_cortex_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    path = str(tmp_path / "ivf")
    SIM.write_ivf_index(emb, path)
    qv = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
    df = SIM.lsh_topk_ivf(spark, path, qv, k=5)
    plan = plan_of(df)
    pf = plan.split("PartitionFilters:")[1].split("\n")[0]
    assert "__bucket" in pf
    # the pruned query agrees with the full-scan LSH path
    full = SIM.lsh_topk(emb, qv, k=5).collect()
    assert [tuple(r) for r in df.collect()] == [tuple(r) for r in full]
    # the physical proof, from the executed scan's runtime metrics:
    # exactly one of the 2^6 bucket directories was read
    n_parts = _scan_metric(df, "numPartitions")
    assert n_parts == 1, f"expected 1 pruned partition read, got {n_parts}"


def test_ivf_incremental_append(spark, tmp_path):
    """append_ivf_index (round 13): a delta batch appended to an
    existing IVF index is (a) bucket-aligned — exactly one new file
    per cell the delta touches, untouched cells keep their file set —
    (b) invisible to the query path: lsh_topk_ivf still prunes to ONE
    partition directory (now multi-file) and returns exactly the
    full-index answer over base ∪ delta."""
    import glob as _glob
    import os as _os

    from etl_cortex_spark.operators import similarity as SIM
    from etl_cortex_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings").filter("vec_id <> 0")
    base = emb.filter("vec_id % 7 <> 3")
    delta = emb.filter("vec_id % 7 = 3")
    path = str(tmp_path / "ivf_inc")
    SIM.write_ivf_index(base, path)

    def files_per_cell():
        return {
            _os.path.basename(d): len(_glob.glob(_os.path.join(d, "*.parquet")))
            for d in _glob.glob(_os.path.join(path, "__bucket=*"))
        }

    before = files_per_cell()
    SIM.append_ivf_index(delta, path)
    after = files_per_cell()
    touched = {
        f"__bucket={r['__bucket']}"
        for r in delta.withColumn(
            "__bucket",
            SIM.lsh_bucket(SIM.as_double(F.col("embedding")), SIM.hyperplanes(64, 6, 7)),
        )
        .select("__bucket")
        .distinct()
        .collect()
    }
    for cell, n in after.items():
        if cell in touched:
            assert n == before.get(cell, 0) + 1, (cell, before.get(cell), n)
        else:
            assert n == before.get(cell, 0), (cell, before.get(cell), n)
    # at least one cell existed in the base AND gained a delta file —
    # the multi-file-cell case the query pin below must survive
    assert any(c in before for c in touched)

    qv = [float(x) for x in load_table(spark, SF, "embeddings").filter("vec_id = 0").first().embedding]
    df = SIM.lsh_topk_ivf(spark, path, qv, k=5)
    full = SIM.lsh_topk(emb, qv, k=5).collect()
    assert [tuple(r) for r in df.collect()] == [tuple(r) for r in full]
    n_parts = _scan_metric(df, "numPartitions")
    assert n_parts == 1, f"expected 1 pruned partition read, got {n_parts}"


def _scan_metric(df, key: str) -> int:
    """Walk the executed (post-AQE) plan to the parquet scan leaf and
    read one of its runtime SQL metrics."""
    stack = [df._jdf.queryExecution().executedPlan()]
    while stack:
        node = stack.pop()
        name = node.nodeName()
        if "Scan" in name:
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == key:
                    return kv._2().value()
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
        if name == "AdaptiveSparkPlan":
            stack.append(node.executedPlan())
        if "QueryStage" in name:
            stack.append(node.plan())
    raise AssertionError(f"no scan node with metric {key!r} found")


def test_binned_range_join_avoids_nested_loop(spark):
    """The big-to-big interval join must plan as a hash/sort-merge
    equi-join on the bin key — if a BroadcastNestedLoopJoin (or
    cartesian) appears, the rewrite regressed to the O(n*m) shape."""
    plan = plan_of(QUERIES["scale_binned_range_join"](spark, SF))
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Join" in plan  # and it's still a join, on the bin key
    assert "__bin" in plan


def test_q21_semi_anti_share_order_key(spark):
    """q21's EXISTS/NOT-EXISTS become one semi + one anti join, both
    keyed on l_orderkey (equality key present → hash-joinable at any
    scale, never a nested loop)."""
    plan = plan_of(QUERIES["tpch_q21_suppliers_who_kept_waiting"](spark, SF))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "NestedLoop" not in plan


def test_q19_or_of_ands_pushes_common_predicates(spark):
    """Catalyst extracts the brand IN-list from the OR-of-ANDs and
    pushes it to the part scan — the broadcast side shrinks before the
    join, not after."""
    plan = plan_of(QUERIES["tpch_q19_discounted_revenue"](spark, SF))
    pushed = [
        ln for ln in plan.splitlines() if "PushedFilters:" in ln and "p_brand" in ln
    ]
    assert pushed, "p_brand IN-list must reach the part parquet scan"


def test_d14_gopher_gate_is_shuffle_free(spark):
    """The quality gate is pure per-row expressions: no Exchange before
    the final sort — it runs at scan speed on any corpus."""
    import re
    df = QUERIES["d14_gopher_quality_flags"](spark, SF)
    plan = plan_of(df)
    body = plan.split("Sort")[0]  # everything below the output sort
    assert not re.search(r"\(\d+\) Exchange", body)


def test_fuzzy_join_avoids_cartesian(spark):
    """The banded fuzzy join must be an equi-join on (band, val) —
    no CartesianProduct / nested-loop over the full sides."""
    plan = plan_of(QUERIES["d26_fuzzy_entity_match"](spark, SF))
    assert "CartesianProduct" not in plan


def test_tfidf_knn_joins_through_inverted_index(spark):
    """Doc-doc similarity must pair documents through the term key
    (posting-list equi-join), never a cross product."""
    plan = plan_of(QUERIES["d28_tfidf_knn"](spark, SF))
    assert "CartesianProduct" not in plan


def test_semantic_dedup_joins_on_bucket(spark):
    plan = plan_of(QUERIES["d25_semantic_dedup"](spark, SF))
    assert "CartesianProduct" not in plan


def test_funnel_pushes_event_type_to_scan(spark):
    """Each funnel step scans only its event type — the filter must
    reach the parquet reader, not sit above a full scan."""
    plan = plan_of(QUERIES["b18_funnel_steps"](spark, SF))
    pushed = [
        line for line in plan.splitlines() if "PushedFilters:" in line
    ]
    assert any("event_type" in line for line in pushed), pushed[:3]


def test_zorder_key_is_pure_projection(spark):
    """The Morton key must be computed without any Exchange — a pure
    codegen projection over the scan."""
    import re

    from etl_cortex_spark.operators.layout import morton_key

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    keyed = orders.select(
        morton_key(
            F.col("o_custkey"),
            F.col("o_totalprice"),
            x_range=(0.0, 200000.0),
            y_range=(0.0, 600000.0),
        ).alias("z")
    )
    plan = plan_of(keyed)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0


def test_runtime_bloom_filter_injects_on_selective_shuffle_join(spark):
    """Runtime row-level filtering (SPARK-32268): when a shuffle join's
    build side carries a selective filter, Catalyst injects a
    bloom_filter_agg on the build keys and a might_contain probe on
    the stream side — at 100 TB this prunes most of the fact shuffle
    before the exchange. The feature keys off size thresholds
    (creation side small enough to sketch, application side big enough
    to care: 10 GB scan default), so tiny test inputs need the
    thresholds scoped down to see the injection; production defaults
    stay untouched outside this test."""
    from etl_cortex_spark.sources.tables import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = load_table(spark, SF, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, SF, "lineitem")
        j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, "no bloom filter injected"
        assert "might_contain" in plan, "no stream-side probe injected"
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dedup_latest_agg_shuffles_reduced_candidates(spark):
    """The max_by dedup variant must partially aggregate BEFORE the
    exchange (shuffle carries at most one candidate per key per input
    partition, not every row), and any Sort it needs is on the group
    keys only — never on the recency columns the window variant has
    to sort by."""
    import re

    df = QUERIES["scale_dedup_latest_agg"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    ex = plan.index("Exchange")
    assert "partial_max_by" in plan[ex:], "no map-side combine before shuffle"
    for sort_line in re.findall(r"Sort \[[^\]]*\]", plan):
        assert "ts#" not in sort_line, f"recency column in sort: {sort_line}"


def test_q3_q5_stream_lineitem_hash_build_cut_side(spark):
    """q3/q5 must NOT broadcast- or hash-build the lineitem side of
    the orders⋈lineitem join: the cut customers⋈orders product is the
    build side (shuffle_hash, partition-wise) and lineitem streams.
    Pins the round-5 side-choice fix — static size estimates used to
    broadcast-build the (even unfiltered) fact."""
    for name in ("tpch_q3_shipping_priority", "tpch_q5_local_supplier_volume"):
        plan = (
            QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
        )
        assert "ShuffledHashJoin" in plan, f"{name}: shuffle_hash hint not honored"
        # lineitem must never sit under a BroadcastExchange: the first
        # scan below each broadcast must be some other relation
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "BroadcastExchange" in ln and "Reused" not in ln:
                for l2 in lines[i + 1:]:
                    if "FileScan" in l2 or "InMemoryTableScan" in l2:
                        assert "lineitem" not in l2, f"{name}: lineitem broadcast-built"
                        break
                    if l2.strip() == "":
                        break


def test_span_dedup_gram_shuffle_is_payload_free(spark):
    """d51's corpus-wide gram exchanges must carry hashes and
    positions only — the document text never rides a gram-keyed
    shuffle (it re-enters via the final id-keyed join)."""
    import re

    from etl_cortex_spark.operators.llmprep import span_dedup
    from etl_cortex_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    plan = (
        span_dedup(docs, n=5, min_docs=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        keys = m.group(1)
        if "doc_id" in keys and "__h" not in keys:
            continue  # the final id-keyed reassembly join may carry text
        assert "text" not in keys
    # no gram STRING column in any exchange either: the only wide
    # payload allowed through a shuffle is the final doc join
    for ln in plan.splitlines():
        if "Exchange hashpartitioning(__h" in ln:
            assert "gram" not in ln and "text" not in ln


def test_quality_classifier_is_shuffle_free(spark):
    """d63 scoring is a pure projection — zero Exchange anywhere: every
    document is scored where it is read, at any corpus size."""
    import re

    plan = plan_of(QUERIES["d63_quality_classifier"](spark, SF))
    assert not re.search(r"\(\d+\) Exchange", plan), plan


def test_cms_sketch_estimate_joins_broadcast(spark):
    """The CMS probe joins the (≤ depth*width-row) sketch by broadcast —
    no shuffle of the probe stream against the sketch — and the whole
    entry never falls back to a cartesian plan."""
    plan = plan_of(QUERIES["scale_cms_frequency"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q3_bloom_prunes_fact_under_scale_sized_gate(spark):
    """With the bloom size gate sized to the data (BENCH_CONF posture —
    at real scale the 10 GB default passes on its own), the q3 shape
    must get the runtime filter: bloom built on the cut customers⋈orders
    product, might_contain probe pruning lineitem BEFORE its shuffle."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        # at test SF everything fits under the broadcast threshold and a
        # broadcast join needs no runtime filter; forcing the shuffle
        # join reproduces the at-scale shape the gate is sized for
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = QUERIES["tpch_q3_shipping_priority"](spark, SF)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, "no bloom built on the cut product"
        assert "might_contain" in plan, "fact side not pruned by the bloom"
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dsir_scoring_is_exchange_free(spark):
    """d67's pass-2 contract: after the 64-row distribution fit, the
    per-document scoring + top-m must be a single TakeOrderedAndProject
    over the scan — no Exchange anywhere (the weight table rides the
    plan as a literal map)."""
    df = QUERIES["d67_dsir_select"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_pipe_sql_plans_identical_to_classic_form(spark):
    """c71's claim: the |> pipeline is pure sugar — Catalyst must
    produce the same physical node sequence as the classic
    WHERE/GROUP BY/HAVING/ORDER BY form."""
    import re

    from etl_cortex_spark.sources.tables import load_table

    load_table(spark, SF, "lineitem").createOrReplaceTempView("c71_lineitem")
    pipe = spark.sql("""
        FROM c71_lineitem
        |> WHERE l_quantity >= 10
        |> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
        |> AGGREGATE round(sum(l_quantity), 2) AS sum_qty,
                     round(sum(disc_price), 2) AS revenue,
                     count(*) AS n_items
           GROUP BY l_returnflag, l_linestatus
        |> WHERE n_items > 50
        |> ORDER BY l_returnflag, l_linestatus
    """)
    classic = spark.sql("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM c71_lineitem
        WHERE l_quantity >= 10
        GROUP BY l_returnflag, l_linestatus
        HAVING count(*) > 50
        ORDER BY l_returnflag, l_linestatus
    """)

    def nodes(df):
        s = df._jdf.queryExecution().executedPlan().toString()
        return [
            m.group(1)
            for m in re.finditer(r"^[\s+:*()\d-]*([A-Za-z]+)", s, re.M)
            # EXTEND materializes its computed column as a pipelined
            # Project where the classic form inlines it into the
            # aggregate — same stage, zero cost; every node that can
            # move data (Exchange/HashAggregate/Sort/Filter/Scan) must
            # match exactly.
            if m.group(1) != "Project"
        ]

    assert nodes(pipe) == nodes(classic)


def test_aqe_splits_skewed_join_partition(spark):
    """The engine-side answer to hot keys (complement of the manual
    salting in operators/skew.py): with AQE's skew-join on, a join
    whose shuffle has one dominant key must re-plan at runtime into a
    split-and-replicate read — SortMergeJoin(skew=true) over an
    'AQEShuffleRead skewed' — instead of one straggler task. Size
    gates are scaled to the test data the same way the bloom test
    scales its gate: at real scale the 256 MB defaults fire on their
    own."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 200000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 200000  # every left row matches once
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "hot partition was not split"
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_concat_chunk_packing_window_is_partitioned(spark):
    """d82's scale contract: the running-sum window is PARTITIONED BY
    the shard — no partition-less (global) Window node anywhere in the
    optimized plan (a global running sum would serialize the corpus
    through one task)."""
    import re

    df = QUERIES["d82_concat_chunk_packing"](spark, SF)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    windows = [
        line.lstrip(" :+-")
        for line in plan.splitlines()
        if line.lstrip(" :+-").startswith("Window ")
    ]
    assert windows, "expected a Window node"
    for w in windows:
        # partitioned: Window [exprs], [partSpec], [orderSpec] — two
        # '], [' separators; a global window omits the partition list
        assert len(re.findall(r"\], \[", w)) == 2, f"global window: {w[:90]}"


def test_preference_pairs_rank_windows_prune_map_side(spark):
    """d83's rank filters (row_number <= k over score) must plan as
    WindowGroupLimit — per-partition top-k pruning BEFORE the group
    shuffle, so a mega-group contributes k rows per input partition,
    not its full size."""
    df = QUERIES["d83_preference_pairs"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


#: registry entries the repo-wide window audits skip: streaming/sink/
#: datasource builders execute their work eagerly and are covered by
#: their own pytest files.
_AUDIT_SKIP = ("stream_", "sink_", "pyds_")

#: name -> optimized-plan string, built once per session and shared by
#: the repo-wide window audits (each fn(spark, SF) call is real work —
#: some builders run jobs — so the sweeps must not pay it twice).
_REGISTRY_PLANS: dict = {}


def _registry_plan(spark, name: str, kind: str = "optimized") -> str:
    """Both plan renderings from ONE entry build (round 20): building
    an entry is real work (recall audits collect, index entries write,
    k-means fits run), and the physical-plan sweep used to rebuild all
    ~350 entries a second time — 165 s of duplicate builds. One
    queryExecution now serves both sweeps."""
    if name not in _REGISTRY_PLANS:
        qe = QUERIES[name](spark, SF)._jdf.queryExecution()
        _REGISTRY_PLANS[name] = {
            "optimized": qe.optimizedPlan().toString(),
            "physical": qe.sparkPlan().toString(),
        }
    return _REGISTRY_PLANS[name][kind]


def test_no_data_sized_global_window_anywhere_in_registry(spark):
    """Repo-wide scale audit (the c69/b26 class): every registry
    entry's optimized plan is scanned for GLOBAL Window nodes (empty
    partition spec). The allowlist carries the entries whose global
    window runs over a provably BOUNDED input (top-k pools, the
    funnel-step constant, |strata|/|sources| rows) with the expected
    node count — anything else funnels data-sized input through one
    task and fails here. Detector: a Window node prints
    ``Window [exprs], [partSpec], [orderSpec]``; with an empty
    partition spec the middle group is omitted, leaving the order
    spec (ASC/DESC markers) as the second of two groups. A
    partition-WITHOUT-order window also prints two groups but its
    second group has no sort direction — not global.
    Streaming/sink/datasource entries execute work in their builders
    and are covered by their own pytest files, so they're skipped."""
    import re

    BOUNDED_GLOBAL = {
        "b18_funnel_steps": 1,        # |funnel steps| rows
        "d23_vocab_coverage": 1,      # top-k bounded (limit before window)
        "d56_hybrid_rrf": 2,          # retrieval pools (<= pool rows)
        "d85_curriculum_order": 1,    # |strata| rows
        "d80_source_concentration": 1,  # |sources| rows
    }
    bad = {}
    for name in QUERIES:
        if name.startswith(_AUDIT_SKIP):
            continue
        plan = _registry_plan(spark, name)
        n = 0
        for line in plan.splitlines():
            s = line.lstrip(" :+-")
            if not s.startswith("Window "):
                continue
            groups = re.split(r"\], \[", s)
            if len(groups) <= 1 or (
                len(groups) == 2 and re.search(r" (ASC|DESC)", groups[1])
            ):
                n += 1
        if n > BOUNDED_GLOBAL.get(name, 0):
            bad[name] = n
    assert not bad, f"data-sized global windows: {bad}"


def test_no_unprunable_partitioned_window_anywhere_in_registry(spark):
    """Round-16 audit extension (the d111 lesson — the round-15
    verdict's one scale-killer sailed PAST the global-window audit
    because its window had a partition spec): ntile, percent_rank and
    cume_dist need their WHOLE partition — WindowGroupLimit cannot
    prune them — so even a partitioned window single-tasks its largest
    group when the partition key is a bounded-cardinality column over
    data-sized input (~45% of a real crawl is one language). Every
    registry plan is swept for Window nodes carrying the family; each
    allowlisted entry is justified below. The pre-fix d111 (ntile OVER
    (PARTITION BY lang)) fails this audit; the grouped_ntile rewrite
    passes. row_number/rank/dense_rank are deliberately excluded:
    their filtered top-k forms plan as WindowGroupLimit (pinned by
    test_preference_pairs_rank_windows_prune_map_side), and their
    partition-less uses are caught by the global-window audit above."""
    UNPRUNABLE = ("ntile(", "percent_rank(", "cume_dist(")
    ALLOWED = {
        # SQL-surface parity demos of the window functions THEMSELVES
        # (SURVEY rows C26 / D47): the deliverable is the windowed
        # form's semantics vs the DuckDB oracle, over one sf table with
        # a fixed 5-value partition key; their docstrings point scale
        # users at skew.grouped_ntile / global_ntile for the 100 TB
        # path.
        "c26_window_ranking": 1,
        "c63_window_cume_dist": 1,
    }
    bad = {}
    for name in QUERIES:
        if name.startswith(_AUDIT_SKIP):
            continue
        plan = _registry_plan(spark, name)
        n = 0
        for line in plan.splitlines():
            s = line.lstrip(" :+-")
            if s.startswith("Window ") and any(u in s for u in UNPRUNABLE):
                n += 1
        if n > ALLOWED.get(name, 0):
            bad[name] = n
    assert not bad, f"unprunable (ntile-family) windows: {bad}"


def test_bucketed_join_is_exchange_free(spark):
    """scale_bucketed_join's contract: once both sides are bucketed on
    the join key with equal bucket counts, the merge join has ZERO
    Exchange nodes — the fact-fact shuffle is paid once at ingest, not
    per query. (The within-bucket Sorts remain: Spark 3+ only trusts
    sortBy order behind a legacy flag.)"""
    from etl_cortex_spark.inventory.tier_scale import bucketed_table_names

    QUERIES["scale_bucketed_join"](spark, SF)  # creates the tables
    lt, ot = bucketed_table_names(SF)
    li, o = spark.table(lt), spark.table(ot)
    plan = plan_of(li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey))
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan


def test_bucketed_incremental_join_is_exchange_free_after_append(spark):
    """scale_bucketed_incremental's contract (round-9): AFTER the
    bucket-aligned delta append, the maintained table's scan still
    reports its bucketing, so the orderkey merge join stays a
    zero-data-sized-Exchange plan — the incremental write bought a
    second file per bucket, not a per-query re-shuffle. The full query
    keeps exactly one Exchange (the |priority|-row final agg)."""
    plan = plan_of(QUERIES["scale_bucketed_incremental"](spark, SF))
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") >= 2, plan  # both sides bucketed
    assert _n_shuffle_exchanges(plan) <= 1, plan


def test_bucketed_incremental_append_is_delta_sized(spark):
    """The maintained table holds base ∪ delta with the delta rows in
    SECOND files within their buckets: per-bucket file count goes to 2
    (where the delta slice is non-empty), and total rows equal
    base + delta exactly — the append wrote the batch, not a rebuilt
    table."""
    import os
    from urllib.parse import urlparse

    from etl_cortex_spark.inventory.tier_scale import _BKT_LI_COLS
    from etl_cortex_spark.operators.layout import bucketed_fact_name
    from etl_cortex_spark.sources.tables import load_table

    QUERIES["scale_bucketed_incremental"](spark, SF)  # builds + appends
    name = bucketed_fact_name(SF, "lineitemincr", "l_orderkey", _BKT_LI_COLS, 8)
    base = load_table(spark, SF, "lineitem")
    n_base = base.count()
    n_delta = base.filter(F.col("l_orderkey") % 19 == 3).count()
    assert n_delta > 0  # the slice must actually exercise the append
    assert spark.table(name).count() == n_base + n_delta
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    files = [f for f in os.listdir(os.path.join(wh, name)) if f.endswith(".parquet")]
    # 8 base files (one per bucket) + the delta's per-bucket files
    assert len(files) > 8, files


def test_dynamic_partition_pruning_reaches_scan(spark):
    """scale_dynamic_partition_pruning's contract: the dim-side filter
    becomes a runtime PartitionFilter on the fact scan — the plan must
    carry a dynamicpruning expression inside the scan's
    PartitionFilters, not just a post-scan join filter."""
    plan = plan_of(QUERIES["scale_dynamic_partition_pruning"](spark, SF))
    assert "PartitionFilters:" in plan
    pf = plan.split("PartitionFilters:")[1].split("\n")[0]
    assert "dynamicpruning" in pf, pf


def test_embedding_outliers_take_ordered_no_vector_shuffle(spark):
    """d92's contract: top-k via TakeOrderedAndProject (never a global
    sort of the vectors), and the only Exchange is the 1-row moment
    aggregate — the embedding column itself is never shuffled."""
    plan = plan_of(QUERIES["d92_embedding_outliers"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    # exactly the single-partition exchange pair of the moment agg
    # (partial → Exchange SinglePartition → final); no hash shuffle
    assert "Exchange hashpartitioning" not in plan


def test_bloom_decontaminate_probe_has_no_hash_shuffle(spark):
    """d91's contract: the only Exchanges are the filter-build's
    single-partition aggregate and the final sort's range exchange —
    the document/shingle side is NEVER hash-shuffled (membership is a
    broadcast + column expression, not a join), and nothing drops to
    Python evaluation."""
    plan = plan_of(QUERIES["d91_bloom_decontaminate"](spark, SF))
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastExchange" in plan
    assert "EvalPython" not in plan


def test_no_row_python_udf_or_cartesian_anywhere_in_registry(spark):
    """Repo-wide hot-path audit, the physical-plan twin of the global-
    window walk — one pass over every entry's sparkPlan pins two
    registry-wide claims:

    - NO row-at-a-time BatchEvalPython node. Arrow-batched escape
      hatches are sanctioned and stay allowed — ArrowEvalPython
      (scalar pandas UDFs), MapInPandas / FlatMapGroupsInPandas
      (multimodal decode, packing, xlsx fan-out), and
      BatchEvalPythonUDTF (the declared UDTF surface, d33). Anything
      else dropping to per-row Python silently turns a codegen'd
      column pipeline into a serialization loop.
    - NO CartesianProduct node. The sanctioned cross joins all have a
      broadcastable side (1-row totals, dim×dim) and plan as
      BroadcastNestedLoopJoin; a CartesianProduct means two
      non-broadcast sides met without an equi-key — the O(n·m)
      shuffle-everything shape that cannot survive any scale-up."""
    bad = {}
    for name in QUERIES:
        if name.startswith(_AUDIT_SKIP):
            continue
        plan = _registry_plan(spark, name, "physical")
        n_py = sum(
            1
            for line in plan.splitlines()
            if "BatchEvalPython" in line and "BatchEvalPythonUDTF" not in line
        )
        n_cart = plan.count("CartesianProduct")
        if n_py or n_cart:
            bad[name] = {"row_python": n_py, "cartesian": n_cart}
    assert not bad, f"hot-path violations: {bad}"


def test_postings_index_partition_pruning(spark, tmp_path):
    """The persisted inverted index's claim: a k-term query reads at
    most k bucket directories — the scan's runtime numPartitions
    equals the query terms' distinct bucket count, and the result
    matches a direct corpus-side computation."""
    from etl_cortex_spark.operators import search as SR
    from etl_cortex_spark.operators.textops import words
    from etl_cortex_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "postings")
    SR.write_postings_index(docs, path)
    terms = ["table", "join", "fast"]
    out = SR.postings_lookup(spark, path, terms, k=10)
    rows = [tuple(r) for r in out.collect()]
    n_buckets = len({SR.term_bucket_py(t) for t in terms})
    n_parts = _scan_metric(out, "numPartitions")
    assert n_parts == n_buckets, (n_parts, n_buckets)
    # parity with the direct corpus-side computation
    w = words("text")
    direct = (
        docs.select(F.col("doc_id"), F.explode(w).alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .groupBy("doc_id")
        .agg(
            F.countDistinct("term").alias("n_matched"),
            F.sum("tf").alias("total_tf"),
        )
        .orderBy(F.desc("n_matched"), F.desc("total_tf"), "doc_id")
        .limit(10)
    )
    assert rows == [tuple(r) for r in direct.collect()]
