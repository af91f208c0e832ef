"""Product-quantization operator tests (operators/pq.py).

The encode projection is oracle-checked (d37_pq_encode); these pin the
pieces the oracle can't: training improves the codebooks, ADC ranking
tracks exact L2, and the physical plan stays a shuffle-free
projection.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from etl_cortex_spark.operators import pq as PQ
from etl_cortex_spark.operators.similarity import as_double

SF = "/root/testdata/sf0.001"
M, K = 4, 8


@pytest.fixture(scope="module")
def emb(spark):
    from etl_cortex_spark.sources.tables import load_table

    return load_table(spark, SF, "embeddings")


def _recon_error(spark, emb, books) -> float:
    """Mean squared reconstruction error of encoding + decoding."""
    codes = PQ.pq_encode(emb, books)
    joined = codes.join(emb, "vec_id").select(
        "codes", as_double(F.col("embedding")).alias("v")
    )
    d_sub = len(books[0][0])
    err = None
    for j in range(M):
        cb = F.array(
            *[F.array(*[F.lit(float(x)) for x in cw]) for cw in books[j]]
        )
        recon = F.element_at(cb, F.col("codes")[j] + 1)
        sub = F.slice(F.col("v"), j * d_sub + 1, d_sub)
        term = F.aggregate(
            F.zip_with(sub, recon, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        err = term if err is None else err + term
    return float(joined.agg(F.avg(err)).first()[0])


def test_training_reduces_reconstruction_error(spark, emb):
    base = PQ.deterministic_codebooks(emb, M, K)
    trained = PQ.train_codebooks(emb, M, K, iters=3)
    e0 = _recon_error(spark, emb, base)
    e1 = _recon_error(spark, emb, trained)
    assert e1 < e0, f"training did not improve reconstruction: {e1} >= {e0}"


@pytest.mark.slow
def test_adc_topk_tracks_exact_l2(spark, emb):
    """ADC is an approximation, and the driver's embeddings are
    near-random unit vectors — PQ's worst case — so the assertions are
    the ROBUST retrieval properties, not brittle exact-top-k overlap:
    the query's own row ranks first, the retrieved set is genuinely
    near (mean exact L2 well under the corpus mean), and a weak floor
    of the exact top-10 still surfaces. Finer grain (m=16, k=16) than
    the oracle entry because recall, not encode correctness, is under
    test here."""
    m16, k16 = 16, 16
    books = PQ.train_codebooks(emb, m16, k16, iters=3)
    q_row = emb.orderBy("vec_id").first()
    q = [float(x) for x in q_row["embedding"]]
    codes = PQ.pq_encode(emb, books)
    adc_ids = [
        r["vec_id"] for r in PQ.pq_adc_topk(codes, books, q, topk=10).collect()
    ]
    assert adc_ids[0] == q_row["vec_id"], "self-match must rank first"

    v = as_double(F.col("embedding"))
    lit = F.array(*[F.lit(x) for x in q])
    l2 = F.aggregate(
        F.zip_with(v, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    exact_d = {
        r["vec_id"]: r["d"] for r in emb.select("vec_id", l2.alias("d")).collect()
    }
    avg_all = sum(exact_d.values()) / len(exact_d)
    avg_adc = sum(exact_d[i] for i in adc_ids) / len(adc_ids)
    assert avg_adc < 0.85 * avg_all, (
        f"ADC set not meaningfully near: {avg_adc} vs corpus {avg_all}"
    )
    exact10 = set(sorted(exact_d, key=lambda i: (exact_d[i], i))[:10])
    assert len(set(adc_ids) & exact10) >= 3


def test_pq_encode_plan_is_shuffle_free(spark, emb):
    books = PQ.deterministic_codebooks(emb, M, K)
    plan = (
        PQ.pq_encode(emb, books)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert not re.search(r"\bExchange (hash|range|single)", plan), plan


def test_dim_mismatch_raises(spark, emb):
    books = PQ.deterministic_codebooks(emb, M, K)
    with pytest.raises(ValueError, match="dim mismatch"):
        PQ.pq_adc_topk(PQ.pq_encode(emb, books), books, [0.0] * 8)
    with pytest.raises(ValueError, match="not divisible"):
        PQ.deterministic_codebooks(emb, m=7, k=4)


def test_ivfpq_prunes_partitions_and_recalls(spark, emb, tmp_path):
    """The composed serving path: (1) the query scans exactly ONE cell
    directory of the index (partition pruning, the IVF half), (2) the
    pruned ADC result equals ADC over that cell's ad-hoc codes (stored
    codes = expression codes), (3) the retrieved set is genuinely near
    under EXACT L2 (the PQ half approximates but must not garbage).
    n_planes=3 → 8 cells so each cell holds enough of the tiny test
    corpus to fill a top-10."""
    from tests.test_plans import _scan_metric

    books = PQ.train_codebooks(emb, M, K, iters=2)
    q_row = emb.orderBy("vec_id").first()
    q = [float(x) for x in q_row["embedding"]]
    base = emb.filter(F.col("vec_id") != q_row["vec_id"])

    path = str(tmp_path / "ivfpq")
    PQ.write_ivfpq_index(base, path, books, n_planes=3)
    top = PQ.ivfpq_adc_topk(spark, path, books, q, topk=10, n_planes=3)

    plan = top._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "__bucket" in plan.split("PartitionFilters:")[1].split("\n")[0]
    got = [(r["vec_id"], r["adc_dist"]) for r in top.collect()]
    assert _scan_metric(top, "numPartitions") == 1

    # stored codes == expression codes: rebuild the cell ad hoc
    from etl_cortex_spark.operators.similarity import (
        hyperplanes,
        lsh_bucket,
        query_bucket,
    )

    planes = hyperplanes(len(q), 3)
    cell = base.filter(
        lsh_bucket(as_double(F.col("embedding")), planes)
        == query_bucket(q, planes)
    )
    adhoc = [
        (r["vec_id"], r["adc_dist"])
        for r in PQ.pq_adc_topk(PQ.pq_encode(cell, books), books, q, topk=10).collect()
    ]
    assert got == adhoc

    # nearness under exact L2: retrieved mean well under corpus mean
    v = as_double(F.col("embedding"))
    lit = F.array(*[F.lit(x) for x in q])
    l2 = F.aggregate(
        F.zip_with(v, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    exact_d = {
        r["vec_id"]: r["d"] for r in base.select("vec_id", l2.alias("d")).collect()
    }
    avg_all = sum(exact_d.values()) / len(exact_d)
    ids = [i for i, _ in got]
    avg_got = sum(exact_d[i] for i in ids) / len(ids)
    assert avg_got < avg_all
