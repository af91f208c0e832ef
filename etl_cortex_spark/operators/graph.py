"""Distributed graph ranking: weighted PageRank as pure DataFrame
iterations.

Completes the graph family started by ``dedup.connected_components``
(min-label propagation): PageRank is the other canonical iterative
join-agg pattern, and the shape a 100 TB link/citation/trade graph
actually runs.

Scale design — everything stays distributed:
- The rank vector is a DataFrame keyed by node (NOT driver-side
  state, unlike k-means' k×dim centroid model): at web scale it is
  billions of rows, partitioned by node id.
- Per iteration: one (rank ⋈ edges on src) shuffle join + one dst
  agg; the dangling-node mass and the node count ride as broadcast
  1-row aggregates (no ``collect``).
- Edge fractions (w / out-degree) are precomputed once and persisted;
  iterations reuse the same partitioning on src.
- Fixed iteration count keeps the result deterministic and
  oracle-checkable (the oracle unrolls the identical iterations as
  CTEs from a shared generator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    *,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    node_col: str = "node",
    persist: bool = True,
) -> DataFrame:
    """Weighted PageRank with dangling-mass redistribution; returns
    (node, pr) after ``iters`` synchronous iterations from the
    uniform start vector.

    ``persist`` caches the edge-fraction frame every iteration reads
    (MEMORY_AND_DISK); pass False in long-lived sessions that manage
    their own caching, or drop it afterwards via
    ``spark.catalog.clearCache()``."""
    from pyspark import StorageLevel

    out_w = edges.groupBy(src).agg(F.sum(weight).alias("__ow"))
    frac = edges.join(out_w, src).select(
        F.col(src).alias("__src"),
        F.col(dst).alias("__dst"),
        (F.col(weight) / F.col("__ow")).alias("__frac"),
    )
    if persist:
        frac = frac.persist(StorageLevel.MEMORY_AND_DISK)
    srcs = frac.select(F.col("__src").alias(node_col)).distinct()
    n_frame = nodes.agg(F.count(F.lit(1)).cast("double").alias("__n"))

    ranks = nodes.select(node_col).crossJoin(F.broadcast(n_frame)).select(
        node_col, (F.lit(1.0) / F.col("__n")).alias("pr")
    )
    for it in range(iters):
        # Join lineage nests once per iteration; truncate it every few
        # rounds exactly like dedup.connected_components does, so a
        # deep fit doesn't re-execute the whole chain per action (on a
        # cluster with a checkpoint dir, checkpoint() is the
        # fault-tolerant equivalent).
        if it > 0 and it % 5 == 0:
            ranks = ranks.localCheckpoint(eager=True)
        dangling = (
            ranks.join(srcs, node_col, "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("__m"))
        )
        inflow = (
            ranks.join(frac, ranks[node_col] == frac["__src"])
            .groupBy("__dst")
            .agg(F.sum(F.col("pr") * F.col("__frac")).alias("__in"))
        )
        ranks = (
            nodes.select(node_col)
            .join(inflow, F.col(node_col) == F.col("__dst"), "left")
            .crossJoin(F.broadcast(dangling))
            .crossJoin(F.broadcast(n_frame))
            .select(
                node_col,
                (
                    (1.0 - damping) / F.col("__n")
                    + damping
                    * (F.coalesce(F.col("__in"), F.lit(0.0)) + F.col("__m") / F.col("__n"))
                ).alias("pr"),
            )
        )
    return ranks


def pagerank_unrolled_sql(
    edges_sql: str,
    nodes_sql: str,
    *,
    iters: int = 3,
    damping: float = 0.85,
) -> str:
    """The identical computation as a DuckDB WITH-chain (oracle twin).
    ``edges_sql`` must yield (src, dst, w); ``nodes_sql`` must yield
    (node)."""
    d = damping
    parts = [
        f"ed AS ({edges_sql})",
        f"nodes AS ({nodes_sql})",
        "ow AS (SELECT src, sum(w) AS ow FROM ed GROUP BY src)",
        "e AS (SELECT ed.src, ed.dst, CAST(ed.w AS DOUBLE) / ow.ow AS frac"
        "      FROM ed JOIN ow USING (src))",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "p0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes)",
    ]
    for i in range(iters):
        parts.append(
            f"d{i} AS (SELECT COALESCE(sum(pr), 0.0) AS m FROM p{i} "
            f"WHERE node NOT IN (SELECT src FROM e))"
        )
        parts.append(
            f"p{i + 1} AS (SELECT n.node, "
            f"{1.0 - d} / (SELECT n FROM nn) + {d} * (COALESCE(s.inflow, 0.0) "
            f"+ (SELECT m FROM d{i}) / (SELECT n FROM nn)) AS pr "
            f"FROM nodes n LEFT JOIN (SELECT e.dst, sum(p.pr * e.frac) AS inflow "
            f"FROM p{i} p JOIN e ON p.node = e.src GROUP BY e.dst) s "
            f"ON n.node = s.dst)"
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT node, pr FROM p{iters}"


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle participation counts via the join-based
    enumeration every distributed engine uses (no per-node adjacency
    materialization):

    1. canonicalize to undirected edges with ``a < b`` (dedup both
       directions, drop self-loops);
    2. wedge join: E(a,b) ⋈ E(b,c) enumerates each candidate path
       with ``a < b < c``;
    3. closure join against E(a,c) keeps actual triangles — each
       triangle found exactly once.

    Scale: the wedge join is the hot spot and its size is Σ deg(v)²
    under this id-ordering; for skewed real graphs swap step 1's order
    for degree-ordering ((deg, id) ascending), which bounds wedges by
    O(m·arboricity) — the enumerated triangle SET is identical either
    way, which is exactly what the oracle hash-check proves. Returns
    (node, n_triangles), nodes in ≥1 triangle only.
    """
    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    und = (
        edges.filter(F.col(src) != F.col(dst))
        .select(a.alias("a"), b.alias("b"))
        .distinct()
    )
    e1 = und.alias("e1")
    e2 = und.alias("e2")
    e3 = und.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
            "left_semi",
        )
        .select(
            F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z")
        )
    )
    per_node = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_node
