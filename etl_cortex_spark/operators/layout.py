"""Z-order (Morton-curve) file layout for multi-column data skipping.

A 100 TB table sorted by one column skips beautifully on that column
and not at all on any other. Interleaving the bits of two columns
into one Morton key and range-partitioning the write on that key
gives every output file a tight bounding box in BOTH dimensions, so
parquet min/max statistics (row-group pushdown, file pruning in
stats-aware catalogs) cut scans for predicates on either column —
the layout trick behind Delta/Iceberg OPTIMIZE ZORDER, built here
from plain DataFrame ops:

- ``morton_key``: a pure codegen expression (fixed-point normalize →
  bit interleave via shift/and/or terms). No UDF, no shuffle.
- ``write_zordered``: ``repartitionByRange`` on the key (one range
  shuffle — the same cost as any global sort-write) + per-partition
  local sort, then a plain parquet write.

The same interleave is emitted as SQL text (``morton_sql``) from one
shared generator, so the DuckDB oracle replays the key bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_cortex_spark.operators.localframe import local_df

BITS = 16  # per-dimension fixed-point resolution


def _normalize(col: Column, lo: float, hi: float) -> Column:
    """Clamp to [lo, hi] and scale to an integer in [0, 2^BITS - 1].
    Bounds are caller-supplied literals (domain knowledge or a cheap
    pre-agg) so the key stays a deterministic pure expression."""
    frac = (F.least(F.greatest(col.cast("double"), F.lit(float(lo))), F.lit(float(hi))) - lo) / (
        hi - lo
    )
    return F.floor(frac * ((1 << BITS) - 1)).cast("long")


def _normalize_sql(expr: str, lo: float, hi: float) -> str:
    return (
        f"CAST(floor((least(greatest(CAST({expr} AS DOUBLE), {float(lo)}), {float(hi)})"
        f" - {float(lo)}) / ({float(hi)} - {float(lo)}) * {(1 << BITS) - 1}) AS BIGINT)"
    )


def morton_key(
    x: Column, y: Column, *, x_range: tuple[float, float], y_range: tuple[float, float]
) -> Column:
    """Interleave the BITS-bit normalizations of x (odd positions) and
    y (even positions) into one 2*BITS-bit key."""
    xi = _normalize(x, *x_range)
    yi = _normalize(y, *y_range)
    key = F.lit(0).cast("long")
    for i in range(BITS):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(xi, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(F.shiftleft(F.shiftright(yi, i).bitwiseAND(F.lit(1)), 2 * i))
    return key


def morton_sql(
    x_expr: str, y_expr: str, *, x_range: tuple[float, float], y_range: tuple[float, float]
) -> str:
    """The identical interleave as DuckDB SQL (oracle twin)."""
    xi = _normalize_sql(x_expr, *x_range)
    yi = _normalize_sql(y_expr, *y_range)
    terms = []
    for i in range(BITS):
        terms.append(f"((({xi} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({yi} >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    *,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    n_files: int = 8,
) -> None:
    """Write df as n_files parquet files clustered along the Morton
    curve of (x, y): one range shuffle, per-file local sort, key
    dropped from the payload."""
    key = morton_key(F.col(x), F.col(y), x_range=x_range, y_range=y_range)
    (
        df.withColumn("__z", key)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def rewrite_multi_file(
    src_file: str,
    dst_dir: str,
    *,
    n_files: int = 8,
) -> int:
    """Rewrite one single-row-group parquet file as a directory of
    ``n_files`` equal row-slices (each its own file/row group), row
    order preserved across the sorted file names.

    Why this exists: a parquet row group is the atomic scan-split unit
    for every engine — a 600k-row table written as ONE row group
    (pyarrow's default for small tables) serializes the whole scan to
    one task in Spark, no matter how many cores the session has, and
    caps DuckDB at intra-row-group morsel parallelism. Real ingest at
    scale never produces this shape (files carry many row groups and
    tables carry many files); this rewrite restores the layout any
    production table would have, so scans parallelize in BOTH engines.
    Driver-side pyarrow (the tables this targets are the small-SF bench
    inputs); the distributed twin of the same operation is
    ``compact_parquet`` below. ``version='2.6'`` preserves
    nanosecond-timestamp columns bit-for-bit. Returns rows written.
    """
    import math
    import os
    import shutil

    import pyarrow.parquet as pq

    table = pq.read_table(src_file)
    shutil.rmtree(dst_dir, ignore_errors=True)
    os.makedirs(dst_dir)
    per = max(1, math.ceil(table.num_rows / n_files))
    for i in range(n_files):
        chunk = table.slice(i * per, per)
        if chunk.num_rows == 0:
            break
        pq.write_table(
            chunk,
            os.path.join(dst_dir, f"part-{i:05d}.parquet"),
            row_group_size=per,
            version="2.6",
        )
    return table.num_rows


def fact_buckets(
    sf_dir: str, per_bucket_mb: int = 12, lo: int = 4, hi: int = 32
) -> int:
    """DATA-SIZED bucket count for a directory's warehouse layouts —
    the sizing rule every real warehouse applies (buckets proportional
    to table bytes, capped by cluster parallelism): one bucket per
    ~``per_bucket_mb`` of the biggest fact (lineitem), rounded up in
    powers of two, clamped to [lo, hi=cores]. ALL fact layouts of one
    directory share the count — equal counts are what make
    bucket-bucket joins exchange-free — so it is derived once from the
    anchor table, not per table. Measured (round 9, BASELINE.md): at
    sf0.1 a 32-bucket layout was 2.2x SLOWER than 8 on q3 (32
    near-empty tasks through every stage), while at sf10 32 buckets
    beat 16 by keeping all of local[32] busy — both ends of the same
    rule. At 100 TB the same formula lands in the thousands."""
    import math
    import os

    path = os.path.join(sf_dir, "lineitem.parquet")
    try:
        if os.path.isdir(path):
            nbytes = sum(
                os.path.getsize(os.path.join(root, f))
                for root, _, files in os.walk(path)
                for f in files
            )
        else:
            nbytes = os.path.getsize(path)
    except OSError:
        return lo
    n = lo
    while n < hi and nbytes > n * per_bucket_mb * 1024 * 1024:
        n *= 2
    return n


def bucketed_fact_name(
    sf_dir: str,
    table: str,
    key: str,
    cols: list[str] | None = None,
    n_buckets: int = 16,
) -> str:
    """The catalog name a `bucketed_fact` layout lives under. Keyed on
    (abs path, table, KEY, cols, buckets) — the key is part of the
    identity because the same table bucketed on two different keys is
    two different layouts (orders-by-orderkey for lineitem joins,
    orders-by-custkey for customer joins: the secondary-projection
    pattern) — plus the pid so concurrent processes cannot rmtree or
    overwrite a table a live sibling is scanning (the tier_scale.py
    `bucketed_table_names` convention, now shared through here)."""
    import hashlib
    import os

    sig = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{table}|{key}|{','.join(cols or ['*'])}|{n_buckets}".encode()
    ).hexdigest()[:8]
    return f"bktf_{table}_{sig}_{os.getpid()}"


def sweep_dead_pid_layouts(wh: str) -> list[str]:
    """Garbage-collect warehouse layout dirs owned by DEAD processes
    (round-8 verdict #3: the pid suffix protects live siblings from
    rmtree races, but nothing ever reclaimed a dead pid's tables, so
    every pytest/bench/driver process left permanent full-table debris
    — 1 GB accumulated by round 8). Matches only the pid-suffixed
    conventions (``bktf_<table>_<8-hex-sig>_<pid>`` from
    ``bucketed_fact_name`` and the older ``bkt_<table>_<8-hex-sig>_
    <pid>``); stable-named dirs are never touched. ``os.kill(pid, 0)``
    probes liveness — ``PermissionError`` means ALIVE (another user's
    process), so only ``ProcessLookupError`` deletes. Returns the
    removed names (test hook).

    Host-locality contract (round-9 ADVICE): the pid probe only sees
    THIS host's processes, so on a shared warehouse (cluster/NFS) a
    live remote sibling's layout would look dead. The layout callers
    below therefore gate the sweep on ``master.startswith("local")``;
    direct callers on a shared dir must not sweep."""
    import os
    import re
    import shutil

    removed: list[str] = []
    try:
        entries = os.listdir(wh)
    except OSError:
        return removed
    for d in entries:
        m = re.match(r"^(?:bktf?|dimf)_\w+_[0-9a-f]{8}_(\d+)$", d)
        if not m:
            continue
        pid = int(m.group(1))
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            shutil.rmtree(os.path.join(wh, d), ignore_errors=True)
            removed.append(d)
        except (PermissionError, OSError):
            pass  # alive (other user) / unprobeable: never delete
    return removed


def bucketed_fact(
    spark,
    sf_dir: str,
    table: str,
    key: str,
    cols: list[str] | None = None,
    n_buckets: int = 16,
) -> DataFrame:
    """The ingest-time bucketed layout of a fact table, built once and
    shared by every query that joins or aggregates on ``key`` — the
    D93 (`scale_bucketed_join`) discipline promoted to a reusable
    loader: pay ONE hash-layout write when the data lands, then every
    downstream join on the key is exchange-free on this side (the scan
    reports ``HashPartitioning(key, n_buckets)``, so EnsureRequirements
    shuffles only the OTHER, usually far smaller, side) and every
    groupBy led by the key needs no exchange either. At 100 TB the big
    fact's per-query shuffle is THE cost a warehouse removes with
    exactly this layout. Callers: tpch.q3/q5 (lineitem on l_orderkey),
    c10 (orders on o_custkey), scale_bucketed_join (both sides).

    ``cols`` stores that projection; ``cols=None`` stores the FULL row
    (scans still column-prune). A real multi-tenant warehouse would
    ingest full rows ONCE and share the layout, but the pid-suffixed
    name makes layouts per-process here, so callers pass the union of
    the columns their query family actually reads (round-8 verdict:
    full-row copies per process were pure debris — q3/q5 read 5 of
    lineitem's 16 columns). ``repartition(n_buckets, key)``
    before the write puts each bucket's rows in one task → exactly one
    file per bucket, the condition for the scan to report its sortBy
    order.

    Falls back to the plain parquet load on ANY failure (read-only
    warehouse dir, catalog quirks): callers get identical ROWS either
    way — only the plan shape differs — so correctness never depends
    on the layout write succeeding.
    """
    import os
    import shutil
    from urllib.parse import urlparse

    from etl_cortex_spark.sources.tables import load_table

    base = load_table(spark, sf_dir, table)
    if cols is not None:
        base = base.select(*cols)
    if os.environ.get("SPARK_GRAFT_NO_BUCKET"):
        # measurement/ops escape hatch: serve the plain scan (identical
        # rows) — the paired bucketed-vs-plain A/B in BASELINE.md flips
        # this within one session so both legs share a JVM and window.
        return base
    name = bucketed_fact_name(sf_dir, table, key, cols, n_buckets)
    try:
        if not spark.catalog.tableExists(name):
            # the catalog is per-session (in-memory) but the warehouse
            # dir persists — clear this name's leftover location first;
            # the pid suffix guarantees no live sibling owns it. Every
            # layout write also sweeps dead siblings' debris, so the
            # warehouse stays bounded by the LIVE process count — but
            # ONLY under a local master: on a cluster the warehouse may
            # be shared and a remote sibling's pid is invisible to this
            # host's liveness probe (sweep docstring).
            wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
            if spark.sparkContext.master.startswith("local"):
                sweep_dead_pid_layouts(wh)
            shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
            (
                base.repartition(n_buckets, key)
                .write.mode("overwrite")
                .bucketBy(n_buckets, key)
                .sortBy(key)
                .format("parquet")
                .saveAsTable(name)
            )
        return spark.table(name)
    except Exception:
        return base


def conformed_dim(spark, name: str, build, sig_key: str) -> DataFrame:
    """An ingest-time DENORMALIZED dimension snapshot — the conformed-
    dim discipline every star-schema warehouse applies: pre-join the
    dimension chain (e.g. supplier ⋈ nation ⋈ region) ONCE when data
    lands and store the flat result, so no query re-pays the chain's
    broadcast-build jobs. The round-12 floor decomposition measured
    tpch_q5 scheduling 5 jobs where its peers schedule 1 — three of
    them the region→nation→supplier broadcast subtree builds, ~28 ms
    scheduler floor each at sf0.1; with the flat dim the query builds
    ONE broadcast from one scan. At 100 TB the dims are still
    broadcast-sized (suppliers grow, but the flat row is as wide as
    the join output the query needed anyway), and the snapshot is
    rebuilt by the same ingest that lands new dim rows.

    ``build`` is a zero-arg callable returning the pre-joined frame —
    ALSO the fallback: on any write/catalog failure the caller gets
    the in-plan join with identical rows, so correctness never
    depends on the layout write (the `bucketed_fact` contract).
    ``sig_key`` disambiguates the stored identity (sf_dir + column
    recipe), pid-suffixed like every layout so concurrent processes
    never rmtree a live sibling's table."""
    import hashlib
    import os
    import shutil
    from urllib.parse import urlparse

    sig = hashlib.md5(sig_key.encode()).hexdigest()[:8]
    tbl = f"dimf_{name}_{sig}_{os.getpid()}"
    try:
        if not spark.catalog.tableExists(tbl):
            wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
            if spark.sparkContext.master.startswith("local"):
                sweep_dead_pid_layouts(wh)
            shutil.rmtree(os.path.join(wh, tbl), ignore_errors=True)
            build().coalesce(1).write.mode("overwrite").format(
                "parquet"
            ).saveAsTable(tbl)
        return spark.table(tbl)
    except Exception:
        return build()


def bucketed_fact_with_delta(
    spark,
    sf_dir: str,
    table: str,
    key: str,
    delta_of,
    cols: list[str] | None = None,
    n_buckets: int = 16,
) -> DataFrame:
    """Incremental maintenance of a ``bucketed_fact`` layout — the
    lakehouse WRITE path at 100 TB (round-8 verdict #5): the initial
    layout write is followed by a bucket-ALIGNED append of a delta
    batch (``mode("append")`` with the identical bucketBy/sortBy spec,
    so each bucket gains a second file containing exactly its keys'
    new rows), after which every join/agg on the key over the
    maintained table is STILL exchange-free — the scan keeps reporting
    ``HashPartitioning(key, n_buckets)`` across multiple files per
    bucket. This is the warehouse answer to streaming/CDC ingest: pay
    a delta-sized aligned write per batch, never a table-sized
    re-shuffle, and never re-shuffle queries either. (Multi-file
    buckets DO forfeit the reported sortBy order — the within-bucket
    Sort is re-done locally, no network; the Exchange is what the
    layout deletes, same contract as ``bucketed_fact``.)

    ``delta_of(base)`` derives the delta frame FROM the base scan so a
    SQL oracle can replay base ∪ delta exactly. Both writes happen in
    one catalog-miss branch, so repeat calls in a session (bench
    best-of-N, plan tests) reuse the maintained table instead of
    appending again. Falls back to ``base ∪ delta`` as plain frames on
    ANY failure — identical rows, only the plan shape differs.
    """
    import os
    import shutil
    from urllib.parse import urlparse

    from etl_cortex_spark.sources.tables import load_table

    base = load_table(spark, sf_dir, table)
    if cols is not None:
        base = base.select(*cols)
    if os.environ.get("SPARK_GRAFT_NO_BUCKET"):
        return base.unionByName(delta_of(base))
    # "incr" folded into the sig input keeps this maintained table's
    # namespace disjoint from the append-free `bucketed_fact` layout of
    # the same (table, key, cols) — and the name still matches the
    # dead-pid sweep pattern.
    name = bucketed_fact_name(sf_dir, f"{table}incr", key, cols, n_buckets)
    try:
        if not spark.catalog.tableExists(name):
            wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
            if spark.sparkContext.master.startswith("local"):
                sweep_dead_pid_layouts(wh)
            shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
            try:
                (
                    base.repartition(n_buckets, key)
                    .write.mode("overwrite")
                    .bucketBy(n_buckets, key)
                    .sortBy(key)
                    .format("parquet")
                    .saveAsTable(name)
                )
                (
                    delta_of(base)
                    .repartition(n_buckets, key)
                    .write.mode("append")
                    .bucketBy(n_buckets, key)
                    .sortBy(key)
                    .format("parquet")
                    .saveAsTable(name)
                )
            except Exception:
                # The two writes are not atomic (round-9 ADVICE): if the
                # delta append dies after the base saveAsTable succeeded,
                # the name is now REGISTERED with base-only rows and every
                # later call in this session would tableExists-hit it and
                # silently miss the delta. Drop the partial table (catalog
                # + files) before falling back, so the next call rebuilds
                # from scratch instead of serving a half-maintained layout.
                try:
                    spark.sql(f"DROP TABLE IF EXISTS {name}")
                except Exception:
                    pass
                shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
                raise
        return spark.table(name)
    except Exception:
        return base.unionByName(delta_of(base))


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    *,
    target_file_mb: int = 128,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-file compaction (the OPTIMIZE-compact half of the layout
    story, next to Z-order): rewrite a directory of many small parquet
    files into ceil(bytes / target) right-sized files, optionally
    re-sorting so min/max stats stay tight after the rewrite.

    File count comes from the actual on-disk byte size (not row
    counts), so the result tracks the real small-files problem:
    streaming sinks and per-partition appends produce kilobyte files
    whose open/footer overhead dominates 100 TB scans. One
    repartition (range if sorted, round-robin otherwise). Returns the
    number of files written.
    """
    import math
    import os

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(src_path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src_path)
    if sort_cols:
        df = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(dst_path)
    return n_files


# --- zone-map file skipping ---------------------------------------------------


def file_stats(spark, path: str, key_col: str):
    """Per-file zone map over a parquet directory: (file, lo, hi,
    n_rows) for ``key_col`` — the stats table Delta/Iceberg keep in
    their metadata, derived here from plain parquet with one
    input_file_name() aggregate. At real scale the stats table has one
    row per file (thousands, not billions) and is itself cheap to
    persist and broadcast."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(key_col).alias("lo"),
            F.max(key_col).alias("hi"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def skipping_scan(spark, path: str, key_col: str, lo, hi, stats=None):
    """Zone-map pruned range scan: read ONLY the files whose
    [lo, hi] key range overlaps the query range, then apply the exact
    predicate to the survivors. With a range-sorted layout
    (``compact_parquet(sort_cols=[key])`` keeps per-file ranges
    disjoint) a narrow range touches one or two files regardless of
    table size — the Delta data-skipping effect from plain ops.

    The matched file list is driver-side state bounded by the FILE
    count (the same class as collected centroids/codebooks — never
    row-scaled); an empty match returns an empty frame with the
    table's schema instead of a read error."""
    from pyspark.sql import functions as F

    if stats is None:
        stats = file_stats(spark, path, key_col)
    files = [
        r["file"]
        for r in stats.filter(
            (F.col("hi") >= F.lit(lo)) & (F.col("lo") <= F.lit(hi))
        ).collect()
    ]
    full = spark.read.parquet(path)
    if not files:
        return full.limit(0)
    return (
        spark.read.schema(full.schema)
        .parquet(*files)
        .filter(F.col(key_col).between(F.lit(lo), F.lit(hi)))
    )


# --- manifest-based snapshot reads (time travel) --------------------------------


def _manifest_version(m: str) -> int:
    """Version number of a ``vN.manifest.json`` path. Manifests MUST be
    ordered by this, never lexicographically: 'v10' sorts before 'v9'
    as a string, so a string-sorted [-1] silently resolves the wrong
    "latest" from version 10 onward (and a writer would then recompute
    and clobber an existing version — data loss)."""
    import os

    return int(os.path.basename(m).split(".")[0][1:])


def _manifests(path: str) -> list:
    """All committed manifests under ``path``, sorted NUMERICALLY by
    version (see `_manifest_version`)."""
    import glob
    import os

    return sorted(
        glob.glob(os.path.join(path, "v*.manifest.json")),
        key=_manifest_version,
    )


def _norm_path_col(col):
    """Normalize a Spark-side file URI (input_file_name() /
    _metadata.file_path) to the plain abspath the manifest keys carry:
    collapse the file: scheme, then percent-decode. The decode is
    F.url_decode, which is FORM decoding — it would turn a literal
    '+' in a path into a space — so literal '+' is pre-escaped to
    %2B first (Spark never encodes a space as '+' in these URIs; a
    '+' in the rendered URI is always a literal path character).
    Round-16 ADVICE #1 + round-17 review. Shared by the lineage tag,
    the position-delete writer and the position-delete read-side
    anti-join, so every (path, pos) producer/consumer pair agrees
    byte-for-byte."""
    from pyspark.sql import functions as F

    return F.url_decode(
        F.regexp_replace(
            F.regexp_replace(col, "^file:/+", "/"), "\\+", "%2B"
        )
    )


def _norm_path_py(uri: str) -> str:
    """Driver-side twin of `_norm_path_col`: collapse the file: scheme
    and percent-decode a Spark-rendered file URI to the plain abspath
    the manifest keys carry. urllib's ``unquote`` (NOT unquote_plus)
    is the Python spelling of the same form-safe decode — a literal
    '+' stays '+'. input_file_name()/_metadata.file_path render
    spaces, '%' and non-ASCII percent-encoded, so an UNDECODED abspath
    never equals a manifest key on such table paths: stats/Bloom maps
    keyed that way silently lose all pruning, and COW affected-file
    sets resolve empty (round-17 ADVICE #1 — the same gap class
    `_norm_path_col` closed Spark-side)."""
    import os
    import re
    from urllib.parse import unquote

    return os.path.abspath(unquote(re.sub("^file:/+", "/", uri)))


class SnapshotCommitConflict(ValueError):
    """Another writer committed this version number first. Appends
    rebase and retry automatically (`snapshot_append`); rewriting
    commits (delete/merge/compact) must re-run against the new head —
    their read set may be stale, so silent retry would be wrong."""


def _commit_manifest(path: str, version: int, meta: dict) -> None:
    """Commit ``meta`` as version ``version`` with CREATE-EXCLUSIVE
    semantics: write to a temp file, then `os.link` it to the final
    name, which fails with FileExistsError if the version already
    exists. A concurrent (or buggy) writer that computes a duplicate
    version number therefore fails LOUDLY instead of silently
    overwriting a committed manifest and orphaning its files.

    Every commit is stamped with its wall-clock time here (ALL write
    paths — append, delete, merge, compact, rollback — flow through
    this commit), which powers `snapshot_version_asof`; the stamp is
    never part of any oracle-compared output."""
    import json
    import os
    import time
    import uuid

    meta.setdefault("committed_at_unix", time.time())
    tmp = os.path.join(
        path, f".v{version}.{uuid.uuid4().hex[:8]}.manifest.tmp"
    )
    with open(tmp, "w") as f:
        # default=str: date/timestamp zone-map bounds persist as ISO
        # strings, which compare correctly (lexicographic == temporal)
        # against string bounds in the scan's range test
        json.dump(meta, f, default=str)
    final = os.path.join(path, f"v{version}.manifest.json")
    try:
        os.link(tmp, final)
    except FileExistsError:
        raise SnapshotCommitConflict(
            f"snapshot commit conflict: version {version} already exists "
            f"at {path} (concurrent writer or version-resolution bug)"
        )
    finally:
        os.remove(tmp)


#: process-local cache of segment payloads keyed by abspath. Segments
#: are IMMUTABLE once written and uniquely named (uuid), so a cached
#: entry can never go stale; the cap only bounds driver memory across
#: a long session touching many tables.
_SEG_CACHE: dict = {}


def _load_segment(path: str, name: str) -> dict:
    """One segment's payload ({files, stats?, blooms?}), cached —
    version walks (history, file_versions, changes) re-resolve the
    same immutable segments over and over; the cache makes an
    N-version walk cost O(segments) JSON reads, not O(N·segments)."""
    import json
    import os

    key = os.path.abspath(os.path.join(path, name))
    seg = _SEG_CACHE.get(key)
    if seg is None:
        with open(key) as f:
            seg = json.load(f)
        if len(_SEG_CACHE) > 4096:
            _SEG_CACHE.clear()
        _SEG_CACHE[key] = seg
    return seg


def _write_segment(path: str, files: list, stats=None, blooms=None) -> str:
    """Write one immutable manifest SEGMENT (round 17 — the Iceberg
    manifest-file idea, closing the round-16 verdict's one weak flag):
    the file list, zone maps and Blooms of ONE commit's batch, written
    once and referenced by name from every subsequent manifest. This
    is what makes commit metadata O(|batch|): an append reserializes
    its own segment plus a small name list, never the table's
    cumulative files/stats/Blooms (layout.py:586/859 in round 16 —
    hundreds of MB of JSON per commit at a million files, paid per
    STREAMING MICRO-BATCH). Returns the segment's basename."""
    import json
    import os
    import uuid

    name = f"seg-{uuid.uuid4().hex[:12]}.segment.json"
    payload: dict = {"files": list(files)}
    if stats:
        payload["stats"] = stats
    if blooms:
        payload["blooms"] = blooms
    tmp = os.path.join(path, f".{name}.tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f, default=str)
    os.replace(tmp, os.path.join(path, name))
    return name


def _resolve_meta(path: str, raw: dict) -> dict:
    """Resolve a manifest to the LOGICAL table state every reader
    plans from: {version, files, stats, blooms, deletes, ...}. Two
    on-disk grammars are honored — the round-17 SEGMENTED form (the
    manifest lists segment names; files/stats/Blooms live in immutable
    segment files, delete entries scope by ``applies_to_segments``)
    and the pre-17 INLINE form (everything in the manifest), so
    existing tables and hand-built fixtures keep reading. Resolution
    preserves commit order: segments concatenate in list order, so
    ``files[-1]`` stays the newest file (`_version_schema`)."""
    if "segments" not in raw:
        return raw
    files: list = []
    stats: dict = {}
    blooms: dict = {}
    for name in raw["segments"]:
        seg = _load_segment(path, name)
        files += seg["files"]
        stats.update(seg.get("stats") or {})
        for c, fb in (seg.get("blooms") or {}).items():
            blooms.setdefault(c, {}).update(fb)
    meta = {k: v for k, v in raw.items() if k != "segments"}
    meta["files"] = files
    if stats:
        meta["stats"] = stats
    if blooms:
        meta["blooms"] = blooms
    if raw.get("deletes"):
        resolved = []
        for d in raw["deletes"]:
            if "applies_to_segments" in d:
                cover: list = []
                for name in d["applies_to_segments"]:
                    cover += _load_segment(path, name)["files"]
                d = {"files": d["files"], "keys": d["keys"], "applies_to": cover}
            resolved.append(d)
        meta["deletes"] = resolved
    return meta


def _load_raw(manifest_path: str) -> dict:
    import json

    with open(manifest_path) as f:
        return json.load(f)


def _load_meta(path: str, manifest_path: str) -> dict:
    return _resolve_meta(path, _load_raw(manifest_path))


def _segments_of(path: str, raw: dict, spark=None,
                 migrated: list | None = None) -> list:
    """The segment-name list a NEW commit builds on. A segmented head
    returns its list; a legacy inline head (pre-17, or a hand-built
    fixture) is MIGRATED: its inline files/stats/Blooms are written
    once as a segment, and every subsequent commit is O(batch). The
    migration pays O(table) metadata exactly once per legacy table.

    ``migrated`` (round-17 ADVICE #2): a caller-owned list the freshly
    written migration segment's name is appended to, so commit paths
    that can FAIL after this point (lost append race, publish/delete
    conflict) can remove the never-referenced segment instead of
    orphaning it until the grace-window sweep — the same no-orphan
    convention the batch segments already follow."""
    if "segments" in raw:
        return list(raw["segments"])
    if not raw.get("files"):
        return []
    name = _write_segment(
        path, raw["files"], raw.get("stats") or None, raw.get("blooms") or None
    )
    if migrated is not None:
        migrated.append(name)
    return [name]


def _rewrite_segments(path: str, raw: dict, drop_abs: set,
                      written: list | None = None) -> list:
    """The segment list of a REWRITING commit (COW delete/merge,
    selective compaction): segments whose files all survive carry BY
    NAME (zero bytes rewritten), segments fully consumed by the
    rewrite drop, and partially-affected segments get ONE replacement
    segment holding their survivors with stats/Blooms filtered to
    match. Write cost is O(|touched segments|), never O(table) — the
    untouched majority of a 100 TB table's metadata is never
    reserialized, matching the data-side COW contract.

    ``written`` (round-18 sweep of the round-17 ADVICE #3 class):
    caller-owned list collecting every segment file this call writes
    (replacements AND a legacy-head migration), so a commit that then
    loses its race can remove the never-referenced metadata instead
    of orphaning it until the grace-window sweep."""
    import os

    out: list = []
    for name in _segments_of(path, raw, migrated=written):
        seg = _load_segment(path, name)
        surviving = [
            f for f in seg["files"] if os.path.abspath(f) not in drop_abs
        ]
        if len(surviving) == len(seg["files"]):
            out.append(name)
            continue
        if not surviving:
            continue
        keep_abs = {os.path.abspath(f) for f in surviving}
        stats = {
            f: v for f, v in (seg.get("stats") or {}).items() if f in keep_abs
        }
        blooms = {
            c: {f: w for f, w in fb.items() if f in keep_abs}
            for c, fb in (seg.get("blooms") or {}).items()
        }
        blooms = {c: fb for c, fb in blooms.items() if fb}
        replacement = _write_segment(
            path, surviving, stats or None, blooms or None
        )
        if written is not None:
            written.append(replacement)
        out.append(replacement)
    return out


#: Tiered auto-consolidation trigger (round 19 — the r18 verdict's
#: lead item): a growing commit merges a trailing RUN of segments only
#: when the run reaches this many entries. 8 keeps the head's segment
#: count ≤ ~fanout+1 under steady appends while each file's metadata
#: is remerged only O(log commits) times (binary-counter amortization).
_SEG_AUTO_FANOUT = 8


def _consolidated_segments(path: str, segments: list,
                           written: list) -> list:
    """AUTOMATIC tiered segment consolidation (round 19): the manifest
    name list grows one segment per commit, and although resolution is
    cached per process, the FIRST resolve of a many-segment manifest
    is O(segments) driver JSON opens — a 100k-commit streaming table
    that never ran `snapshot_rewrite_segments` paid a 100k-file JSON
    walk on first read (the r18 verdict's lead structural item). This
    is Iceberg's manifest-merge tiering folded into the commit path:
    grow a trailing suffix while the segment BEFORE it holds no more
    files than the suffix's running total, and merge the suffix into
    ONE segment when it reaches `_SEG_AUTO_FANOUT` entries. The
    logarithmic-method amortization: segment count stays
    O(fanout + log commits) and each file's metadata is re-merged
    O(log commits) times total — amortized O(|batch|·log) metadata per
    commit, with `snapshot_rewrite_segments` remaining the explicit
    collapse-to-one maintenance call.

    Counts come from `_load_segment` (cached; the list is bounded by
    this very function, so the decision is O(fanout + log) cheap
    reads). The merged segment concatenates files IN LIST ORDER
    (`files[-1]` stays the newest commit's file — the
    `_version_schema` contract) and unions stats/Blooms exactly like
    `_resolve_meta`. The replaced segment FILES stay on disk: older
    manifests and pending delete entries (``applies_to_segments``)
    still reference them by name, and `snapshot_expire`'s liveness
    walk GCs them when nothing does. The merged name is appended to
    the caller-owned ``written`` list so a lost commit race removes
    it (the no-orphan convention).

    Consumers of append-step PREFIX arithmetic (`snapshot_tail`'s
    `_added_files_between`, `_tail_cut_version`) fall back to the
    resolved FILE-set diff when the name list was consolidated — the
    file set is still append-only, which is the actual contract."""
    if len(segments) < _SEG_AUTO_FANOUT:
        return segments
    counts = [len(_load_segment(path, n)["files"]) for n in segments]
    i = len(segments) - 1
    total = counts[i]
    while i > 0 and counts[i - 1] <= total:
        total += counts[i - 1]
        i -= 1
    if len(segments) - i < _SEG_AUTO_FANOUT:
        return segments
    files: list = []
    stats: dict = {}
    blooms: dict = {}
    for name in segments[i:]:
        seg = _load_segment(path, name)
        files += seg["files"]
        stats.update(seg.get("stats") or {})
        for c, fb in (seg.get("blooms") or {}).items():
            blooms.setdefault(c, {}).update(fb)
    merged = _write_segment(path, files, stats or None, blooms or None)
    written.append(merged)
    return segments[:i] + [merged]


def _abandon_rewrite(path: str, staged_dirs: list, segments: list) -> None:
    """No-orphan convention for a REWRITING commit that lost its race
    (round-18 sweep of the round-17 ADVICE #3 class, matching
    append/merge_mor/publish/delete_mor/delete_pos): the staged data
    dirs and freshly written segment files will never be referenced —
    remove them before surfacing SnapshotCommitConflict to the caller
    (who re-runs against the new head)."""
    import contextlib
    import os
    import shutil

    for d in staged_dirs:
        if d:
            shutil.rmtree(d, ignore_errors=True)
    for seg in segments:
        with contextlib.suppress(OSError):
            os.remove(os.path.join(path, seg))


def snapshot_meta(path: str, version: int | None = None) -> dict:
    """PUBLIC resolved-manifest accessor: the logical
    {version, files, stats, blooms, deletes, layout, batch_id} dict of
    a version (default: head). The one supported way for out-of-module
    consumers (postings/IVF lookups, inventory fixtures, tests) to
    read table state — the on-disk grammar (inline vs segmented) is
    this module's private business."""
    import os

    if version is None:
        manifests = _manifests(path)
        if not manifests:
            raise ValueError(f"snapshot_meta: no manifests under {path}")
        target = manifests[-1]
    else:
        target = os.path.join(path, f"v{version}.manifest.json")
        if not os.path.exists(target):
            raise ValueError(
                f"snapshot_meta: version {version} does not exist at {path}"
            )
    return _load_meta(path, target)


def multi_file_stats(spark, path: str, cols: list) -> dict:
    """Per-file zone maps over a parquet directory for SEVERAL columns
    in ONE aggregate pass: {abs_file: {col: [lo, hi]}}. The manifest
    form `snapshot_append(stats_col=[...])` persists — real warehouses
    prune on more than one column (ship date AND order key), and the
    scan cost of deriving N columns' ranges together is the same one
    pass as deriving one."""
    import os

    from pyspark.sql import functions as F

    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
    rows = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
        .collect()
    )
    return {
        _norm_path_py(r["file"]): {
            c: [r[f"lo_{c}"], r[f"hi_{c}"]] for c in cols
        }
        for r in rows
    }


#: manifest Bloom sizing: 8192 bits (128 longs) × 3 hash functions —
#: ~3% false-positive rate at 1k distinct keys per file, degrading
#: gracefully (a saturated Bloom prunes nothing, never wrongly). Real
#: deployments size m to the file's key cardinality; the constant keeps
#: the manifest entry small (128 ints/file) at test scale.
_BLOOM_BITS = 8192


#: Spark types whose CAST(col AS STRING) rendering is byte-identical to
#: Python's str() of the corresponding probe value — the ONLY types the
#: Bloom protocol admits. Booleans ('True' vs 'true'), floats ('1e+20'
#: vs '1.0E20'), dates/timestamps and decimals all render differently
#: between the two sides, which would turn the no-false-negative
#: guarantee into silent empty lookups (round-14 ADVICE #1).
_BLOOM_SAFE_TYPES = {"tinyint", "smallint", "int", "bigint", "string"}


def _bloom_positions_py(value, m: int = _BLOOM_BITS) -> list:
    """The 3 Bloom bit positions of ``value`` — md5-based (the repo's
    engine-portable hash convention), byte-identical to the Spark-side
    expression in `file_blooms`, so the DRIVER can test a query key
    against manifest Blooms without touching the cluster.

    Probe values must be int or str (bool is rejected explicitly — it
    IS an int subclass, and Python renders it 'True' where Spark would
    render 'true'): these are the only Python types whose str() matches
    Spark's CAST(AS STRING) for the column types `file_blooms` admits,
    so restricting BOTH sides is what makes the renderings provably
    identical."""
    import hashlib

    if isinstance(value, bool) or not isinstance(value, (int, str)):
        raise TypeError(
            "bloom probe values must be int or str (got "
            f"{type(value).__name__}): other types render differently "
            "between Python and Spark's CAST(AS STRING), which would "
            "produce silent false negatives"
        )
    return [
        int(hashlib.md5(f"{i}:{value}".encode()).hexdigest()[:8], 16) % m
        for i in range(3)
    ]


def file_blooms(spark, path: str, col: str, m: int = _BLOOM_BITS) -> dict:
    """Per-file BLOOM FILTERS over a parquet directory:
    {abs_file: [m/64 longs]} — the point-lookup complement of the
    range zone map (`multi_file_stats`): min/max prunes ranges, a
    Bloom prunes EQUALITY probes on columns with no range locality
    (ids, hashes, emails — exactly the GDPR-lookup / record-fetch
    keys). Built in ONE aggregate pass: each row explodes to its 3 bit
    positions, positions group map-side into (file, word-slot) bit_or
    partials, and the driver folds ≤ m/64 rows per file into the word
    array — the shuffle carries slot partials, never rows.

    Two contracts enforced here (round-14 ADVICE #1/#2): the column
    must be an INTEGER or STRING type — the only types whose Spark
    CAST(AS STRING) matches Python's str() byte-for-byte, which is
    what lets `snapshot_point_lookup` plan with driver-side hashing
    (anything else raises loudly BEFORE any manifest is written) —
    and NULLs are excluded from the Bloom (NULL never equi-matches,
    so a NULL row can never be the target of a point lookup; without
    the filter the md5-of-NULL positions would group under a NULL
    slot and the driver fold would crash)."""
    import os

    from pyspark.sql import functions as F

    scan = spark.read.parquet(path)
    dtype = dict(scan.dtypes).get(col)
    if dtype not in _BLOOM_SAFE_TYPES:
        raise TypeError(
            f"file_blooms: column {col!r} has type {dtype!r}; manifest "
            f"Blooms support only {sorted(_BLOOM_SAFE_TYPES)} — other "
            "types render differently under Spark CAST(AS STRING) vs "
            "Python str(), which would break the no-false-negative "
            "point-lookup guarantee"
        )
    pos = [
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{i}:"), F.col(col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % m
        for i in range(3)
    ]
    rows = (
        scan.filter(F.col(col).isNotNull())
        .select(
            F.input_file_name().alias("file"),
            F.explode(F.array(*pos)).alias("p"),
        )
        .groupBy("file", (F.col("p") / 64).cast("int").alias("slot"))
        .agg(
            F.bit_or(F.expr("shiftleft(1L, CAST(p % 64 AS INT))")).alias(
                "bits"
            )
        )
        .collect()
    )
    out: dict = {}
    for r in rows:
        f = _norm_path_py(r["file"])
        words = out.setdefault(f, [0] * (m // 64))
        words[r["slot"]] = r["bits"]
    return out


def _bloom_maybe_contains(words, value, m: int = _BLOOM_BITS) -> bool:
    """Driver-side membership test against one manifest Bloom entry.
    True = the file MAY contain the key (read it); a missing/None
    entry is conservatively True. No false negatives by construction:
    every committed row set all three of its bits."""
    if not words:
        return True
    for p in _bloom_positions_py(value, m):
        if not (words[p // 64] >> (p % 64)) & 1:
            return False
    return True


def _version_schema(spark, files: list):
    """The schema a version's single-footer read paths plan with: the
    NEWEST file's (every commit appends its files at the END of the
    manifest list, so ``files[-1]`` belongs to the latest commit).
    Under the protocol's ADDITIVE schema-evolution contract the newest
    commit carries the widest schema; Spark's parquet reader fills
    NULL for schema columns absent from older files, so pre-evolution
    rows surface with NULL in the new columns instead of the new
    columns being silently DROPPED (round-14 ADVICE #4 — the oldest
    file's schema did exactly that). Still exactly ONE footer read to
    plan — the 100k-file claim holds; tables whose history is not
    additive should read via ``snapshot_read(merge_schema=True)``.

    An EMPTY file list (a head whose every file was COW-deleted)
    raises a clear contract error instead of a bare IndexError
    (round-18 ADVICE #1): the protocol has no stored-schema sidecar,
    so a fully emptied table has nothing to plan a frame from."""
    if not files:
        raise ValueError(
            "_version_schema: this version references no data files "
            "(fully deleted table?) — there is no schema to plan an "
            "empty frame from; read a non-empty version instead"
        )
    return spark.read.parquet(files[-1]).schema


def snapshot_point_lookup(spark, path: str, col: str, value, version: int | None = None):
    """BLOOM-PRUNED point lookup on the versioned table (round 14 —
    the equality twin of `snapshot_scan`): the manifest's per-file
    Blooms (written by ``snapshot_append(..., bloom_col=)``) decide
    which files MAY contain ``col = value``; only those are opened and
    the exact predicate filters them. Planning is one JSON read plus
    3·|files| driver-side bit tests — no footer, no data file touched
    to plan — and the Bloom guarantees no false negatives, so the
    result equals the full scan's. At 100 TB this is the record-fetch
    / GDPR-locate path: a single-key probe over a table whose key has
    no range locality touches the handful of false-positive files
    instead of everything the zone maps can't exclude."""
    import json
    import os

    from pyspark.sql import functions as F

    if version is None:
        manifests = _manifests(path)
        if not manifests:
            raise ValueError(f"snapshot_point_lookup: no manifests under {path}")
        target = manifests[-1]
    else:
        target = os.path.join(path, f"v{version}.manifest.json")
        if not os.path.exists(target):
            raise ValueError(
                f"snapshot_point_lookup: version {version} does not exist at {path}"
            )
    meta = _load_meta(path, target)
    _require_no_renames(meta, "snapshot_point_lookup")
    blooms = meta.get("blooms", {}).get(col, {})
    keep = [
        fp
        for fp in meta["files"]
        if _bloom_maybe_contains(blooms.get(os.path.abspath(fp)), value)
    ]
    schema = _version_schema(spark, meta["files"])
    if not keep:
        return local_df(spark, [], schema)
    # Blooms stay valid under merge-on-read (a deleted key's bits may
    # still be set — false-positive direction only, never a miss); the
    # delete anti-join applies after pruning
    return _apply_mor_deletes(spark, meta, keep, schema).filter(
        F.col(col) == F.lit(value)
    )


def _stats_range(entry, col: str, legacy_ok: bool = False):
    """A file's [lo, hi] for ``col`` from a manifest stats entry, or
    None (conservative: never prune) when the entry doesn't carry that
    column. The round-14 per-column dict form is always honored; the
    round-13 legacy form (one UNLABELED [lo, hi] list per file) is
    honored only when the caller passes ``legacy_ok=True`` — i.e. only
    `snapshot_scan`, the single-column scan such manifests were
    written for. Every other consumer (`snapshot_scan_multi`, the
    ``__bucket`` pruning in postings/IVF lookups) treats a legacy list
    as None: the list's column identity is unknown there, and pruning
    against the WRONG column's bounds silently drops matching files
    (round-14 ADVICE #3)."""
    if entry is None:
        return None
    rng = entry.get(col) if isinstance(entry, dict) else (
        entry if legacy_ok else None  # legacy unlabeled [lo, hi]
    )
    # an all-NULL file records [None, None] (min/max ignore NULLs —
    # and a bucket layout on a NULLABLE key deterministically produces
    # such a file: repartitionByRange sorts NULLs first). None bounds
    # cannot be compared — treat them as "no stats", never prune
    # (round-17 review)
    if rng is not None and (rng[0] is None or rng[1] is None):
        return None
    return rng


def snapshot_append(
    spark, df, path: str, batch_id: int | None = None,
    stats_col=None, bloom_col: str | None = None,
) -> int:
    """MANIFEST-BASED versioned append (round 13 — the lakehouse
    capability the layout family was missing): each call writes the
    batch's parquet files under ``path/data/`` and commits a new
    manifest ``path/vN.manifest.json`` resolving to EVERY file visible
    at version N. Reads never list the data directory — they resolve
    exactly one manifest — so a reader pinned to version N is
    untouched by later appends (snapshot isolation) and historical
    versions stay queryable after new commits (time travel). This is
    the Iceberg/Delta snapshot mechanism reduced to its load-bearing
    core: an immutable file log as the table's source of truth, no
    table-sized rewrite per commit, O(|batch|) data written per
    version.

    METADATA is O(|batch|) per commit too (round 17 — the round-16
    verdict's one weak flag): the batch's file list, zone maps and
    Blooms are written ONCE as an immutable SEGMENT file
    (``seg-*.segment.json``, `_write_segment`), and the manifest is a
    small name list referencing the surviving segments — Iceberg's
    manifest-file/manifest-list split. The old form reserialized the
    cumulative files+stats+Blooms per commit: invisible at fixture
    scale, hundreds of MB of driver JSON per streaming micro-batch at
    a million files. The name list grows O(#commits), not O(files);
    a full `snapshot_compact` collapses it to one segment (the
    rewrite_manifests maintenance analogue), and `snapshot_expire`
    GCs segments no surviving manifest references. Pre-17 INLINE
    manifests stay readable (`_resolve_meta`) and migrate to a
    segment on their next commit (`_segments_of`).

    Returns the committed version number. Concurrency stance (round
    14): appends are OPTIMISTICALLY CONCURRENT — the exclusive-create
    commit detects a lost race and the append rebases onto the new
    head and retries (its read set is just "the previous manifest",
    so the retry is always correct; pinned by a real multi-writer
    pytest). Rewriting commits (delete/merge/compact) surface
    `SnapshotCommitConflict` instead, because their affected-file
    computation is stale after a concurrent commit — the caller
    re-runs against the new head. A production build swaps the
    link-create for an atomic-swap catalog; the READ protocol is
    unchanged by that upgrade, which is the point of the design.

    ``batch_id`` makes the commit IDEMPOTENT for streaming replays
    (round 13, the foreachBatch contract): a manifest already carrying
    this batch_id means the batch was fully committed — the replay
    returns that version without writing, so a crash-and-replay can
    never double-append a micro-batch.

    ``stats_col`` (a column name or a LIST of them, round 14) records
    a per-file ZONE MAP in the manifest (``"stats": {file: {col: [lo,
    hi]}}`` over the new batch's files, merged with the previous
    manifest's) — the Iceberg manifest-stats idea: ``snapshot_scan`` /
    ``snapshot_scan_multi`` then prune files by predicate range from
    the MANIFEST alone, no footer reads, no directory listing. Files
    committed without stats are conservatively never pruned.

    ``bloom_col`` (round 14) additionally records a per-file BLOOM
    FILTER over that column (``"blooms": {col: {file: [words]}}``) —
    the equality-probe complement of the range zone map:
    ``snapshot_point_lookup`` prunes files for ``col = value`` with
    driver-side bit tests, no false negatives. Range stats and Blooms
    compose (a scan can use both)."""
    import glob
    import json
    import os
    import uuid

    if batch_id is not None:
        # the retired-batch ledger survives manifest expiry: a replay
        # of a batch OLDER than retention must stay a no-op (round-14
        # ADVICE #5b) — it returns the original version number (whose
        # manifest may be expired; pinning to it fails loudly, which
        # is the retention contract)
        committed = snapshot_batch_version(path, batch_id)
        if committed is not None:
            return committed
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    # PARTITION-EVOLUTION layout (round 16, `snapshot_set_layout`): a
    # layout spec on the head manifest applies to FUTURE appends only —
    # cluster THIS batch's rows into files by range on the layout
    # columns (one O(|batch|) shuffle, never a table rewrite) and
    # auto-record their zone maps, so new-generation files prune on
    # the layout key from the manifest alone. Pre-evolution files keep
    # their old layout and whatever stats their commits recorded.
    manifests0 = _manifests(path)
    layout = None
    constraints0: dict = {}
    if manifests0:
        with open(manifests0[-1]) as f:
            head0 = json.load(f)
        layout = head0.get("layout")
        constraints0 = head0.get("constraints") or {}
    # CHECK constraints (round 19 — Delta's ADD CONSTRAINT contract):
    # validate the BATCH before any file is staged, one aggregate over
    # the micro-batch per append; SQL semantics — NULL passes, only an
    # expression that evaluates FALSE is a violation
    _check_constraints(df, constraints0, "snapshot_append")
    staged = os.path.join(path, "data", f"batch-{uuid.uuid4().hex[:12]}")
    to_write = df
    if layout:
        lexprs, _ = _layout_cluster_exprs(layout)
        to_write = df.repartitionByRange(
            max(int(layout.get("files_per_batch", 4)), 1), *lexprs
        ).sortWithinPartitions(*lexprs)
    to_write.write.mode("errorifexists").parquet(staged)
    new_files = sorted(glob.glob(os.path.join(staged, "*.parquet")))
    if not new_files:
        raise ValueError("snapshot_append: batch wrote no parquet files")
    batch_stats: dict = {}
    batch_blooms: dict = {}
    try:
        cols = []
        if stats_col is not None:
            cols = [stats_col] if isinstance(stats_col, str) else list(stats_col)
        if layout:
            # zone maps on the SOURCE columns: monotone transforms keep
            # each clustered file a contiguous source range, so source
            # stats prune source-column predicates (hidden partitioning)
            _, lsrc = _layout_cluster_exprs(layout)
            cols += [c for c in lsrc if c not in cols]
        if cols:
            batch_stats = multi_file_stats(spark, staged, cols)
        espec = _layout_expr_specs(layout)
        if espec:
            # transform-value zone maps (bucket(n) hidden partitioning)
            for f, entry in multi_file_expr_stats(spark, staged, espec).items():
                batch_stats.setdefault(f, {}).update(entry)
        if bloom_col is not None:
            batch_blooms = file_blooms(spark, staged, bloom_col)
    except Exception:
        # stats/Bloom derivation failed AFTER the data files were
        # staged (e.g. a Bloom-unsafe column type, raised loudly by
        # file_blooms) — the batch will never be referenced, so remove
        # it instead of leaving orphans (round-14 ADVICE #5a)
        import shutil

        shutil.rmtree(staged, ignore_errors=True)
        raise
    # ONE segment per batch (round 17 — commit metadata is O(|batch|)):
    # the batch's files, zone maps and Blooms are serialized exactly
    # once, here; every manifest from now on references this segment by
    # NAME. The old form reserialized the table's full cumulative
    # files+stats+Blooms per commit — O(table files) of driver JSON per
    # micro-batch at a million files (the round-16 weak flag).
    batch_seg = _write_segment(
        path,
        new_files,
        batch_stats or None,
        {bloom_col: batch_blooms} if bloom_col is not None and batch_blooms else None,
    )

    # legacy-head migration segments written by _segments_of inside
    # the retry loop; a lost race strands the attempt's migration
    # (the winner's head is segmented, so the retry never references
    # it) — track and drop stale ones (round-17 ADVICE #2)
    migrations: list = []

    def _drop_migrations():
        import contextlib

        for name in migrations:
            with contextlib.suppress(OSError):
                os.remove(os.path.join(path, name))
        migrations.clear()

    def _abandon():
        # OUR staged files and segment will never be referenced —
        # remove them now instead of leaving re-vacuumable orphans
        # (round-14 ADVICE #5a)
        import contextlib
        import shutil

        shutil.rmtree(staged, ignore_errors=True)
        _drop_migrations()
        with contextlib.suppress(OSError):
            os.remove(os.path.join(path, batch_seg))

    # OPTIMISTIC CONCURRENCY (round 14): an append's read set is only
    # "the previous manifest", so losing the commit race is always
    # recoverable — re-resolve the new head (one JSON read; the staged
    # data files and segment are already written and conflict-free by
    # uuid) and re-attempt. Rewriting commits (delete/merge/compact) do
    # NOT get this: their affected-file computation is stale after a
    # concurrent commit, so they surface SnapshotCommitConflict and
    # the caller re-runs against the new head.
    for attempt in range(25):
        # migrations written by a LOST attempt reference a superseded
        # head (the race winner's manifest is segmented) — unreferenced
        # by construction, so drop before re-resolving
        _drop_migrations()
        manifests = _manifests(path)
        if attempt and batch_id is not None:
            # a racing replay of OUR batch may have won a commit since
            # the pre-staging idempotence walk — re-check the history
            # (and the ledger: an expire could also have run meanwhile)
            committed = snapshot_batch_version(path, batch_id)
            if committed is not None:
                _abandon()
                return committed
        prev_segments: list = []
        prev_deletes: list = []
        prev_pos: list = []
        prev_renames: list = []
        version = 1
        if manifests:
            latest = _load_raw(manifests[-1])
            prev_segments = _segments_of(path, latest, migrated=migrations)
            # pending equality deletes carry UNCHANGED (by reference —
            # their applies_to sets exclude this batch's files, so
            # appended rows keep their keys: the MOR sequence rule)
            prev_deletes = latest.get("deletes") or []
            prev_pos = latest.get("pos_deletes") or []
            # rename events carry too: this batch's files are NOT in
            # any event's cover (they write the logical names
            # physically), so appends never grow the mapping debt
            prev_renames = latest.get("renames") or []
            version = _manifest_version(manifests[-1]) + 1
        if (latest.get("layout") if manifests else None) != layout:
            # the layout spec changed between staging and commit — the
            # batch was clustered under a superseded spec; restaging
            # is the caller's call (the rewriting-commit convention)
            _abandon()
            raise SnapshotCommitConflict(
                f"snapshot_append: table layout changed concurrently at "
                f"{path} — the staged batch was clustered under the old "
                "spec; re-run the append"
            )
        if ((latest.get("constraints") or {}) if manifests else {}) != constraints0:
            # a constraint added between validation and commit: the
            # batch was validated against a superseded contract set
            _abandon()
            raise SnapshotCommitConflict(
                f"snapshot_append: table constraints changed concurrently "
                f"at {path} — the batch was validated against the old "
                "set; re-run the append"
            )
        # tiered auto-consolidation (round 19): merged segments written
        # by a LOST attempt are stale exactly like migration segments —
        # track them in the same per-attempt drop list
        segs = _consolidated_segments(
            path, prev_segments + [batch_seg], migrations
        )
        meta = {"version": version, "segments": segs}
        if prev_deletes:
            meta["deletes"] = prev_deletes
        if prev_pos:
            meta["pos_deletes"] = prev_pos
        if prev_renames:
            meta["renames"] = prev_renames
        if constraints0:
            meta["constraints"] = constraints0
        if layout:
            meta["layout"] = layout
        if batch_id is not None:
            meta["batch_id"] = batch_id
        _stamp_recent_batches(
            meta, latest if manifests else {}, version - 1, batch_id,
            path=path,
        )
        try:
            _commit_manifest(path, version, meta)
            if batch_seg not in segs:
                # the consolidation merged this batch's own fresh
                # segment into the new tier in the same commit —
                # no manifest (this or any older) references it
                import contextlib

                with contextlib.suppress(OSError):
                    os.remove(os.path.join(path, batch_seg))
            return version
        except SnapshotCommitConflict:
            continue
    _abandon()  # never-referenced: no orphan
    raise SnapshotCommitConflict(
        f"snapshot_append: lost the commit race 25 times at {path} — "
        "writer contention is beyond what the file protocol is for; "
        "use a catalog service"
    )


def snapshot_read(
    spark, path: str, version: int | None = None, merge_schema: bool = False
):
    """Read a versioned table AS OF ``version`` (default: latest):
    parse one manifest, scan exactly its file set. A version committed
    after this reader resolved its manifest can never change the
    result — snapshot isolation from immutability alone.

    ``merge_schema=True`` (round 14) resolves the UNION of all the
    version's file schemas — the schema-evolution read: commits may
    add columns over time (the Delta/Iceberg additive-evolution
    contract) and rows from pre-evolution files surface NULL for the
    new columns. Off by default because schema merging pays a footer
    read per file; turn it on when the table's history is known to
    span an evolution."""
    import json
    import os

    if version is None:
        manifests = _manifests(path)
        if not manifests:
            raise ValueError(f"snapshot_read: no manifests under {path}")
        target = manifests[-1]
    else:
        target = os.path.join(path, f"v{version}.manifest.json")
        if not os.path.exists(target):
            raise ValueError(
                f"snapshot_read: version {version} does not exist at {path}"
            )
    meta = _load_meta(path, target)
    files = meta["files"]
    if meta.get("renames"):
        # metadata-only renamed table (round 19): resolve the logical
        # view by file generation; cannot coexist with MOR entries
        # (rename refuses on MOR tables and MOR ops refuse on renames)
        return _read_with_renames(spark, path, meta, merge_schema)
    if meta.get("deletes") or meta.get("pos_deletes"):
        # merge-on-read table: the equality/position-delete anti-joins
        # resolve the live rows (schema merging is folded into
        # _version_schema's newest-file resolution there)
        return _apply_mor_deletes(
            spark, meta, files, _version_schema(spark, files)
        )
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*files)


def _check_reserved_cols(schema, names: tuple, op: str) -> None:
    """The position-delete machinery reserves ``_file``/``_pos``
    (delete-file columns, `keep_pos_tags` output) and ``__pf``/``__pp``
    (scan-time tags); a data column with one of those names would turn
    the read-side anti-join into an ambiguous-column
    AnalysisException — or worse, a silently wrong join (round-17
    ADVICE #4). Raise loudly at the boundary instead, alongside the
    Bloom/µunit type contracts this protocol already documents."""
    # casefolded: Spark resolves column names case-insensitively by
    # default, so a data column `_FILE` clashes exactly like `_file`
    lowered = {n.lower() for n in names}
    clash = [f for f in schema.fieldNames() if f.lower() in lowered]
    if clash:
        raise ValueError(
            f"{op}: table schema contains reserved column name(s) "
            f"{clash} — the position-delete protocol reserves "
            f"{sorted(set(names))} for its (path, row_index) plumbing; "
            "rename the column(s) before using position deletes"
        )


def _apply_mor_deletes(spark, meta: dict, files: list, schema,
                       tag_versions: dict | None = None,
                       keep_pos_tags: bool = False):
    """Resolve the LIVE rows of a merge-on-read version: scan ``files``
    and anti-join each against the equality-delete files that COVER it
    (an entry covers exactly the data files present when the delete
    committed — ``applies_to`` — which is the Iceberg sequence-number
    rule reduced to sets: rows APPENDED after a delete keep their keys
    even if a prior delete named them). Files are grouped by their
    covering-entry signature so the plan holds one scan + one
    broadcast anti-join per distinct coverage, not per file; delete
    key sets are small by contract (a delete names keys, not rows), so
    every anti-join build side is broadcast-sized.

    ``tag_versions`` (round 16 — `snapshot_read_lineage`): abs file →
    commit version; when given, every row gains ``_commit_version``
    via a broadcast join of the manifest-sized (file, version) dim on
    ``input_file_name()`` projected AT SCAN TIME (the snapshot_merge
    rule: after a shuffle it returns ''). A file-dim join, not a
    literal map expression, so a 100k-file manifest costs a 100k-row
    broadcast, never a 100k-node plan.

    POSITION deletes (round 17 — Iceberg v2's other delete form, for
    keyless tables): ``meta["pos_deletes"]`` entries name (file, pos)
    pairs directly; every scanned row is tagged with its normalized
    ``_metadata.file_path`` + ``_metadata.row_index`` AT SCAN TIME and
    anti-joined against the pos-delete set (rows-sized by contract —
    a pos delete names rows, broadcast build). Position and equality
    deletes compose on the same version."""
    import os

    from functools import reduce

    from pyspark.sql import functions as F

    lineage_dim = None
    if tag_versions is not None:
        # '_commit_version' is the lineage OUTPUT column — a data
        # column with that name collides exactly like the '__file'
        # join key this guard was added for (round-18 ADVICE #2)
        _check_reserved_cols(
            schema, ("__file", "_commit_version"), "_apply_mor_deletes"
        )
        lineage_dim = local_df(
            spark,
            [(k, int(v)) for k, v in tag_versions.items()],
            "__file string, _commit_version int",
        )
    pos_entries = meta.get("pos_deletes") or []
    pos_keys = None
    if pos_entries or keep_pos_tags:
        _check_reserved_cols(
            schema, ("_file", "_pos", "__pf", "__pp"), "_apply_mor_deletes"
        )
    if pos_entries:
        pos_files = [p for d in pos_entries for p in d["files"]]
        pos_keys = spark.read.parquet(*pos_files).select("_file", "_pos")
    # keep_pos_tags (round 17 — the CDF's pos-delete pre-image read):
    # surface each surviving row's normalized (path, row_index) as
    # ``_file``/``_pos`` output columns, so a caller can semi-join a
    # position-delete entry against the LIVE view of the prior version

    # file paths render PERCENT-ENCODED as file:/ or file:/// URIs (a
    # space is %20, '%' is %25, non-ASCII is UTF-8 escaped): normalize
    # with the shared '+'-safe helper so the dim/delete keys match
    # (round-16 ADVICE #1, round-17 review)
    _norm_path = _norm_path_col

    def _scan(fs):
        part = spark.read.schema(schema).parquet(*fs)
        extra = []
        if lineage_dim is not None:
            # input_file_name()/metadata cols projected AT SCAN TIME
            extra.append(_norm_path(F.input_file_name()).alias("__file"))
        if pos_keys is not None or keep_pos_tags:
            extra.append(
                _norm_path(F.col("_metadata.file_path")).alias("__pf")
            )
            extra.append(F.col("_metadata.row_index").alias("__pp"))
        if extra:
            part = part.select("*", *extra)
        if pos_keys is not None:
            part = part.join(
                F.broadcast(pos_keys),
                (F.col("__pf") == pos_keys["_file"])
                & (F.col("__pp") == pos_keys["_pos"]),
                "left_anti",
            )
        if pos_keys is not None and not keep_pos_tags:
            part = part.drop("__pf", "__pp")
        elif keep_pos_tags:
            part = part.withColumnRenamed("__pf", "_file").withColumnRenamed(
                "__pp", "_pos"
            )
        if lineage_dim is not None:
            # LEFT join, not inner: a residual path mismatch surfaces
            # as a NULL _commit_version in an audit-facing read — loud
            # in any downstream check — instead of silently dropping
            # the affected rows (round-16 ADVICE #1)
            part = part.join(
                F.broadcast(lineage_dim), "__file", "left"
            ).drop("__file")
        return part

    deletes = meta.get("deletes") or []
    if not files:
        out = local_df(spark, [], schema)
        if lineage_dim is not None:
            out = out.withColumn("_commit_version", F.lit(None).cast("int"))
        if keep_pos_tags:
            out = out.withColumn("_file", F.lit(None).cast("string"))
            out = out.withColumn("_pos", F.lit(None).cast("long"))
        return out
    if not deletes:
        return _scan(files)
    cover_sets = [
        {os.path.abspath(p) for p in d["applies_to"]} for d in deletes
    ]
    groups: dict = {}
    for fp in files:
        sig = tuple(
            i for i, s in enumerate(cover_sets) if os.path.abspath(fp) in s
        )
        groups.setdefault(sig, []).append(fp)
    parts = []
    for sig, fs in groups.items():
        part = _scan(fs)
        for i in sig:
            keys = spark.read.parquet(*deletes[i]["files"])
            part = part.join(
                F.broadcast(keys), deletes[i]["keys"], "left_anti"
            )
        parts.append(part)
    return reduce(lambda a, b: a.unionByName(b), parts)


def snapshot_file_versions(path: str, version: int | None = None) -> dict:
    """abs data file → the version whose commit FIRST listed it,
    walking manifests 1..version (incremental first-seen, one JSON
    read per surviving manifest). Files whose introducing manifest is
    past retention resolve to the oldest SURVIVING manifest that lists
    them — the honest answer once history is erased."""
    import json
    import os

    seen: dict = {}
    for m in _manifests(path):
        v = _manifest_version(m)
        if version is not None and v > version:
            break
        meta = _load_meta(path, m)
        for fp in meta["files"]:
            a = os.path.abspath(fp)
            if a not in seen:
                seen[a] = v
    return seen


def snapshot_history(spark, path: str):
    """TABLE-HISTORY metadata view (round 16 — Iceberg's
    history/snapshots metadata tables, Delta's DESCRIBE HISTORY, on
    the D102 protocol): one row per SURVIVING manifest with the
    bookkeeping an operator reads before touching a table — version,
    file count, files added/removed vs the previous surviving
    version, the streaming batch_id (NULL for batch commits), pending
    equality-delete entries, and whether a layout spec is in force.
    Driver state is manifest-sized (one JSON read per version, no
    data file touched — the same cost class as every planner path
    here). Wall-clock commit stamps exist in the manifests but are
    deliberately NOT emitted: they are oracle-unstable by nature;
    `snapshot_version_asof` is the time-keyed lookup."""
    import json
    import os

    rows = []
    prev: set = set()
    for m in _manifests(path):
        meta = _load_meta(path, m)
        cur = {os.path.abspath(p) for p in meta["files"]}
        bid = meta.get("batch_id")
        rows.append(
            (
                int(meta["version"]),
                len(cur),
                len(cur - prev),
                len(prev - cur),
                int(bid) if bid is not None else None,
                # pending MOR debt across BOTH delete families (round-17
                # review: a position-delete commit must not read as a
                # metadata no-op in the audit view)
                len(meta.get("deletes") or [])
                + len(meta.get("pos_deletes") or []),
                "layout" in meta,
            )
        )
        prev = cur
    return local_df(
        spark,
        rows,
        "version int, n_files int, n_added int, n_removed int, "
        "batch_id bigint, n_delete_entries int, has_layout boolean",
    )


def snapshot_read_lineage(spark, path: str, version: int | None = None):
    """ROW-LINEAGE read (round 16 — Delta's ``_commit_version`` /
    Iceberg's file-provenance metadata column on the D102 protocol):
    the table AS OF ``version`` with every row tagged
    ``_commit_version`` = the version whose commit ADDED the row's
    file. This is what makes a snapshot table auditable row-by-row —
    "which ingest batch produced this training document" without a
    provenance column baked into the data — and it composes with the
    protocol: merge-on-read deletes resolve normally (survivors keep
    their original version tag), pinned reads tag against their own
    version's history.

    Contract: FILE provenance, deliberately — a COW delete/merge or a
    compaction re-stamps the rows it rewrites with the rewriting
    version (the rewrite is a new commit of new files; pinned in
    pytest). Iceberg v3's durable per-row ids survive rewrites; that
    upgrade changes this function alone, not the protocol."""
    import json
    import os

    if version is None:
        manifests = _manifests(path)
        if not manifests:
            raise ValueError(f"snapshot_read_lineage: no manifests under {path}")
        target = manifests[-1]
        version = _manifest_version(target)
    else:
        target = os.path.join(path, f"v{version}.manifest.json")
        if not os.path.exists(target):
            raise ValueError(
                f"snapshot_read_lineage: version {version} does not exist"
            )
    meta = _load_meta(path, target)
    _require_no_renames(meta, "snapshot_read_lineage")
    files = meta["files"]
    schema = _version_schema(spark, files) if files else None
    if not files:
        raise ValueError(f"snapshot_read_lineage: empty files at v{version}")
    return _apply_mor_deletes(
        spark, meta, files, schema,
        tag_versions=snapshot_file_versions(path, version=version),
    )


def snapshot_delete_mor(spark, path: str, predicate, key_cols) -> int:
    """MERGE-ON-READ DELETE (round 15 — the OTHER delete the lakehouse
    formats offer, Iceberg v2 equality deletes / Delta deletion
    vectors): instead of rewriting every file containing a match
    (`snapshot_delete`'s COW contract), commit a tiny EQUALITY-DELETE
    file holding the matched rows' key tuples; every data file is
    carried by REFERENCE and readers anti-join the delete keys at scan
    time. Write cost is O(|matched keys|) — at 100 TB a same-day GDPR
    erasure costs kilobytes instead of rewriting the files the user's
    rows live in — in exchange for a per-read anti-join until the next
    `snapshot_compact`, which APPLIES pending deletes and clears them
    (exactly Iceberg's COW-vs-MOR tradeoff; choose per table by
    read/write ratio).

    Scope rule (the Iceberg sequence-number semantics, reduced to
    sets): the delete applies to the files PRESENT at delete time
    (``applies_to``); rows appended later keep their keys even when a
    prior delete named them. NULL-predicate rows are KEPT (3VL, same
    as COW) and NULL keys are excluded from the delete set (NULL never
    equi-matches — an anti-join on a NULL key drops nothing anyway).
    Returns the committed version."""
    import glob
    import json
    import os
    import uuid

    from pyspark.sql import functions as F

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    manifests = _manifests(path)
    if not manifests:
        raise ValueError(f"snapshot_delete_mor: no manifests under {path}")
    raw = _load_raw(manifests[-1])
    _require_no_renames(raw, "snapshot_delete_mor")
    latest = _resolve_meta(path, raw)
    version = _manifest_version(manifests[-1]) + 1
    matched = F.coalesce(predicate, F.lit(False))
    # matched keys are resolved against the CURRENT live rows (pending
    # deletes honored), so deleting an already-deleted key is a no-op
    live = _apply_mor_deletes(
        spark, latest, latest["files"], _version_schema(spark, latest["files"])
    )
    del_keys = live.filter(matched).select(*keys).distinct()
    notnull = None
    for k in keys:
        c = F.col(k).isNotNull()
        notnull = c if notnull is None else (notnull & c)
    del_keys = del_keys.filter(notnull)
    staged = os.path.join(path, "data", f"eqdel-{uuid.uuid4().hex[:12]}")
    # coalesce(1): a delete file is keys-sized by contract — one file
    # keeps the manifest entry and the read-side broadcast build tiny
    del_keys.coalesce(1).write.mode("errorifexists").parquet(staged)
    del_files = sorted(glob.glob(os.path.join(staged, "*.parquet")))
    # O(batch) commit metadata (round 17): data files, stats and Blooms
    # carry BY SEGMENT REFERENCE; the delete entry scopes its coverage
    # by the same segment names instead of re-listing every table file
    migrations: list = []
    prev_segments = _segments_of(path, raw, migrated=migrations)
    meta = {
        "version": version,
        "segments": prev_segments,
        "deletes": (raw.get("deletes") or [])
        + [
            {
                "files": del_files,
                "keys": keys,
                "applies_to_segments": prev_segments,
            }
        ],
    }
    for carry in ("pos_deletes", "layout"):
        if carry in raw:
            meta[carry] = raw[carry]
    _stamp_recent_batches(meta, raw, version - 1, path=path)
    try:
        _commit_manifest(path, version, meta)
    except SnapshotCommitConflict:
        # no-orphan convention (round-17 ADVICE #3, matching
        # snapshot_append/_merge_mor/_publish): the staged delete file
        # and any legacy-head migration segment will never be
        # referenced — remove them before surfacing the conflict
        import contextlib
        import shutil

        shutil.rmtree(staged, ignore_errors=True)
        for seg in migrations:
            with contextlib.suppress(OSError):
                os.remove(os.path.join(path, seg))
        raise
    return version


def snapshot_delete_pos(spark, path: str, predicate) -> int:
    """POSITION DELETE (round 17 — Iceberg v2's second delete form,
    the one `snapshot_delete_mor`'s equality keys cannot express):
    commit a tiny (file, pos) delete file naming the matched ROWS of
    the current version's data files — no key column required, so
    row-level deletes work on KEYLESS tables (raw crawl shards,
    event logs, anything pre-dedup). Readers anti-join every scanned
    row's ``_metadata.file_path``/``row_index`` against the set;
    `snapshot_compact` applies and clears the entries exactly like
    equality deletes, and the two forms COMPOSE on one version (a
    GDPR key erasure and a bad-span position retraction can both be
    pending).

    Scope comes free from the addressing: positions name files
    explicitly, so rows appended later are untouched (their files are
    not in the set) — no applies_to machinery needed. Write cost is
    O(|matched rows|); 3VL as ever (NULL predicate = keep; the matched
    set is computed with coalesce(predicate, false)). Positions are
    parquet row indexes — stable because data files are immutable by
    protocol. Returns the committed version."""
    import glob
    import os
    import uuid

    from pyspark.sql import functions as F

    manifests = _manifests(path)
    if not manifests:
        raise ValueError(f"snapshot_delete_pos: no manifests under {path}")
    raw = _load_raw(manifests[-1])
    _require_no_renames(raw, "snapshot_delete_pos")
    latest = _resolve_meta(path, raw)
    version = _manifest_version(manifests[-1]) + 1
    matched = F.coalesce(predicate, F.lit(False))
    schema = _version_schema(spark, latest["files"])
    # all four names, not just the two this writer uses: a committed
    # pos delete makes EVERY later read go through _apply_mor_deletes'
    # __pf/__pp scan tags, so admitting those here would commit a
    # table its own reads then refuse
    _check_reserved_cols(
        schema, ("_file", "_pos", "__pf", "__pp"), "snapshot_delete_pos"
    )
    # (file, pos) of matched rows over the RAW file set: rows already
    # dead behind a pending equality/position delete may re-enter the
    # set, which is harmless (the anti-joins compose idempotently) and
    # keeps this a single scan-side job
    hits = (
        spark.read.schema(schema)
        .parquet(*latest["files"])
        .select(
            "*",
            _norm_path_col(F.col("_metadata.file_path")).alias("_file"),
            F.col("_metadata.row_index").alias("_pos"),
        )
        .filter(matched)
        .select("_file", "_pos")
    )
    staged = os.path.join(path, "data", f"posdel-{uuid.uuid4().hex[:12]}")
    # coalesce(1): a delete file is rows-named-sized by contract — one
    # file keeps the manifest entry and the read-side broadcast tiny
    hits.coalesce(1).write.mode("errorifexists").parquet(staged)
    del_files = sorted(glob.glob(os.path.join(staged, "*.parquet")))
    migrations: list = []
    meta = {
        "version": version,
        "segments": _segments_of(path, raw, migrated=migrations),
        "pos_deletes": (raw.get("pos_deletes") or [])
        + [{"files": del_files}],
    }
    for carry in ("deletes", "layout"):
        if carry in raw:
            meta[carry] = raw[carry]
    _stamp_recent_batches(meta, raw, version - 1, path=path)
    try:
        _commit_manifest(path, version, meta)
    except SnapshotCommitConflict:
        # no-orphan convention (round-17 ADVICE #3): the staged
        # position-delete file and any migration segment will never
        # be referenced — remove before surfacing the conflict
        import contextlib
        import shutil

        shutil.rmtree(staged, ignore_errors=True)
        for seg in migrations:
            with contextlib.suppress(OSError):
                os.remove(os.path.join(path, seg))
        raise
    return version


def snapshot_version_asof(path: str, unix_ts: float) -> int:
    """Resolve the snapshot version that was CURRENT at wall-clock
    time ``unix_ts`` (round 14 — `VERSION AS OF` came with the r13
    protocol; this is `TIMESTAMP AS OF`): the highest version whose
    recorded commit time is ≤ the asked instant. Pre-round-14
    manifests without a commit time are treated as epoch-0 (always
    eligible — resolving an old table errs toward the oldest true
    answer, never an anachronistic one). Raises when the instant
    precedes the first commit."""
    import json

    best = None
    for m in _manifests(path):
        with open(m) as f:
            meta = json.load(f)
        if meta.get("committed_at_unix", 0.0) <= unix_ts:
            best = meta["version"]
    if best is None:
        raise ValueError(
            f"snapshot_version_asof: no version at or before {unix_ts} "
            f"under {path}"
        )
    return best


def snapshot_delete(spark, path: str, predicate) -> int:
    """COPY-ON-WRITE DELETE for the manifest snapshot protocol (the
    other half of the lakehouse write path — GDPR erasure / bad-batch
    retraction against a versioned table): rows matching ``predicate``
    (a Column) disappear from the NEW version while every prior
    version still serves them (time travel is the audit trail;
    permanent erasure would additionally expire old manifests, a
    retention-policy knob, not a protocol change).

    Cost shape is the COW contract: only files that actually CONTAIN
    matching rows are rewritten (one filtered rewrite each); untouched
    files are carried into the new manifest by reference — at 100 TB
    an erasure of one user's rows rewrites the handful of files their
    rows live in, never the table. The affected-file set is found with
    one predicate-pushdown scan over ``input_file_name()`` (file-level
    zone maps would prune that scan further, `file_stats`).

    DELETE drops exactly the rows where ``predicate`` is TRUE —
    NULL-predicate rows (e.g. ``col = 5`` over a NULL) are KEPT, the
    Delta/Iceberg three-valued-logic contract. Both the affected-file
    scan and the survivor rewrite therefore use the null-safe form
    ``coalesce(predicate, false)`` so a NULL never silently erases a
    row from a rewritten file.

    Returns the committed version. Like ``snapshot_append``: one
    sequential writer at test scale; atomic-swap catalogs replace the
    manifest rename in production without touching the read protocol."""
    import glob
    import json
    import os
    import uuid

    from pyspark.sql import functions as F

    manifests = _manifests(path)
    if not manifests:
        raise ValueError(f"snapshot_delete: no manifests under {path}")
    raw = _load_raw(manifests[-1])
    _require_no_renames(raw, "snapshot_delete")
    latest = _resolve_meta(path, raw)
    if latest.get("deletes") or latest.get("pos_deletes"):
        raise ValueError(
            "snapshot_delete: table has pending merge-on-read deletes — "
            "run snapshot_compact first (the COW survivor rewrite reads "
            "raw files and would resurrect MOR-deleted rows)"
        )
    cur = latest["files"]
    version = _manifest_version(manifests[-1]) + 1
    matched = F.coalesce(predicate, F.lit(False))
    full = spark.read.parquet(*cur)
    affected = {
        _norm_path_py(r["f"])
        for r in full.filter(matched)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    new_files: list[str] = []
    if affected:
        staged = os.path.join(path, "data", f"cow-{uuid.uuid4().hex[:12]}")
        survivors = (
            spark.read.schema(full.schema)
            .parquet(*sorted(affected))
            .filter(~matched)
        )
        survivors.write.mode("errorifexists").parquet(staged)
        new_files = sorted(glob.glob(os.path.join(staged, "*.parquet")))
    # kept files keep their zone maps and Blooms (the merge-path
    # convention, round 14): untouched segments carry BY NAME —
    # O(|touched segments|) metadata written, never the table's;
    # rewritten files re-enter without stats until the next
    # stats-carrying commit or compaction
    written: list = []
    segments = _rewrite_segments(path, raw, affected, written=written)
    if new_files:
        survivor_seg = _write_segment(path, new_files)
        written.append(survivor_seg)
        segments.append(survivor_seg)
    meta = {"version": version, "segments": segments}
    if "layout" in raw:
        meta["layout"] = raw["layout"]
    _stamp_recent_batches(meta, raw, version - 1, path=path)
    try:
        _commit_manifest(path, version, meta)
    except SnapshotCommitConflict:
        _abandon_rewrite(path, [staged if affected else None], written)
        raise
    return version


def snapshot_scan(
    spark, path: str, key_col: str, lo, hi, version: int | None = None
):
    """MANIFEST-STATS PRUNED range scan over a versioned table (round
    13 — the Iceberg manifest-pruning idea on the D102 protocol): the
    manifest's per-file zone map (written by ``snapshot_append(...,
    stats_col=)``) decides which files can overlap [lo, hi]; only
    those are opened, the exact predicate filters the survivors, and —
    unlike ``skipping_scan``, which derives stats with a footer-read
    pass — NO data file is touched to plan the scan: pruning runs
    entirely on the manifest, which is what makes it free at 100 TB
    (one JSON read vs listing/opening thousands of files). Files
    committed without stats are conservatively read. Returns an empty
    frame with the table's schema when nothing overlaps."""
    import glob
    import json
    import os

    from pyspark.sql import functions as F

    if version is None:
        manifests = _manifests(path)
        if not manifests:
            raise ValueError(f"snapshot_scan: no manifests under {path}")
        target = manifests[-1]
    else:
        target = os.path.join(path, f"v{version}.manifest.json")
        if not os.path.exists(target):
            raise ValueError(
                f"snapshot_scan: version {version} does not exist at {path}"
            )
    meta = _load_meta(path, target)
    _require_no_renames(meta, "snapshot_scan")
    stats = meta.get("stats", {})
    keep = []
    for fpath in meta["files"]:
        # legacy_ok: round-13 manifests recorded ONE unlabeled range —
        # this single-column scan is the only consumer allowed to treat
        # it as the queried column's (see _stats_range)
        rng = _stats_range(stats.get(os.path.abspath(fpath)), key_col, legacy_ok=True)
        if rng is None or (rng[1] >= lo and rng[0] <= hi):
            keep.append(fpath)
    # Schema from ONE footer (the newest file's — evolution-correct,
    # see _version_schema), never a full-table footer pass: the "no
    # data file is touched to plan the scan" claim holds at 100k files.
    schema = _version_schema(spark, meta["files"])
    if not keep:
        return local_df(spark, [], schema)
    # zone maps stay valid under merge-on-read (rows only disappear,
    # so a file's recorded range can only be too WIDE — conservative);
    # the delete anti-join applies after pruning
    return _apply_mor_deletes(spark, meta, keep, schema).filter(
        F.col(key_col).between(F.lit(lo), F.lit(hi))
    )


def snapshot_scan_multi(spark, path: str, ranges: dict, version: int | None = None):
    """MULTI-PREDICATE manifest pruning (round 14): ``ranges`` maps
    column -> (lo, hi); a file survives only when EVERY queried
    column's zone map overlaps its range (ranges intersect ⇒ candidate;
    any disjoint column proves no row can match). This is how a real
    warehouse scan prunes — ship date AND order key together — and the
    conjunctive test makes multi-column stats multiplicative: two
    selective predicates prune to the files in the INTERSECTION of
    their survivor sets. Columns a file has no stats for are
    conservative (never disqualify). Plan cost is still one JSON read;
    the exact conjunction filters the surviving files.

    Bound types must match the manifest's storage form: numeric
    columns take numeric (lo, hi); date/timestamp columns persist as
    ISO strings (the `_commit_manifest` default=str round trip), so
    pass their bounds as ISO strings too — lexicographic order on the
    ISO form IS temporal order, which is what makes the string
    comparison exact."""
    import json
    import os

    from pyspark.sql import functions as F

    if version is None:
        manifests = _manifests(path)
        if not manifests:
            raise ValueError(f"snapshot_scan_multi: no manifests under {path}")
        target = manifests[-1]
    else:
        target = os.path.join(path, f"v{version}.manifest.json")
        if not os.path.exists(target):
            raise ValueError(
                f"snapshot_scan_multi: version {version} does not exist at {path}"
            )
    meta = _load_meta(path, target)
    _require_no_renames(meta, "snapshot_scan_multi")
    stats = meta.get("stats", {})
    keep = []
    for fpath in meta["files"]:
        entry = stats.get(os.path.abspath(fpath))
        ok = True
        for col, (lo, hi) in ranges.items():
            rng = _stats_range(entry, col)
            if rng is not None and (rng[1] < lo or rng[0] > hi):
                ok = False
                break
        if ok:
            keep.append(fpath)
    schema = _version_schema(spark, meta["files"])
    if not keep:
        return local_df(spark, [], schema)
    pred = None
    for col, (lo, hi) in ranges.items():
        c = F.col(col).between(F.lit(lo), F.lit(hi))
        pred = c if pred is None else (pred & c)
    out = _apply_mor_deletes(spark, meta, keep, schema)
    return out.filter(pred) if pred is not None else out


def snapshot_point_lookup_bucket(spark, path: str, col: str, value, version: int | None = None):
    """TRANSFORM-AWARE point lookup for a bucket(n) hidden-partition
    layout (round 17 — the scan path that closes the round-16
    "bucket rejected loudly" boundary): resolve the probe's bucket
    with the same md5 arithmetic the layout clustered by
    (`_bucket_value_py` ≡ `_bucket_sql`), prune files whose
    TRANSFORM-VALUE zone map (recorded per-file at append time under
    `_bucket_stat_key`) excludes that bucket, then filter the exact
    equality predicate. Because appends range-cluster on the bucket
    value, a point probe touches ~1/files_per_batch of each
    generation's files — the hash-key analogue of the monotone
    transforms' source-range pruning, for exactly the id/hash/email
    keys that have no range locality. Files committed before the
    bucket layout (no transform stats) are conservatively read; the
    planner cost is one manifest resolve + driver bit arithmetic, no
    footer reads."""
    import os

    from pyspark.sql import functions as F

    if version is None:
        manifests = _manifests(path)
        if not manifests:
            raise ValueError(
                f"snapshot_point_lookup_bucket: no manifests under {path}"
            )
        target = manifests[-1]
    else:
        target = os.path.join(path, f"v{version}.manifest.json")
        if not os.path.exists(target):
            raise ValueError(
                f"snapshot_point_lookup_bucket: version {version} does not exist"
            )
    meta = _load_meta(path, target)
    _require_no_renames(meta, "snapshot_point_lookup_bucket")
    layout = meta.get("layout") or {}
    spec = next(
        (
            e
            for e in layout.get("partition_by", [])
            if isinstance(e, dict)
            and e.get("transform") == "bucket"
            and e.get("col") == col
        ),
        None,
    )
    if spec is None:
        raise ValueError(
            f"snapshot_point_lookup_bucket: no bucket() layout on {col!r} "
            f"at {path} — set one with snapshot_set_layout(('bucket', "
            f"{col!r}, n))"
        )
    n = int(spec["n"])
    qb = _bucket_value_py(value, n)
    key = _bucket_stat_key(col, n)
    stats = meta.get("stats", {})
    keep = []
    for fp in meta["files"]:
        rng = _stats_range(stats.get(os.path.abspath(fp)), key)
        if rng is None or (rng[0] <= qb <= rng[1]):
            keep.append(fp)
    schema = _version_schema(spark, meta["files"])
    if not keep:
        return local_df(spark, [], schema)
    return _apply_mor_deletes(spark, meta, keep, schema).filter(
        F.col(col) == F.lit(value)
    )


def snapshot_merge(spark, df, path: str, key_cols) -> int:
    """MERGE (upsert) on the versioned snapshot table (round 14 — the
    protocol member the round-13 verdict listed first: B17's keyed
    merge semantics composed with `snapshot_delete`'s targeted-file
    COW): rows of ``df`` whose key matches an existing row REPLACE it
    (matched rows are dropped from the rewritten files); non-matching
    keys INSERT. One commit, so readers see the upsert atomically and
    pinned readers keep the pre-merge version.

    Cost shape is the COW contract again: only files that CONTAIN a
    matched key are rewritten (survivors = their rows anti-joined
    against the batch's key set); untouched files carry into the new
    manifest BY REFERENCE, and the batch itself lands as O(|batch|)
    new files — at 100 TB a merge of one day's updates rewrites the
    files those keys live in, never the table. The affected-file set
    comes from one key semi-join over ``input_file_name()`` (AQE picks
    broadcast when the batch's key set is small — the common case).

    Semantics notes: NULL keys never equi-match, so a NULL-keyed
    update row inserts (the SQL MERGE contract); ``df`` is committed
    as-is, so a batch carrying duplicate keys lands duplicate rows —
    deduplicate upstream (`dedup_latest_agg`) exactly as Delta's MERGE
    requires a unique source. Kept files keep their manifest zone maps
    (pruning survives the merge); rewritten/new files re-enter without
    stats (conservatively unpruned) until the next stats-carrying
    commit or compaction. Returns the committed version."""
    import glob
    import json
    import os
    import uuid

    from pyspark.sql import functions as F

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    manifests = _manifests(path)
    if not manifests:
        raise ValueError(f"snapshot_merge: no manifests under {path}")
    raw = _load_raw(manifests[-1])
    _require_no_renames(raw, "snapshot_merge")
    _check_constraints(df, raw.get("constraints") or {}, "snapshot_merge")
    latest = _resolve_meta(path, raw)
    if latest.get("deletes") or latest.get("pos_deletes"):
        raise ValueError(
            "snapshot_merge: table has pending merge-on-read deletes — "
            "run snapshot_compact first (the survivor rewrite reads raw "
            "files and would resurrect MOR-deleted rows)"
        )
    cur = latest["files"]
    version = _manifest_version(manifests[-1]) + 1
    batch_keys = df.select(*keys).distinct()
    full = spark.read.parquet(*cur)
    # input_file_name() must be PROJECTED AT SCAN TIME, before the
    # semi-join's shuffle boundary — after a shuffle it returns ''
    affected = {
        _norm_path_py(r["f"])
        for r in full.select(*keys, F.input_file_name().alias("f"))
        .join(batch_keys, keys, "left_semi")
        .select("f")
        .distinct()
        .collect()
    }
    new_files: list[str] = []
    if affected:
        staged = os.path.join(path, "data", f"merge-{uuid.uuid4().hex[:12]}")
        survivors = (
            spark.read.schema(full.schema)
            .parquet(*sorted(affected))
            .join(batch_keys, keys, "left_anti")
        )
        survivors.write.mode("errorifexists").parquet(staged)
        new_files += sorted(glob.glob(os.path.join(staged, "*.parquet")))
    batch_staged = os.path.join(path, "data", f"merge-{uuid.uuid4().hex[:12]}")
    df.select(*full.columns).write.mode("errorifexists").parquet(batch_staged)
    new_files += sorted(glob.glob(os.path.join(batch_staged, "*.parquet")))
    # untouched segments carry BY NAME (kept files keep their zone
    # maps and Blooms); the survivor rewrite + batch land as one new
    # stats-less segment — O(|touched| + |batch|) metadata written
    written: list = []
    segments = _rewrite_segments(path, raw, affected, written=written)
    if new_files:
        out_seg = _write_segment(path, new_files)
        written.append(out_seg)
        segments.append(out_seg)
    meta = {"version": version, "segments": segments}
    if "layout" in raw:
        meta["layout"] = raw["layout"]
    _stamp_recent_batches(meta, raw, version - 1, path=path)
    try:
        _commit_manifest(path, version, meta)
    except SnapshotCommitConflict:
        _abandon_rewrite(
            path,
            [staged if affected else None, batch_staged],
            written,
        )
        raise
    return version


def snapshot_merge_mor(
    spark, df, path: str, key_cols, batch_id: int | None = None
) -> int:
    """MERGE-ON-READ MERGE (round 16 — the upsert `snapshot_merge`'s
    copy-on-write form cannot afford when a day's keys scatter across
    many files: COW rewrites every file containing a match, MOR
    commits O(|batch|) regardless of scatter). One atomic commit
    carries (a) the batch as new data files and (b) ONE equality-
    delete entry naming the batch's keys, scoped — the sequence rule —
    to the files present BEFORE this commit. That IS the MERGE at
    read time: pre-existing rows with batch keys disappear behind the
    anti-join, the batch's own rows keep theirs (their files are not
    in ``applies_to``), non-matching keys simply insert. The read-side
    anti-join persists until `snapshot_compact` applies and clears the
    entries — Iceberg's MOR-upsert trade, chosen per table by
    read/write ratio, with `snapshot_merge` as the COW sibling.

    Semantics match `snapshot_merge`: NULL-keyed batch rows INSERT and
    never delete (NULL never equi-matches, and NULL keys are excluded
    from the delete file); a batch with duplicate keys lands duplicate
    rows — deduplicate upstream (`dedup_latest_agg`). Batch files
    enter without manifest stats (conservatively read) until the next
    stats-carrying commit or compaction, the kept files keep theirs.
    Works with prior pending deletes (entries accumulate; coverage is
    per-file). Returns the committed version."""
    import glob
    import json
    import os
    import uuid

    from pyspark.sql import functions as F

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if batch_id is not None:
        # exactly-once for streaming upsert replays (round 17 — the
        # same ledger contract as snapshot_append/snapshot_publish):
        # a manifest or retired-ledger entry carrying this batch_id
        # means the merge fully committed; the replay is a no-op
        committed = snapshot_batch_version(path, batch_id)
        if committed is not None:
            return committed
    manifests = _manifests(path)
    if not manifests:
        raise ValueError(f"snapshot_merge_mor: no manifests under {path}")
    raw = _load_raw(manifests[-1])
    _require_no_renames(raw, "snapshot_merge_mor")
    _check_constraints(
        df, raw.get("constraints") or {}, "snapshot_merge_mor"
    )
    version = _manifest_version(manifests[-1]) + 1
    batch_staged = os.path.join(
        path, "data", f"mormerge-{uuid.uuid4().hex[:12]}"
    )
    df.write.mode("errorifexists").parquet(batch_staged)
    new_files = sorted(glob.glob(os.path.join(batch_staged, "*.parquet")))
    if not new_files:
        raise ValueError("snapshot_merge_mor: batch wrote no parquet files")
    notnull = None
    for k in keys:
        c = F.col(k).isNotNull()
        notnull = c if notnull is None else (notnull & c)
    # delete keys come from the STAGED FILES READ BACK, never from a
    # re-evaluation of the caller's df (round-16 ADVICE #2): a
    # nondeterministic batch (sample, unordered limit, rand-derived
    # keys) re-evaluated here would commit delete keys that disagree
    # with the batch files in the same atomic manifest — silently
    # deleting rows that were never inserted or keeping stale
    # duplicates. Read-back is the same discipline wap_commit_batch's
    # audit uses: the keys describe what was actually written.
    del_keys = (
        spark.read.parquet(batch_staged)
        .select(*keys)
        .distinct()
        .filter(notnull)
    )
    eq_staged = os.path.join(path, "data", f"eqdel-{uuid.uuid4().hex[:12]}")
    # coalesce(1): a delete file is keys-sized by contract — one file
    # keeps the manifest entry and the read-side broadcast build tiny
    del_keys.coalesce(1).write.mode("errorifexists").parquet(eq_staged)
    del_files = sorted(glob.glob(os.path.join(eq_staged, "*.parquet")))
    # O(batch) commit metadata (round 17): the batch is one new
    # segment; prior data/stats/Blooms carry by segment name and the
    # delete entry scopes to those names (the batch's own segment is
    # NOT covered — its rows keep their keys, the MOR sequence rule)
    migrations: list = []
    prev_segments = _segments_of(path, raw, migrated=migrations)
    batch_seg = _write_segment(path, new_files)
    # auto-consolidation runs over the name LIST only; the delete
    # entry below keeps naming the PRE-consolidation segments (their
    # files stay on disk, liveness-held by this very entry), which is
    # exactly the coverage it must have — pre-batch files only
    segs = _consolidated_segments(
        path, prev_segments + [batch_seg], migrations
    )
    meta = {
        "version": version,
        "segments": segs,
        "deletes": (raw.get("deletes") or [])
        + (
            [
                {
                    "files": del_files,
                    "keys": keys,
                    "applies_to_segments": prev_segments,
                }
            ]
            if del_files
            else []
        ),
    }
    if not meta["deletes"]:
        del meta["deletes"]
    for carry in ("pos_deletes", "layout"):
        if carry in raw:
            meta[carry] = raw[carry]
    if batch_id is not None:
        meta["batch_id"] = batch_id
    _stamp_recent_batches(meta, raw, version - 1, batch_id, path=path)
    try:
        _commit_manifest(path, version, meta)
    except SnapshotCommitConflict:
        # no-orphan convention (round-16 ADVICE #5, matching
        # snapshot_append's abandon path): the staged batch, delete
        # file, batch segment and any consolidation tier will never
        # be referenced — remove them before surfacing the conflict
        # instead of leaving them for the grace-period sweep
        import contextlib
        import shutil

        shutil.rmtree(batch_staged, ignore_errors=True)
        shutil.rmtree(eq_staged, ignore_errors=True)
        for seg in [batch_seg] + migrations:
            with contextlib.suppress(OSError):
                os.remove(os.path.join(path, seg))
        raise
    if batch_seg not in segs:
        # consolidation consumed the batch's own fresh segment —
        # nothing references it (the delete entry names only the
        # PRE-batch segments); drop it now
        import contextlib

        with contextlib.suppress(OSError):
            os.remove(os.path.join(path, batch_seg))
    return version


def _zorder_rewrite(df, zorder_by: tuple | None, n_out: int):
    """The compaction rewrite plan: Morton-clustered when asked (one
    cheap min/max agg for the normalization bounds, one range shuffle
    on the interleaved key), plain coalesce otherwise — with the
    empty/all-NULL-bounds guard (round-16 ADVICE): no curve exists
    there, so fall through to the plain rewrite."""
    from pyspark.sql import functions as F

    if zorder_by is None:
        return df.coalesce(n_out)
    xc, yc = zorder_by
    b = df.agg(
        F.min(F.col(xc).cast("double")).alias("xlo"),
        F.max(F.col(xc).cast("double")).alias("xhi"),
        F.min(F.col(yc).cast("double")).alias("ylo"),
        F.max(F.col(yc).cast("double")).alias("yhi"),
    ).collect()[0]
    if b["xlo"] is None or b["ylo"] is None:
        # EMPTY set (or all-NULL keys): coalesce(1) still writes one
        # schema-carrying part file, so read paths keep working
        return df.coalesce(n_out)
    key = morton_key(
        F.col(xc),
        F.col(yc),
        x_range=(b["xlo"], max(b["xhi"], b["xlo"] + 1e-9)),
        y_range=(b["ylo"], max(b["yhi"], b["ylo"] + 1e-9)),
    )
    return (
        df.withColumn("__z", key)
        .repartitionByRange(n_out, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def snapshot_compact(
    spark,
    path: str,
    stats_col: str | None = None,
    target_files: int = 1,
    zorder_by: tuple | None = None,
    bloom_col: str | None = None,
    small_bytes: int | None = None,
) -> int:
    """OPTIMIZE for the manifest snapshot table (round 13 — closing
    the protocol family: append / read / COW-delete / stats-prune /
    stream-ingest / COMPACT): per-batch commits and COW rewrites
    accumulate small files; this rewrites the CURRENT version's rows
    into ``target_files`` files and commits them as a new version with
    identical content — readers pinned to older versions keep their
    file sets (compaction is just another commit; old files are
    garbage only when every manifest referencing them is expired, the
    retention knob). With ``stats_col`` the rewrite re-derives the
    per-file zone map, so a compacted table keeps manifest pruning.
    Cost is one read + one write of the LIVE rows — the standing
    small-files answer (`compact_parquet`) lifted into the versioned
    protocol.

    ``zorder_by=(colA, colB)`` (round 15 — Delta/Iceberg OPTIMIZE
    ZORDER on the snapshot protocol) clusters the rewrite along the
    Morton curve of the two columns instead of coalescing: one cheap
    min/max agg derives the normalization ranges from the live rows,
    then ONE range shuffle on the interleaved key places each output
    file in a tight bounding box in BOTH dimensions — so the manifest
    zone maps written by ``stats_col=[colA, colB]`` prune range
    predicates on EITHER column (pinned in tests/test_layout.py).
    Ingest commits in arrival order; this is the maintenance job that
    converts arrival order into queryable order, exactly where a
    100 TB warehouse schedules it.

    ``small_bytes`` (round 16 — Delta OPTIMIZE's actual selection
    rule): rewrite ONLY files smaller than the threshold; files at or
    above it carry into the new version BY REFERENCE with their zone
    maps and Blooms intact. This is the form a 100 TB table actually
    schedules — the small-file debt is per-batch commits, and a full
    rewrite to fix it would be a table-sized job; selective compaction
    is O(|small files|) forever. Fewer than TWO small files is a
    metadata no-op (returns the current head, no commit — nothing to
    bin-pack). Refuses on pending merge-on-read deletes: a selective
    rewrite resolves deletes for the files it touches but not the
    kept ones, which would leave one version with half-applied
    deletes — run a full compact there (it applies and clears them)."""
    import glob
    import json
    import os
    import uuid

    manifests = _manifests(path)
    if not manifests:
        raise ValueError(f"snapshot_compact: no manifests under {path}")
    raw = _load_raw(manifests[-1])
    _require_no_renames(raw, "snapshot_compact")
    cur = _resolve_meta(path, raw)
    version = _manifest_version(manifests[-1]) + 1
    if small_bytes is not None:
        if cur.get("deletes") or cur.get("pos_deletes"):
            raise ValueError(
                "snapshot_compact: selective compaction (small_bytes) "
                "cannot run with pending merge-on-read deletes — it would "
                "apply them only to the rewritten files; run a full "
                "compact first"
            )
        small = [
            f for f in cur["files"] if os.path.getsize(f) < small_bytes
        ]
        if len(small) < 2:
            return _manifest_version(manifests[-1])  # nothing to bin-pack
        small_set = {os.path.abspath(f) for f in small}
        staged = os.path.join(path, "data", f"compact-{uuid.uuid4().hex[:12]}")
        schema = _version_schema(spark, cur["files"])
        # zorder_by applies to the REWRITTEN subset (round-16 review:
        # silently ignoring it would leave callers believing the small
        # files are Morton-clustered when they are not)
        out = _zorder_rewrite(
            spark.read.schema(schema).parquet(*small),
            zorder_by,
            max(int(target_files), 1),
        )
        out.write.mode("errorifexists").parquet(staged)
        new_files = sorted(glob.glob(os.path.join(staged, "*.parquet")))
        if not new_files:
            raise ValueError(
                "snapshot_compact: selective rewrite produced no files"
            )
        # untouched segments carry BY NAME with their stats/Blooms;
        # segments the small files lived in get filtered replacements;
        # the bin-packed output is one new segment with freshly
        # derived stats/Blooms as requested — O(|small| + touched
        # segments) metadata, never the table's
        new_stats: dict = {}
        if stats_col is not None:
            cols = [stats_col] if isinstance(stats_col, str) else list(stats_col)
            new_stats = multi_file_stats(spark, staged, cols)
        new_blooms: dict = {}
        if bloom_col is not None:
            new_blooms = {bloom_col: file_blooms(spark, staged, bloom_col)}
        written: list = []
        segments = _rewrite_segments(path, raw, small_set, written=written)
        packed_seg = _write_segment(
            path, new_files, new_stats or None, new_blooms or None
        )
        written.append(packed_seg)
        segments.append(packed_seg)
        # operation stamp (round 19): lets `snapshot_tail(...,
        # across_compaction=True)` recognize this rewrite as
        # CONTENT-PRESERVING (selective compaction refuses pending
        # deletes above, so live rows are identical across the step)
        meta = {"version": version, "segments": segments,
                "operation": "compact"}
        if "layout" in raw:
            meta["layout"] = raw["layout"]
        _stamp_recent_batches(meta, raw, version - 1, path=path)
        try:
            _commit_manifest(path, version, meta)
        except SnapshotCommitConflict:
            _abandon_rewrite(path, [staged], written)
            raise
        return version
    staged = os.path.join(path, "data", f"compact-{uuid.uuid4().hex[:12]}")
    # a merge-on-read table compacts through the delete-resolving read:
    # pending equality deletes are APPLIED here and the new manifest
    # carries none — compaction is the MOR maintenance path that
    # returns reads to plain scans (the Iceberg rewrite_data_files job)
    df = _apply_mor_deletes(
        spark, cur, cur["files"], _version_schema(spark, cur["files"])
    )
    out = _zorder_rewrite(df, zorder_by, max(int(target_files), 1))
    out.write.mode("errorifexists").parquet(staged)
    new_files = sorted(glob.glob(os.path.join(staged, "*.parquet")))
    if not new_files:
        # a repartitionByRange of an empty frame can plan ZERO tasks —
        # never commit an empty files list (read paths index files[-1])
        import shutil

        shutil.rmtree(staged, ignore_errors=True)
        df.limit(0).coalesce(1).write.mode("errorifexists").parquet(staged)
        new_files = sorted(glob.glob(os.path.join(staged, "*.parquet")))
        if not new_files:
            raise ValueError(
                "snapshot_compact: rewrite produced no parquet files"
            )
    stats = None
    if stats_col is not None:
        cols = [stats_col] if isinstance(stats_col, str) else list(stats_col)
        stats = multi_file_stats(spark, staged, cols)
    blooms = None
    if bloom_col is not None:
        # a compacted table would otherwise silently LOSE point-lookup
        # pruning (blooms are per-file; the rewrite produced new files)
        # — re-derive them over the compacted layout (round 15)
        blooms = {bloom_col: file_blooms(spark, staged, bloom_col)}
    # a full compact is the segment-merge maintenance job too (the
    # Iceberg rewrite_manifests analogue): the whole table collapses
    # to ONE segment, so the head manifest's name list — which grows
    # by one entry per commit — resets alongside the files
    compact_seg = _write_segment(path, new_files, stats, blooms)
    # operation stamp (round 19): a FULL compact is content-preserving
    # exactly when the pre-compact version had no pending MOR deletes
    # (it APPLIES them otherwise) — `snapshot_tail`'s across-compaction
    # crossing re-checks that from the previous manifest, so the stamp
    # alone never vouches for row identity
    meta = {"version": version, "segments": [compact_seg],
            "operation": "compact"}
    if "layout" in raw:
        meta["layout"] = raw["layout"]
    _stamp_recent_batches(meta, raw, version - 1, path=path)
    try:
        _commit_manifest(path, version, meta)
    except SnapshotCommitConflict:
        _abandon_rewrite(path, [staged], [compact_seg])
        raise
    return version


#: hidden-partitioning transforms the layout spec admits (round 16 —
#: Iceberg's partition transforms): the MONOTONE ones — identity,
#: truncate(width), days/months/years — keep each clustered file a
#: contiguous SOURCE-column range, so the existing per-file zone maps
#: prune range scans with no new manifest machinery. bucket(n)
#: (round 17) is admitted through the OTHER protocol it needed: a
#: hash transform breaks source contiguity, so its appends record
#: per-file zone maps of the TRANSFORM VALUE (`_layout_expr_specs`)
#: and the transform-aware `snapshot_point_lookup_bucket` prunes
#: equality probes against them — the round-16 documented boundary,
#: closed.
_MONOTONE_TRANSFORMS = ("truncate", "days", "months", "years")
_LAYOUT_TRANSFORMS = _MONOTONE_TRANSFORMS + ("bucket",)


def _bucket_sql(col: str, n: int) -> str:
    """Spark SQL for the bucket(n) transform value — md5-based (the
    repo's engine-portable hash convention, byte-compatible with
    `_bucket_value_py` for int/string columns)."""
    return (
        f"cast(conv(substring(md5(cast({col} as string)), 1, 8), 16, 10) "
        f"as bigint) % {int(n)}"
    )


def _bucket_value_py(value, n: int) -> int:
    """Driver-side bucket of a probe value — identical to `_bucket_sql`
    for int/str probes (the same rendering contract as the manifest
    Blooms: those are the only Python types whose str() matches
    Spark's CAST(AS STRING) byte-for-byte)."""
    import hashlib

    if isinstance(value, bool) or not isinstance(value, (int, str)):
        raise TypeError(
            "bucket probe values must be int or str (got "
            f"{type(value).__name__}): other types render differently "
            "between Python and Spark's CAST(AS STRING)"
        )
    return int(hashlib.md5(str(value).encode()).hexdigest()[:8], 16) % int(n)


def _bucket_stat_key(col: str, n: int) -> str:
    return f"__bucket_{col}_{int(n)}"


def _layout_cluster_exprs(layout: dict):
    """(cluster expressions, source columns) for a layout spec.
    Monotone transforms contribute their SOURCE column (each clustered
    file stays a contiguous source range, so ordinary zone maps
    prune); bucket(n) contributes its cluster expression only — its
    prunable stats live on the TRANSFORM VALUE (`_layout_expr_specs`),
    because a hash bucket is deliberately NOT source-contiguous."""
    from pyspark.sql import functions as F

    exprs, src_cols = [], []
    for e in layout["partition_by"]:
        if isinstance(e, str):
            exprs.append(F.col(e))
            src_cols.append(e)
            continue
        t, c = e["transform"], e["col"]
        if t == "truncate":
            exprs.append(F.floor(F.col(c) / int(e["width"])) * int(e["width"]))
        elif t == "days":
            exprs.append(F.date_trunc("day", F.col(c)))
        elif t == "months":
            exprs.append(F.date_trunc("month", F.col(c)))
        elif t == "years":
            exprs.append(F.date_trunc("year", F.col(c)))
        elif t == "bucket":
            exprs.append(F.expr(_bucket_sql(c, int(e["n"]))))
            continue  # no source col: stats go on the transform value
        else:  # pragma: no cover - set_layout validated already
            raise ValueError(f"unknown layout transform {t!r}")
        src_cols.append(c)
    return exprs, src_cols


def _layout_expr_specs(layout: dict | None) -> dict:
    """{stat_key: SQL expr} for the layout's TRANSFORM-VALUE zone maps
    (round 17 — the stats protocol bucket(n) needed): each bucket
    entry records per-file [lo, hi] of the bucket VALUE under a
    derived key, which `snapshot_point_lookup_bucket` prunes against.
    Monotone transforms need none (source stats already prune)."""
    if not layout:
        return {}
    out = {}
    for e in layout["partition_by"]:
        if isinstance(e, dict) and e.get("transform") == "bucket":
            out[_bucket_stat_key(e["col"], int(e["n"]))] = _bucket_sql(
                e["col"], int(e["n"])
            )
    return out


def multi_file_expr_stats(spark, path: str, specs: dict) -> dict:
    """`multi_file_stats` over SQL EXPRESSIONS instead of plain
    columns: {abs_file: {stat_key: [lo, hi]}} in one aggregate pass —
    the transform-value zone maps hidden partitioning's bucket(n)
    prunes with."""
    import os

    from pyspark.sql import functions as F

    aggs = []
    for k, e in specs.items():
        aggs += [
            F.min(F.expr(e)).alias(f"lo_{k}"),
            F.max(F.expr(e)).alias(f"hi_{k}"),
        ]
    rows = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
        .collect()
    )
    return {
        _norm_path_py(r["file"]): {
            k: [r[f"lo_{k}"], r[f"hi_{k}"]] for k in specs
        }
        for r in rows
    }


def snapshot_rewrite_segments(path: str) -> int:
    """METADATA-ONLY segment consolidation (round 17 — Iceberg's
    rewrite_manifests on the D102 protocol): merge the head's segment
    list into ONE segment and commit, touching NO data file. The
    manifest's name list grows by one entry per commit (the
    manifest-list term — ~33 B/commit, measured in BASELINE.md); a
    year of per-minute micro-batches is ~500k names, so the metadata
    maintenance job is this, scheduled like compaction but infinitely
    cheaper (pure driver JSON, no read or shuffle). A full
    `snapshot_compact` subsumes it; this is for tables whose DATA
    layout is already fine.

    Pending delete entries carry VERBATIM — their
    ``applies_to_segments`` still name the pre-consolidation segments,
    which stay on disk (and alive through `snapshot_expire`'s
    liveness walk) for as long as any surviving manifest or delete
    entry references them; the merged segment only serves the file
    list/stats/Blooms. Fewer than two segments is a no-op (returns
    the head version, no commit). Optimistically concurrent like an
    append."""
    for _ in range(25):
        manifests = _manifests(path)
        if not manifests:
            raise ValueError(
                f"snapshot_rewrite_segments: no manifests under {path}"
            )
        raw = _load_raw(manifests[-1])
        if len(raw.get("segments") or []) < 2 and "segments" in raw:
            return _manifest_version(manifests[-1])
        resolved = _resolve_meta(path, raw)
        version = _manifest_version(manifests[-1]) + 1
        merged = _write_segment(
            path,
            resolved["files"],
            resolved.get("stats") or None,
            resolved.get("blooms") or None,
        )
        meta = {"version": version, "segments": [merged]}
        # "renames" MUST carry: this is a content-preserving metadata
        # reorg, and dropping the event list would silently revert a
        # renamed table's reads to the physical names (the events'
        # covers stay resolvable — replaced segment files persist and
        # the expire liveness walk keeps event-referenced segments)
        for carry in ("deletes", "pos_deletes", "layout", "renames"):
            if carry in raw:
                meta[carry] = raw[carry]
        _stamp_recent_batches(meta, raw, version - 1, path=path)
        try:
            _commit_manifest(path, version, meta)
            return version
        except SnapshotCommitConflict:
            import contextlib
            import os

            with contextlib.suppress(OSError):
                os.remove(os.path.join(path, merged))
            continue
    raise SnapshotCommitConflict(
        f"snapshot_rewrite_segments: lost the commit race 25 times at {path}"
    )


def snapshot_analyze(spark, path: str, cols) -> int:
    """Zone-map BACKFILL for files committed without stats (round 19
    — Iceberg's ANALYZE TABLE for the snapshot protocol): compute
    per-file min/max for ``cols`` over exactly the files MISSING
    them (one Spark aggregate pass over those files, never the
    table) and commit replacement segments carrying the merged
    stats — after which `snapshot_scan`/`snapshot_scan_multi` prune
    the previously-unpruned legacy generation from the manifest
    alone. This closes the one gap `snapshot_set_layout`'s
    no-rewrite contract leaves: pre-evolution files stayed
    conservatively unpruned forever unless recommitted; analyze
    retrofits their pruning metadata at O(legacy data) scan +
    O(affected segments) metadata cost, zero data rewritten.
    Replaced segment files persist for older manifests (the
    replacement-segment discipline `_rewrite_segments` established);
    a fully-statted table is a no-op returning the head version.
    Refuses on renamed tables (stats keys are physical names — the
    scan paths refuse there anyway)."""
    import contextlib
    import os

    from pyspark.sql import functions as F

    cols = [cols] if isinstance(cols, str) else list(cols)
    migrations: list = []

    def _cleanup(written: list):
        for name in written + migrations:
            with contextlib.suppress(OSError):
                os.remove(os.path.join(path, name))
        migrations.clear()

    for _ in range(25):
        manifests = _manifests(path)
        if not manifests:
            raise ValueError(f"snapshot_analyze: no manifests under {path}")
        raw = _load_raw(manifests[-1])
        _require_no_renames(raw, "snapshot_analyze")
        segs = _segments_of(path, raw, migrated=migrations)
        affected: dict = {}  # segment name -> files missing stats
        for name in segs:
            seg = _load_segment(path, name)
            seg_stats = seg.get("stats") or {}
            missing = [
                f
                for f in seg["files"]
                if any(c not in (seg_stats.get(f) or {}) for c in cols)
            ]
            if missing:
                affected[name] = missing
        if not affected:
            _cleanup([])
            return _manifest_version(manifests[-1])
        # ONE aggregate pass over every missing file, all columns —
        # the multi_file_stats shape on an explicit file list
        all_missing = sorted({f for fs in affected.values() for f in fs})
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
        rows = (
            spark.read.option("mergeSchema", "true")
            .parquet(*all_missing)
            .groupBy(F.input_file_name().alias("file"))
            .agg(*aggs)
            .collect()
        )
        new_stats = {
            _norm_path_py(r["file"]): {
                c: [r[f"lo_{c}"], r[f"hi_{c}"]] for c in cols
            }
            for r in rows
        }
        version = _manifest_version(manifests[-1]) + 1
        written: list = []
        replaced: dict = {}
        for name in affected:
            seg = _load_segment(path, name)
            stats = dict(seg.get("stats") or {})
            for f in seg["files"]:
                add = new_stats.get(os.path.abspath(f))
                if add:
                    merged = dict(stats.get(f) or {})
                    merged.update(add)
                    stats[f] = merged
            replaced[name] = _write_segment(
                path, seg["files"], stats, seg.get("blooms") or None
            )
            written.append(replaced[name])
        meta: dict = {
            "version": version,
            "segments": [replaced.get(n, n) for n in segs],
        }
        for carry in ("deletes", "pos_deletes", "layout"):
            if carry in raw:
                meta[carry] = raw[carry]
        _stamp_recent_batches(meta, raw, version - 1, path=path)
        try:
            _commit_manifest(path, version, meta)
            return version
        except SnapshotCommitConflict:
            _cleanup(written)
            continue
    _cleanup([])
    raise SnapshotCommitConflict(
        f"snapshot_analyze: lost the commit race 25 times at {path}"
    )


def snapshot_set_layout(
    path: str, partition_by, files_per_batch: int = 4
) -> int:
    """PARTITION-SPEC EVOLUTION (round 16 — the last load-bearing
    Iceberg capability the D102 protocol lacked, per the round-15
    verdict): commit a METADATA-ONLY version that records the table's
    layout spec — the clustering that applies to FUTURE appends only.
    Nothing is rewritten, so evolving a 100 TB table's partitioning is
    free (the Iceberg partition-spec-evolution contract): pre-evolution
    files keep their arrival layout and whatever manifest stats their
    commits recorded, while `snapshot_append` clusters each subsequent
    batch into ``files_per_batch`` files by RANGE on the layout
    columns and auto-records their zone maps. Reads need no
    generation awareness at all: `snapshot_scan`/`snapshot_scan_multi`
    already plan from per-file stats, so new-generation files prune
    tightly on the layout key and old-generation files prune on their
    own recorded stats (conservatively read otherwise) — the scan
    unification IS the existing stats protocol, which is why the spec
    can evolve without a read-path change.

    ``partition_by`` is a column name, a list of names and/or
    HIDDEN-PARTITIONING transform specs (round 16 — Iceberg's
    transforms): ``("truncate", col, width)`` /
    ``("days"|"months"|"years", col)`` / ``("bucket", col, n)`` or the
    equivalent dicts. Hidden means queries still filter the SOURCE
    column — clustering by a monotone transform keeps each file a
    contiguous source range, so the ordinary zone maps prune; no query
    rewrite, no partition column in the data. ``bucket(n)`` (round 17)
    prunes through TRANSFORM-VALUE zone maps instead — appends record
    per-file [lo, hi] of the md5 bucket value and
    `snapshot_point_lookup_bucket` plans equality probes against them
    (see `_LAYOUT_TRANSFORMS`). ``None`` CLEARS the spec (subsequent
    appends return to arrival layout). The commit is optimistically
    concurrent like an append (its read set is just the previous
    manifest); an append staged under the superseded spec detects the
    change at commit time and surfaces `SnapshotCommitConflict`.
    Returns the committed version."""
    import json

    def _norm(e):
        if isinstance(e, str):
            return e
        if isinstance(e, (tuple, list)):
            t = e[0]
            if t == "truncate":
                e = {"transform": t, "col": e[1], "width": e[2]}
            elif t == "bucket":
                e = {"transform": t, "col": e[1], "n": e[2]}
            else:
                e = {"transform": t, "col": e[1]}
        t = e.get("transform")
        if t not in _LAYOUT_TRANSFORMS:
            raise ValueError(
                f"snapshot_set_layout: transform {t!r} is not supported — "
                f"supported transforms: {_LAYOUT_TRANSFORMS}"
            )
        if t == "truncate" and int(e.get("width", 0)) <= 0:
            raise ValueError("snapshot_set_layout: truncate needs width > 0")
        if t == "bucket" and int(e.get("n", 0)) <= 0:
            raise ValueError("snapshot_set_layout: bucket needs n > 0")
        return e

    if partition_by is None:
        cols = None
    elif isinstance(partition_by, str):
        cols = [partition_by]
    elif (
        isinstance(partition_by, tuple)
        and partition_by
        and partition_by[0] in _LAYOUT_TRANSFORMS
    ):
        cols = [_norm(partition_by)]  # one bare transform tuple
    else:
        cols = [_norm(e) for e in partition_by]
    for _ in range(25):
        manifests = _manifests(path)
        if not manifests:
            raise ValueError(f"snapshot_set_layout: no manifests under {path}")
        latest = _load_raw(manifests[-1])
        version = _manifest_version(manifests[-1]) + 1
        # metadata-only commit: carry the head's state VERBATIM in its
        # own grammar (segment refs stay refs — O(#segments) bytes)
        meta = {"version": version}
        for carry in (
            "segments", "files", "stats", "blooms", "deletes", "pos_deletes",
            "renames",
        ):
            if carry in latest:
                meta[carry] = latest[carry]
        if cols is not None:
            meta["layout"] = {
                "partition_by": cols,
                "files_per_batch": int(files_per_batch),
                "since_version": version,
            }
        _stamp_recent_batches(meta, latest, version - 1, path=path)
        try:
            _commit_manifest(path, version, meta)
            return version
        except SnapshotCommitConflict:
            continue
    raise SnapshotCommitConflict(
        f"snapshot_set_layout: lost the commit race 25 times at {path}"
    )

def snapshot_changes(
    spark, path: str, from_version: int, to_version: int,
    merge_schema: bool = False,
):
    """INCREMENTAL READ between two snapshot versions (round 14 — the
    change-data-feed the protocol gets for free on append-only
    histories): every commit's manifest lists the table's full file
    set, so the rows ADDED between versions are exactly the files in
    ``to_version``'s manifest missing from ``from_version``'s — an
    incremental consumer (downstream ETL, index maintenance, a
    training-data refresh) reads O(|new data|), never the table.

    Contract enforced, not just documented: every step in
    (from_version, to_version] must be an APPEND (no file of the
    previous version dropped). A delete/merge/compact step rewrites
    rows, so "added files" would double-count surviving rows — the
    walk raises loudly there instead of silently over-reporting
    (full-diff readers belong to `cdc_diff`, which compares contents).
    At 100 TB this check is |files| set arithmetic on manifests — no
    data file is touched to validate the lineage."""
    import json
    import os

    def load_meta(v: int) -> dict:
        target = os.path.join(path, f"v{v}.manifest.json")
        if not os.path.exists(target):
            raise ValueError(
                f"snapshot_changes: version {v} does not exist at {path}"
            )
        # resolved form; the segment cache makes the version walk
        # O(segments) JSON reads total, not O(versions × segments)
        return _load_meta(path, target)

    def load(v: int) -> list:
        return load_meta(v)["files"]

    if not 0 < from_version < to_version:
        raise ValueError(
            "snapshot_changes: need 0 < from_version < to_version"
        )
    prev_meta = load_meta(from_version)
    prev = set(prev_meta["files"])
    prev_dels = prev_meta.get("deletes") or []
    prev_pos = prev_meta.get("pos_deletes") or []
    for v in range(from_version + 1, to_version + 1):
        cur_meta = load_meta(v)
        cur = set(cur_meta["files"])
        if not prev <= cur:
            raise ValueError(
                f"snapshot_changes: version {v} is not an append "
                f"(it drops {len(prev - cur)} file(s) of v{v - 1}); "
                "append-only lineage required for an added-files read"
            )
        if (cur_meta.get("deletes") or []) != prev_dels or (
            cur_meta.get("pos_deletes") or []
        ) != prev_pos:
            # a merge-on-read delete (equality OR position) keeps the
            # file set intact but retracts rows — an added-files read
            # would silently skip the retraction, so it fails as
            # loudly as a COW rewrite
            raise ValueError(
                f"snapshot_changes: version {v} changes the merge-on-"
                "read delete set; append-only lineage required for an "
                "added-files read"
            )
        if (cur_meta.get("renames") or []) != (
            prev_meta.get("renames") or []
        ):
            # a rename step adds no files but shifts the logical
            # schema — refuse; CONSTANT events are safe (every file
            # added after an event already carries the new name)
            raise ValueError(
                f"snapshot_changes: version {v} renames a column "
                "inside the window; start the read at or after the "
                "rename, or snapshot_materialize_renames the table"
            )
        prev, prev_dels = cur, cur_meta.get("deletes") or []
        prev_pos = cur_meta.get("pos_deletes") or []
        prev_meta = cur_meta
    new_files = sorted(set(load(to_version)) - set(load(from_version)))
    # Schema from the NEWEST file (manifests append new files at the
    # end), so a change feed spanning an additive schema evolution
    # delivers the post-evolution columns (pre-evolution deltas read
    # NULL there) instead of silently dropping them (round-14 ADVICE
    # #4). ``merge_schema=True`` pays a footer read per delta file for
    # the exact union when the evolution shape is unknown.
    schema = _version_schema(spark, load(to_version))
    if not new_files:
        return local_df(spark, [], schema)
    if merge_schema:
        return spark.read.option("mergeSchema", "true").parquet(*new_files)
    return spark.read.schema(schema).parquet(*new_files)


def _tail_cut_version(path: str, from_version: int, head: int,
                      max_files: int) -> int:
    """The version a rate-limited tail pull should stop at: walk the
    manifests' SEGMENT-NAME lists forward from the cursor, counting
    each new segment's file count (one JSON read per NEW segment —
    the same O(new) arithmetic as `_added_files_between`), and cut
    BEFORE the version that would push the pull past ``max_files``.
    At least one version is always consumed (a single over-budget
    commit must still drain, exactly Delta's maxFilesPerTrigger
    behavior — the knob bounds batches, it cannot wedge the stream).
    Validation of the steps is left to `_added_files_between`, which
    the pull still runs over the cut window."""
    import os

    def raw_of(v: int) -> dict:
        target = os.path.join(path, f"v{v}.manifest.json")
        if not os.path.exists(target):
            raise ValueError(
                f"snapshot_tail: version {v} does not exist at {path} "
                "(expired past the cursor? re-seed the consumer)"
            )
        return _load_raw(target)

    prev = raw_of(from_version) if from_version else {"segments": []}
    taken = 0
    cut = from_version
    for v in range(from_version + 1, head + 1):
        cur = raw_of(v)
        if (
            "segments" in prev
            and "segments" in cur
            and cur["segments"][: len(prev["segments"])] == prev["segments"]
        ):
            p, c = prev["segments"], cur["segments"]
            step = sum(
                len(_load_segment(path, n)["files"]) for n in c[len(p):]
            )
        else:
            # legacy inline step, or a consolidation-rewritten name
            # list (round 19): file-set diff — cached segment loads,
            # bounded by the consolidation's own O(log) segment count
            pf = set(_resolve_meta(path, prev)["files"]) if prev.get(
                "files") or prev.get("segments") else set()
            step = len(set(_resolve_meta(path, cur)["files"]) - pf)
        if cut > from_version and taken + step > max_files:
            break
        taken += step
        cut = v
        prev = cur
    return cut


def _added_files_between(path: str, from_version: int, to_version: int):
    """Files ADDED in (from_version, to_version], validating that every
    step is an append — resolved from the manifests' SEGMENT-NAME
    lists, so the walk costs O(new versions + new segments) JSON
    reads, never O(table files) (an append extends the previous
    manifest's name list by exactly its batch segment, so the prefix
    test is pure list arithmetic). Steps that change the equality- or
    position-delete sets or drop a FILE (COW rewrite, compaction,
    rollback) raise loudly — an added-files read there would
    double-count or skip retractions, the `snapshot_changes`
    contract. Steps that rewrite only the segment NAME list while the
    file set stays append-only — tiered auto-consolidation (round 19)
    and `snapshot_rewrite_segments` — fall back to the resolved
    file-set diff and deliver normally; legacy inline manifests take
    the same fallback (O(its files), paid only on pre-17 history)."""
    import os

    def raw_of(v: int) -> dict:
        target = os.path.join(path, f"v{v}.manifest.json")
        if not os.path.exists(target):
            raise ValueError(
                f"snapshot_tail: version {v} does not exist at {path} "
                "(expired past the cursor? re-seed the consumer)"
            )
        return _load_raw(target)

    # ordered step list — ("seg", name) | ("files", [f, ...]) — so
    # COMMIT ORDER is preserved, not lexicographic: `_version_schema`
    # plans the delta's schema from files[-1] (the newest commit's
    # file — the additive-evolution contract), and staged dir names
    # are uuid-random so a sort would scramble that.
    steps: list = []
    prev = raw_of(from_version)
    for v in range(from_version + 1, to_version + 1):
        cur = raw_of(v)
        if (cur.get("deletes") or []) != (prev.get("deletes") or []) or (
            cur.get("pos_deletes") or []
        ) != (prev.get("pos_deletes") or []):
            raise ValueError(
                f"snapshot_tail: version {v} changes the merge-on-read "
                "delete set; append-only lineage required"
            )
        if (cur.get("renames") or []) != (prev.get("renames") or []):
            # a rename step delivers no files but shifts the LOGICAL
            # schema under the consumer — refuse like a rewrite;
            # events constant across the window are safe (every file
            # added after an event already carries the new name)
            raise ValueError(
                f"snapshot_tail: version {v} renames a column inside "
                "the window — re-seed past it, or "
                "snapshot_materialize_renames the table"
            )
        if "segments" in prev and "segments" in cur:
            p, c = prev["segments"], cur["segments"]
            if c[: len(p)] == p:
                steps += [("seg", n) for n in c[len(p):]]
            else:
                # the NAME list was rewritten — auto tiered
                # consolidation does exactly that on a growing commit
                # (round 19) — but the append contract lives at the
                # FILE level: fall back to the resolved file-set diff,
                # which delivers the same rows and still refuses a
                # real rewrite (a dropped file fails the subset test).
                # O(head segments) cached loads, bounded small by the
                # consolidation itself.
                pf = set(_resolve_meta(path, prev)["files"])
                cf_list = _resolve_meta(path, cur)["files"]
                if not pf <= set(cf_list):
                    raise ValueError(
                        f"snapshot_tail: version {v} is not an append "
                        f"(it drops "
                        f"{len(pf - set(cf_list))} file(s) of the "
                        "previous version); append-only lineage required"
                    )
                steps.append(
                    ("files", [f for f in cf_list if f not in pf])
                )
        else:
            # legacy inline step: exact file-set diff, paid once
            pf = set(_resolve_meta(path, prev)["files"])
            cf = set(_resolve_meta(path, cur)["files"])
            if not pf <= cf:
                raise ValueError(
                    f"snapshot_tail: version {v} is not an append "
                    f"(it drops {len(pf - cf)} file(s)); append-only "
                    "lineage required"
                )
            steps.append(("files", sorted(cf - pf)))
        prev = cur
    files: list = []
    for kind, val in steps:
        files += _load_segment(path, val)["files"] if kind == "seg" else val
    seen: set = set()
    out: list = []
    for f in files:
        if f not in seen:
            seen.add(f)
            out.append(f)
    return out


def _read_cursor(state_path: str, path: str, op: str) -> int:
    """The durable tail cursor, validated against the table it was
    written for: a cursor file accidentally pointed at a different
    table would silently skip that table's early versions (the
    version numbers alias), so the mismatch raises instead."""
    import json
    import os

    if not os.path.exists(state_path):
        return 0
    with open(state_path) as f:
        state = json.load(f)
    table = state.get("table")
    if table is not None and table != os.path.abspath(path):
        raise ValueError(
            f"{op}: cursor file {state_path} belongs to table "
            f"{table!r}, not {os.path.abspath(path)!r} — refusing to "
            "misapply its version"
        )
    if "version" not in state:
        # truncated or hand-edited state: the module's loud-ValueError
        # house style, not a bare KeyError (round-18 review)
        raise ValueError(
            f"{op}: cursor file {state_path} is malformed (no "
            "'version' key) — re-seed the consumer with "
            "snapshot_tail_seed or delete the state file"
        )
    return int(state["version"])


def snapshot_tail_seed(path: str, state_path: str, version: int,
                       force: bool = False) -> None:
    """Pre-position a tail consumer's cursor AT ``version`` without
    reading anything — the escape hatch both tail sources' refusal
    messages point at: seed a consumer at a compacted version (whose
    read you materialized some other way, or chose to skip), then
    pull only what lands after it. Validates the version exists so a
    typo can't silently skip history; writes the same table-scoped
    cursor file `ack` writes (atomic tmp+rename).

    Re-seeding an EXISTING cursor that belongs to a DIFFERENT table
    refuses unless ``force=True`` (round-18 review): seeding state
    path A with table B's path would silently re-target a live
    consumer — the same mismatch `_read_cursor` already rejects on
    the read side."""
    import json
    import os

    target = os.path.join(path, f"v{version}.manifest.json")
    if not os.path.exists(target):
        raise ValueError(
            f"snapshot_tail_seed: version {version} does not exist at "
            f"{path}"
        )
    if not force and os.path.exists(state_path):
        with open(state_path) as f:
            prior = json.load(f).get("table")
        if prior is not None and prior != os.path.abspath(path):
            raise ValueError(
                f"snapshot_tail_seed: cursor file {state_path} belongs "
                f"to table {prior!r}, not {os.path.abspath(path)!r} — "
                "pass force=True to deliberately re-target the consumer"
            )
    tmp = f"{state_path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(
            {"version": int(version), "table": os.path.abspath(path)}, f
        )
    os.replace(tmp, state_path)


def snapshot_tail(spark, path: str, state_path: str,
                  merge_schema: bool = False,
                  max_files: int | None = None,
                  across_compaction: bool = False):
    """CHECKPOINTED INCREMENTAL SOURCE over the snapshot table — the
    Delta `readStream`-on-a-table analog on the D102 protocol: each
    pull resolves the head manifest, validates that every commit since
    the consumer's durable cursor is an APPEND, and returns exactly
    the rows those commits added. Planning cost per pull is O(new
    versions + new segments) driver JSON plus O(|new data|) read — a
    downstream consumer of a 100 TB table pays for its deltas, never
    the table.

    Returns ``(df, from_version, to_version, ack)``. The consumer
    processes ``df`` downstream and then calls ``ack()`` to durably
    advance the cursor (atomic tmp+rename) — crash BEFORE ack means
    the next pull re-delivers the same versions (at-least-once).
    Exactly-once composes the same way the streaming sinks do it:
    commit downstream with ``snapshot_append(..., batch_id=
    to_version)`` (or any idempotent keyed write) so a re-delivered
    pull resolves to a ledger no-op. A cursor at the head returns an
    empty frame with ``from_version == to_version``.

    A commit that is NOT an append (COW delete/merge, MOR delete,
    rollback — and compaction unless ``across_compaction``) raises
    loudly — the tailing consumer must re-seed (full refresh) or
    switch to `snapshot_changes_cdf` for retraction-aware feeds,
    exactly Delta's ignoreChanges contract made explicit. A segment
    consolidation (tiered auto-merge or `snapshot_rewrite_segments`)
    is NOT a rewrite at the file level and delivers normally.

    ``across_compaction`` (round 19 — the r18 verdict's maintenance-
    boundary item): survive `snapshot_compact` commits automatically.
    The pull splits into append-only windows at the ``operation:
    compact`` stamps: it drains the rows appended BEFORE the
    compaction from the pre-compact manifests (their files still
    exist until `snapshot_expire`), steps the cursor over the
    boundary for zero rows, and continues after it — no rows lost,
    none duplicated, and the consumer never re-reads the compacted
    table. The crossing is safe even when the compact APPLIED
    pending MOR deletes: a delete-set CHANGE inside any window still
    refuses (below), so entries pending at a boundary predate the
    cursor, and the MOR sequence rule scopes them to files present
    at THEIR commit — none holding rows this consumer has yet to
    drain. Delta's ignoreChanges delivers rewritten files
    (duplicates, caller dedups); this is the stronger
    exactly-the-appends contract, possible because the protocol
    stamps its maintenance commits.

    ``max_files`` (Delta's maxFilesPerTrigger): bound the pull to at
    most that many data files, cutting at a VERSION boundary so the
    cursor stays a consistent checkpoint; the backlog drains across
    successive pulls. A single over-budget commit still drains whole
    (the knob bounds batches; it cannot wedge the stream). The cut
    walk costs the same O(new segments) JSON arithmetic as the pull
    itself. Not applied to a from-scratch seed's head==cut case —
    a cur==0 seed cuts too, draining the initial backfill in
    version-sized steps. Composes with ``across_compaction``: the
    budget applies per append window, and a cut inside a window
    stops the pull there (the next pull resumes and crosses)."""
    import json
    import os

    manifests = _manifests(path)
    if not manifests:
        raise ValueError(f"snapshot_tail: no manifests under {path}")
    head = _manifest_version(manifests[-1])
    cur = _read_cursor(state_path, path, "snapshot_tail")
    if cur > head:
        raise ValueError(
            f"snapshot_tail: cursor v{cur} is ahead of head v{head} — "
            "the table was rolled over or the state file belongs to a "
            "different table"
        )

    boundaries: list = []
    if across_compaction and 0 < cur < head:
        for v in range(cur + 1, head + 1):
            t = os.path.join(path, f"v{v}.manifest.json")
            if not os.path.exists(t):
                raise ValueError(
                    f"snapshot_tail: version {v} does not exist at "
                    f"{path} (expired past the cursor? re-seed the "
                    "consumer)"
                )
            if _load_raw(t).get("operation") == "compact":
                boundaries.append(v)

    new_files: list | None = None
    if boundaries:
        # ACROSS-COMPACTION pull: drain each append-only window, then
        # step over the (content-preserving) compact commit for zero
        # rows. Same O(window versions + new segments) planning.
        new_files = []
        remaining = int(max_files) if max_files is not None else None
        lo = final = cur
        for b in boundaries + [None]:
            w_end = head if b is None else b - 1
            if w_end > lo:
                end = w_end
                if remaining is not None:
                    end = _tail_cut_version(path, lo, w_end, remaining)
                step_files = _added_files_between(path, lo, end)
                new_files += step_files
                if remaining is not None:
                    remaining -= len(step_files)
                final = lo = end
                if end < w_end or (
                    remaining is not None and remaining <= 0
                ):
                    break
            if b is None:
                break
            # crossing is safe even when the compact APPLIED pending
            # MOR deletes: a delete-set CHANGE inside any window
            # already refused above, so entries pending at the
            # boundary predate the cursor — and the sequence rule
            # scopes them to files present at THEIR commit, none of
            # which hold rows this consumer has yet to drain
            final = lo = b
        head = final
    elif max_files is not None and head > cur:
        # RATE LIMIT (Delta's maxFilesPerTrigger): cut the pull at the
        # last version that keeps the file budget — the cursor then
        # advances to the CUT, so the backlog drains across pulls and
        # every version boundary stays a consistent checkpoint
        head = _tail_cut_version(path, cur, head, int(max_files))

    def ack():
        tmp = f"{state_path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"version": head, "table": os.path.abspath(path)}, f)
        os.replace(tmp, state_path)

    raw = _load_raw(os.path.join(path, f"v{head}.manifest.json"))
    if cur == head:
        # schema-only resolve: ONE footer via the newest file of the
        # newest segment — not _load_meta, which would pull every
        # segment of a 100 TB table for an empty pull
        if "segments" in raw and raw["segments"]:
            last = _load_segment(path, raw["segments"][-1])["files"]
        else:
            last = raw.get("files") or []
        schema = _renamed_schema(
            _version_schema(spark, last), path, raw, last[-1]
        )
        return local_df(spark, [], schema), cur, head, ack
    if cur == 0:
        # first pull: everything visible at head, but STILL validated —
        # a pending MOR delete means "all head files" is not "all rows"
        if raw.get("deletes") or raw.get("pos_deletes"):
            raise ValueError(
                "snapshot_tail: head has pending merge-on-read deletes; "
                "seed from a compacted version or use snapshot_changes_cdf"
            )
        if raw.get("renames"):
            # a raw first pull would force the newest file's schema
            # onto pre-rename files, silently nulling the renamed
            # column there — seed through the logical read instead
            raise ValueError(
                "snapshot_tail: head carries metadata-only column "
                "renames; seed the consumer from snapshot_read (or "
                "snapshot_tail_changes' seed), or "
                "snapshot_materialize_renames the table"
            )
        new_files = _load_meta(
            path, os.path.join(path, f"v{head}.manifest.json")
        )["files"]
    elif new_files is None:  # the across-compaction path filled it
        new_files = _added_files_between(path, cur, head)
    if not new_files:
        # e.g. the window holds only metadata-only commits (layout
        # evolution): schema from the newest segment's newest file
        if "segments" in raw and raw["segments"]:
            last = _load_segment(path, raw["segments"][-1])["files"]
        else:
            last = raw.get("files") or []
        schema = _renamed_schema(
            _version_schema(spark, last), path, raw, last[-1]
        )
        return local_df(spark, [], schema), cur, head, ack
    schema = _version_schema(spark, new_files)
    if merge_schema:
        df = spark.read.option("mergeSchema", "true").parquet(*new_files)
    else:
        df = spark.read.schema(schema).parquet(*new_files)
    return df, cur, head, ack


def snapshot_tail_changes(spark, path: str, state_path: str,
                          across_compaction: bool = False):
    """RETRACTION-AWARE checkpointed source — `snapshot_tail`'s
    sibling for consumers that can fold deletes (incremental MV
    maintenance, downstream index upkeep): each pull returns
    CDF-SHAPED rows (``_change_type`` in {'insert','delete'}, the
    `snapshot_changes_cdf` contract) for every commit since the
    durable cursor, so merge-on-read retractions flow through instead
    of refusing. A from-scratch seed emits the head's LIVE view
    (MOR-resolved) as inserts — well-defined even over pending
    deletes, unlike an added-files seed. Returns ``(df, from_version,
    to_version, ack)`` with the same at-least-once ack contract as
    `snapshot_tail`; exactly-once composes with an idempotent
    downstream commit keyed by ``to_version``. COW rewrites and
    rollback still refuse (inherited from `snapshot_changes_cdf` —
    a rewrite step has no row-level delta representation; re-seed
    the consumer there, Delta's ignoreChanges contract).

    ``across_compaction`` (round 19, mirroring `snapshot_tail`):
    a `snapshot_compact` commit is ALWAYS a ZERO-DELTA step in LIVE
    terms for a CDF consumer — it writes exactly the previous
    version's MOR-resolved live rows (live(b) == live(b-1) by
    construction), and the retractions any pending delete represents
    were delivered at the delete's OWN step, inside this pull's
    window or before the cursor. The pull therefore splits at the
    ``operation: compact`` stamps, unions the per-window CDF deltas,
    and steps the cursor over each boundary — an incremental MV stays
    continuously maintained straight through the table's maintenance
    schedule, pending deletes included."""
    import json
    import os

    from functools import reduce

    from pyspark.sql import functions as F

    manifests = _manifests(path)
    if not manifests:
        raise ValueError(f"snapshot_tail_changes: no manifests under {path}")
    head = _manifest_version(manifests[-1])
    cur = _read_cursor(state_path, path, "snapshot_tail_changes")
    if cur > head:
        raise ValueError(
            f"snapshot_tail_changes: cursor v{cur} is ahead of head "
            f"v{head} — the state file belongs to a different table"
        )

    boundaries: list = []
    if across_compaction and 0 < cur < head:
        for v in range(cur + 1, head + 1):
            t = os.path.join(path, f"v{v}.manifest.json")
            if not os.path.exists(t):
                raise ValueError(
                    f"snapshot_tail_changes: version {v} does not "
                    f"exist at {path} (expired past the cursor? "
                    "re-seed the consumer)"
                )
            if _load_raw(t).get("operation") == "compact":
                boundaries.append(v)

    def ack():
        tmp = f"{state_path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"version": head, "table": os.path.abspath(path)}, f)
        os.replace(tmp, state_path)

    if cur == head:
        # schema-only resolve: ONE segment, one footer — not
        # _load_meta, which would pull every segment of a 100 TB
        # table for an empty pull (the snapshot_tail rule)
        raw = _load_raw(manifests[-1])
        if "segments" in raw and raw["segments"]:
            last = _load_segment(path, raw["segments"][-1])["files"]
        else:
            last = raw.get("files") or []
        schema = _renamed_schema(
            _version_schema(spark, last), path, raw, last[-1]
        )
        empty = local_df(spark, [], schema).withColumn(
            "_change_type", F.lit(None).cast("string")
        )
        return empty, cur, head, ack
    if cur == 0:
        df = snapshot_read(spark, path, version=head).withColumn(
            "_change_type", F.lit("insert")
        )
    elif boundaries:
        # across-compaction: union the per-window CDF deltas; each
        # compact boundary is a zero-delta step iff the pre-compact
        # version had no pending MOR deletes
        parts = []
        lo = cur
        for b in boundaries + [None]:
            w_end = head if b is None else b - 1
            if w_end > lo:
                parts.append(snapshot_changes_cdf(spark, path, lo, w_end))
            if b is None:
                break
            # a compact is ALWAYS a zero-delta step in LIVE terms for
            # a CDF consumer: it writes exactly the previous version's
            # MOR-resolved live rows (live(b) == live(b-1) by
            # construction), and the retractions a pending delete
            # represents were delivered at the delete's own step —
            # inside this pull's window or before the cursor
            lo = b
        if not parts:
            raw = _load_raw(manifests[-1])
            if "segments" in raw and raw["segments"]:
                last = _load_segment(path, raw["segments"][-1])["files"]
            else:
                last = raw.get("files") or []
            schema = _renamed_schema(
                _version_schema(spark, last), path, raw, last[-1]
            )
            df = local_df(spark, [], schema).withColumn(
                "_change_type", F.lit(None).cast("string")
            )
        else:
            df = reduce(lambda a, b: a.unionByName(b), parts)
    else:
        df = snapshot_changes_cdf(spark, path, cur, head)
    return df, cur, head, ack


def snapshot_rollback(spark, path: str, to_version: int) -> int:
    """ROLLBACK as a new commit (round 14): the new version's file set
    IS ``to_version``'s — the bad commits stay in history (time travel
    remains the audit trail; `snapshot_expire` is the deletion knob)
    but the table head serves the old state again. No data is read,
    copied, or rewritten: rollback is one manifest write, O(1) in the
    table size, exactly how Delta/Iceberg RESTORE works. Zone-map
    stats of the restored version are carried so pruning survives."""
    import json
    import os

    target = os.path.join(path, f"v{to_version}.manifest.json")
    if not os.path.exists(target):
        raise ValueError(
            f"snapshot_rollback: version {to_version} does not exist at {path}"
        )
    manifests = _manifests(path)
    version = _manifest_version(manifests[-1]) + 1
    old = _load_raw(target)
    # restore the old version's state VERBATIM in its own grammar —
    # a segmented manifest restores as O(#segments) name references,
    # keeping rollback O(1) in the table's file count
    meta = {"version": version}
    for carry in (
        "segments", "files", "stats", "blooms", "deletes", "pos_deletes",
        "layout", "renames",
    ):
        if carry in old:
            meta[carry] = old[carry]
    # the batch map carries from the LATEST head, NOT the rollback
    # target: rolling back past a batch's commit must not turn its
    # crash-replay into a duplicate re-append (the manifest walk kept
    # that true pre-18; the map keeps it true in O(1))
    _stamp_recent_batches(meta, _load_raw(manifests[-1]), version - 1, path=path)
    _commit_manifest(path, version, meta)
    return version


def _batch_ledger_path(path: str) -> str:
    import os

    return os.path.join(path, "batch_ids.json")


def _read_batch_ledger(path: str) -> dict:
    """The retired-batch ledger ``path/batch_ids.json``: batch_id (as a
    JSON string key) -> the version it originally committed as. Written
    only by `snapshot_expire`; consulted by `snapshot_append` so a
    crash-replay of a batch OLDER than retention stays a no-op instead
    of re-appending as a duplicate (round-14 ADVICE #5b)."""
    import json
    import os

    p = _batch_ledger_path(path)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


#: bound on the batch_id → version map every commit carries forward
#: (Delta's SetTransaction retention reduced to a count cap): 1024
#: entries ≈ a day of minute-granularity micro-batches, a few tens of
#: KB of manifest bytes — O(1) per commit, never O(#batches).
_RECENT_BATCHES_CAP = 1024


def _recent_batches_next(raw: dict, head_version: int,
                         batch_id: int | None = None,
                         new_version: int | None = None,
                         path: str | None = None):
    """The (map, floor) a NEW commit carries (round 18 — the
    `snapshot_batch_version` walk was the metadata layer's remaining
    per-commit O(history) cost: every micro-batch's idempotence check
    opened EVERY surviving manifest, O(N²) cumulative over a stream's
    life). The map records recent batch_id → version; ``floor`` is
    the highest version whose batch stamp may be MISSING from the map
    (evictions past the cap, and everything up to the migration point
    on a pre-18 table) — a lookup can conclude absence without any
    walk exactly when floor is 0, and otherwise walks only manifests
    ≤ floor. The map can never hold a false entry (it is extended
    only by the committing writer with its own version), so a hit is
    always safe, expired-manifest semantics included (same contract
    as the retired ledger: the version may no longer be readable)."""
    if "recent_batches" in raw:
        m = dict(raw["recent_batches"])
        floor = int(raw.get("recent_batches_floor", 0))
    else:
        # migration: pre-18 manifests may carry batch stamps the map
        # has never seen. BACKFILL them here (round 19 — r18 ADVICE
        # #4): walk the surviving manifests ONCE, at this migration
        # commit, and seed the map with every stamp found, so the
        # floor drops to 0 and every later miss concludes in O(1)
        # instead of re-walking O(floor) manifests until retention
        # expires them. Stamps already expired live in the retired
        # ledger, which `snapshot_batch_version` consults first, so
        # floor 0 stays sound. Without a path (no caller does this)
        # the pre-19 conservative floor applies.
        m = {}
        floor = int(head_version)
        if path is not None:
            for mf in _manifests(path):
                if _manifest_version(mf) > head_version:
                    continue
                mm = _load_raw(mf)
                if mm.get("batch_id") is not None:
                    m[str(mm["batch_id"])] = int(mm["version"])
            floor = 0
    if batch_id is not None:
        m[str(batch_id)] = int(new_version)
    if len(m) > _RECENT_BATCHES_CAP:
        items = sorted(m.items(), key=lambda kv: kv[1])
        evicted = items[: -_RECENT_BATCHES_CAP]
        floor = max(floor, max(v for _, v in evicted))
        m = dict(items[-_RECENT_BATCHES_CAP:])
    return m, floor


def _stamp_recent_batches(meta: dict, raw: dict, head_version: int,
                          batch_id: int | None = None,
                          path: str | None = None) -> None:
    """Apply `_recent_batches_next` to a commit's ``meta`` in place
    (every commit path calls this, so the map survives deletes,
    compactions, layout evolution and rollback unbroken). ``path``
    enables the one-time migration backfill on pre-18 tables."""
    m, floor = _recent_batches_next(
        raw, head_version, batch_id, meta.get("version"), path=path
    )
    meta["recent_batches"] = m
    if floor:
        meta["recent_batches_floor"] = floor
    # CHECK constraints ride EVERY commit from the current head
    # (round 19 — Delta table-property semantics: rewrites, deletes,
    # compactions and rollback keep the policy in force; only the
    # set/drop-constraint commits, which set the key themselves,
    # change it). One line here instead of one per commit path, so a
    # future commit path cannot silently drop the table's contract.
    if "constraints" not in meta and raw.get("constraints"):
        meta["constraints"] = raw["constraints"]


def snapshot_batch_version(path: str, batch_id: int) -> int | None:
    """The version that committed ``batch_id``, or None (round 16 —
    the exactly-once lookup shared by `snapshot_append` and the
    streaming WAP sink): the retired-batch ledger first (batches past
    retention), then the HEAD manifest's bounded ``recent_batches``
    map (round 18 — one JSON read, O(1) for both hits and misses when
    the map is complete), and only then the manifest walk, restricted
    to versions ≤ the map's completeness floor (cap evictions only:
    since round 19 the migration commit BACKFILLS pre-18 stamps into
    the map — `_recent_batches_next` — so a migrated table's floor is
    0 and misses stay O(1); tables migrated by round 18 keep their
    conservative floor until retention expires it). Pre-18: every
    lookup — including the nothing-committed-yet common case of each
    NEW micro-batch — opened every surviving manifest: O(versions)
    per commit, O(N²) over a stream's life."""
    import json

    retired = _read_batch_ledger(path)
    if str(batch_id) in retired:
        return retired[str(batch_id)]
    manifests = _manifests(path)
    if not manifests:
        return None
    head = _load_raw(manifests[-1])
    if "recent_batches" in head:
        hit = head["recent_batches"].get(str(batch_id))
        if hit is not None:
            return int(hit)
        floor = int(head.get("recent_batches_floor", 0))
        if floor <= 0:
            return None  # the map is complete: absence without a walk
        walk = [m for m in manifests if _manifest_version(m) <= floor]
    else:
        walk = manifests
    for m in reversed(walk):  # newest first: replays are recent
        with open(m) as f:
            meta = json.load(f)
        if meta.get("batch_id") == batch_id:
            return meta["version"]
    return None


def snapshot_expire(
    spark, path: str, keep_last: int = 1, orphan_grace_secs: float = 86400.0
) -> dict:
    """RETENTION / VACUUM (round 14 — the knob every docstring in this
    family deferred to): drop all but the newest ``keep_last``
    manifests, then delete every data file under ``path/data`` that NO
    surviving manifest references. Two-phase on purpose — manifests
    vanish FIRST, so a crash between phases strands unreferenced files
    (re-vacuumable garbage) but can never break a surviving version;
    the reverse order could delete a file a still-live manifest
    references. Readers pinned to an expired version fail loudly at
    resolve time (the manifest is gone), which is the retention
    contract: erasure SLAs bound time travel. Only files inside the
    table's own data directory are ever deleted.

    The sweep covers ORPHANS too (round-14 ADVICE #5a): staged files
    that never made it into any manifest (a writer that lost the
    commit race to a replay of its own batch, or exhausted its
    retries) used to leak forever because the old sweep only deleted
    (referenced-by-dropped − live). Now every unreferenced data file
    older than ``orphan_grace_secs`` is removed; the grace window
    (default 24 h — the Iceberg remove-orphans convention) protects a
    CONCURRENT writer's staged-but-not-yet-committed batch from being
    swept mid-commit. Pass 0 only when no writer can be in flight.

    Expired manifests' batch_ids are carried into a persistent ledger
    (``batch_ids.json``, atomic replace) before the manifests are
    deleted (ADVICE #5b): `snapshot_append` checks the ledger, so a
    crash-replay of a batch older than retention returns its original
    version as a no-op instead of silently double-appending. Returns
    ``{"manifests_removed", "files_deleted", "orphans_deleted"}``.

    Holds `_catalog_lock` for the whole retention pass (round-16
    ADVICE): the refs read, the ledger rewrite and the manifest
    deletions form one read-modify-write — without the lock a tag
    committed between the refs read and the deletes could pin a
    version whose manifest this pass already dropped."""
    if keep_last < 1:
        raise ValueError("snapshot_expire: keep_last must be >= 1")
    with _catalog_lock(path) as fence:
        return _snapshot_expire_locked(
            spark, path, keep_last, orphan_grace_secs, fence
        )


def _snapshot_expire_locked(
    spark, path: str, keep_last: int, orphan_grace_secs: float,
    fence=lambda: None,
) -> dict:
    import json
    import os
    import time

    manifests = _manifests(path)
    if not manifests:
        raise ValueError(f"snapshot_expire: no manifests under {path}")
    drop, keep = manifests[:-keep_last], manifests[-keep_last:]
    # TAGGED versions are retention guarantees (round 15 — the Iceberg
    # ref rule): a manifest named by any ref moves from the drop set to
    # the keep set no matter how old it is; its batch_id therefore also
    # stays out of the retired ledger (the manifest remains the
    # authority while the tag lives)
    tagged = {
        os.path.join(path, f"v{v}.manifest.json")
        for v in snapshot_refs(path).values()
    }
    if tagged:
        keep = sorted(
            set(keep) | (set(drop) & tagged), key=_manifest_version
        )
        drop = [m for m in drop if m not in tagged]

    def _all_refs(meta: dict) -> set:
        # data files AND equality-delete files: both are load-bearing
        # for the version (sweeping a live delete file would resurrect
        # its deleted rows)
        refs = {os.path.abspath(p) for p in meta["files"]}
        for d in (meta.get("deletes") or []) + (meta.get("pos_deletes") or []):
            refs |= {os.path.abspath(p) for p in d["files"]}
        return refs

    live: set = set()
    live_segments: set = set()
    for m in keep:
        kraw = _load_raw(m)
        live |= _all_refs(_resolve_meta(path, kraw))
        for name in kraw.get("segments") or []:
            live_segments.add(name)
        for d in kraw.get("deletes") or []:
            live_segments.update(d.get("applies_to_segments") or [])
        for e in kraw.get("renames") or []:
            # a rename event's cover resolves through its recorded
            # segment names for the event's whole life (round 19)
            live_segments.update(e.get("applies_to_segments") or [])
    # staged WAP branches are live too (round 15): their files are
    # referenced by no version manifest YET — sweeping them would kill
    # an in-flight write-audit-publish older than the grace window
    import glob as _glob

    for bm in _glob.glob(os.path.join(path, "branch-*.manifest.json")):
        with open(bm) as f:
            live |= {os.path.abspath(p) for p in json.load(f)["files"]}
    referenced: set = set()
    dropped_segments: set = set()
    retired: dict = dict(_read_batch_ledger(path))
    for m in drop:
        draw = _load_raw(m)
        meta = _resolve_meta(path, draw)
        referenced |= _all_refs(meta)
        dropped_segments.update(draw.get("segments") or [])
        for d in draw.get("deletes") or []:
            dropped_segments.update(d.get("applies_to_segments") or [])
        for e in draw.get("renames") or []:
            dropped_segments.update(e.get("applies_to_segments") or [])
        if meta.get("batch_id") is not None:
            retired[str(meta["batch_id"])] = meta["version"]
    # ledger BEFORE manifest deletion: a crash after this point may
    # leave both the manifest and the ledger entry (harmless — both
    # idempotence paths agree), never neither
    # fence before the first destructive write: from here on the pass
    # mutates shared state (ledger, manifests, segments, data files) —
    # a holder whose lock was broken must abort BEFORE any of it
    fence()
    if retired:
        tmp = _batch_ledger_path(path) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(retired, f)
        os.replace(tmp, _batch_ledger_path(path))
    for m in drop:
        os.remove(m)
    # SEGMENT GC (round 17): a segment no surviving manifest (or any
    # surviving delete entry's coverage) references is dead metadata.
    # Segments the DROPPED manifests referenced are definitively dead
    # (they were committed; their history is now erased) — removed at
    # once; unreferenced segments of UNKNOWN provenance (an abandoned
    # writer's) get the same mtime grace window as data orphans, which
    # protects a concurrent writer's just-written, not-yet-committed
    # batch segment.
    cutoff0 = time.time() - orphan_grace_secs
    for sp in _glob.glob(os.path.join(path, "seg-*.segment.json")):
        name = os.path.basename(sp)
        if name in live_segments:
            continue
        try:
            if name not in dropped_segments and os.path.getmtime(sp) > cutoff0:
                continue
            os.remove(sp)
        except OSError:
            continue
    data_root = os.path.abspath(os.path.join(path, "data"))
    deleted = orphans = 0
    cutoff = time.time() - orphan_grace_secs
    for root, _dirs, files in os.walk(data_root):
        for name in files:
            p = os.path.abspath(os.path.join(root, name))
            if p in live or not name.endswith(".parquet"):
                continue
            was_referenced = p in referenced
            try:
                if not was_referenced and os.path.getmtime(p) > cutoff:
                    continue  # possibly a concurrent writer's staged batch
                os.remove(p)
            except OSError:
                continue
            if was_referenced:
                deleted += 1
            else:
                orphans += 1
    # prune batch dirs the sweep emptied (pure tidiness — absent dirs
    # and non-empty dirs are both fine)
    for root, dirs, _files in list(os.walk(data_root, topdown=False)):
        for d in dirs:
            try:
                os.rmdir(os.path.join(root, d))
            except OSError:
                pass
    return {
        "manifests_removed": len(drop),
        "files_deleted": deleted,
        "orphans_deleted": orphans,
    }


def _refs_path(path: str) -> str:
    import os

    return os.path.join(path, "refs.json")


def _catalog_lock(path: str, timeout_secs: float = 30.0,
                  stale_secs: float = 300.0):
    """Serialize refs.json / batch-ledger mutation (round-16 ADVICE):
    `snapshot_tag` / `snapshot_untag` / `snapshot_expire` are
    read-modify-write over shared JSON — atomic REPLACE alone cannot
    stop two concurrent writers from losing one of their updates, and
    expire additionally deletes manifests based on the refs it read,
    so a tag committed between that read and the deletes would pin a
    version whose manifest is already gone (a silently void retention
    guarantee). This context manager gives those three paths the same
    exclusive-create arbitration `_commit_manifest` gets from
    ``os.link``: a ``.catalog.lock`` file created O_EXCL, retried up
    to ``timeout_secs``, with a ``stale_secs`` breaker for a crashed
    holder (the single-node analogue of a catalog service's lease; a
    production build replaces the whole file protocol with that
    service, as `snapshot_append`'s docstring already states).

    Race discipline (round-16 review): the stale break is an atomic
    ``os.rename`` to a unique tombstone — of two waiters that both
    judge the lock stale, exactly ONE rename succeeds, so a breaker
    can never delete the lock another waiter just freshly created
    (the remove-based break's TOCTOU). Release is TOKEN-CHECKED: the
    holder removes the lock only if it still carries its own token,
    so a holder that overran ``stale_secs`` and was broken cannot
    release its breaker's live lock on exit."""
    import contextlib
    import os
    import time
    import uuid

    @contextlib.contextmanager
    def _cm():
        if not os.path.isdir(path):
            raise ValueError(
                f"catalog lock: no table directory at {path}"
            )
        lock = os.path.join(path, ".catalog.lock")
        token = f"{os.getpid()}-{uuid.uuid4().hex}"
        deadline = time.time() + timeout_secs
        while True:
            # deadline at the TOP of the retry loop (round-16 ADVICE
            # #3b): every path through the body — including the
            # except-OSError re-probe that used to skip the check —
            # re-tests it, so pathological lock churn cannot loop past
            # timeout_secs
            if time.time() > deadline:
                raise TimeoutError(
                    f"catalog lock at {path} busy for >{timeout_secs}s"
                )
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, token.encode())
                os.close(fd)
                break
            except FileExistsError:
                try:
                    stale = time.time() - os.path.getmtime(lock) > stale_secs
                except OSError:
                    continue  # holder released between test and stat
                if stale:
                    dead = lock + f".dead-{uuid.uuid4().hex[:8]}"
                    try:
                        os.rename(lock, dead)  # one breaker wins
                    except OSError:
                        continue  # lost the break race — re-probe
                    with contextlib.suppress(OSError):
                        os.remove(dead)
                    continue
                time.sleep(0.05)

        def fence():
            # WRITE FENCING (round-16 ADVICE #3a): a holder that
            # overran stale_secs may have been broken — its token is
            # gone — yet it is still executing inside the `with`.
            # Callers re-verify the token IMMEDIATELY before each
            # protected write, so a broken holder aborts loudly
            # instead of mutating refs/ledger/manifests concurrently
            # with its breaker (the lost update the lock exists to
            # prevent).
            try:
                with open(lock) as f:
                    if f.read() == token:
                        return
            except OSError:
                pass
            raise TimeoutError(
                f"catalog lock at {path} was broken while held (holder "
                f"exceeded stale_secs={stale_secs}); aborting before the "
                "protected write"
            )

        try:
            yield fence
        finally:
            try:
                with open(lock) as f:
                    mine = f.read() == token
            except OSError:
                mine = False
            if mine:
                with contextlib.suppress(OSError):
                    os.remove(lock)

    return _cm()


def snapshot_tag(path: str, name: str, version: int | None = None) -> int:
    """Named REF on the snapshot table (round 15 — Iceberg tags /
    Delta's named restore points): bind ``name`` to a version (default
    the head) in ``refs.json`` (atomic replace). Tags make pinning
    HUMAN-OPERABLE — "the snapshot the March run trained on" instead
    of a version number in a notebook — and they are load-bearing for
    retention: `snapshot_expire` NEVER drops a tagged version's
    manifest, so a tag is a retention guarantee, not a comment
    (exactly Iceberg's ref-retention rule). Returns the bound
    version; re-tagging a name rebinds it. Tag/untag/expire serialize
    through `_catalog_lock`, so no concurrent update is ever lost and
    a tag can never race expire into pinning an already-dropped
    manifest."""
    import json
    import os

    with _catalog_lock(path) as fence:
        manifests = _manifests(path)
        if not manifests:
            raise ValueError(f"snapshot_tag: no manifests under {path}")
        if version is None:
            version = _manifest_version(manifests[-1])
        elif not os.path.exists(
            os.path.join(path, f"v{version}.manifest.json")
        ):
            raise ValueError(f"snapshot_tag: version {version} does not exist")
        refs = snapshot_refs(path)
        refs[name] = version
        tmp = _refs_path(path) + f".{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump(refs, f)
        fence()  # still the holder? (see _catalog_lock write fencing)
        os.replace(tmp, _refs_path(path))
        return version


def snapshot_refs(path: str) -> dict:
    """All named refs: {name: version}."""
    import json
    import os

    p = _refs_path(path)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def snapshot_untag(path: str, name: str) -> None:
    """Drop a ref; the version it pinned becomes expirable again.
    Serialized via `_catalog_lock` (see `snapshot_tag`)."""
    import json
    import os

    with _catalog_lock(path) as fence:
        refs = snapshot_refs(path)
        refs.pop(name, None)
        tmp = _refs_path(path) + f".{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump(refs, f)
        fence()  # still the holder? (see _catalog_lock write fencing)
        os.replace(tmp, _refs_path(path))


def snapshot_read_ref(spark, path: str, name: str):
    """Read the table AS OF a named ref — `snapshot_read` at the
    tagged version."""
    refs = snapshot_refs(path)
    if name not in refs:
        raise ValueError(f"snapshot_read_ref: no ref {name!r} at {path}")
    return snapshot_read(spark, path, version=refs[name])


def snapshot_clone(
    spark, src: str, dest: str, version: int | None = None,
    deep: bool = False,
) -> int:
    """CLONE the snapshot table (round 19 — Delta's CREATE TABLE
    CLONE / Iceberg snapshot-ref forks, the missing member of the
    tag/branch/rollback family): ``dest`` becomes an independent
    table whose v1 equals ``src`` at ``version`` (default head), with
    its own history, refs, ledger and retention from then on —
    divergent writes to either side never touch the other.

    SHALLOW (default) is ZERO-COPY and O(metadata): the resolved
    file list, zone maps and Blooms are written as one segment under
    ``dest`` REFERENCING THE SOURCE'S DATA FILES by absolute path —
    at 100 TB the clone commits in milliseconds, the dev/test-fork
    and experiment-branch shape. Two contracts make this sound:
    `snapshot_expire` only ever deletes files under a table's OWN
    ``data/`` directory, so clone-side retention can never reach the
    source's files; and the source does NOT know about clones, so
    source-side expire that drops the cloned version's files BREAKS
    shallow clones — exactly Delta's documented VACUUM-vs-shallow-
    clone hazard, pinned (not papered over) in pytest. Tag the source
    version (`snapshot_tag` is a retention guarantee) to keep a
    shallow clone durable.

    DEEP copies the version's data files into ``dest/data`` (stats
    and Bloom keys re-pointed file-by-file — clustering and pruning
    metadata survive), making the clone self-contained and immune to
    source retention, at O(table bytes) copy cost.

    A version carrying merge-on-read delete entries refuses SHALLOW
    (the entries' segment-scoping grammar is table-local; carrying
    them cross-table would fork that contract) — DEEP materializes
    the LIVE rows through `snapshot_read` into a fresh single-history
    append instead, which is also Delta's CLONE semantics (clones see
    applied deletes, not pending ones)."""
    import os
    import shutil
    import uuid

    meta = snapshot_meta(src, version)
    if _manifests(dest):
        raise ValueError(
            f"snapshot_clone: {dest} is already a snapshot table — "
            "clone targets must be fresh paths"
        )
    has_mor = bool(meta.get("deletes") or meta.get("pos_deletes"))
    has_renames = bool(meta.get("renames"))
    if (has_mor or has_renames) and not deep:
        raise ValueError(
            "snapshot_clone: source version carries "
            + ("merge-on-read delete entries" if has_mor
               else "metadata-only column renames")
            + " — shallow clones cannot carry another table's "
            "delete/rename scoping; pass deep=True to materialize "
            "the logical rows"
        )
    os.makedirs(dest, exist_ok=True)
    if has_mor or has_renames:
        live = snapshot_read(spark, src, version=version)
        return snapshot_append(spark, live, dest)
    src_files = [os.path.abspath(f) for f in meta["files"]]
    stats = {
        os.path.abspath(f): v for f, v in (meta.get("stats") or {}).items()
    }
    blooms = {
        c: {os.path.abspath(f): w for f, w in fb.items()}
        for c, fb in (meta.get("blooms") or {}).items()
    }
    if deep:
        copy_dir = os.path.join(dest, "data", f"clone-{uuid.uuid4().hex[:12]}")
        os.makedirs(copy_dir)
        mapping = {}
        for i, f in enumerate(src_files):
            # index prefix: part-file basenames repeat across the
            # source's batch directories
            to = os.path.join(copy_dir, f"{i:06d}-{os.path.basename(f)}")
            shutil.copyfile(f, to)
            mapping[f] = to
        src_files = [mapping[f] for f in src_files]
        stats = {mapping[f]: v for f, v in stats.items() if f in mapping}
        blooms = {
            c: {mapping[f]: w for f, w in fb.items() if f in mapping}
            for c, fb in blooms.items()
        }
    seg = _write_segment(dest, src_files, stats or None, blooms or None)
    manifest: dict = {
        "version": 1,
        "segments": [seg],
        "cloned_from": {
            "path": os.path.abspath(src),
            "version": int(meta["version"]),
            "deep": bool(deep),
        },
    }
    if meta.get("layout"):
        manifest["layout"] = meta["layout"]
    if meta.get("constraints"):
        # clones inherit the source's CHECK contracts
        manifest["constraints"] = meta["constraints"]
    _commit_manifest(dest, 1, manifest)
    return 1


def _renamed_schema(schema, path: str, raw: dict, newest_file: str):
    """Map a physically-resolved schema to LOGICAL names (round 19):
    when the newest file itself predates a rename event (a rename
    with no append since), its footer carries the old physical name —
    apply the covering events so empty-pull/tail schema resolves
    stay consistent with what the next non-empty pull will deliver."""
    events = raw.get("renames") or []
    if not events:
        return schema
    from pyspark.sql import types as T

    fields = list(schema.fields)
    for e in events:
        if newest_file in _rename_cover(path, e):
            if "drop" in e:
                fields = [f for f in fields if f.name != e["drop"]]
            else:
                fields = [
                    T.StructField(e["new"], f.dataType, f.nullable)
                    if f.name == e["old"]
                    else f
                    for f in fields
                ]
    return T.StructType(fields)


def _rename_cover(path: str, event: dict) -> set:
    """The file set a rename event applies to: the segments recorded
    at its commit, resolved by name. Segment files outlive
    consolidation (merges write NEW names; the old segment files stay
    on disk until `snapshot_expire`, whose liveness walk keeps every
    rename-referenced segment — same mechanism as the MOR deletes'
    ``applies_to_segments``), so the cover stays resolvable for the
    event's whole life."""
    cover: set = set()
    for name in event["applies_to_segments"]:
        cover.update(_load_segment(path, name)["files"])
    return cover


def _require_no_renames(raw_or_meta: dict, op: str) -> None:
    """Loud guard for paths coupled to PHYSICAL column names (COW/MOR
    rewrites, stats-pruned scans, tail/CDF deltas, raw-file sources):
    a metadata-only rename makes logical ≠ physical for pre-rename
    files, and these paths would silently read or write the wrong
    name. The escape hatch is the explicit O(table) rewrite."""
    if raw_or_meta.get("renames"):
        raise ValueError(
            f"{op}: table carries metadata-only column renames — this "
            "path depends on physical column names; run "
            "snapshot_materialize_renames(spark, path) to fold the "
            "renames into the data files first"
        )


def _read_with_renames(spark, path: str, meta: dict, merge_schema: bool):
    """Resolve the LOGICAL view of a renamed table (round 19 — Delta
    column mapping / Iceberg RENAME COLUMN, metadata-only): files
    group by WHICH rename events cover them (pre-rename generations
    carry the old physical name; generations appended after an event
    already wrote the new name), each group scans once with its
    event-chain applied as `withColumnRenamed`, and the groups union
    BY NAME. Cost: O(renames) extra scans at most — in practice one
    group per schema generation — with additive evolution handled by
    ``allowMissingColumns`` exactly like the base read's
    merge-schema contract."""
    events = meta["renames"]
    covers = [_rename_cover(path, e) for e in events]
    groups: dict = {}
    order: list = []
    for f in meta["files"]:
        sig = tuple(i for i, cov in enumerate(covers) if f in cov)
        if sig not in groups:
            order.append(sig)
        groups.setdefault(sig, []).append(f)
    frames = []
    for sig in order:
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(*groups[sig])
        for i in sig:  # events apply in commit order
            e = events[i]
            if "drop" in e:
                df = df.drop(e["drop"])
            else:
                df = df.withColumnRenamed(e["old"], e["new"])
        frames.append(df)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def snapshot_rename_column(path: str, old: str, new: str) -> int:
    """METADATA-ONLY column rename (round 19 — the standard lakehouse
    answer to the protocol's documented additive-only schema
    evolution: Delta's column mapping, Iceberg's RENAME COLUMN): one
    manifest write, zero data IO at any table size. The commit
    records a rename EVENT scoped to the segments existing NOW
    (``applies_to_segments`` — the same table-local scoping grammar
    the MOR deletes use): files in those segments keep their old
    PHYSICAL name and are mapped at read time; every later append
    writes the new name physically, so the mapping debt never grows
    with the table, only with the rename count.

    Contract boundaries, all loud: paths that depend on physical
    names — COW/MOR deletes, merge, compact, stats-pruned scans,
    lineage, tail/CDF deltas, the raw-file DataSources, WAP staging,
    shallow clones — REFUSE while rename events are active and point
    at `snapshot_materialize_renames` (the explicit O(table) rewrite
    that folds names into the files and restores the full op
    surface). Renaming a table that carries MOR delete entries
    refuses symmetrically (delete files reference physical key
    columns). `snapshot_read`, appends, rollback, tags, expire and
    further renames all compose with active events."""

    def edit(logical: list) -> dict:
        if old not in logical:
            raise ValueError(
                f"snapshot_rename_column: no column {old!r} in the "
                f"table's logical schema {logical}"
            )
        if new.lower() in {c.lower() for c in logical}:
            # casefolded: Spark resolves column names case-insensitively
            raise ValueError(
                f"snapshot_rename_column: column {new!r} already exists "
                "in the logical schema"
            )
        return {"old": old, "new": new}

    return _schema_edit_commit(path, "snapshot_rename_column", edit)


def snapshot_drop_column(path: str, col: str) -> int:
    """METADATA-ONLY column drop (round 19 — `snapshot_rename_column`'s
    sibling, completing Delta column-mapping parity: DROP COLUMN is
    one manifest write, zero data IO). The event is scoped to the
    segments existing now; covered files keep the physical column but
    readers exclude it, and later appends simply never write it.
    Re-adding the NAME later (an append whose frame carries a column
    so named) creates a logically NEW column: pre-drop generations
    read NULL for it — exactly Delta's drop-then-re-add semantics,
    which falls out of the generation-grouped union by name. The
    physical bytes remain until `snapshot_materialize_renames` (or
    any compaction after it) rewrites them — the erasure caveat Delta
    documents for metadata-only drops; materialize IS the erasure
    path. Same guard surface and MOR refusal as rename."""

    def edit(logical: list) -> dict:
        if col not in logical:
            raise ValueError(
                f"snapshot_drop_column: no column {col!r} in the "
                f"table's logical schema {logical}"
            )
        if len(logical) == 1:
            raise ValueError(
                "snapshot_drop_column: cannot drop the table's only "
                "column"
            )
        return {"drop": col}

    return _schema_edit_commit(path, "snapshot_drop_column", edit)


def _check_constraints(df, constraints: dict, op: str) -> None:
    """Validate a frame against the table's CHECK constraints in ONE
    aggregate pass (round 19 — Delta's enforcement cost: one extra
    O(|batch|) job per constrained write, all constraints together).
    SQL CHECK semantics: a row violates only when the expression
    evaluates FALSE — NULL passes (``~expr`` of NULL is NULL, which
    the conditional count skips)."""
    if not constraints:
        return
    from pyspark.sql import functions as F

    names = list(constraints)
    aggs = [
        F.count(F.when(~F.expr(constraints[n]), 1)).alias(f"__c{i}")
        for i, n in enumerate(names)
    ]
    row = df.agg(*aggs).first()
    bad = {
        n: int(row[f"__c{i}"])
        for i, n in enumerate(names)
        if row[f"__c{i}"]
    }
    if bad:
        raise ValueError(
            f"{op}: CHECK constraint violation(s) — "
            + ", ".join(
                f"{n!r} ({constraints[n]}): {c} row(s)"
                for n, c in bad.items()
            )
            + " — the batch was refused before any file was staged"
        )


def snapshot_set_constraint(spark, path: str, name: str, expr: str) -> int:
    """ADD a CHECK constraint (round 19 — Delta's ALTER TABLE ADD
    CONSTRAINT for the snapshot protocol): ``expr`` is a SQL boolean
    over the table's LOGICAL columns; the commit first validates the
    EXISTING table (one O(table) aggregate — exactly Delta's add-time
    scan) and then records the constraint on the manifest, after
    which every file-adding write — `snapshot_append`, `snapshot_
    merge`/`merge_mor`'s upsert batch, WAP `snapshot_stage` — refuses
    batches containing a violating row BEFORE staging any file, at
    one extra O(|batch|) aggregate per write. NULL passes (SQL CHECK
    semantics). The constraint rides every subsequent commit —
    rewrites, deletes, compaction, rollback (policy follows the HEAD,
    not the restored version: RESTORE restores data, not contracts) —
    via the `_stamp_recent_batches` carry, and an append racing a
    constraint change re-validates (commit-loop conflict check).
    Duplicate names refuse; `snapshot_drop_constraint` removes one.
    A rename/drop of a column the expression references makes later
    validations fail LOUDLY at analysis time (never silently)."""
    for _ in range(25):
        manifests = _manifests(path)
        if not manifests:
            raise ValueError(
                f"snapshot_set_constraint: no manifests under {path}"
            )
        latest = _load_raw(manifests[-1])
        constraints = dict(latest.get("constraints") or {})
        if name in constraints:
            raise ValueError(
                f"snapshot_set_constraint: constraint {name!r} already "
                "exists — snapshot_drop_constraint it first"
            )
        # add-time validation: the EXISTING rows must satisfy the new
        # contract (reads the logical, MOR-resolved view)
        _check_constraints(
            snapshot_read(spark, path, merge_schema=True),
            {name: expr},
            "snapshot_set_constraint",
        )
        version = _manifest_version(manifests[-1]) + 1
        constraints[name] = expr
        meta: dict = {"version": version, "constraints": constraints}
        for carry in (
            "segments", "files", "stats", "blooms", "deletes",
            "pos_deletes", "layout", "renames",
        ):
            if carry in latest:
                meta[carry] = latest[carry]
        _stamp_recent_batches(meta, latest, version - 1, path=path)
        try:
            _commit_manifest(path, version, meta)
            return version
        except SnapshotCommitConflict:
            continue
    raise SnapshotCommitConflict(
        f"snapshot_set_constraint: lost the commit race 25 times at {path}"
    )


def snapshot_drop_constraint(path: str, name: str) -> int:
    """Remove a CHECK constraint by name — metadata-only commit."""
    for _ in range(25):
        manifests = _manifests(path)
        if not manifests:
            raise ValueError(
                f"snapshot_drop_constraint: no manifests under {path}"
            )
        latest = _load_raw(manifests[-1])
        constraints = dict(latest.get("constraints") or {})
        if name not in constraints:
            raise ValueError(
                f"snapshot_drop_constraint: no constraint {name!r} "
                f"(active: {sorted(constraints)})"
            )
        del constraints[name]
        version = _manifest_version(manifests[-1]) + 1
        meta: dict = {"version": version, "constraints": constraints}
        for carry in (
            "segments", "files", "stats", "blooms", "deletes",
            "pos_deletes", "layout", "renames",
        ):
            if carry in latest:
                meta[carry] = latest[carry]
        _stamp_recent_batches(meta, latest, version - 1, path=path)
        try:
            _commit_manifest(path, version, meta)
            return version
        except SnapshotCommitConflict:
            continue
    raise SnapshotCommitConflict(
        f"snapshot_drop_constraint: lost the commit race 25 times at {path}"
    )


def _schema_edit_commit(path: str, op: str, edit) -> int:
    """Shared metadata-only schema-edit commit (rename/drop): resolve
    the head, refuse MOR entries, derive the LOGICAL schema (newest
    file's footer + covering events — the `_version_schema`
    convention), let ``edit(logical)`` validate and produce the event
    body, and commit it appended to the event list with
    ``applies_to_segments`` = the head's segment names. Optimistic
    retry like every append-shaped commit."""
    import os

    import pyarrow.parquet as pq

    migrations: list = []

    def _drop_migrations():
        import contextlib

        for name in migrations:
            with contextlib.suppress(OSError):
                os.remove(os.path.join(path, name))
        migrations.clear()

    for _ in range(25):
        _drop_migrations()
        manifests = _manifests(path)
        if not manifests:
            raise ValueError(f"{op}: no manifests under {path}")
        latest = _load_raw(manifests[-1])
        if latest.get("deletes") or latest.get("pos_deletes"):
            raise ValueError(
                f"{op}: table carries merge-on-read delete entries "
                "whose delete files reference the physical column "
                "names — compact/merge them first"
            )
        version = _manifest_version(manifests[-1]) + 1
        events = list(latest.get("renames") or [])
        segs = _segments_of(path, latest, migrated=migrations)
        files: list = []
        for name in segs:
            files += _load_segment(path, name)["files"]
        if not files:
            raise ValueError(
                f"{op}: version references no data files — there is "
                "no schema to edit against"
            )
        # LOGICAL schema = the newest file's physical names with any
        # covering events applied (the `_version_schema` convention)
        logical = [f.name for f in pq.read_schema(files[-1])]
        for e in events:
            if files[-1] in _rename_cover(path, e):
                if "drop" in e:
                    logical = [c for c in logical if c != e["drop"]]
                else:
                    logical = [
                        e["new"] if c == e["old"] else c for c in logical
                    ]
        event = dict(edit(logical))
        event["applies_to_segments"] = segs
        meta: dict = {
            "version": version,
            "segments": segs,
            "renames": events + [event],
        }
        if "layout" in latest:
            meta["layout"] = latest["layout"]
        _stamp_recent_batches(meta, latest, version - 1, path=path)
        try:
            _commit_manifest(path, version, meta)
            return version
        except SnapshotCommitConflict:
            continue
    _drop_migrations()
    raise SnapshotCommitConflict(
        f"{op}: lost the commit race 25 times at {path}"
    )


def snapshot_materialize_renames(spark, path: str) -> int:
    """Fold active rename events INTO the data files (round 19 — the
    explicit rewrite `_require_no_renames` points at, playing the
    role Delta's REORG TABLE plays for column mapping): read the
    logical view, write it as a fresh file generation, and commit a
    manifest with no rename events — after which every physical-name-
    coupled path (deletes, merge, compact, scans, tail, sources)
    works again. O(table) by design, the price the metadata-only
    rename deferred; a no-op (head version returned) when no events
    are active. Rewriting-commit convention: a concurrent commit
    surfaces SnapshotCommitConflict after cleaning up the staged
    files."""
    import contextlib
    import glob
    import os
    import shutil
    import uuid

    manifests = _manifests(path)
    if not manifests:
        raise ValueError(
            f"snapshot_materialize_renames: no manifests under {path}"
        )
    latest = _load_raw(manifests[-1])
    if not latest.get("renames"):
        return _manifest_version(manifests[-1])
    version = _manifest_version(manifests[-1]) + 1
    # merge_schema: a REWRITE must preserve the union of the
    # generations' schemas — the plain read's pick-one-footer default
    # would silently drop additively-evolved columns from the table
    df = snapshot_read(spark, path, merge_schema=True)
    staged = os.path.join(path, "data", f"rewrite-{uuid.uuid4().hex[:12]}")
    df.write.mode("errorifexists").parquet(staged)
    new_files = sorted(glob.glob(os.path.join(staged, "*.parquet")))
    seg = _write_segment(path, new_files)
    meta: dict = {"version": version, "segments": [seg]}
    if "layout" in latest:
        meta["layout"] = latest["layout"]
    _stamp_recent_batches(meta, latest, version - 1, path=path)
    try:
        _commit_manifest(path, version, meta)
    except SnapshotCommitConflict:
        shutil.rmtree(staged, ignore_errors=True)
        with contextlib.suppress(OSError):
            os.remove(os.path.join(path, seg))
        raise
    return version


def snapshot_changes_cdf(spark, path: str, from_version: int, to_version: int):
    """CHANGE-DATA-FEED read between snapshot versions (round 15 — the
    Delta CDF shape: rows + ``_change_type``): extends
    `snapshot_changes` beyond pure appends to MERGE-ON-READ DELETE
    steps. Per step in (from, to]:

    - pure append → the added files' rows as ``_change_type='insert'``;
    - a MOR delete (file set unchanged, new equality-delete entries) →
      the retracted rows' FULL PRE-IMAGES as ``_change_type='delete'``,
      reconstructed by semi-joining the PREVIOUS version's live view
      against the new entries' key files — already-deleted rows never
      re-emit, and the delete costs O(|retracted| + |covered files|),
      never the table;
    - a POSITION delete (round 17 — `snapshot_delete_pos`) → the same
      pre-image contract, reconstructed by semi-joining the previous
      live view's (path, row_index) tags against the new entries'
      position files;
    - a pure FILE DROP (round 19 — the file set strictly shrank,
      nothing added, no MOR entries on either side: a ROLLBACK of
      appends, or a COW delete that consumed whole files) → the
      dropped files' rows as ``_change_type='delete'`` — a downstream
      MV survives a table RESTORE incrementally;
    - any other rewriting commit (partial-file COW delete/merge,
      compact, rollback past a rewrite) still raises loudly: a
      file-level feed cannot represent it without content diffing,
      which is `cdc_diff`'s job.

    This is what a downstream incremental consumer (index maintenance,
    aggregate view, training-data refresh) needs to stay correct under
    the cheap delete path: inserts AND retractions, each delivered
    once, in version order."""
    import json
    import os

    from functools import reduce

    from pyspark.sql import functions as F

    def load_meta(v: int) -> dict:
        target = os.path.join(path, f"v{v}.manifest.json")
        if not os.path.exists(target):
            raise ValueError(
                f"snapshot_changes_cdf: version {v} does not exist at {path}"
            )
        m = _load_meta(path, target)
        # conservative, unlike the added-files walk: CDF retraction
        # branches read DROPPED (possibly pre-rename) files raw, so
        # any active event could surface physical names mid-feed
        _require_no_renames(m, "snapshot_changes_cdf")
        return m

    if not 0 < from_version < to_version:
        raise ValueError("snapshot_changes_cdf: need 0 < from < to")
    parts = []
    prev = load_meta(from_version)
    schema = _version_schema(spark, load_meta(to_version)["files"])
    for v in range(from_version + 1, to_version + 1):
        cur = load_meta(v)
        prev_files, cur_files = set(prev["files"]), set(cur["files"])
        prev_dels = prev.get("deletes") or []
        cur_dels = cur.get("deletes") or []
        prev_pos = prev.get("pos_deletes") or []
        cur_pos = cur.get("pos_deletes") or []
        if (
            prev_files < cur_files
            and cur_dels == prev_dels
            and cur_pos == prev_pos
        ):
            added = sorted(cur_files - prev_files)
            parts.append(
                spark.read.schema(schema)
                .parquet(*added)
                .withColumn("_change_type", F.lit("insert"))
            )
        elif (
            prev_files == cur_files
            and cur_pos == prev_pos
            and len(cur_dels) > len(prev_dels)
            and cur_dels[: len(prev_dels)] == prev_dels
        ):
            # the previous version's LIVE view is the pre-image space:
            # rows earlier deletes already removed must not re-emit
            live_prev = _apply_mor_deletes(
                spark, prev, prev["files"], schema
            )
            for entry in cur_dels[len(prev_dels):]:
                keys = spark.read.parquet(*entry["files"])
                parts.append(
                    live_prev.join(
                        F.broadcast(keys), entry["keys"], "left_semi"
                    ).withColumn("_change_type", F.lit("delete"))
                )
        elif (
            prev_files == cur_files
            and cur_dels == prev_dels
            and len(cur_pos) > len(prev_pos)
            and cur_pos[: len(prev_pos)] == prev_pos
        ):
            # POSITION-delete step (round 17): pre-images come from the
            # previous version's live view TAGGED with each row's
            # (path, row_index), semi-joined against the new entries'
            # position files — already-deleted rows never re-emit, and
            # the step costs O(|retracted| + |covered files|) exactly
            # like the equality branch
            live_prev = _apply_mor_deletes(
                spark, prev, prev["files"], schema, keep_pos_tags=True
            )
            for entry in cur_pos[len(prev_pos):]:
                keys = spark.read.parquet(*entry["files"])
                parts.append(
                    live_prev.join(
                        F.broadcast(keys), ["_file", "_pos"], "left_semi"
                    )
                    .drop("_file", "_pos")
                    .withColumn("_change_type", F.lit("delete"))
                )
        elif (
            prev_files == cur_files
            and cur_dels == prev_dels
            and cur_pos == prev_pos
        ):
            pass  # metadata-only commit: nothing to deliver
        elif (
            cur_files < prev_files
            and not prev.get("deletes")
            and not cur.get("deletes")
            and not prev.get("pos_deletes")
            and not cur.get("pos_deletes")
        ):
            # FILE-DROP retraction (round 19): the file set strictly
            # SHRANK with nothing added and no MOR entries on either
            # side — a ROLLBACK of appends (`snapshot_rollback`), or a
            # COW delete whose every affected file was fully consumed.
            # The row-level delta IS the dropped files' rows as
            # deletes (every dropped row was live — no delete entries
            # exist to have hidden any), so a downstream MV survives a
            # table RESTORE incrementally (Delta's CDF errors there).
            # A rewrite that also ADDS files (partial-file COW, or a
            # rollback past a delete/compact) still refuses below —
            # that delta needs content diffing.
            dropped = sorted(prev_files - cur_files)
            parts.append(
                spark.read.schema(schema)
                .parquet(*dropped)
                .withColumn("_change_type", F.lit("delete"))
            )
        else:
            raise ValueError(
                f"snapshot_changes_cdf: version {v} rewrites data files "
                "(COW delete/merge/compact/rollback-past-a-rewrite) — a "
                "file-level feed cannot represent it; use cdc_diff for "
                "content diffs"
            )
        prev = cur
    if not parts:
        return local_df(spark, [], schema).withColumn(
            "_change_type", F.lit("insert")
        ).limit(0)
    return reduce(lambda a, b: a.unionByName(b), parts)


def snapshot_stage(spark, df, path: str, branch: str) -> str:
    """WRITE-AUDIT-PUBLISH, step 1 (round 15 — the Iceberg WAP
    pattern: land a batch INVISIBLY, gate it on audits, then publish
    atomically or discard without trace): write the batch's data
    files under the table's data dir and record them in a BRANCH
    manifest (``branch-<name>.manifest.json`` — outside the ``v*``
    version namespace, so head readers never see it), together with
    the head version the stage was based on. Readers of the branch
    (`snapshot_read_branch`) see head ∪ staged — exactly what the
    audit must validate. Returns the branch manifest path.

    An EMPTY table stages at base_version 0 (round 16 — the streaming
    WAP sink's first micro-batch must be auditable before the table's
    first version exists); publishing such a branch commits v1.

    A layout spec on the base head applies to staged batches exactly
    as it does to appends (round-16 review — WAP is the OTHER
    file-adding commit path, and skipping it would leave every
    streamed-in generation unclustered and unpruned forever): the
    batch is range-clustered by the layout columns and their zone
    maps ride the branch manifest; `snapshot_publish` merges them
    into the committed version. Staging under a spec the head has
    since replaced is caught by publish's base-version check — a
    `snapshot_set_layout` commit moves the head, so the stale-base
    refusal already covers superseded layouts."""
    import glob
    import json
    import os
    import uuid

    manifests = _manifests(path)
    base_version = _manifest_version(manifests[-1]) if manifests else 0
    layout = None
    constraints: dict = {}
    if manifests:
        with open(manifests[-1]) as f:
            head0 = json.load(f)
        layout = head0.get("layout")
        constraints = head0.get("constraints") or {}
    # WAP is the other file-adding write path: a staged batch is
    # validated against the base head's CHECK constraints before any
    # file lands (a constraint added between stage and publish moves
    # the head, so publish's stale-base refusal re-covers it)
    _check_constraints(df, constraints, "snapshot_stage")
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    staged = os.path.join(path, "data", f"wap-{uuid.uuid4().hex[:12]}")
    to_write = df
    if layout:
        lexprs, _ = _layout_cluster_exprs(layout)
        to_write = df.repartitionByRange(
            max(int(layout.get("files_per_batch", 4)), 1), *lexprs
        ).sortWithinPartitions(*lexprs)
    to_write.write.mode("errorifexists").parquet(staged)
    new_files = sorted(glob.glob(os.path.join(staged, "*.parquet")))
    meta = {"branch": branch, "base_version": base_version, "files": new_files}
    if layout:
        _, lsrc = _layout_cluster_exprs(layout)
        stats = multi_file_stats(spark, staged, lsrc) if lsrc else {}
        espec = _layout_expr_specs(layout)
        if espec:
            for f, entry in multi_file_expr_stats(spark, staged, espec).items():
                stats.setdefault(f, {}).update(entry)
        if stats:
            meta["stats"] = stats
    target = os.path.join(path, f"branch-{branch}.manifest.json")
    tmp = target + f".{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, target)
    return target


def snapshot_read_branch(spark, path: str, branch: str, staged_only: bool = False):
    """The branch view: the base head's rows plus the staged batch —
    the frame audits run against BEFORE anything becomes visible.
    ``staged_only=True`` returns just the staged batch's rows READ
    BACK from the branch files (the frame a per-batch audit wants:
    what was actually written, not what the writer intended)."""
    import json
    import os

    target = os.path.join(path, f"branch-{branch}.manifest.json")
    if not os.path.exists(target):
        raise ValueError(f"snapshot_read_branch: no branch {branch!r}")
    with open(target) as f:
        meta = json.load(f)
    if staged_only or meta["base_version"] == 0:
        # staged onto an empty table: the branch view is the batch
        return spark.read.parquet(*meta["files"])
    base = snapshot_read(spark, path, version=meta["base_version"])
    staged = spark.read.schema(base.schema).parquet(*meta["files"])
    return base.unionByName(staged)


def snapshot_publish(
    spark, path: str, branch: str, batch_id: int | None = None
) -> int:
    """WAP step 3a — PUBLISH: commit the staged files as the next
    version (the previous manifest's files + the branch's), then drop
    the branch manifest. Refuses when the head moved past the
    branch's base (the audit validated a superseded state — restage
    against the new head); the exclusive-create commit makes the
    publish atomic. Returns the committed version.

    ``batch_id`` (round 16 — the streaming WAP sink) stamps the
    committed manifest exactly like `snapshot_append`'s, composing the
    publish with the exactly-once batch ledger: a crash-replay of a
    published micro-batch resolves via `snapshot_batch_version` to a
    no-op instead of staging and publishing twice."""
    import json
    import os

    target = os.path.join(path, f"branch-{branch}.manifest.json")
    if not os.path.exists(target):
        raise ValueError(f"snapshot_publish: no branch {branch!r}")
    with open(target) as f:
        meta = json.load(f)
    manifests = _manifests(path)
    head = _manifest_version(manifests[-1]) if manifests else 0
    if head != meta["base_version"]:
        raise SnapshotCommitConflict(
            f"snapshot_publish: head moved (v{meta['base_version']} -> "
            f"v{head}) since branch {branch!r} was staged; the audit "
            "validated a superseded state — restage against the new head"
        )
    latest_raw: dict = {}
    if manifests:
        latest_raw = _load_raw(manifests[-1])
    version = head + 1
    # the staged batch becomes ONE segment (its files + the
    # layout-derived zone maps staged with the branch, round 16);
    # prior state carries by segment name — publish commits O(|batch|)
    # metadata exactly like an append
    migrations: list = []
    prev_segments = (
        _segments_of(path, latest_raw, migrated=migrations)
        if manifests
        else []
    )
    branch_seg = _write_segment(path, meta["files"], meta.get("stats") or None)
    segs = _consolidated_segments(
        path, prev_segments + [branch_seg], migrations
    )
    new_meta = {"version": version, "segments": segs}
    # "renames" carries like an append's: staged files were written
    # from the LOGICAL view, so they are outside every event's cover
    for carry in ("deletes", "pos_deletes", "layout", "renames"):
        if carry in latest_raw:
            new_meta[carry] = latest_raw[carry]
    if batch_id is not None:
        new_meta["batch_id"] = batch_id
    _stamp_recent_batches(new_meta, latest_raw, head, batch_id, path=path)
    try:
        _commit_manifest(path, version, new_meta)
    except SnapshotCommitConflict:
        import contextlib

        # never-referenced: the branch segment, any consolidation tier
        # AND any legacy-head migration segment this publish wrote
        # (round-17 ADVICE #2)
        for seg in [branch_seg] + migrations:
            with contextlib.suppress(OSError):
                os.remove(os.path.join(path, seg))
        raise
    if branch_seg not in segs:
        import contextlib

        # consolidation consumed the branch's fresh segment — nothing
        # references it; drop it now (the append-path convention)
        with contextlib.suppress(OSError):
            os.remove(os.path.join(path, branch_seg))
    os.remove(target)
    return version


def snapshot_discard_branch(path: str, branch: str) -> int:
    """WAP step 3b — DISCARD: a failed audit deletes the branch
    manifest and its staged files immediately (no trace at head, no
    orphan left for the vacuum). Returns files removed."""
    import json
    import os
    import shutil

    target = os.path.join(path, f"branch-{branch}.manifest.json")
    if not os.path.exists(target):
        raise ValueError(f"snapshot_discard_branch: no branch {branch!r}")
    with open(target) as f:
        meta = json.load(f)
    n = 0
    dirs = set()
    for p in meta["files"]:
        if os.path.exists(p):
            os.remove(p)
            n += 1
        dirs.add(os.path.dirname(p))
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)
    os.remove(target)
    return n
