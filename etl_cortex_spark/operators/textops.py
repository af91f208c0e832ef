"""Text-analysis operators for LLM training-data pipelines (SURVEY §2
tier D / BASELINE.json north star: "text analysis").

Everything here is pure column expressions (whole-stage codegen, no
Python in the hot path): tokenization, token statistics, quality
scoring, language-ID heuristics, and k-gram fingerprinting. These are
the per-document map stages of a 100 TB pipeline — embarrassingly
parallel, no shuffle until the final (small) aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_cortex_spark.operators.localframe import local_df

#: BPE-ish pre-tokenizer: letter runs, digit runs, or single punctuation
#: marks — the classic GPT-2-style pre-split shape, portable regex.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"

#: tiny stopword list for quality ratios (public, trivially replaceable)
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")

#: language marker words for the n-gram/marker-count language-ID
#: heuristic. Real deployments plug in fastText-style profiles; the
#: engine mechanism (score → argmax with deterministic tiebreak) is
#: what matters here.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "que"),
}


def words(col: Column | str) -> Column:
    """Whitespace tokens, empties removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda w: w != "")


def n_tokens(col: Column | str) -> Column:
    return F.size(words(col)).cast("bigint")


def n_bpe_tokens(col: Column | str) -> Column:
    """Token count under the BPE-ish pre-split — the budget metric for
    LLM context windows."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_TOKEN_RE)).cast("bigint")


def distinct_ratio(col: Column | str) -> Column:
    """|distinct words| / |words| — low values flag repetitive spam."""
    w = words(col)
    return F.size(F.array_distinct(w)) / F.greatest(F.size(w), F.lit(1))


def stopword_ratio(col: Column | str, stopwords=STOPWORDS) -> Column:
    w = words(col)
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(w, lambda x: F.array_contains(sw, F.lower(x))))
    return hits / F.greatest(F.size(w), F.lit(1))


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"[^\sA-Za-z0-9]")).cast("double") / F.greatest(
        F.length(c), F.lit(1)
    )


def quality_score(col: Column | str, target_chars: int = 500) -> Column:
    """Composite [0,1] quality score: length saturation + lexical
    diversity + stopword plausibility. Deterministic arithmetic only
    (int divisions promoted to double the same way in any engine)."""
    c = F.col(col) if isinstance(col, str) else col
    length_part = F.least(F.length(c) / F.lit(float(target_chars)), F.lit(1.0))
    return F.round(
        0.4 * length_part + 0.3 * distinct_ratio(c) + 0.3 * stopword_ratio(c), 6
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Marker-token hit count per candidate language."""
    w = words(col)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(w, lambda x: F.array_contains(arr, F.lower(x)))).cast(
            "bigint"
        )
    return out


def lang_id(col: Column | str) -> Column:
    """argmax over lang_scores with deterministic lexicographic
    tiebreak; 'und' when no marker hits at all."""
    scores = lang_scores(col)
    pairs = F.array(
        *[F.struct(s.alias("score"), F.lit(lang).alias("lang")) for lang, s in sorted(scores.items())]
    )
    # struct max compares (score, lang) lexicographically: highest
    # score wins; ties fall to the lexicographically largest lang —
    # that IS the documented tiebreak.
    best = F.array_max(pairs)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def kgram_fingerprint(col: Column | str, k: int = 5) -> Column:
    """Document fingerprint: minimum md5 over word k-grams (a 1-hash
    MinHash / winnowing-style content signature). Stable across
    engines because md5 is."""
    w = words(col)
    n = F.size(w)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i, k)))
    return F.array_min(F.transform(grams, lambda g: F.md5(g.cast("binary"))))


def shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct word k-shingles (for Jaccard / MinHash dedup). Short
    docs (< k words) collapse to their single full-text shingle."""
    w = words(col)
    n = F.size(w)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i, k)))
    )


def mean_word_length(col: Column | str) -> Column:
    """Mean characters per whitespace token (0.0 for empty docs)."""
    w = words(col)
    total = F.aggregate(w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    return total / F.greatest(F.size(w), F.lit(1))


def alpha_word_ratio(col: Column | str) -> Column:
    """Fraction of tokens containing at least one ASCII letter — the
    Gopher-rule '80% of words must have an alphabetic character'."""
    w = words(col)
    hits = F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]")))
    return hits / F.greatest(F.size(w), F.lit(1))


def symbol_word_ratio(col: Column | str) -> Column:
    """Symbols (# or ...) per token — high values flag markup/spam."""
    c = F.col(col) if isinstance(col, str) else col
    syms = F.regexp_count(c, F.lit(r"#|\.\.\."))
    return syms / F.greatest(F.size(words(c)), F.lit(1))


def top_word_frac(col: Column | str) -> Column:
    """Fraction of tokens taken by the single most frequent token —
    the Gopher top-n-gram repetition rule at n=1. O(n·distinct) per
    document as a pure expression (documents are bounded; corpus-level
    n-gram stats are a different operator with a shuffle)."""
    w = words(col)
    counts = F.transform(
        F.array_distinct(w), lambda d: F.size(F.filter(w, lambda x: x == d))
    )
    return F.array_max(F.concat(counts, F.array(F.lit(0)))) / F.greatest(
        F.size(w), F.lit(1)
    )


def stopword_hits(col: Column | str, stopwords=STOPWORDS) -> Column:
    """Absolute stopword token count (the Gopher 'must contain at
    least N stopwords' rule wants a count, not a ratio)."""
    w = words(col)
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(w, lambda x: F.array_contains(sw, F.lower(x)))).cast(
        "bigint"
    )


def gopher_pass(
    col: Column | str,
    min_words: int = 5,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_alpha_ratio: float = 0.8,
    max_symbol_ratio: float = 0.1,
    max_top_word_frac: float = 0.2,
    min_stopwords: int = 1,
) -> Column:
    """The combined Gopher-style keep/drop gate (Rae et al. 2021,
    MassiveText filtering, adapted thresholds). Pure conjunction of
    per-row expressions — embarrassingly parallel at any scale."""
    n = F.size(words(col))
    return (
        n.between(min_words, max_words)
        & mean_word_length(col).between(min_mean_len, max_mean_len)
        & (alpha_word_ratio(col) >= min_alpha_ratio)
        & (symbol_word_ratio(col) <= max_symbol_ratio)
        & (top_word_frac(col) <= max_top_word_frac)
        & (stopword_hits(col) >= min_stopwords)
    )


def char_trigrams(col: Column | str) -> Column:
    """All full character 3-grams of the lowercased text (documents
    under 3 chars contribute none)."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    n = F.length(c)
    idx = F.when(n >= 3, F.sequence(F.lit(1), (n - 2).cast("int"))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: c.substr(i, F.lit(3)))


def trigram_lm_scores(df, id_col: str = "doc_id", text_col: str = "text"):
    """KenLM-style quality signal without an external model: train a
    unigram-over-trigrams LM on the corpus itself (one count shuffle)
    and score each document by its mean trigram logprob (second
    shuffle, keyed on id). Gibberish and boilerplate sit far from the
    corpus mean — the same screening KenLM perplexity does in
    web-scale pipelines, minus the external model dependency. Returns
    (id, mean_logprob, n_trigrams), mean unrounded (callers round for
    cross-engine hashing).

    Scale note (round 16 — the d111 broadcast lesson applied
    repo-wide): the LM join carries NO broadcast hint. The old
    "bounded: |charset|³" claim is false comfort for CJK — the
    distinct-trigram count of a 100 TB CJK sub-corpus is billions of
    rows, a driver OOM if forced broadcast. AQE broadcasts the LM at
    runtime exactly when it is actually small; otherwise the score is
    a well-distributed trigram-keyed hash join. A pipeline that wants
    a provably bounded broadcast uses the capped-LM variant
    (`llmprep.ccnet_perplexity_buckets`'s top-K per language — CCNet's
    fixed-LM contract)."""
    tg = df.select(F.col(id_col), F.explode(char_trigrams(text_col)).alias("tg"))
    counts = tg.groupBy("tg").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    lm = counts.crossJoin(F.broadcast(total)).select(
        "tg", F.log(F.col("n") / F.col("total")).alias("lp")
    )
    return (
        tg.join(lm, "tg")
        .groupBy(id_col)
        .agg(
            F.avg("lp").alias("mean_logprob"),
            F.count(F.lit(1)).alias("n_trigrams"),
        )
    )


# --- repetition signals (Gopher §A1.1-style filters) --------------------------


def lines(col: Column | str) -> Column:
    """Non-empty trimmed lines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.transform(F.split(c, "\n"), lambda x: F.trim(x)), lambda x: x != ""
    )


def dup_line_frac(col: Column | str) -> Column:
    """Fraction of lines that duplicate an earlier line
    (1 − |distinct| / |lines|; 0 for line-less docs) — the Gopher
    duplicate-line filter signal. Exact integer quotient: engines
    can't drift."""
    ls = lines(col)
    return F.when(F.size(ls) > 0, 1.0 - F.size(F.array_distinct(ls)) / F.size(ls)).otherwise(0.0)


def word_ngrams(
    col: Column | str, n: int, *, words_col: Column | None = None
) -> Column:
    """Word n-grams as strings; empty array when the doc has < n
    words (guarded — an unguarded descending ``sequence`` would fan
    out garbage grams).

    ``words_col``: a PRE-MATERIALIZED token array to build grams from
    (round 19). The tokenizer is an interpreted HOF, so a caller that
    derives several gram widths from one document re-pays the split+
    filter once per width unless it projects the array first and
    passes it here — d04's three signals measured 2x faster with one
    shared array; grams are identical by construction."""
    w = words(col) if words_col is None else words_col
    k = F.size(w)
    return F.when(
        k >= n,
        F.transform(
            F.sequence(F.lit(1), k - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def top_ngram_frac(
    col: Column | str, n: int, *, words_col: Column | None = None
) -> Column:
    """Occurrence fraction of the most frequent word n-gram (Gopher's
    top-n-gram repetition signal, as a count fraction — integer
    quotient, engine-exact). Per-row compute only, embarrassingly
    parallel, no shuffle.

    Round 19: sort-then-run-length scan, O(G log G) per doc, replacing
    the original distinct×filter form — that one was O(D·G) string
    compares per doc, and Spark evaluates higher-order-function
    lambdas INTERPRETED (no codegen), so a 2k-word doc paid ~4M
    interpreted compares per signal. Any total order groups equal
    grams adjacently, so the max run length over the sorted array IS
    the max occurrence count — same integers, same quotient (exact
    equality pinned old-vs-new over sf0.001/sf0.01 + adversarial
    literals; measured 59.6 s → 2.1 s for the 3-signal d04 entry at
    sf0.01, ~28×). The "" accumulator sentinel is safe: run starts at
    0, so a first element equal to the sentinel still yields run=1."""
    g = word_ngrams(col, n, words_col=words_col)
    s = F.array_sort(g)
    best = F.aggregate(
        s,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                a["best"],
                F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda a: a["best"],
    )
    return F.coalesce(best / F.greatest(F.size(g), F.lit(1)), F.lit(0.0))


def dup_ngram_frac(
    col: Column | str, n: int, *, words_col: Column | None = None
) -> Column:
    """Fraction of n-gram occurrences belonging to grams that appear
    more than once (Gopher's duplicate-n-gram signal for n=5..10).

    Round 19: same sort-then-run-length rewrite as `top_ngram_frac`
    (O(G log G) instead of O(D·G) interpreted compares): a closed run
    of length ≥ 2 contributes its length — summed over runs this is
    exactly Σ count(gram) over grams with count ≥ 2, the original
    definition. The finish lambda closes the final run."""
    g = word_ngrams(col, n, words_col=words_col)
    s = F.array_sort(g)
    dup = F.aggregate(
        s,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("tot")
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)).alias("run"),
            (
                a["tot"]
                + F.when((x != a["prev"]) & (a["run"] >= 2), a["run"]).otherwise(
                    F.lit(0)
                )
            ).alias("tot"),
        ),
        lambda a: a["tot"] + F.when(a["run"] >= 2, a["run"]).otherwise(F.lit(0)),
    )
    return dup / F.greatest(F.size(g), F.lit(1))


# --- D53: markup stripping (crawl text extraction) ----------------------------

#: Fixed entity table, applied in THIS order on every engine (&amp;
#: must come last so '&amp;lt;' decodes to the literal '&lt;' — the
#: single-pass contract; a second decode pass is deliberately not
#: applied). The tag regex is in the Java∩RE2 subset, and whitespace
#: is the explicit class [ \t\n\r] (Java's \s adds \x0B/\f, RE2's
#: doesn't — never use bare \s in a cross-engine pattern).
MARKUP_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_markup(col: Column | str) -> Column:
    """Extract text from markup — the crawl-corpus cleaning step
    before any quality/dedup stage: drop tags (replaced by a space so
    '<td>a</td><td>b</td>' keeps its word boundary), decode the fixed
    entity set, collapse runs of whitespace, trim. Pure codegen
    projection — no shuffle, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, "<[^>]*>", " ")
    for ent, rep in MARKUP_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, "[ \t\n\r]+", " "))


# --- D54: URL canonicalization (crawl dedup key) ------------------------------

#: Tracking parameters dropped during canonicalization. The pattern is
#: Java∩RE2 (no lookaround); matched against each single k=v pair.
TRACKING_PARAM_RE = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="


def norm_url(col: Column | str) -> Column:
    """Canonicalize a URL the way crawl pipelines key their dedup:
    lowercase scheme+host (path/query case is significant and kept),
    strip the fragment, drop tracking parameters (``utm_*``, fbclid,
    gclid, ref), strip default ports (:80 http / :443 https), strip
    trailing path slashes. Strings without a ``scheme://`` pass
    through trimmed. Pure codegen projection; every regex is in the
    Java∩RE2 subset and NO replacement uses backreferences (Java spells
    them ``$1``, RE2 ``\\1`` — the one unportable corner, avoided by
    CASE+substr instead)."""
    t = F.trim(F.col(col) if isinstance(col, str) else col)
    sh_raw = F.regexp_extract(t, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    tail = F.substring(t, F.length(sh_raw) + 1, F.lit(1 << 30))
    tail = F.regexp_replace(tail, "#.*$", "")
    path = F.regexp_extract(tail, "^([^?]*)", 1)
    qry = F.regexp_extract(tail, r"\?(.*)$", 1)
    params = F.filter(
        F.split(qry, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qry2 = F.array_join(params, "&")
    sh = F.lower(sh_raw)
    sh = (
        F.when(
            sh.startswith("http://") & sh.endswith(":80"),
            F.substring(sh, 1, F.length(sh) - 3),
        )
        .when(
            sh.startswith("https://") & sh.endswith(":443"),
            F.substring(sh, 1, F.length(sh) - 4),
        )
        .otherwise(sh)
    )
    path2 = F.regexp_replace(path, "/+$", "")
    rebuilt = F.concat(
        sh, path2, F.when(qry2 != "", F.concat(F.lit("?"), qry2)).otherwise(F.lit(""))
    )
    return F.when(sh_raw == "", t).otherwise(rebuilt)


# --- D55: BPE pair-count step (tokenizer training primitive) ------------------


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", top_k: int = 20
) -> DataFrame:
    """The count step of one BPE merge iteration (Sennrich et al.):
    corpus word frequencies, then every adjacent character pair
    weighted by its word's frequency; the top pair is the next merge
    rule. Returns the ``top_k`` (pair, total) rows ordered by count
    desc with a lexicographic tiebreak — the head of the merge table.

    Scale shape: words explode → word-frequency partial agg (the
    vocabulary is the small side from here on) → per DISTINCT word a
    position explode with ``pair = substr(word, i, 2)`` → one
    pair-keyed partial agg → TakeOrdered(top_k). Two keyed shuffles,
    both carrying (short-string, count) pairs only; no Python.
    """
    from pyspark.sql import functions as F  # noqa: F811

    vocab = (
        df.select(F.explode(words(text_col)).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__wf"))
        .filter(F.length("__w") >= 2)
    )
    pairs = vocab.select(
        "__wf",
        F.explode(F.sequence(F.lit(1), F.length("__w") - 1)).alias("__i"),
        F.col("__w"),
    ).select(F.substring(F.col("__w"), F.col("__i"), 2).alias("pair"), "__wf")
    return (
        pairs.groupBy("pair")
        .agg(F.sum("__wf").alias("total"))
        .orderBy(F.desc("total"), "pair")
        .limit(top_k)
    )


# --- D57: BPE merge application (tokenizer encode) ----------------------------

#: Symbol-boundary separator for the BPE encode representation: every
#: symbol is enclosed as \x1f<sym>\x1f, so adjacent symbols meet as
#: \x1f\x1f and a merge rule (a, b) is the LITERAL string replacement
#:   \x1f a \x1f\x1f b \x1f  ->  \x1f ab \x1f
#: replace() is left-to-right and non-overlapping in every engine —
#: exactly the greedy per-rule merge pass — and the enclosing
#: separators make a boundary-crossing false match impossible. No
#: regex, no backreferences, no HOF fold state.
BPE_SEP = "\x1f"


def bpe_encode_word(col: Column | str) -> Column:
    """A word as its boundary-separated character symbols:
    'ab' -> '\\x1fa\\x1f\\x1fb\\x1f'."""
    w = F.col(col) if isinstance(col, str) else col
    chars = F.transform(
        F.sequence(F.lit(1), F.length(w)), lambda i: F.substring(w, i, 1)
    )
    return F.concat(
        F.lit(BPE_SEP), F.array_join(chars, BPE_SEP + BPE_SEP), F.lit(BPE_SEP)
    )


def bpe_apply_merges(col: Column | str, merges: list[tuple[str, str]]) -> Column:
    """Apply an ordered BPE merge table to an ENCODED word (see
    ``bpe_encode_word``): one full greedy left-to-right pass per rule,
    in priority order — the documented deterministic contract (true
    BPE re-scans for the best-ranked pair after every single merge;
    the per-rule-pass form is the classic fast approximation and is
    exactly replayable as a replace() chain in any engine). Later
    rules may consume earlier rules' outputs (e.g. ('ta','b') after
    ('t','a')), so multi-level merges chain."""
    s = F.col(col) if isinstance(col, str) else col
    for a, b in merges:
        s = F.replace(
            s,
            F.lit(f"{BPE_SEP}{a}{BPE_SEP}{BPE_SEP}{b}{BPE_SEP}"),
            F.lit(f"{BPE_SEP}{a}{b}{BPE_SEP}"),
        )
    return s


def bpe_symbol_count(col: Column | str) -> Column:
    """Symbol count of an encoded word: segments between the
    double-separator joints."""
    s = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(s, BPE_SEP + BPE_SEP)).cast("bigint")


def bpe_symbols(col: Column | str) -> Column:
    """The symbol array of an encoded word: strip the outer
    boundary separators, split on the double-separator joints."""
    s = F.col(col) if isinstance(col, str) else col
    inner = F.substring(s, 2, F.length(s) - 2)
    return F.split(inner, BPE_SEP + BPE_SEP)


def bpe_train(
    df: DataFrame, text_col: str = "text", n_merges: int = 4
) -> DataFrame:
    """Iterative BPE merge-table training (Sennrich et al. 2016) —
    d55 counts one iteration's pairs, this runs the LOOP: count
    symbol pairs over the (weighted, distinct-word) vocabulary, take
    the most frequent pair, merge it everywhere, repeat. Returns the
    learned merge table: (step, lhs, rhs, pair_count), step 1-based,
    ties broken (count desc, lhs asc, rhs asc) so the table is
    deterministic and SQL-replayable.

    Scale shape (the reason BPE training is feasible at corpus scale
    at all): ONE pass over the corpus builds the word-frequency
    vocabulary — from then on every iteration touches only the
    vocabulary, never the corpus. Per iteration: a position explode
    over the symbol arrays + one pair-keyed partial-combined
    aggregate, then a 1-row TakeOrdered collect (the argmax is
    driver-side model state, exactly like k-means centroids), then
    the merge is a literal replace() projection on the vocabulary.
    The vocabulary frame is cached; each iteration adds one
    projection to its lineage (truncate with localCheckpoint every
    ~20 merges when training real vocabularies)."""
    vocab = (
        df.select(F.explode(words(text_col)).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__wf"))
        .filter(F.length("__w") >= 2)
        .select(bpe_encode_word("__w").alias("__e"), "__wf")
    )
    base = vocab = vocab.persist()
    spark = df.sparkSession
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        syms = bpe_symbols("__e")
        pairs = vocab.filter(F.size(syms) >= 2).select(
            "__wf",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(syms) - 1),
                    lambda i: F.struct(
                        F.element_at(syms, i).alias("lhs"),
                        F.element_at(syms, i + 1).alias("rhs"),
                    ),
                )
            ).alias("__p"),
        )
        top = (
            pairs.groupBy("__p.lhs", "__p.rhs")
            .agg(F.sum("__wf").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not top:
            break
        r = top[0]
        merges.append((step, r["lhs"], r["rhs"], r["pair_count"]))
        vocab = vocab.select(
            bpe_apply_merges("__e", [(r["lhs"], r["rhs"])]).alias("__e"),
            "__wf",
        )
    base.unpersist()  # the merge table is driver state; drop the cached vocab
    return local_df(
        spark, merges, "step int, lhs string, rhs string, pair_count bigint"
    )


# ---------------------------------------------------------------------------
# Hashed-feature linear quality classifier (fastText-style scoring).
# ---------------------------------------------------------------------------

#: fixed hex alphabet for the portable hex-digit → int conversion
#: (`instr` here == `strpos` in DuckDB/Postgres — no base-conversion
#: builtin needed on either engine).
HEX_ALPHABET = "0123456789abcdef"


def _hex_val(c: Column) -> Column:
    """0..15 from one lowercase hex character via position in the
    fixed alphabet — the only hex→int conversion that is portable
    verbatim across engines (Spark `instr`, DuckDB `strpos`)."""
    return F.call_function("instr", F.lit(HEX_ALPHABET), c) - 1


def hashed_feature_weight(tok: Column) -> Column:
    """Deterministic per-token weight in [-128, 127]: the first md5
    byte of the lowercased token, centered. This is the hashing-trick
    feature map of a fastText/VW-style linear model — in production
    the weight table comes out of training; here the weights are a
    pure function of the token hash so the SAME model is replayable
    in any engine (the oracle re-derives every weight in SQL).
    Integer weights keep the feature sum associative-exact, so the
    distributed sum is order-independent."""
    h = F.md5(F.lower(tok).cast("binary"))
    v1 = _hex_val(F.substring(h, 1, 1))
    v2 = _hex_val(F.substring(h, 2, 1))
    return (v1 * 16 + v2 - 128).cast("long")


def classifier_feat_sum(col: Column | str) -> Column:
    """Integer feature sum of the hashed bag-of-words — the linear
    model's dot product, folded over the token array per row (no
    explode, no shuffle: scoring stays a pure projection)."""
    w = words(col)
    return F.aggregate(
        w, F.lit(0).cast("long"), lambda acc, t: acc + hashed_feature_weight(t)
    )


def classifier_score(col: Column | str) -> Column:
    """Mean feature weight in [-1, 1]: feat_sum / (128 * n_tokens).
    One IEEE division of two exact integers — bit-identical in any
    engine. Empty documents score 0.0."""
    w = words(col)
    n = F.greatest(F.size(w), F.lit(1))
    return classifier_feat_sum(col) / (128.0 * n)


def classifier_score_weighted(
    col: Column | str, weights: dict[str, float], bias: float = 0.0
) -> Column:
    """The trained-model form of ``classifier_score``: a token→weight
    map (what fastText training emits) applied as a literal map lookup
    — unknown tokens weigh 0. Same plan shape as the hashed form: a
    pure projection, the weight table rides the plan as a literal (at
    real vocabulary sizes, a broadcast join against an exploded token
    frame — same zero-shuffle scoring, different small-side plumbing).
    Score = (bias + Σ w(token)) / max(n_tokens, 1)."""
    w = words(col)
    wmap = F.create_map(
        *[x for tok, wt in sorted(weights.items()) for x in (F.lit(tok), F.lit(float(wt)))]
    )
    s = F.aggregate(
        w,
        F.lit(float(bias)),
        lambda acc, t: acc + F.coalesce(wmap[F.lower(t)], F.lit(0.0)),
    )
    return s / F.greatest(F.size(w), F.lit(1))


def md5_bucket(tok: Column, n_buckets: int) -> Column:
    """Hash a token into 0..n_buckets-1 via the first md5 byte — the
    engine-portable hashing-trick bucket (same hex→int trick as
    ``hashed_feature_weight``; DuckDB replays it with strpos+md5).
    n_buckets must divide 256 so the bucket is the full byte mod n."""
    if 256 % n_buckets:
        raise ValueError(f"n_buckets must divide 256, got {n_buckets}")
    h = F.md5(F.lower(tok).cast("binary"))
    v1 = _hex_val(F.substring(h, 1, 1))
    v2 = _hex_val(F.substring(h, 2, 1))
    return ((v1 * 16 + v2) % n_buckets).cast("int")


def distinctive_terms(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 5,
    min_count: int = 5,
) -> DataFrame:
    """Per-group distinctive vocabulary by LIFT — the corpus-audit /
    topic-labeling step (the log-free core of c-TF-IDF): for each
    (group, term), lift = (term share within the group) / (term share
    in the whole corpus); the top-k lifted terms characterize what a
    group talks about that the rest of the corpus does not.

    Deterministic and oracle-exact: counts are exact integers and lift
    is a quotient of two IEEE divisions of exact integers — no log, no
    libm variance (ln-based c-TF-IDF would pit Math.log ULPs against
    the oracle's), and the double is emitted UNROUNDED (identical
    inputs → identical doubles → identical strings; a round() here is
    the one op whose last decimal can differ across engines).
    ``min_count`` drops rare-term noise.

    Scale shape: one explode→(group, term) count (map-side combined),
    corpus term totals derived FROM the group counts (an aggregate of
    the aggregate — never a second scan), broadcast-joined back; the
    final top-k is a rank window over (group) — WindowGroupLimit
    prunes per-partition.
    """
    from pyspark.sql import Window

    gt = (
        docs.select(F.col(group_col), F.explode(words(text_col)).alias("__t"))
        .groupBy(group_col, "__t")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    group_tot = gt.groupBy(group_col).agg(F.sum("cnt").alias("g_tot"))
    term_tot = gt.groupBy("__t").agg(F.sum("cnt").alias("t_tot"))
    corpus_tot = gt.agg(F.sum("cnt").alias("c_tot"))
    lift = (F.col("cnt") / F.col("g_tot")) / (F.col("t_tot") / F.col("c_tot"))
    w = Window.partitionBy(group_col).orderBy(
        F.desc("lift"), F.asc("__t")
    )
    return (
        gt.filter(F.col("cnt") >= min_count)
        .join(F.broadcast(group_tot), group_col)
        .join(term_tot, "__t")
        .crossJoin(F.broadcast(corpus_tot))
        .withColumn("lift", lift)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            group_col,
            F.col("__t").alias("term"),
            "cnt",
            "lift",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def winnowing_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
) -> Column | DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
    SIGMOD 2003, the MOSS algorithm): hash every word k-gram, slide a
    ``window``-wide window over the hash sequence, keep each window's
    MINIMUM hash, emit the distinct selected hashes per document.
    Guarantees: any match of length ≥ window+k-1 grams shares a
    fingerprint, and the density is ~2/(window+1) — the bounded-size
    signature set plagiarism/overlap detection needs, far smaller than
    the full gram set.

    All HOFs over the per-document gram array — zero shuffles before
    the caller's aggregation; the hash is md5-prefix (engine-portable,
    so the DuckDB oracle selects the very same fingerprints).
    Documents shorter than one window still emit the minimum of what
    they have (the standard boundary rule).

    Returns (id, fingerprint) exploded rows.
    """
    w = words(text_col)
    n = F.size(w)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(w, i, k)),
    )
    hashes = F.transform(grams, lambda g: F.substring(F.md5(g), 1, 16))
    m = F.size(hashes)
    starts = F.sequence(F.lit(1), F.greatest(m - (window - 1), F.lit(1)))
    selected = F.array_distinct(
        F.transform(starts, lambda i: F.array_min(F.slice(hashes, i, window)))
    )
    return docs.select(
        F.col(id_col), F.explode(selected).alias("fingerprint")
    ).dropDuplicates([id_col, "fingerprint"])


# --- D58: unigram-LM (SentencePiece) EM step -----------------------------------

#: Viterbi key sentinel: real keys are lpad(cost,6,'0') || '|' || seg and
#: per-word costs top out near 400, so '999999|' sorts after every real
#: key — string MIN is the (cost, segmentation) lexicographic argmin.
_UNI_INF = "999999|"
#: piece separator inside a segmentation string ('.' = ASCII 46, below
#: every lowercase letter, so dot-vs-letter decides ties identically on
#: any bytewise-comparing engine)
_UNI_SEP = "."


def _unigram_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """The weighted CLEAN-WORD vocabulary the EM step runs on: pure
    lowercase-alpha tokens of length 2..10 with occurrence counts. The
    length cap bounds the segmentation lattice (and the oracle's
    brute-force path enumeration); production tails beyond it are
    chunked upstream (d18) — the EM statistics want the high-frequency
    core anyway, which is short words."""
    return (
        df.select(F.explode(words(text_col)).alias("__w"))
        .filter(
            F.col("__w").rlike("^[a-z]+$")
            & F.length("__w").between(2, 10)
        )
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__wf"))
    )


def unigram_piece_costs(
    df: DataFrame, text_col: str = "text", top_multi: int = 60
) -> DataFrame:
    """Seed piece inventory + integer costs for the unigram-LM EM step
    (Kudo 2018's frequent-substring seeding, quantized): every length-1
    piece of the clean vocabulary (guaranteed segmentation coverage)
    plus the ``top_multi`` most frequent length-2..3 substrings
    (occurrence-weighted, ties broken piece-asc so the cut is
    deterministic). cost(p) = 41 − length(bin(freq_p)) — equivalently
    40 − ilog2(freq_p) with ilog2 = length(bin(freq)) − 1 — an INTEGER
    quantization of −log p(piece), exact on any engine (no
    transcendental log for two engines to round differently), so
    Viterbi sums and the EM counts downstream are bit-identical by
    construction. The cost is clamped at 0 (greatest(…, 0), mirrored
    in the DuckDB oracle): a piece frequency ≥ 2^41 would otherwise go
    negative and a '-'-prefixed lpad would break the string-MIN key
    ordering the Viterbi fold relies on.

    Scale shape: one corpus pass builds the vocabulary; the substring
    explode runs over DISTINCT words only (≤30 positions each); the
    inventory is ≤ 26 + top_multi rows — broadcastable model state."""
    v = _unigram_vocab(df, text_col)
    occ = (
        v.select(
            "__w", "__wf",
            F.explode(F.sequence(F.lit(1), F.length("__w"))).alias("__i"),
        )
        .select(
            "__w", "__wf", "__i",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("__l"),
        )
        .filter(F.col("__i") + F.col("__l") - 1 <= F.length("__w"))
        .select(F.expr("substring(__w, __i, __l)").alias("piece"), "__wf")
        .groupBy("piece")
        .agg(F.sum("__wf").alias("pf"))
    )
    p1 = occ.filter(F.length("piece") == 1)
    pk = (
        occ.filter(F.length("piece") >= 2)
        .orderBy(F.desc("pf"), "piece")
        .limit(top_multi)
    )
    return p1.unionByName(pk).select(
        "piece", "pf",
        F.greatest(F.lit(41) - F.length(F.bin("pf")), F.lit(0)).alias("cost"),
    )


def _unigram_viterbi_key(w, items: list[tuple[str, int]]):
    """Best-segmentation key for word column ``w`` under the collected
    (piece, cost) ladder: a pure-JVM ``aggregate`` fold over character
    positions — dp[i] = MIN over piece lengths j∈{1,2,3} of
    extend(dp[i−j], w[i−j+1 .. i]) — where each dp entry is the string
    ``lpad(cost,6,'0')|seg`` so string MIN is exactly the (cost, seg)
    lexicographic argmin. Optimal substructure holds for this key: a
    cheaper prefix stays cheaper under any common suffix (costs add;
    equal-cost segs of the same prefix can never be string-prefixes of
    each other, so their order is decided before the suffix).

    Piece-cost lookup is O(1) per probe: the ladder is compiled into
    one fixed-width string table per piece length (slot = base-26
    digit value of the piece, 2 chars per slot holding the 00-40 cost,
    '99' = absent — costs are capped at 40 by unigram_piece_costs'
    clamp so the sentinel is unambiguous), probed with
    ``substring(table, 2*idx+1, 2)``. The previous form was an
    ~|inventory|-branch CASE chain evaluated 3x per character
    position — O(|inventory|·len) string compares per word vs
    O(len) table probes (measured 4.4x on the d58 entry, round 19).
    Pieces and probe words are guaranteed lowercase a-z by
    _unigram_vocab's filter, so ascii(char)-97 digits are total."""
    by_len: dict[int, dict[str, int]] = {1: {}, 2: {}, 3: {}}
    for p, c in items:
        by_len[len(p)][p] = int(c)
    tables = {}
    for j in (1, 2, 3):
        buf = ["99"] * (26 ** j)
        for p, c in by_len[j].items():
            idx = 0
            for ch in p:
                idx = idx * 26 + (ord(ch) - 97)
            buf[idx] = f"{c:02d}"
        tables[j] = "".join(buf)

    def slot_of(i, j):
        idx = F.lit(0)
        for t in range(j):
            idx = idx * F.lit(26) + (
                F.ascii(F.substr(w, i - F.lit(j - 1 - t), F.lit(1)))
                - F.lit(97)
            )
        # i < j probes read out-of-range chars (ascii('') = 0, idx
        # negative); clamp so the substring stays a well-formed slot —
        # the i >= j validity guard discards the candidate anyway
        return F.substring(
            F.lit(tables[j]),
            F.greatest(idx, F.lit(0)) * F.lit(2) + F.lit(1),
            F.lit(2),
        )

    def step(acc, i):
        cands = []
        for j in (1, 2, 3):
            prev = F.element_at(acc, F.greatest(i - F.lit(j) + 1, F.lit(1)))
            piece = F.substr(w, i - F.lit(j) + 1, F.lit(j))
            slot = slot_of(i, j)
            prev_cost = F.substring(prev, 1, 6).cast("int")
            prev_seg = F.substr(prev, F.lit(8), F.length(prev))
            key = F.concat(
                F.lpad((prev_cost + slot.cast("int")).cast("string"), 6, "0"),
                F.lit("|"), prev_seg, piece, F.lit(_UNI_SEP),
            )
            valid = (
                (i >= F.lit(j))
                & (F.substring(prev, 1, 6) != F.lit("999999"))
                & (slot != F.lit("99"))
            )
            cands.append(F.when(valid, key).otherwise(F.lit(_UNI_INF)))
        best = F.least(*cands)
        return F.concat(acc, F.array(best))

    dp = F.aggregate(
        F.sequence(F.lit(1), F.length(w)),
        F.array(F.lit("000000|")),
        step,
    )
    return F.element_at(dp, -1)


def unigram_em_step(
    df: DataFrame,
    text_col: str = "text",
    top_multi: int = 60,
    top_k: int = 40,
) -> DataFrame:
    """ONE EM iteration of unigram-LM (SentencePiece, Kudo 2018)
    tokenizer training — the tokenizer-family member BPE doesn't cover
    (d55/d57/d69 are BPE end-to-end; unigram is the other production
    tokenizer): E-step = Viterbi-segment every distinct clean word
    under the current (integer-quantized) piece costs; M-step = piece
    occurrence counts over the Viterbi segmentations, occurrence-
    weighted, renormalized to exact parts-per-million integer scores.
    Returns the ``top_k`` (piece, em_count, score_ppm) rows ordered
    (em_count desc, piece).

    The textbook E-step is forward-backward (expected counts over ALL
    segmentations); SentencePiece itself ships the Viterbi ("hard-EM")
    approximation for exactly the reason this engine wants it —
    argmax counts are integer-exact and engine-replayable, while
    posterior expectations are transcendental. Documented contract,
    not a shortcut taken silently.

    Scale shape: the corpus is touched ONCE (vocabulary pass); the
    E-step is a pure projection over DISTINCT words (the fold in
    `_unigram_viterbi_key` is whole-stage-codegen JVM, no Python); the
    piece inventory (≤ 26 + top_multi rows) is collected as driver
    model state — the documented k-row pattern (k-means centroids,
    DSIR buckets, perceptron gradients); the M-step is one explode +
    partial-combined agg over segment pieces. Oracle: the DuckDB twin
    replays the vocabulary, inventory, and costs verbatim, then
    brute-force enumerates every segmentation with a recursive CTE
    (bounded by the length-10 vocab cap) and takes the same string-MIN
    key — the worse-algorithm-as-oracle pattern (d59b)."""
    v = _unigram_vocab(df, text_col)
    pieces = unigram_piece_costs(df, text_col, top_multi)
    items = [
        (r["piece"], int(r["cost"]))
        for r in pieces.collect()  # ≤ 26 + top_multi rows: model state
    ]
    if not items:
        return local_df(
            df.sparkSession, [], "piece string, em_count bigint, score_ppm bigint"
        )
    key = _unigram_viterbi_key(F.col("__w"), items)
    segs = v.select(
        "__wf",
        F.substr(key, F.lit(8), F.length(key)).alias("__seg"),
    )
    em = (
        segs.select(
            "__wf",
            F.explode(
                F.filter(
                    F.split("__seg", "\\" + _UNI_SEP), lambda x: x != ""
                )
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("__wf").alias("em_count"))
    )
    total = em.agg(F.sum("em_count").alias("__t"))
    return (
        em.crossJoin(F.broadcast(total))
        .select(
            "piece",
            "em_count",
            F.expr("em_count * 1000000 div __t").alias("score_ppm"),
        )
        .orderBy(F.desc("em_count"), "piece")
        .limit(top_k)
    )


def train_vocab_ids(
    docs: "DataFrame", v: int = 50, text_col: str = "text"
) -> list[tuple[str, int]]:
    """Train a top-V word vocabulary with DETERMINISTIC ids: rank by
    (count desc, word asc) — the tiebreak makes the id assignment
    reproducible on any engine and any partitioning. Returns [(word,
    id)] driver-side — k-row MODEL STATE (the centroid/codebook/
    merge-table pattern), never data-sized."""
    w = words(text_col)
    rows = (
        docs.select(F.explode(w).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy(F.desc("__n"), F.asc("__w"))
        .limit(v)
        .collect()
    )
    return [(r["__w"], i) for i, r in enumerate(rows)]


def encode_to_ids(
    docs: "DataFrame",
    vocab: list[tuple[str, int]],
    max_len: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """TENSORIZATION (round 13 — the last data-side step before
    training): map each document's tokens to vocabulary ids with an
    UNK fallback (id = |vocab|), truncate to ``max_len``, and emit the
    id array plus the lengths a collator needs (n_tokens pre-truncate,
    n_unk within the kept window). The vocabulary rides as a literal
    MAP expression (broadcast model state, one codegen'd projection —
    no explode, no join, no Python), so encoding is a pure map-side
    pass over the corpus: the plan every tokenizer-apply job wants at
    100 TB. Deterministic by construction given the trained vocab
    (`train_vocab_ids`' (count desc, word asc) ids)."""
    unk = len(vocab)
    m = F.create_map(
        *[x for wd, i in vocab for x in (F.lit(wd), F.lit(i))]
    )
    w = words(text_col)
    kept = F.slice(w, 1, max_len)
    ids = F.transform(kept, lambda t: F.coalesce(m[t], F.lit(unk)).cast("int"))
    return docs.select(
        F.col(id_col),
        ids.alias("ids"),
        F.size(w).cast("bigint").alias("n_tokens"),
        F.size(F.filter(ids, lambda i: i == unk)).cast("bigint").alias("n_unk"),
    )


def encoding_audit(
    docs: "DataFrame", text_col: str = "text", id_col: str = "doc_id"
) -> "DataFrame":
    """ENCODING/MOJIBAKE audit (round 13 — the ingestion-health check a
    web-scale corpus runs before any text op trusts the bytes): per
    document, counts of the three classic damage signatures —
    U+FFFD replacement characters (a decoder already gave up),
    C0/C1 control characters other than tab/newline/CR (binary leaked
    into text), and the 'Ã?'-class double-encoding artifact (UTF-8
    bytes decoded as Latin-1 then re-encoded: 'Ã' followed by a char
    in U+0080–U+00BF, the Latin-1 rendering of UTF-8 continuation
    bytes — café→cafÃ©, the most common real-world corruption) — plus the combined ``clean`` flag a filter gates on.
    Pure regexp_count projections in the Java∩RE2 subset (the
    PII_PATTERNS discipline): zero shuffle, oracle-exact."""
    from pyspark.sql import functions as F  # noqa: N812

    c = F.col(text_col)
    n_replacement = F.regexp_count(c, F.lit("�")).cast("int")
    n_control = F.regexp_count(
        c, F.lit(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")
    ).cast("int")
    n_mojibake = F.regexp_count(c, F.lit("Ã[\\x80-\\xbf]")).cast("int")
    return docs.select(
        F.col(id_col),
        n_replacement.alias("n_replacement"),
        n_control.alias("n_control"),
        n_mojibake.alias("n_mojibake"),
        (
            (n_replacement == 0) & (n_control == 0) & (n_mojibake == 0)
        ).alias("clean"),
    )
