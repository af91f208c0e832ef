"""Silver-layer cleaning operators (SURVEY §2 tier A, rows A4-A10, A16).

Reference semantics come from ``/root/reference/app.py`` (cited per
function); mechanics are deliberately different — every per-row pandas
``.apply`` lambda becomes a Catalyst column expression that stays
inside whole-stage codegen. No Python UDFs anywhere in this module.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- A6: snake_case column rename (app.py:148-152) --------------------------

_NON_ALNUM = re.compile(r"[^0-9a-zA-Z]+")


def norm_col(name: str) -> str:
    """strip → non-alnum runs → '_' → trim '_' → lower (app.py:148-152)."""
    return _NON_ALNUM.sub("_", str(name).strip()).strip("_").lower()


def norm_cols(df: DataFrame) -> DataFrame:
    """Metadata-only rename; no job, no shuffle (app.py:181)."""
    return df.toDF(*[norm_col(c) for c in df.columns])


# --- A4/A5: drop all-null columns / rows (app.py:178) -----------------------


def drop_all_null_rows(df: DataFrame) -> DataFrame:
    """pandas ``dropna(how='all')`` → builtin na.drop (app.py:178)."""
    return df.na.drop(how="all")


def drop_all_null_cols(df: DataFrame) -> DataFrame:
    """pandas ``dropna(axis=1, how='all')`` (app.py:178).

    Two-phase: one aggregate action computing non-null counts for every
    column (a single map-side-combinable job over the data), then a
    metadata-only projection dropping zero-count columns. At scale this
    is one full scan — unavoidable, the semantics demand global
    knowledge — but it is a count-only scan, so parquet statistics and
    aggregate pushdown keep it cheap.
    """
    counts = df.agg(*[F.count(F.col(c)).alias(c) for c in df.columns]).first()
    dead = [c for c in df.columns if counts[c] == 0]
    return df.drop(*dead) if dead else df


# --- A7: date parse with coercion (app.py:184-186) ---------------------------


def to_ts_coerce(df: DataFrame, cols: Iterable[str]) -> DataFrame:
    """``pd.to_datetime(errors='coerce')`` → ``try_to_timestamp``.

    Parse failures become NULL (the reference's NaT). Columns already
    typed timestamp/date pass through untouched; only present columns
    are converted (the reference guards with ``if col in df.columns``,
    app.py:185).
    """
    dtypes = dict(df.dtypes)
    out = df
    for c in cols:
        t = dtypes.get(c)
        if t is None or t.startswith(("timestamp", "date")):
            continue
        out = out.withColumn(c, F.try_to_timestamp(F.col(c).cast("string")))
    return out


# --- A8: trim + title-case normalize (app.py:189-192) ------------------------


def norm_title(col: Column | str) -> Column:
    """Python ``str.strip().title()`` as a column expression.

    ``initcap`` only capitalizes after whitespace while Python's
    ``str.title`` capitalizes after ANY non-alpha ("o'brien"→"O'Brien").
    For bit-exact parity we lower-case then upper-case every letter
    that follows a non-letter (or starts the string) via regexp
    replacement on a split/transform chain — cheap and codegen'd.

    On the actual domain (single status words) ``initcap(trim(c))`` is
    identical; this version closes the general gap (app.py:189-192).
    """
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    lowered = F.lower(c)
    chars = F.split(lowered, "")
    # transform's 2-arg lambda gives the 0-based index; element_at is
    # 1-based, so element_at(chars, i) is the PREVIOUS character.
    # Uppercase a char when it starts the string or follows a non-letter.
    titled = F.array_join(
        F.transform(
            chars,
            lambda ch, i: F.when(
                (i == 0) | ~F.element_at(chars, i.cast("int")).rlike(r"\p{L}"),
                F.upper(ch),
            ).otherwise(ch),
        ),
        "",
    )
    return F.when(c.isNotNull(), titled)


def norm_status(df: DataFrame, col: str = "endpoint_status") -> DataFrame:
    """Trim + title-case a status column if present (app.py:189-192).

    NULL stays NULL — the reference's ``astype(str)`` would stringify
    NaN to "Nan"; we deliberately keep SQL NULL (SURVEY §1.2 NaN→NULL
    policy).
    """
    if col not in df.columns:
        return df
    return df.withColumn(col, norm_title(col))


# --- A9: first IPv4 extract (app.py:195-203) ---------------------------------

IPV4_PATTERN = r"\b(\d{1,3}(?:\.\d{1,3}){3})\b"


def first_ipv4(col: Column | str) -> Column:
    """First IPv4-looking token, NULL when absent.

    ``regexp_extract`` returns '' on no-match; ``nullif`` restores the
    reference's NaN-as-missing semantics (app.py:195-203).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(F.regexp_extract(c, IPV4_PATTERN, 1), F.lit(""))


def extract_first_ipv4(df: DataFrame, src: str = "ip_address", dst: str = "ipv4") -> DataFrame:
    if src not in df.columns:
        return df
    return df.withColumn(dst, first_ipv4(src))


# --- A10: first IPv6 from comma list (app.py:205-214) ------------------------


def first_ipv6(col: Column | str) -> Column:
    """Split on ',', trim parts, first part containing ':' else NULL.

    Higher-order functions only; ``element_at(..,1)`` on an empty
    filtered array yields NULL — matching the reference's NaN
    (app.py:205-214).
    """
    c = F.col(col) if isinstance(col, str) else col
    parts = F.filter(
        F.transform(F.split(c, ","), lambda x: F.trim(x)),
        lambda x: x.contains(":"),
    )
    return F.when(F.size(parts) > 0, F.element_at(parts, 1))


def extract_first_ipv6(df: DataFrame, src: str = "ipv6_address", dst: str = "ipv6") -> DataFrame:
    if src not in df.columns:
        return df
    return df.withColumn(dst, first_ipv6(src))


# --- A16: multi-column keyword flag, OR-fold (app.py:264-269) -----------------

FAIL_KEYWORDS = r"fail|timed out|faulty|lost|error"


def keyword_flag(df: DataFrame, cols: Iterable[str], pattern: str = FAIL_KEYWORDS) -> Column:
    """Case-insensitive contains-any over present columns; NULL→False.

    ``coalesce(..., false)`` reproduces pandas ``.str.contains(na=False)``
    (app.py:264-269). Missing columns contribute False, like the
    reference's column-presence guard.
    """
    pred = F.lit(False)
    for c in cols:
        if c in df.columns:
            pred = pred | F.coalesce(F.lower(F.col(c).cast("string")).rlike(pattern), F.lit(False))
    return pred


# --- B3: trim every string column (README.md:31) ------------------------------


def trim_strings(df: DataFrame) -> DataFrame:
    return df.select(
        *[
            F.trim(F.col(c)).alias(c) if t == "string" else F.col(c)
            for c, t in df.dtypes
        ]
    )
