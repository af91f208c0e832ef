"""Reusable column-expression helpers — the engine's scalar-function
namespace, re-exported from the operator modules that define them.

Everything here is a pure Catalyst column expression (whole-stage
codegen, no Python in the hot path), usable in any ``select``/
``filter``/``agg`` like a builtin:

    from etl_cortex_spark import functions as EF
    df.select(EF.norm_title("status"), EF.first_ipv4("ip"))
"""

from etl_cortex_spark.operators.cleaning import (  # noqa: F401
    FAIL_KEYWORDS,
    IPV4_PATTERN,
    first_ipv4,
    first_ipv6,
    keyword_flag,
    norm_col,
    norm_title,
)
from etl_cortex_spark.operators.similarity import (  # noqa: F401
    as_double,
    cosine,
    dot,
    l2norm,
    lsh_bucket,
)
from etl_cortex_spark.operators.textops import (  # noqa: F401
    BPE_TOKEN_RE,
    STOPWORDS,
    bpe_apply_merges,
    bpe_encode_word,
    bpe_symbol_count,
    classifier_feat_sum,
    classifier_score,
    classifier_score_weighted,
    distinct_ratio,
    hashed_feature_weight,
    kgram_fingerprint,
    lang_id,
    n_bpe_tokens,
    n_tokens,
    norm_url,
    punct_ratio,
    quality_score,
    shingles,
    stopword_ratio,
    strip_markup,
    words,
)

__all__ = [
    "FAIL_KEYWORDS",
    "IPV4_PATTERN",
    "BPE_TOKEN_RE",
    "STOPWORDS",
    "first_ipv4",
    "first_ipv6",
    "keyword_flag",
    "norm_col",
    "norm_title",
    "as_double",
    "cosine",
    "dot",
    "l2norm",
    "lsh_bucket",
    "distinct_ratio",
    "kgram_fingerprint",
    "lang_id",
    "n_bpe_tokens",
    "n_tokens",
    "punct_ratio",
    "quality_score",
    "shingles",
    "stopword_ratio",
    "classifier_feat_sum",
    "classifier_score",
    "classifier_score_weighted",
    "hashed_feature_weight",
    "words",
    "strip_markup",
    "norm_url",
    "bpe_encode_word",
    "bpe_apply_merges",
    "bpe_symbol_count",
]
