"""Direct operator tests for `operators.dedup` (round 17 — the
containment metric; the Jaccard paths are covered by the registry
entries + tests/test_tier_d.py)."""

from __future__ import annotations


def test_prefix_filter_containment_finds_quote_jaccard_misses(spark):
    """Round-17 containment metric: a short quote inside a long
    article has near-zero Jaccard but containment 1.0 — the
    asymmetric pair the default metric structurally misses. Also pins
    the metric validation."""
    import pytest

    from etl_cortex_spark.operators.dedup import prefix_filter_probe

    article_words = " ".join(f"w{i}" for i in range(300))
    quote = " ".join(f"w{i}" for i in range(40, 55))  # verbatim slice
    articles = spark.createDataFrame(
        [(1, article_words), (2, " ".join(f"x{i}" for i in range(200)))],
        "doc_id long, text string",
    )
    quotes = spark.createDataFrame([(10, quote)], "doc_id long, text string")
    got = prefix_filter_probe(
        articles, quotes, threshold=0.9, metric="containment"
    ).collect()
    assert [(r.new_id, r.existing_id, r.containment) for r in got] == [
        (10, 1, 1.0)
    ]
    # the Jaccard form misses it at any usable threshold
    assert (
        prefix_filter_probe(articles, quotes, threshold=0.3).count() == 0
    )
    with pytest.raises(ValueError, match="unknown metric"):
        prefix_filter_probe(articles, quotes, metric="cosine")
