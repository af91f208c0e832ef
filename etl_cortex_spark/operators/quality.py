"""Declarative data-quality checks (Deequ/Great-Expectations style),
evaluated in ONE pass over the table.

The reference app's only validation is dropping all-null rows/columns
(app.py:77-90); a production lakehouse wants assertable constraints.
Each rule is a boolean column expression; ``check_rules`` folds every
rule into a single wide aggregate — one scan, map-side partial
combine, no per-rule jobs — and returns the long-form report
(rule, n_rows, n_violations, violation_frac). ``expect_clean`` turns
the report into a hard gate for pipelines.

At 100 TB this is the difference between running k table scans for k
constraints and running one: all counters ride the same shuffle-free
aggregate, exactly like the c49 column profiler.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def check_rules(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate named boolean rules (True = row passes) in one
    aggregate pass; NULL rule results count as violations (3VL-safe).

    Returns (rule, n_rows, n_violations, violation_frac) sorted by
    rule name.
    """
    if not rules:
        raise ValueError("check_rules needs at least one rule")
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for name, cond in rules.items():
        aggs.append(
            F.sum(F.when(cond, 0).otherwise(1)).alias(f"__v__{name}")
        )
    one = df.agg(*aggs)
    stack_parts = ", ".join(f"'{name}', __v__{name}" for name in rules)
    return (
        one.selectExpr(
            "__rows",
            f"stack({len(rules)}, {stack_parts}) AS (rule, n_violations)",
        )
        .select(
            "rule",
            F.col("__rows").alias("n_rows"),
            "n_violations",
            F.round(F.col("n_violations") / F.col("__rows"), 6).alias("violation_frac"),
        )
        .orderBy("rule")
    )


def expect_clean(df: DataFrame, rules: dict[str, Column]) -> None:
    """Hard pipeline gate: raise with the offending rules if any rule
    has violations."""
    report = check_rules(df, rules).filter(F.col("n_violations") > 0).collect()
    if report:
        detail = ", ".join(f"{r.rule}: {r.n_violations}" for r in report)
        raise ValueError(f"data-quality violations: {detail}")
