"""Plan inspection helpers (SURVEY C40 + the test_plans.py contract).

Small, dependency-free accessors over ``queryExecution`` so scale
properties (pushdown, pruning, exchange counts, codegen) can be
asserted in tests and inspected interactively:

    from etl_cortex_spark import plans
    print(plans.formatted(df))
    assert plans.exchange_count(df) <= 2
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_NODE_RE = re.compile(r"\(\d+\) (\w+)")


def formatted(df: DataFrame) -> str:
    """The formatted physical plan (pre-execution; AQE not yet run)."""
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def physical_body(df: DataFrame) -> str:
    plan = formatted(df)
    body = plan.split("== Physical Plan ==")[1]
    return body.split("===== Subqueries =====")[0]


def node_counts(df: DataFrame) -> dict[str, int]:
    """Physical operator name → occurrence count (each node once)."""
    out: dict[str, int] = {}
    for name in _NODE_RE.findall(physical_body(df)):
        out[name] = out.get(name, 0) + 1
    return out


def exchange_count(df: DataFrame) -> int:
    return node_counts(df).get("Exchange", 0)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every scan in the plan."""
    out = []
    for line in formatted(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            inner = line.split(":", 1)[1].strip().strip("[]")
            out.extend(p.strip() for p in inner.split(",") if p.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema strings of every scan — what actually gets read."""
    return [
        line.strip().split(":", 1)[1].strip()
        for line in formatted(df).splitlines()
        if line.strip().startswith("ReadSchema:")
    ]


def uses_python_eval(df: DataFrame) -> bool:
    """True when any Python-evaluation operator is in the plan — the
    thing hot paths must avoid."""
    body = formatted(df)
    return "BatchEvalPython" in body or "ArrowEvalPython" in body
