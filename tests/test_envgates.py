"""Environment-gate accounting (ENVGATES.md, round-3 verdict #5).

The registry size depends on exactly one container fact — whether
``google.protobuf`` imports (gates ``stream_tws_user_stats``). This
test pins the arithmetic so a drifted count fails loudly and the
181-vs-182 question is answerable from CI output alone.
"""

from __future__ import annotations

from etl_cortex_spark.inventory.tier_d import _tws_available
from etl_cortex_spark.queries import ORACLE, QUERIES

BASE_QUERIES = 371
BASE_ORACLE = 365


def test_registry_count_matches_env_gates():
    gated = 1 if _tws_available() else 0
    assert len(QUERIES) == BASE_QUERIES + gated, (
        f"registry has {len(QUERIES)} queries; expected "
        f"{BASE_QUERIES} + {gated} gated (tws_available={_tws_available()})"
    )
    assert len(ORACLE) == BASE_ORACLE + gated


def test_tws_gate_outcome_is_reported():
    # Always-pass probe whose *name + assertion message* records the
    # outcome in CI output.
    outcome = _tws_available()
    assert outcome in (True, False)
    print(f"ENVGATE stream_tws_user_stats: tws_available={outcome}")
