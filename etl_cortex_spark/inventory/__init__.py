"""Query inventory, one module per SURVEY.md §2 tier.

Importing this package registers every (query, oracle) pair into
``etl_cortex_spark.queries.QUERIES/ORACLE``.
"""

from etl_cortex_spark.inventory import (  # noqa: F401
    tier_a,
    tier_a_excel,
    tier_b,
    tier_c_core,
    tier_c_rel,
    tier_c_scalar,
    tier_d,
    tier_d_ext,
    tier_d_prep,
    tier_d_sel,
    tier_scale,
    tier_sinks,
    tier_tpch,
)
