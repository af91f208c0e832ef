"""Local mimic of the driver's DuckDB oracle comparison.

For every (name, builder) in the inventory with an oracle SQL: run the
Spark query and the DuckDB SQL on the same parquet directory, then
compare row count, column-name set, and order-insensitive values
(sorted by all columns). Floats must match to 1e-12 relative — the
inventory rounds derived doubles, so anything looser indicates a
dialect-drift bug, not benign ULP noise.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from etl_cortex_spark.sources.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # unify None/NaN representations for strings
            df[c] = df[c].where(pd.notna(df[c]), None)
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="last").reset_index(
            drop=True
        )
    return df


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    got, want = _normalize(spark_pdf), _normalize(oracle_pdf)
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rowcount spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        kind = {"u": "i"}.get  # unsigned counts as signed
        assert kind(gk, gk) == kind(wk, wk), (
            f"{name}: dtype-kind mismatch on {c}: spark={got[c].dtype} oracle={want[c].dtype}"
        )
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            g = g.astype("float64")
            w = w.astype("float64")
            both_nan = g.isna() & w.isna()
            close = np.isclose(g.fillna(0), w.fillna(0), rtol=1e-12, atol=1e-12)
            ok = (both_nan | (close & ~(g.isna() ^ w.isna()))).all()
            assert ok, f"{name}: float column {c} diverges\n{pd.DataFrame({'spark': g, 'oracle': w})[~(both_nan | close)].head(10)}"
        else:
            eq = (g.isna() & w.isna()) | (g == w)
            assert eq.all(), (
                f"{name}: column {c} diverges\n"
                f"{pd.DataFrame({'spark': g, 'oracle': w})[~eq].head(10)}"
            )


def run_pair(spark, sf_dir: str, name: str, builder, sql: str) -> None:
    got = builder(spark, sf_dir).toPandas()
    con = duck_connection(sf_dir)
    try:
        want = con.execute(sql).df()
    finally:
        con.close()
    compare(got, want, name)
