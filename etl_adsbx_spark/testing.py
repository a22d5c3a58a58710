"""Local mirror of the driver's correctness gate: run a registry query on
Spark AND its oracle SQL on DuckDB over the same parquet tables, compare
row-count + schema-shape + values (order-insensitive). Used by
tests/test_queries_oracle.py so every oracle mismatch is caught locally
before the driver sees it.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from .schemas import DRIVER_TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v):
    # array-valued cells: Spark yields numpy arrays / lists, DuckDB yields
    # numpy arrays — canonicalize both to tuples so == is a scalar bool
    if isinstance(v, np.ndarray):
        return tuple(_canon_cell(x) for x in v.tolist())
    if isinstance(v, list):
        return tuple(_canon_cell(x) for x in v)
    return v


def assert_driver_hashable(pdf: pd.DataFrame, side: str) -> None:
    """The driver's canonicalizer hashes cell values with pandas and
    CRASHES on list/array cells (CORRECTNESS_r01: map_funcs/collect_agg,
    'unhashable type: list'). Mirror that here so array-typed OUTPUT
    columns fail locally before the driver sees them."""
    for c in pdf.columns:
        if pdf[c].dtype == object and len(pdf):
            # pyspark Row is a tuple subclass: check struct-ness FIRST so
            # struct-typed outputs get an actionable message, not the
            # list/array one ('|'-joining a struct makes no sense).
            structy = pdf[c].map(lambda v: isinstance(v, dict) or hasattr(v, "asDict"))
            if structy.any():
                raise AssertionError(
                    f"{side} column {c!r} has struct-typed cells — the driver "
                    "canonicalizer cannot hash these; flatten the struct to "
                    "scalar columns (col('s.a'), col('s.b')) on both sides"
                )
            bad = pdf[c].map(lambda v: isinstance(v, (list, tuple, np.ndarray)))
            if bad.any():
                raise AssertionError(
                    f"{side} column {c!r} has list/array-typed cells — the "
                    "driver canonicalizer cannot hash these; serialize to a "
                    "'|'-joined string on both sides"
                )


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].map(_canon_cell)
    if len(pdf):
        pdf = pdf.sort_values(
            by=list(pdf.columns), key=lambda col: col.astype(str), na_position="last"
        ).reset_index(drop=True)
    return pdf


def compare_query(spark_df, sql: str, sf_dir: str) -> None:
    """Raise AssertionError with a diagnostic on any mismatch."""
    con = duckdb_conn(sf_dir)
    oracle_raw = con.execute(sql).fetchdf()
    got_raw = spark_df.toPandas()
    assert_driver_hashable(got_raw, "spark")
    assert_driver_hashable(oracle_raw, "oracle")
    oracle = _normalize(oracle_raw)
    got = _normalize(got_raw)
    assert len(got) == len(oracle), f"row count: spark={len(got)} oracle={len(oracle)}"
    assert list(got.columns) == list(oracle.columns), (
        f"columns: spark={list(got.columns)} oracle={list(oracle.columns)}"
    )
    for c in got.columns:
        # the driver's value hash is dtype-sensitive (json_extract r01:
        # identical values, int64 vs HUGEINT→float64, hash_match=false) —
        # require identical post-normalization dtypes, not just == values
        assert got[c].dtype == oracle[c].dtype, (
            f"col {c}: dtype spark={got[c].dtype} oracle={oracle[c].dtype} "
            "(driver hash is dtype-sensitive — cast both sides)"
        )
    for c in got.columns:
        g, o = got[c], oracle[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(o):
            ga, oa = g.astype(float).to_numpy(), o.astype(float).to_numpy()
            both_nan = np.isnan(ga) & np.isnan(oa)
            eq = (ga == oa) | both_nan
            if not eq.all():
                idx = int(np.argmax(~eq))
                raise AssertionError(
                    f"col {c}: {(~eq).sum()} mismatches; first at row {idx}: "
                    f"spark={ga[idx]!r} oracle={oa[idx]!r} diff={ga[idx]-oa[idx]!r}"
                )
        else:
            eq = (g == o) | (g.isna() & o.isna())
            if not eq.all():
                idx = int(np.argmax(~eq.to_numpy()))
                raise AssertionError(
                    f"col {c}: {(~eq).sum()} mismatches; first at row {idx}: "
                    f"spark={g.iloc[idx]!r} oracle={o.iloc[idx]!r}"
                )
