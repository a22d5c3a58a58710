"""Local mirror of the driver's DuckDB-oracle correctness gate: every
registry query that declares an oracle must match it exactly at sf0.001
(the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from etl_adsbx_spark import queries as registry
from etl_adsbx_spark.testing import compare_query

from .conftest import SF_ORACLE

CASES = sorted(registry.oracle_sql().keys())


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(spark, name):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    compare_query(q(spark, SF_ORACLE), sql, SF_ORACLE)


def test_every_query_has_entry():
    qs = registry.queries()
    assert qs, "registry is empty"
    for name in registry.oracle_sql():
        assert name in qs, f"oracle without query: {name}"


def test_approx_distinct_error_bound(spark):
    """approx_count_distinct has no value oracle (engine-specific HLL
    sketch); bound its relative error against the exact count instead."""
    from pyspark.sql import functions as F

    from etl_adsbx_spark.tables import load_table

    got = {
        r["event_type"]: r["approx_users"]
        for r in registry.queries()["approx_distinct"](spark, SF_ORACLE).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_ORACLE, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, n in exact.items():
        assert abs(got[k] - n) <= max(3, 0.1 * n), (k, got[k], n)
