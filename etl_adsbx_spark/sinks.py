"""Sinks: FeatureCollection document assembly + file/HTTP emit
(task.ts:252-257, R28)."""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def feature_collection_json(features: DataFrame) -> str:
    """Assemble the single FeatureCollection document for the batch.

    The reference emits ONE document per tick (task.ts:252-255), so a
    driver-side collect of the (already deduped, O(10³-10⁴) row) feature set
    is the correct shape — this is the one place `collect()` is legitimate.
    For unbounded outputs use ``write_json`` instead.
    """
    docs = features.select(F.to_json(F.struct(*features.columns)).alias("j")).collect()
    return json.dumps(
        {"type": "FeatureCollection", "features": [json.loads(r.j) for r in docs]},
        separators=(",", ":"),
    )


def submit(features: DataFrame, post_fn: Callable[[str], None]) -> int:
    """`submit()` equivalent (task.ts:257): POST the FeatureCollection.
    Returns the feature count (the reference logs ids.size, task.ts:251)."""
    n = features.count()
    post_fn(feature_collection_json(features))
    return n


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
