"""File/JSON sources with declared schemas.

Reference parity: ingestion is schema-validated at the boundary
(`res.typed(...)`, task.ts:131-134) — FAILFAST is the validated path,
PERMISSIVE + `_corrupt_record` the quarantine option (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StringType, StructType

from ..schemas import ENVELOPE_SCHEMA


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def parse_envelope(payload: DataFrame, col: str = "value", strict: bool = True) -> DataFrame:
    """Parse raw JSON payload strings into validated envelope rows and
    explode the aircraft array (R4), adding the ingestion-order `_idx`
    that replaces JS loop order (SURVEY.md §7 hard-point 1).

    strict=True → FAILFAST (malformed payload aborts, matching res.typed);
    strict=False → PERMISSIVE with corrupt-record quarantine.
    """
    mode = "FAILFAST" if strict else "PERMISSIVE"
    schema = ENVELOPE_SCHEMA
    if not strict:
        schema = StructType(
            [*ENVELOPE_SCHEMA.fields, StructField("_corrupt_record", StringType(), True)]
        )
    parsed = payload.select(
        F.from_json(F.col(col), schema, {"mode": mode}).alias("env")
    )
    rows = parsed.select(F.posexplode("env.ac").alias("_idx", "ac")).select(
        F.col("_idx").cast("long"), "ac.*"
    )
    return rows


def reconcile_schema(
    df: DataFrame, target: StructType, on_extra: str = "drop"
) -> DataFrame:
    """Project a drifted frame onto a canonical schema: every target column
    is selected in target order — cast to the target type when present,
    typed NULL when the generation predates it; columns the target does not
    declare are dropped (``on_extra='drop'``) or rejected
    (``on_extra='error'``).

    This is the read-side half of schema evolution for a long-lived corpus:
    at 100 TB the parquet tree spans YEARS of writer generations (columns
    added, ints widened), and every consumer wants one contract schema, not
    whichever footer Spark happened to sample. Pure projection — zero
    shuffle, and column pruning still reaches the scan because the select
    is static. Pair with ``spark.read.option('mergeSchema', 'true')`` when
    one read must span generations (mergeSchema unions the footers;
    reconcile then pins order, types, and presence).
    """
    have = dict(df.dtypes)
    if on_extra == "error":
        extra = [c for c in df.columns if c not in {f.name for f in target.fields}]
        if extra:
            raise ValueError(f"columns not in target schema: {extra}")
    elif on_extra != "drop":
        raise ValueError(f"on_extra must be 'drop' or 'error', got {on_extra!r}")
    cols = [
        F.col(f.name).cast(f.dataType).alias(f.name)
        if f.name in have
        else F.lit(None).cast(f.dataType).alias(f.name)
        for f in target.fields
    ]
    return df.select(*cols)


def quarantine(payload: DataFrame, col: str = "value") -> DataFrame:
    """Rows that fail envelope validation, kept for inspection."""
    schema = StructType(
        [*ENVELOPE_SCHEMA.fields, StructField("_corrupt_record", StringType(), True)]
    )
    parsed = payload.select(
        F.from_json(F.col(col), schema, {"mode": "PERMISSIVE"}).alias("env")
    )
    return parsed.filter(F.col("env._corrupt_record").isNotNull()).select(
        F.col("env._corrupt_record").alias("raw")
    )
