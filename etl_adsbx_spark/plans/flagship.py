"""Flagship end-to-end query (driver smoke check, SURVEY.md §7 step 3).

The reference pipeline needs an observation stream; the driver test data
has one — ``events``. We map it deterministically onto the ADS-B
observation schema (each user is an "aircraft", each event an observation
tick), then run the REAL pipeline: schema'd scan → R5-R20 transform →
last-write-wins dedup (R21) → includes broadcast join + enrichment
(R23/R24) → first-wins output dedup (R25) → Feature assembly (R20).

Everything downstream of the mapping is exactly the production plan, so the
smoke check exercises scan / filter / project / broadcast-join / two keyed
dedups / nested-struct sink in one query.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import control, to_features
from ..schemas import INCLUDES_SCHEMA
from ..tables import load_table

BATCH_TIME = dt.datetime(2026, 1, 15, 12, 0, 0)


def events_as_aircraft(events: DataFrame) -> DataFrame:
    """Deterministic events → ADS-B observation mapping.

    user_id → registration 'N<user>', event ordering → ingestion index,
    value → position/telemetry, event_type → emitter category branches
    (covering R10's A0-A7/B2/other arms), error events → emergency.
    """
    e = events
    return e.select(
        F.col("event_id").alias("_idx"),
        F.lower(F.format_string("ae%04x", F.col("user_id"))).alias("hex"),
        F.lit("adsb_icao").alias("type"),
        F.lit(None).cast("string").alias("group"),
        F.concat(F.lit("FLT"), F.col("user_id")).alias("flight"),
        # ~3% of observations lose registration → exercises the falsy
        # coalesce fallback to flight (R5)
        F.when(F.col("event_id") % 31 == 0, F.lit("")).otherwise(
            F.concat(F.lit("N"), F.col("user_id"), F.lit("SG"))
        ).alias("r"),
        F.lit("B738").alias("t"),
        (F.col("user_id") % 4).cast("double").alias("dbFlags"),
        F.when(F.col("value") < 1.0, F.lit("ground"))
        .otherwise((F.col("value") * 100).cast("long").cast("string"))
        .alias("alt_baro"),
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value") * 100.0)
        .alias("alt_geom"),
        F.when(F.col("event_id") % 11 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("gs"),
        (F.col("value") % 360.0).alias("track"),
        F.lit(0.0).alias("baro_rate"),
        F.lit("1200").alias("squawk"),
        F.when(F.col("event_type") == "error", F.lit("squawk7700"))
        .otherwise(F.lit("none"))
        .alias("emergency"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("A1", "A3", "A7", "B2", "C1")]),
            (F.col("user_id") % 5 + 1).cast("int"),
        ).alias("category"),
        F.lit(None).cast("double").alias("nav_qnh"),
        F.lit(None).cast("double").alias("nav_altitude_mcp"),
        F.lit(None).cast("double").alias("nav_heading"),
        (F.col("value") % 90.0).alias("lat"),
        (-(F.col("value") % 180.0)).alias("lon"),
        F.lit(1.0).alias("seen_pos"),
        F.lit(0.5).alias("seen"),
        F.col("value").alias("dst"),
    )


def includes_for_users(spark: SparkSession, n_users: int = 64) -> DataFrame:
    """Allow-list dimension: every 2nd user is included (half get callsign
    overrides), mirroring the reference includes config (task.ts:26-61)."""
    rows = []
    for i in range(0, n_users, 2):
        rows.append(
            (
                i,
                ["EMS", "FIRE", "LAW"][i % 3],
                f"MEDIC{i}" if i % 4 == 0 else None,
                f" N{i}SG ",  # exercises lower/trim matching (task.ts:223)
                ["National", "Fire", "Law"][i % 3],
            )
        )
    return spark.createDataFrame(rows, INCLUDES_SCHEMA)


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → aircraft → full CoT pipeline → nested Feature rows."""
    events = load_table(spark, sf_dir, "events")
    aircraft = events_as_aircraft(events)
    includes = includes_for_users(spark)
    flat = control(
        aircraft,
        includes,
        filtering=True,
        hostile_enabled=True,
        batch_time=BATCH_TIME,
    )
    return to_features(flat)
