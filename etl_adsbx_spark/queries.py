"""Driver-contract query registry: every operator from SURVEY.md §2B ships
here as a named (Spark callable, DuckDB oracle SQL) pair. The driver runs
both at sf0.01 and compares row-count + schema + order-insensitive
value-hash (see __spark_entry__.py).

Cross-engine determinism conventions (the whole file follows these):

- **Exact aggregates via decimal**: double→decimal(12,2)/(8,4) casts are
  deterministic (binary doubles have no decimal-midpoint ties), decimal
  arithmetic is exact in both engines, and the final decimal→double cast is
  correctly rounded in both. So SUM/AVG of money/rates hash identically.
- **Nonlinear per-row math** (trig/ln/cosine): computed fully in double —
  engines may differ by ~1 ulp — then `round(x, 6)` before output or before
  any exact sum. Reduction-order-dependent *unrounded* sums of such values
  are never emitted.
- **Computed integers** are cast to bigint on both sides (Spark `size()`
  is int, DuckDB `len()` is BIGINT, etc.).
- **Top-k requires a total order**: every rank/limit has a unique tiebreak
  column in both engines.
- Column names are aliased identically on both sides (driver sorts columns
  by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import text as T
from .functions.scalar import coalesce_falsy_str, haversine_km
from .operators import similarity
from .operators.agg import topk_per_group
from .operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash32,
)
from .operators.joins import asof_join, bucketed_range_join
from .tables import load_table

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLE)


# --- exactness helpers (see module docstring) ---

def dec2(c: Column | str) -> Column:
    return (F.col(c) if isinstance(c, str) else c).cast("decimal(12,2)")


def dec4(c: Column | str) -> Column:
    return (F.col(c) if isinstance(c, str) else c).cast("decimal(8,4)")


def dsum(c: Column, scale: int | None = None) -> Column:
    """Exact decimal sum surfaced as double.

    ``scale``: round the decimal sum first. REQUIRED when the exact sum can
    exceed ~15 significant digits (e.g. scale-10 product sums): decimal→
    double casting is correctly rounded in Spark (BigDecimal) but double-
    rounded in DuckDB (int128→double, then /10^scale), so 16+-digit values
    can land on adjacent doubles. Rounding to ≤14 sig digits makes both
    casts exact-identical."""
    out = F.sum(c)
    if scale is not None:
        out = F.round(out, scale)
    return out.cast("double")


def ONE4() -> Column:
    # classic PySpark Columns need an active session → build lazily
    return F.lit(1).cast("decimal(8,4)")


# =========================================================================
# Aggregations (SURVEY §2B: groupBy hash-agg, TPC-H surface)
# =========================================================================

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))), 4) AS DOUBLE) AS sum_disc_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
               * (CAST(1 AS DECIMAL(8,4)) + CAST(l_tax AS DECIMAL(8,4)))), 4) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan→filter→hash-agg. One shuffle on the 6-value
    group key; partial aggregation map-side; filter + column pruning reach
    the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dec2("l_extendedprice") * (ONE4() - dec4("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec2("l_quantity")).alias("sum_qty"),
            dsum(dec2("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price, 4).alias("sum_disc_price"),
            dsum(disc_price * (ONE4() + dec4("l_tax")), 4).alias("sum_charge"),
            (dsum(dec2("l_quantity")) / F.count("*")).alias("avg_qty"),
            (dsum(dec2("l_extendedprice")) / F.count("*")).alias("avg_price"),
            (dsum(dec4("l_discount")) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))), 4) AS DOUBLE) AS revenue,
      o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → agg → total-order
    top-k. customer is small → broadcast; orders⋈lineitem is the large
    equi-join (AQE sort-merge at scale)."""
    cutoff = F.to_timestamp(F.lit("1998-03-15"))
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(dec2("l_extendedprice") * (ONE4() - dec4("l_discount")), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_regional_revenue",
    oracle="""
    SELECT n_name,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))), 4) AS DOUBLE) AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = n_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join with three broadcast dims + one large
    fact-fact equi-join; Catalyst reorders the dim filters below the joins."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])),
            c["c_nationkey"] == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(s),
            (li["l_suppkey"] == s["s_suppkey"]) & (s["s_nationkey"] == F.col("n_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum(dec2("l_extendedprice") * (ONE4() - dec4("l_discount")), 4).alias("revenue"))
    )


@register(
    "distinct_agg",
    oracle="""
    SELECT c_mktsegment,
      COUNT(*) AS n_customers,
      COUNT(DISTINCT c_nationkey) AS n_nations,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal,
      CAST(MIN(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS min_bal,
      CAST(MAX(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS max_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count / count-distinct / min / max / sum in one hash-agg (Spark
    plans distinct-agg as a two-phase expand+agg — still one shuffle)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        dsum(dec2("c_acctbal")).alias("sum_bal"),
        F.min(dec2("c_acctbal")).cast("double").alias("min_bal"),
        F.max(dec2("c_acctbal")).cast("double").alias("max_bal"),
    )


@register(
    "rollup_agg",
    oracle="""
    SELECT c_mktsegment, o_orderstatus,
      CAST(GROUPING(c_mktsegment, o_orderstatus) AS BIGINT) AS grp_id,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
    FROM orders JOIN customer ON c_custkey = o_custkey
    GROUP BY ROLLUP (c_mktsegment, o_orderstatus)
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (SURVEY §2B grouping sets). Spark plans this
    as Expand + single hash-agg — one shuffle regardless of level count."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .rollup("c_mktsegment", "o_orderstatus")
        .agg(
            F.grouping_id().cast("bigint").alias("grp_id"),
            F.count("*").alias("n_orders"),
            dsum(dec2("o_totalprice")).alias("sum_price"),
        )
    )


# =========================================================================
# Filters / scalar expressions (R5-R20 generalized)
# =========================================================================

@register(
    "filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice BETWEEN 1000 AND 200000
      AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
      AND o_custkey IS NOT NULL
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6/R22 generalized: IN / BETWEEN / LIKE / null-check combos — all
    pushed to the parquet scan (PushedFilters in explain)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(1000, 200000)
        & (F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%"))
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@register(
    "case_value_mapping",
    oracle="""
    SELECT CASE
             WHEN event_type IN ('click', 'view') THEN 'engagement'
             WHEN event_type = 'purchase' THEN 'conversion'
             WHEN event_type = 'signup' THEN 'acquisition'
             ELSE 'other'
           END AS event_class,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1
    """,
)
def case_value_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R10 generalized: multi-branch CASE with IN-groups (the emitter-
    category → airframe mapping shape, task.ts:152-171)."""
    e = load_table(spark, sf_dir, "events")
    cls = (
        F.when(F.col("event_type").isin("click", "view"), F.lit("engagement"))
        .when(F.col("event_type") == "purchase", F.lit("conversion"))
        .when(F.col("event_type") == "signup", F.lit("acquisition"))
        .otherwise(F.lit("other"))
    )
    return e.groupBy(cls.alias("event_class")).agg(
        F.count("*").alias("n"), dsum(dec2("value")).alias("total_value")
    )


@register(
    "falsy_coalesce",
    oracle="""
    SELECT COALESCE(NULLIF(regexp_extract(text, '\\b(sp\\w+)', 1), ''), 'NONE') AS first_sp_word,
           COUNT(*) AS n_docs
    FROM documents GROUP BY 1
    """,
)
def falsy_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quirk #2 as a relational op: JS `||` treats '' as missing —
    regexp_extract returns '' on no match in both engines, and the falsy
    coalesce falls through to the default (task.ts:139 semantics)."""
    d = load_table(spark, sf_dir, "documents")
    first_sp = F.regexp_extract(F.col("text"), r"\b(sp\w+)", 1)
    return d.groupBy(
        coalesce_falsy_str(first_sp, F.lit("NONE")).alias("first_sp_word")
    ).agg(F.count("*").alias("n_docs"))


@register(
    "string_funcs",
    oracle="""
    SELECT p_partkey,
      lower(p_name) AS name_lower,
      upper(p_brand) AS brand_upper,
      trim(p_type) AS type_trim,
      string_split(p_name, ' ')[1] AS first_word,
      substring(p_name, 1, 5) AS name_prefix,
      concat_ws('|', p_brand, p_type) AS brand_type,
      CAST(length(p_name) AS BIGINT) AS name_len,
      regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devowel,
      CASE WHEN p_name LIKE '%part%' THEN 1 ELSE 0 END AS has_part
    FROM part
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3/R7/R13/R19 generalized: the string-function surface."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.trim("p_type").alias("type_trim"),
        F.element_at(F.split(F.col("p_name"), " "), 1).alias("first_word"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "_").alias("name_devowel"),
        F.when(F.col("p_name").like("%part%"), F.lit(1)).otherwise(F.lit(0)).alias("has_part"),
    )


@register(
    "datetime_funcs",
    oracle="""
    SELECT o_orderkey,
      CAST(year(o_orderdate) AS BIGINT) AS o_year,
      CAST(month(o_orderdate) AS BIGINT) AS o_month,
      CAST(day(o_orderdate) AS BIGINT) AS o_day,
      date_trunc('month', o_orderdate) AS month_start,
      CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
      CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95,
      o_orderdate + INTERVAL 30 DAY AS due_date
    FROM orders
    """,
)
def datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R15 generalized: the date/time surface."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("o_year"),
        F.month("o_orderdate").cast("bigint").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("o_day"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.datediff(F.col("o_orderdate"), F.to_timestamp(F.lit("1995-01-01")))
        .cast("bigint")
        .alias("days_since_95"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
    )


@register(
    "json_extract",
    oracle="""
    SELECT event_type,
      COUNT(*) AS n,
      SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
      CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
      CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 generalized: JSON-in-string extraction (events.props)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "haversine_geo",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
        CAST(c_custkey % 180 AS DOUBLE) - 90.0 + 0.5 AS lat,
        CAST(c_custkey % 360 AS DOUBLE) - 180.0 + 0.5 AS lon
      FROM customer
    )
    SELECT c_custkey, lat, lon,
      round(2.0 * 6371.0 * atan2(
        sqrt(pow(sin(radians(39.7392 - lat) / 2), 2)
             + cos(radians(lat)) * cos(radians(39.7392))
             * pow(sin(radians(-104.9903 - lon) / 2), 2)),
        sqrt(1 - (pow(sin(radians(39.7392 - lat) / 2), 2)
             + cos(radians(lat)) * cos(radians(39.7392))
             * pow(sin(radians(-104.9903 - lon) / 2), 2)))), 4) AS dist_km
    FROM pts
    WHERE round(2.0 * 6371.0 * atan2(
        sqrt(pow(sin(radians(39.7392 - lat) / 2), 2)
             + cos(radians(lat)) * cos(radians(39.7392))
             * pow(sin(radians(-104.9903 - lon) / 2), 2)),
        sqrt(1 - (pow(sin(radians(39.7392 - lat) / 2), 2)
             + cos(radians(lat)) * cos(radians(39.7392))
             * pow(sin(radians(-104.9903 - lon) / 2), 2)))), 4) <= 5000.0
    """,
)
def haversine_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2's geo-radius predicate, client-side (SURVEY §2B): haversine over
    derived lat/lon, radius filter. Pure built-in trig, codegen'd."""
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") % 180).cast("double") - 90.0 + 0.5).alias("lat"),
        ((F.col("c_custkey") % 360).cast("double") - 180.0 + 0.5).alias("lon"),
    )
    dist = F.round(
        haversine_km(F.col("lat"), F.col("lon"), F.lit(39.7392), F.lit(-104.9903)), 4
    )
    return pts.withColumn("dist_km", dist).filter(F.col("dist_km") <= 5000.0)


# =========================================================================
# Joins (R22-R24 generalized + [EXT] shapes)
# =========================================================================

@register(
    "dim_enrich_join",
    oracle="""
    SELECT s_suppkey, s_name,
      COALESCE(n_name, 'UNKNOWN') AS nation_name,
      COALESCE(r_name, 'UNKNOWN') AS region_name
    FROM supplier
    LEFT JOIN nation ON n_nationkey = s_nationkey
    LEFT JOIN region ON r_regionkey = n_regionkey
    """,
)
def dim_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R23/R24 generalized: broadcast dim lookup with default fill — the
    includes-join enrichment shape (task.ts:227-233)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), n["n_nationkey"] == s["s_nationkey"], "left")
        .join(F.broadcast(r), r["r_regionkey"] == n["n_regionkey"], "left")
        .select(
            "s_suppkey",
            "s_name",
            F.coalesce("n_name", F.lit("UNKNOWN")).alias("nation_name"),
            F.coalesce("r_name", F.lit("UNKNOWN")).alias("region_name"),
        )
    )


@register(
    "semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    """,
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The includes filter IS a semi-join (task.ts:217-240 semantics)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negation of the includes filter: aircraft NOT in the allow-list."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "asof_join_events",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click'),
         best AS (
           SELECT p.event_id AS pid, c.ts AS asof_ts,
                  c.event_id AS click_id,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts DESC, c.event_id DESC) AS rn
           FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
         )
    SELECT p.event_id, p.user_id, p.ts, b.asof_ts, b.click_id
    FROM p LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.pid = p.event_id
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY §2B): latest click at-or-before each purchase per
    user — R21 recency generalized. Implementation: equi-join on user +
    max_by, no global window sort. Times flow as exact epoch-nanos
    (events.ts is TIMESTAMP(NANOS) — see tables.load_table)."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    out = asof_join(
        purchases,
        clicks,
        left_key="user_id",
        right_key="user_id",
        left_ts="ts",
        right_ts="ts",
        tiebreak="click_id",
        right_vals=["click_id"],
    )
    return out.select("event_id", "user_id", "ts", "asof_ts", "click_id")


@register(
    "range_join_events",
    oracle="""
    SELECT s.event_id AS signup_id, e.event_id AS error_id,
           s.ts AS signup_ts, e.ts AS error_ts
    FROM events s, events e
    WHERE s.event_type = 'signup' AND e.event_type = 'error'
      AND e.ts >= s.ts - INTERVAL 10 MINUTE
      AND e.ts <= s.ts + INTERVAL 10 MINUTE
    """,
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join (SURVEY §2B): errors within ±10 min of each
    signup. Bucketized into an hour-granularity equi-join — the oracle's
    theta join is O(n·m); this form survives 100 TB."""
    e = load_table(spark, sf_dir, "events")
    signups = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), F.col("ts").alias("signup_ts")
    )
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("ts").alias("error_ts")
    )
    joined = bucketed_range_join(
        signups, errors, "signup_ts", "error_ts", "10 MINUTE", "10 MINUTE", "hour"
    )
    return joined.select("signup_id", "error_id", "signup_ts", "error_ts")


# =========================================================================
# Dedup / argmax (R21/R25 as relational ops)
# =========================================================================

@register(
    "last_wins_events",
    oracle="""
    SELECT user_id, event_id AS last_event_id, event_type AS last_type,
           ts AS last_ts, value AS last_value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def last_wins_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R21 (Map-upsert last-write-wins) over the events stream: latest event
    per user. max_by aggregation — one shuffle, no window sort."""
    e = load_table(spark, sf_dir, "events")
    picked = e.groupBy("user_id").agg(
        F.max_by(
            F.struct("event_id", "event_type", "ts", "value"),
            F.struct("ts", "event_id"),
        ).alias("r")
    )
    return picked.select(
        "user_id",
        F.col("r.event_id").alias("last_event_id"),
        F.col("r.event_type").alias("last_type"),
        F.col("r.ts").alias("last_ts"),
        F.col("r.value").alias("last_value"),
    )


@register(
    "first_wins_events",
    oracle="""
    SELECT user_id, event_id AS first_event_id, event_type AS first_type,
           ts AS first_ts
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts ASC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def first_wins_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R25 (output Set-guard first-wins) over events: first event per user."""
    e = load_table(spark, sf_dir, "events")
    picked = e.groupBy("user_id").agg(
        F.min_by(
            F.struct("event_id", "event_type", "ts"), F.struct("ts", "event_id")
        ).alias("r")
    )
    return picked.select(
        "user_id",
        F.col("r.event_id").alias("first_event_id"),
        F.col("r.event_type").alias("first_type"),
        F.col("r.ts").alias("first_ts"),
    )


# =========================================================================
# Windows / sorts / set ops
# =========================================================================

@register(
    "window_running",
    oracle="""
    SELECT user_id, event_id,
      CAST(row_number() OVER w AS BIGINT) AS rn,
      lag(value) OVER w AS prev_value,
      lead(value) OVER w AS next_value,
      round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS run_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead + running sum with explicit frame (SURVEY §2B windows).
    Both engines accumulate the running sum in the same total order, so the
    doubles agree bit-for-bit; rounded to 6 dp regardless."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "user_id",
        "event_id",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.round(F.sum("value").over(frame), 6).alias("run_sum"),
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM (
      SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def topk_per_group_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per priority class (window rank + filter)."""
    o = load_table(spark, sf_dir, "orders")
    out = topk_per_group(
        o, ["o_orderpriority"], F.struct("o_totalprice", "o_orderkey"), k=3, desc=True
    )
    return out.select("o_orderpriority", "o_orderkey", "o_totalprice")


@register(
    "order_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global total-order top-k (Spark: TakeOrderedAndProject — no full
    sort, each partition keeps k candidates)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


@register(
    "set_ops",
    oracle="""
    SELECT 'both' AS tag, c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    )
    UNION ALL
    SELECT 'building_only' AS tag, c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    )
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL in one result (SURVEY §2B set ops)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    both = building.intersect(big).select(F.lit("both").alias("tag"), "c_custkey")
    only = building.exceptAll(big.distinct()).distinct().select(
        F.lit("building_only").alias("tag"), "c_custkey"
    )
    return both.unionByName(only)
