#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:  {"metric": ..., "value": total_sec, "unit": "sec",
"queries_cs": {name: median centiseconds}, "sf": ...} — centiseconds keep
every per-query median inside the driver's ~2000-char stdout capture; the
3-dp seconds table (medians + [min, median, max] spreads) is written to
BENCH_DETAIL.json alongside.

JVM spin-up and codegen dominate first runs, so we do one warm-up pass at
the smallest SF, then time each headline query N_RUNS times (default 3) and
report the per-query MEDIAN — single-run timings at this scale have ±25%
jitter that can't be told apart from a real regression. The flagship
pipeline is included: it is the reference workload.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_adsbx_spark import queries as registry  # noqa: E402
from etl_adsbx_spark.planprobe import release_pins  # noqa: E402
from etl_adsbx_spark.plans.flagship import flagship  # noqa: E402
from etl_adsbx_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "rollup_agg",
    "window_running",
    "first_last_events",
    "asof_join_events",
    "range_join_events",
    "topk_per_group",
    "haversine_geo",
    "q13_customer_distribution",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q10_returned_revenue",
    "q14_promo_share",
    "q22_dormant_customers",
    "time_windows",
]
# [EXT] queries register later in the round; include any that exist
OPTIONAL = [
    "exact_dedup_docs",
    "minhash_pairs",
    "ngram_jaccard_pairs",
    "simhash_docs",
    "embedding_neardup",
    "ann_topk",
    "decontaminate",
    "pack_sequences",
    "text_stats",
    "tfidf_top_terms",
    "cube_grouping_sets",
    "pivot_unpivot",
    "media_kernels",
    "dedup_clusters",
    "semantic_dedup",
    "sample_select_ops",
    "unigram_lm_score",
    "boilerplate_strip",
    # r5 cont.: TPC-H completion heavies (the fact-fact joins and the
    # decorrelated EXISTS/NOT-EXISTS pipeline) + sub-document dedup
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q9_product_profit",
    "q21_blocking_supplier",
    "substring_dedup",
    "window_analytics",
    "resample_timeseries",
    "interval_overlap",
    # r5 cont. 2: fuzzy join / retrieval / domain analytics / robust gate
    "fuzzy_name_pairs",
    "bm25_topk",
    "url_domain_stats",
    "mad_outlier_gate",
    # r6: event analytics (sessionize/funnel/retention/SCD2) + the two
    # newly driver-graded gates (exact-percentile config, CDC chunking)
    "sessionization_report",
    "funnel_steps",
    "retention_cohorts",
    "scd2_history",
    "quantile_filter",
    "chunk_documents_cdc",
    "scd2_point_in_time",
    "event_paths_topk",
    # r6 cont.: DSIR importance weighting (map-side fit/score), link-graph
    # PageRank, column profiler
    "dsir_weights",
    "domain_pagerank",
    "column_profile",
    # r6 cont. 2: temperature mixing, graded k-means, KN bigram LM
    "mixture_weights",
    "kmeans_clusters",
    "bigram_lm_score",
    "corpus_diff_content",
    "pq_ann_topk",
    "curation_pipeline",
    "geo_radius_join",
    # r7: hybrid lexical⊕vector retrieval, multiset set ops, quality-keep
    "hybrid_rrf_topk",
    "set_ops_all",
    "cluster_keep_best",
    "line_dedup_global",
    "tfidf_cosine_pairs",
    # r8: fitted language ID, HTML→text extraction, unicode normalize,
    # cross-split leakage audit, exact-decimal correlation matrix,
    # URL canonicalization dedup
    "lang_id_model",
    "html_extract",
    "text_normalize",
    "split_leakage_audit",
    "corr_matrix",
    "url_canonicalize",
    "cluster_split_assign",
    # r8 cont.: triangle/HITS link analytics, decimal EWMA smoothing,
    # readability battery, MMR diversified rerank
    "graph_triangles",
    "domain_hits",
    "ewma_smooth",
    "readability_scores",
    "mmr_rerank",
    "anomaly_events",
    "jaccard_prefix_pairs",
    # r9: WARC serialize→parse roundtrip (codegen framing + Arrow parser);
    # exact-decimal fitted quality classifier (4 GD-step aggs + map score)
    "warc_roundtrip",
    "quality_logreg",
    # r9: robots.txt gate (broadcast robots dim + Arrow evaluator kernel)
    "robots_gate",
    # r10: web-ingest capstone (frame→parse→decode→robots→extract→dedup
    # as one plan — the end-to-end ingest workload) + the asymmetric
    # containment join
    "web_ingest_pipeline",
    "containment_prefix_pairs",
    "crawl_frontier",
    # r11: CDX capture index on SURT keys (codegen transform + the
    # revisit lag window on surt-hash) + sitemap-driven recrawl (xpath
    # discovery joined to the capture index by SURT)
    "cdx_surt_index",
    "sitemap_recrawl",
    "crawl_budget_allocate",
]
# dedup_clusters_star and incremental_minhash_admit are deliberately NOT
# benchmarked: star is the adversarial-graph fallback (measured slower on
# LSH graphs by design — BASELINE.md CC table), and the admission query's
# cost is dominated by re-signaturing the synthetic corpus each run, which
# a production tick never does (it probes the maintained band index).


#: Projection-only queries (no agg/join downstream of the kernel): under
#: plain count() Catalyst PRUNES the measured expression (measured: ewma
#: 4.73s forced vs 0.34s counted at sf10 — BASELINE.md round-8 note), so
#: these are timed through a 1-row sum over the output column instead.
FORCE_COL = {
    "ewma_smooth": "ewma",
    "readability_scores": "flesch_ease",
}


def calibrate(spark, qs, n_runs: int = 3) -> dict:
    """Pinned calibration workload (r10 verdict item 3: cross-round
    anchor comparisons rested on an UNCOMMITTED ad-hoc drift probe).
    Two code- and data-invariant measurements, recorded with every
    bench run:

    - ``cpu_sha256_256mb_s``: sha256 over 256 MiB of fixed bytes — pure
      CPU, no Spark, no I/O; drifts only with the box (clock, steal,
      contention).
    - ``memcpy_gb_s``: single-thread copy bandwidth over a 512 MiB
      buffer — the r11 finding: shuffle/sort-heavy queries are
      memory-bandwidth-bound, and a host whose bandwidth degrades
      inflates THEM ~2× while barely moving scan-shaped queries, so a
      sha-only calibration under-corrects exactly the expensive legs.
    - ``tiny_scan_q1_sf0001_s``: the q1 aggregation at sf0.001 (already
      JIT-warmed by the warm-up pass) — prices the JVM/scan/schedule
      overhead floor.

    Because neither depends on engine code or benchmark data, the ratio
    of two rounds' calibration rows IS the box-drift factor; BASELINE.md
    anchor tables carry a drift-normalized column computed from it."""
    import hashlib

    block = b"\xa5" * 65536
    cpu = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        h = hashlib.sha256()
        for _ in range(4096):  # 4096 * 64 KiB = 256 MiB
            h.update(block)
        h.digest()
        cpu.append(time.perf_counter() - t0)
    buf = bytearray(512 << 20)
    bw = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        _copy = bytes(buf)
        bw.append(time.perf_counter() - t0)
        del _copy
    del buf
    scan = []
    cal_dir = "/root/testdata/sf0.001"
    if os.path.isdir(cal_dir) and "q1_pricing_summary" in qs:
        for _ in range(n_runs):
            t0 = time.perf_counter()
            qs["q1_pricing_summary"](spark, cal_dir).count()
            scan.append(time.perf_counter() - t0)
    return {
        "cpu_sha256_256mb_s": round(statistics.median(cpu), 3),
        "memcpy_gb_s": round(0.5 / statistics.median(bw), 2),
        "tiny_scan_q1_sf0001_s": (
            round(statistics.median(scan), 3) if scan else None
        ),
    }


def run_df(df, force_col: str | None = None) -> int:
    # count() forces full execution without driver-side materialization
    # (except pure projections — see FORCE_COL)
    if force_col is not None:
        from pyspark.sql import functions as F

        df.agg(F.sum(force_col)).collect()
        return 1
    return df.count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("etl-adsbx-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = registry.queries()
    names = [n for n in HEADLINE if n in qs] + [n for n in OPTIONAL if n in qs]

    # Warm-up pass at the smallest SF: JVM spin-up, parquet footer reads,
    # and whole-stage-codegen compilation of each query's expression tree.
    # The timed pass then measures data-proportional execution, not JIT.
    warm_dir = "/root/testdata/sf0.001"
    import os as _os

    if not _os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in names:
        run_df(qs[name](spark, warm_dir), FORCE_COL.get(name))
        release_pins()
    run_df(flagship(spark, warm_dir))
    release_pins()

    raw_runs = os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")
    try:
        n_runs = max(1, int(raw_runs))
    except ValueError:
        sys.exit(f"SPARK_GRAFT_BENCH_RUNS must be an integer, got {raw_runs!r}")

    def timed(fn, force_col: str | None = None) -> tuple[float, list[float]]:
        samples = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            run_df(fn(), force_col)
            samples.append(time.perf_counter() - t0)
            # Drop the finished sample's pinned checkpoint blocks OUTSIDE
            # the timer (r11): each sample constructs and materializes its
            # own pins, so this frees only dead blocks — but left to the
            # ContextCleaner they accumulate for the whole bench, and the
            # resulting heap growth page-faults fresh OS pages mid-run
            # (measured: intermittent 3-10× per-query stalls on this
            # memory-bandwidth-starved host; OPTIMIZATION_r11.md).
            release_pins()
        spread = [round(min(samples), 3), round(statistics.median(samples), 3),
                  round(max(samples), 3)]
        return spread[1], spread

    # calibration brackets the timed pass (box state can change DURING a
    # 90-second run; before/after rows make that visible too)
    cal_before = calibrate(spark, qs)

    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    for name in names:
        timings[name], spreads[name] = timed(
            lambda: qs[name](spark, sf_dir), FORCE_COL.get(name)
        )

    timings["flagship_pipeline"], spreads["flagship_pipeline"] = timed(
        lambda: flagship(spark, sf_dir)
    )

    cal_after = calibrate(spark, qs)
    calibration = {"before": cal_before, "after": cal_after}

    total = round(sum(timings.values()), 3)
    # load-skew self-identification (round-6 verdict #8: a driver-loaded box
    # ran 44% over a clean run on identical code): report each query's
    # [min, median, max] and the worst max/min ratio — a clean run sits near
    # 1; a skewed run is visibly >1.5 without needing a rerun to tell.
    worst = max(
        ((s[2] / s[0] if s[0] > 0 else 1.0), n) for n, s in spreads.items()
    )
    record = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "spreads": spreads,
        "worst_spread_ratio": round(worst[0], 2),
        "worst_spread_query": worst[1],
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "runs_per_query": n_runs,
        "stat": "median",
        "calibration": calibration,
        # the driver re-runs the bench at a lower core count; record which
        # run produced this file (the c8 rerun overwrites it — r12)
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
    }
    # Full per-query table (3-dp medians + [min, median, max] spreads) goes
    # to a repo file; stdout stays inside the driver's capture window.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump({**record, "queries": timings}, fh, indent=1, sort_keys=True)
        fh.write("\n")
    # The driver records only the last ~2000 chars of stdout (BENCH_r07 and
    # r08 both came back "parsed": null because the line outgrew it — first
    # with spread triples, then even with 2-dp spreads at 85 queries). The
    # byte floor is the QUERY NAMES (~1.5 KB at 94 queries). The contract
    # form is {"metric",...,"queries":{name: sec},...} — emit exactly that
    # whenever it fits the capture (r12: PERF_r11 shows the driver could
    # not read per-query names from the r10/r11 degraded lines — restore
    # the contract key as the FIRST choice and only degrade past it when
    # the line would otherwise be head-truncated into unparseable text).
    # Every degrade keeps all per-query medians recoverable: the named
    # table is always in BENCH_DETAIL.json.
    stdout_budget = 1980  # the 2000-char capture minus the newline + margin
    sf_val = record["sf"]
    cal_cs = [
        int(round((c.get(k) or 0) * 100))
        for c in (cal_before, cal_after)
        for k in ("cpu_sha256_256mb_s", "memcpy_gb_s",
                  "tiny_scan_q1_sf0001_s")
    ]

    def _fit(rec: dict) -> str | None:
        line = json.dumps(rec, separators=(",", ":"))
        return line if len(line) <= stdout_budget else None

    # Attempt 0: the full driver contract — named seconds under "queries".
    # 3-dp first (bench resolution), then 2-dp (same 10 ms resolution the
    # centisecond encoding carries).
    line = _fit({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": {n: round(t, 3) for n, t in timings.items()},
        "sf": sf_val,
        "cal_cs": cal_cs,
    }) or _fit({
        "metric": "hq_total",
        "value": total,
        "unit": "sec",
        "queries": {n: round(t, 2) for n, t in timings.items()},
        "sf": sf_val,
        "cal_cs": cal_cs,
    })
    if line is None:
        # Degrade 1: named INTEGER CENTISECONDS (sec = cs/100 — same 10 ms
        # resolution at roughly half the value bytes); names survive.
        line = _fit({
            "value": total,
            "unit": "sec",
            "sf": sf_val,
            "queries_cs": {n: int(round(t * 100)) for n, t in timings.items()},
            "cal_cs": cal_cs,
        })
    if line is None:
        # Degrade 2: values in SORTED-NAME order — recoverable by zipping
        # with sorted(BENCH_DETAIL.json queries) — so the artifact always
        # parses with every median present.
        line = _fit({
            "value": total,
            "unit": "sec",
            "sf": sf_val,
            "queries_cs": [
                int(round(timings[n] * 100)) for n in sorted(timings)
            ],
            "queries_order": "sorted names; table in BENCH_DETAIL.json",
            "cal_cs": cal_cs,
        })
    if line is None:
        # Degrade 3 (terminal): totals only, per-query table lives in the
        # detail file. The envelope MUST parse within the driver's
        # ~2000-char tail capture no matter how large the registry grows.
        line = json.dumps({
            "value": total,
            "unit": "sec",
            "sf": sf_val,
            "queries_n": len(timings),
            "cal_cs": cal_cs,
            "detail": "BENCH_DETAIL.json",
        }, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
