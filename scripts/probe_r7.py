"""Scale probe for the round-7 operators: hybrid RRF retrieval, multiset
set ops, cross-tick incremental sessionization, pretrained GPT-2-format
BPE encode. Measures target-vs-base medians (a 10x decade per
invocation), one JSON line — appended to BASELINE.md.

Usage: python scripts/probe_r7.py [target_dir] [base_dir]
base_dir defaults to /root/testdata/sf0.1 — pass testdata_sf1 when
probing sf10 so each ratio stays a 10x step.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_adsbx_spark import queries as registry  # noqa: E402
from etl_adsbx_spark.functions.bpe import bpe_encode_pretrained  # noqa: E402
from etl_adsbx_spark.session import get_spark  # noqa: E402
from etl_adsbx_spark.streaming.sessionize import IncrementalSessionizer  # noqa: E402
from etl_adsbx_spark.tables import load_table  # noqa: E402

N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))


def _write_fixture_merges(tmpdir: str) -> str:
    """A realistic-size fixture artifact: ~2000 synthetic merges over the
    byte alphabet (we avoid shipping a real vocab; the kernel cost is
    merges-count- and text-length-proportional either way)."""
    from etl_adsbx_spark.functions.bpe import gpt2_bytes_to_unicode

    be = gpt2_bytes_to_unicode()
    alpha = [be[ord(c)] for c in "etaoinshrdlucmfwypvbgkjqxz"]
    sp = be[0x20]
    merges = []
    for a in alpha:
        for b in alpha:
            merges.append((a, b))
    for a in alpha:
        merges.append((sp, a))
    for (a, b) in merges[:600]:
        merges.append((a + b, "e"))
    merges = merges[:2000]
    p = os.path.join(tmpdir, "merges.txt")
    with open(p, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return p


def probes(spark, sf_dir, merges_path):
    qs = registry.queries()

    def hybrid():
        qs["hybrid_rrf_topk"](spark, sf_dir).count()

    def setops_all():
        qs["set_ops_all"](spark, sf_dir).count()

    def inc_sessionize():
        ev = load_table(spark, sf_dir, "events").select(
            "user_id", "ts_ns", "event_id"
        )
        lo, hi = ev.agg(F.min("ts_ns"), F.max("ts_ns")).first()
        c1, c2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
        inc = IncrementalSessionizer()
        n = 0
        for t in (
            ev.where(F.col("ts_ns") <= c1),
            ev.where((F.col("ts_ns") > c1) & (F.col("ts_ns") <= c2)),
            ev.where(F.col("ts_ns") > c2),
        ):
            n += inc.process(t).count()
        inc.state.unpersist()

    def bpe_pretrained():
        docs = load_table(spark, sf_dir, "documents")
        bpe_encode_pretrained(docs, merges_path).agg(
            F.sum("n_bpe_tokens")
        ).collect()

    def keep_best():
        qs["cluster_keep_best"](spark, sf_dir).count()

    def line_dedup():
        qs["line_dedup_global"](spark, sf_dir).count()

    def tfidf_pairs():
        qs["tfidf_cosine_pairs"](spark, sf_dir).count()

    return {
        "hybrid_rrf_topk": hybrid,
        "set_ops_all": setops_all,
        "incremental_sessionize_3tick": inc_sessionize,
        "bpe_encode_pretrained": bpe_pretrained,
        "cluster_keep_best": keep_best,
        "line_dedup_global": line_dedup,
        "tfidf_cosine_pairs": tfidf_pairs,
    }


def main() -> None:
    import tempfile

    target = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf1"
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("etl-adsbx-probe-r7")
    spark.sparkContext.setLogLevel("ERROR")
    td = tempfile.mkdtemp()
    merges_path = _write_fixture_merges(td)

    out = {}
    for which, sf_dir in (("base", base), ("target", target)):
        ps = probes(spark, sf_dir, merges_path)
        for name, fn in ps.items():
            fn()  # warm
            ts = []
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                fn()
                ts.append(time.perf_counter() - t0)
            out.setdefault(name, {})[which] = round(statistics.median(ts), 3)
    for name, d in out.items():
        d["ratio"] = round(d["target"] / d["base"], 2) if d["base"] else None
    print(
        json.dumps(
            {
                "metric": "probe_r7",
                "base": base,
                "target": target,
                "runs": N_RUNS,
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    main()
