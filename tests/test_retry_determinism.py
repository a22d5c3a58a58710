"""Task-retry fault injection: results must be identical when tasks fail
and re-execute.

On a 1000-executor cluster task retries are routine (spot preemption, OOM
kills, fetch failures), and any operator whose output depends on first-
attempt state — nondeterministic ids feeding self-joins, rand() salts,
round-robin placement picked up by keyed ties — silently corrupts exactly
and only under retry, the hardest bug class to see locally. This test runs
a pipeline in a subprocess Spark (`local[4,2]` — 2 task attempts, the knob
the shared test session cannot enable) with a mapInPandas stage that
CRASHES the first attempt of one partition in every job, and asserts
byte-identical results vs the fault-free run for the retry-sensitive
operators (keyed dedup, global prefix sum, MinHash-LSH pairs, SemDeDup
semantic dedup — whose k-means fit runs several jobs per call, each of
which sees its own injected crash — ExactSubstr substring dedup,
whose canonical-occurrence rank rides a digest shuffle, the checkpointed
PageRank loop, and PQ encoding off a lowid orderBy-limit codebook).
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

SCRIPT = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession
    from pyspark import TaskContext

    spark = (
        SparkSession.builder.master("local[4,2]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def flaky(batches):
        tc = TaskContext.get()
        if tc.partitionId() == 1 and tc.attemptNumber() == 0:
            raise RuntimeError("injected first-attempt failure")
        yield from batches

    def run(df):
        from etl_adsbx_spark.operators.agg import global_running_sum
        from etl_adsbx_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
        from pyspark.sql import functions as F

        dedup = sorted(
            (r.text_sha, r.doc_id) for r in exact_dedup(df).select("text_sha", "doc_id").collect()
        )
        cum = global_running_sum(
            df.select("doc_id", F.length("text").cast("bigint").alias("n")),
            ["doc_id"], "n", out_col="cum",
        )
        prefix = sorted((r.doc_id, r.cum) for r in cum.collect())
        pairs = sorted(
            (r.a_id, r.b_id) for r in minhash_lsh_pairs(df).collect()
        )
        return dedup, prefix, pairs

    def run_sem(edf):
        from etl_adsbx_spark.operators.similarity import semantic_dedup

        return sorted(
            (r.vec_id, r.cluster_id, r.keep)
            for r in semantic_dedup(edf, eps=0.05, n_clusters=4).collect()
        )

    def run_cc(pairs_df, nodes_df):
        # iterative fixpoints under retry: every round is its own job, so
        # the injected crash fires once per round for BOTH variants
        from etl_adsbx_spark.operators.dedup import connected_components

        return tuple(
            sorted(
                (r.doc_id, r.cluster_id)
                for r in connected_components(
                    pairs_df, nodes_df, id_col="doc_id", algorithm=algo
                ).collect()
            )
            for algo in ("propagation", "star")
        )

    def run_samp(df):
        from etl_adsbx_spark.operators.sampling import weighted_k_sample

        return sorted(
            r.doc_id
            for r in weighted_k_sample(df, 20, "doc_id", "n_chars", ["lang"]).collect()
        )

    def run_rank(edges_df):
        # 5 checkpointed power-iteration steps: each step is its own job
        # (plus the checkpoint materialization), so the injected crash
        # fires repeatedly; the rank vector must not move
        from etl_adsbx_spark.operators.graph import pagerank, symmetrize_edges

        return sorted(
            (r.node, str(r.pagerank))
            for r in pagerank(symmetrize_edges(edges_df, "a_id", "b_id")).collect()
        )

    def run_pq(edf):
        # PQ codes ride a broadcast codebook whose lowid seeds come from
        # an orderBy().limit() — a retried scan must reproduce them
        from etl_adsbx_spark.functions.vector import as_double
        from etl_adsbx_spark.operators.similarity import pq_codebook, pq_encode
        from pyspark.sql import functions as F

        base = edf.select(
            F.col("vec_id").alias("_bid"), as_double("embedding").alias("_v")
        )
        cb = pq_codebook(base)
        return sorted(
            (r.vec_id, tuple(r.codes)) for r in pq_encode(edf, cb).collect()
        )

    def run_substr(df):
        # shingle-rank canonicalization + per-doc cummax spans: the
        # canonical pick is a row_number over (doc_id, pos) — content-
        # ordered, so a retried shingle shuffle must not move it
        from etl_adsbx_spark.operators.dedup import exact_substring_dedup

        return sorted(
            (r.doc_id, r.n_words, r.n_removed, r.cleaned_md5)
            for r in exact_substring_dedup(df, k=8).collect()
        )

    # chain diameter 12 -> propagation needs ~12 rounds (within max_iter=20
    # plus the confirming round); star collapses it in O(log n)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)] + [(500 + i, 500 + (i + 1) % 10) for i in range(10)],
        "a_id long, b_id long",
    )
    cnodes = spark.createDataFrame(
        [(n,) for n in list(range(13)) + list(range(500, 510)) + [900]], "doc_id long"
    )

    clean = run(docs) + (
        run_sem(emb), run_cc(chain, cnodes), run_samp(docs), run_substr(docs),
        run_rank(chain), run_pq(emb),
    )
    injected = run(docs.repartition(4).mapInPandas(flaky, docs.schema)) + (
        run_sem(emb.repartition(4).mapInPandas(flaky, emb.schema)),
        run_cc(
            chain.repartition(4).mapInPandas(flaky, chain.schema),
            cnodes.repartition(4).mapInPandas(flaky, cnodes.schema),
        ),
        run_samp(docs.repartition(4).mapInPandas(flaky, docs.schema)),
        run_substr(docs.repartition(4).mapInPandas(flaky, docs.schema)),
        run_rank(chain.repartition(4).mapInPandas(flaky, chain.schema)),
        run_pq(emb.repartition(4).mapInPandas(flaky, emb.schema)),
    )
    names = ("dedup", "prefix", "pairs", "semantic", "cc", "weighted_sample",
             "substring_dedup", "pagerank", "pq_codes")
    for name, a, b in zip(names, clean, injected):
        assert a == b, f"{name} diverged under task retry"
    print("RETRY_DETERMINISM_OK")
    """
)


def test_results_identical_under_task_retry():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "RETRY_DETERMINISM_OK" in proc.stdout, proc.stdout[-2000:]
