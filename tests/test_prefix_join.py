"""Prefix-filtered exact Jaccard join (operators.dedup.jaccard_prefix_pairs):
losslessness vs the naive exact join (the SSJoin/PPJoin prefix principle),
crafted-fixture semantics, and the integer threshold gate. The registry row
`jaccard_prefix_pairs` grades the same losslessness against the naive
DuckDB oracle at sf0.01/0.1."""

from __future__ import annotations

import pytest

from etl_adsbx_spark.operators.dedup import jaccard_prefix_pairs, ngram_jaccard_pairs

from .conftest import SF_SMALL


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prefix_join_matches_naive_on_corpus(spark):
    """Every (pair, jaccard) the naive exact join finds at t=0.5 on the
    sf0.001 corpus, the prefix-filtered join finds too — and nothing else
    (the losslessness property the oracle also grades)."""
    from etl_adsbx_spark.tables import load_table

    d = load_table(spark, SF_SMALL, "documents")
    naive = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in ngram_jaccard_pairs(d, "doc_id", "text", 3, threshold=0.5).collect()
    }
    pref = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in jaccard_prefix_pairs(d, "doc_id", "text", 3, 1, 2).collect()
    }
    assert pref == naive and len(pref) > 0


def test_prefix_join_crafted_pairs(spark):
    """Hand-built shingle overlap: docs 1/2 share 4 of 6 3-grams
    (J = 4/8 = 0.5 — ON the boundary, kept by >=); doc 3 shares one
    shingle with doc 1 (J = 1/9, dropped)."""
    d = _docs(
        spark,
        [
            (1, "a b c d e f"),        # shingles: abc bcd cde def  (4)
            (2, "a b c d e g"),        # abc bcd cde deg            (4, 3 common)
            (3, "a b c x y z"),        # abc bcx cxy xyz            (4, 1 common)
        ],
    )
    got = {(r["a_id"], r["b_id"]): r["jaccard"]
           for r in jaccard_prefix_pairs(d, "doc_id", "text", 3, 1, 2).collect()}
    # docs 1,2: common = {abc,bcd,cde} = 3, union = 5 -> 0.6 >= 0.5 kept
    assert got == {(1, 2): 0.6}


def test_prefix_join_boundary_pair_kept_by_integer_gate(spark):
    """A pair at exactly J = 1/2 survives: the integer cross-multiply
    cannot lose it to a float ulp."""
    # 4 shingles each, 2 common, union 6 -> J = 1/3 (dropped at 1/2);
    # build instead 6+6 with 4 common -> J = 4/8 = 1/2 exactly.
    d = _docs(
        spark,
        [
            (1, "p q r s t u v w"),    # pqr qrs rst stu tuv uvw (6)
            (2, "p q r s t u x y"),    # pqr qrs rst stu tux uxy (6, 4 common)
        ],
    )
    got = jaccard_prefix_pairs(d, "doc_id", "text", 3, 1, 2).collect()
    assert [(r["a_id"], r["b_id"], r["jaccard"]) for r in got] == [(1, 2, 0.5)]


def test_prefix_join_rejects_bad_threshold(spark):
    d = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        jaccard_prefix_pairs(d, threshold_num=0, threshold_den=2)
    with pytest.raises(ValueError):
        jaccard_prefix_pairs(d, threshold_num=3, threshold_den=2)


def test_containment_join_directed_semantics(spark):
    """The asymmetric variant: a snippet fully inside a page scores
    C(snippet→page)=1.0 while the reverse direction is gated out, and
    Jaccard would have missed the pair entirely at any usable threshold."""
    from etl_adsbx_spark.operators.dedup import containment_prefix_pairs

    page = " ".join(f"w{i}" for i in range(60))          # 58 shingles
    snippet = " ".join(f"w{i}" for i in range(10, 16))   # 4 shingles, all in page
    other = " ".join(f"x{i}" for i in range(30))
    d = spark.createDataFrame(
        [(1, page), (2, snippet), (3, other)], "doc_id bigint, text string"
    )
    got = {
        (r["a_id"], r["b_id"]): r["containment"]
        for r in containment_prefix_pairs(d, threshold_num=4, threshold_den=5).collect()
    }
    assert got == {(2, 1): 1.0}  # directed: only snippet→page
    # Jaccard on the same pair: 4/58 — invisible to the symmetric join
    j = jaccard_prefix_pairs(d, threshold_num=1, threshold_den=2).collect()
    assert not j


def test_containment_matches_naive_on_corpus(spark):
    """Losslessness of the asymmetric prefix screen: identical pair set
    and values vs a brute-force all-pairs intersection on real corpus
    text (the oracle replays the same check in DuckDB at grading SFs)."""
    from pyspark.sql import functions as F

    from etl_adsbx_spark.operators.dedup import (
        containment_prefix_pairs,
        word_shingles,
    )
    from etl_adsbx_spark.tables import load_table

    d = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    fast = {
        (r["a_id"], r["b_id"]): r["containment"]
        for r in containment_prefix_pairs(d, threshold_num=4, threshold_den=5).collect()
    }
    sh = d.select(
        F.col("doc_id").alias("_id"),
        F.explode(F.array_distinct(word_shingles("text", 3))).alias("shingle"),
    )
    sizes = sh.groupBy("_id").count()
    naive = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .where(F.col("a._id") != F.col("b._id"))
        .groupBy(F.col("a._id").alias("a_id"), F.col("b._id").alias("b_id"))
        .agg(F.count("*").alias("n_common"))
        .join(sizes.select(F.col("_id").alias("a_id"), F.col("count").alias("a_n")), "a_id")
        .where(F.col("n_common") * 5 >= 4 * F.col("a_n"))
        .select("a_id", "b_id", F.round(F.col("n_common") / F.col("a_n"), 6).alias("c"))
    )
    slow = {(r["a_id"], r["b_id"]): r["c"] for r in naive.collect()}
    assert fast == slow and fast, f"{len(fast)} vs {len(slow)}"
