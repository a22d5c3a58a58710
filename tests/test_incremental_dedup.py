"""Incremental (batch-vs-corpus) dedup: the per-tick admission form of the
corpus dedup family. Invariants pinned here; the exact path is also
driver-oracle-checked via the `exact_dedup_docs` tagged union."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_adsbx_spark.operators.dedup import (
    band_signatures,
    exact_dedup,
    incremental_exact_dedup,
    incremental_minhash_dedup,
    minhash_lsh_pairs,
)
from etl_adsbx_spark.tables import load_table

from .conftest import SF_SMALL


def _docs(spark):
    return load_table(spark, SF_SMALL, "documents")


def _split(d):
    return (
        d.filter(F.col("doc_id") % 10 == 0),
        d.filter(F.col("doc_id") % 10 != 0),
    )


def test_incremental_exact_no_corpus_overlap_and_batch_unique(spark):
    batch, corpus = _split(_docs(spark))
    admitted = incremental_exact_dedup(batch, corpus)
    assert admitted.count() > 0
    # no admitted hash exists in the corpus
    corpus_sha = exact_dedup(corpus).select("text_sha")
    assert admitted.join(corpus_sha, "text_sha", "left_semi").count() == 0
    # admitted hashes are unique within the batch result
    n = admitted.count()
    assert admitted.select("text_sha").distinct().count() == n


def test_incremental_exact_union_covers_all_text(spark):
    """corpus keeps ∪ admitted batch docs must cover every distinct text of
    corpus ∪ batch — incremental admission loses no content."""
    d = _docs(spark)
    batch, corpus = _split(d)
    admitted = incremental_exact_dedup(batch, corpus)
    covered = (
        exact_dedup(corpus)
        .select("text_sha")
        .union(admitted.select("text_sha"))
        .distinct()
        .count()
    )
    assert covered == exact_dedup(d).count()


def test_incremental_exact_first_seen_wins(spark):
    """A batch doc duplicating corpus text is dropped even when its id is
    LOWER than the corpus copy's — the corpus copy already shipped."""
    corpus = spark.createDataFrame([(100, "alpha beta"), (101, "unique text")],
                                   ["doc_id", "text"])
    batch = spark.createDataFrame([(1, "alpha  BETA"), (2, "brand new")],
                                  ["doc_id", "text"])
    got = sorted(r.doc_id for r in incremental_exact_dedup(batch, corpus).collect())
    assert got == [2]


def test_incremental_exact_accepts_prebuilt_hash_index(spark):
    """Passing a corpus that already carries text_sha (the maintained index
    table) must behave identically to hashing the raw corpus."""
    batch, corpus = _split(_docs(spark))
    index = corpus.select(
        F.sha2(
            F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), 256
        ).alias("text_sha")
    )
    a = set(r.doc_id for r in incremental_exact_dedup(batch, corpus).collect())
    b = set(r.doc_id for r in incremental_exact_dedup(batch, index).collect())
    assert a == b


def test_incremental_minhash_no_band_collision_with_corpus(spark):
    batch, corpus = _split(_docs(spark))
    admitted = incremental_minhash_dedup(batch, corpus)
    n = admitted.count()
    assert 0 < n <= batch.count()
    asig = band_signatures(admitted)
    csig = band_signatures(corpus).select("band", "bucket").distinct()
    assert asig.join(csig, ["band", "bucket"], "left_semi").count() == 0


def test_incremental_minhash_intra_batch_canonical(spark):
    """Within the admitted set no candidate pair survives, and each dropped
    survivor's component canonical (min id) is admitted."""
    batch, corpus = _split(_docs(spark))
    admitted = incremental_minhash_dedup(batch, corpus)
    assert minhash_lsh_pairs(admitted).count() == 0


def test_incremental_minhash_crafted(spark):
    """Crafted corpus/batch: exact near-dup of a corpus doc is rejected,
    the intra-batch near-dup pair keeps only the lower id, the novel doc
    is admitted."""
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest tonight")
    intra = ("completely different content about spark engines processing "
             "huge corpora with deterministic hashing everywhere always")
    corpus = spark.createDataFrame([(50, base)], ["doc_id", "text"])
    batch = spark.createDataFrame(
        [
            (1, base),                      # dup of corpus -> rejected
            (2, intra),                     # canonical of intra pair -> admitted
            (3, intra + " extra"),          # near-dup of 2 -> dropped
            (4, "totally novel words that share no shingles with anything "
                "else in this test corpus of documents"),
        ],
        ["doc_id", "text"],
    )
    got = sorted(r.doc_id for r in incremental_minhash_dedup(batch, corpus).collect())
    assert 1 not in got
    assert 2 in got and 4 in got
    assert 3 not in got


def test_strip_boilerplate_lines(spark):
    from etl_adsbx_spark.operators.dedup import strip_boilerplate_lines

    docs = spark.createDataFrame(
        [
            (1, "unique opening line\nAccept all cookies\nreal content one"),
            (2, "Accept ALL Cookies  \nreal content two\ncopyright footer"),
            (3, "accept all cookies\nCOPYRIGHT FOOTER\nreal content three"),
            (4, "totally clean document\nwith two lines"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in strip_boilerplate_lines(docs, min_doc_frac=0.5).collect()}
    # cookie banner in 3/4 docs, footer in 2/4 (>= ceil(0.5*4)=2): both removed
    assert out[1].text == "unique opening line\nreal content one"
    assert out[1].n_lines_removed == 1
    assert out[2].text == "real content two"
    assert out[2].n_lines_removed == 2
    assert out[3].text == "real content three"
    assert out[4].text == "totally clean document\nwith two lines"
    assert out[4].n_lines_removed == 0


def test_strip_boilerplate_lines_preserves_order_and_empties(spark):
    from etl_adsbx_spark.operators.dedup import strip_boilerplate_lines

    docs = spark.createDataFrame(
        [
            (1, "z last\na first\nz last\nm middle"),
            (2, "z last\nboiler\nother"),
            (3, "boiler\nthird doc"),
            (4, "boiler"),  # reduced to nothing
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in strip_boilerplate_lines(docs, min_docs=2, min_doc_frac=0.0).collect()}
    # 'z last' appears twice in doc 1 but only 2 DISTINCT docs carry it
    assert out[1].text == "a first\nm middle"  # both z-last copies removed
    assert out[4].text == "" and out[4].n_lines_removed == 1


def test_incremental_minhash_accepts_prebuilt_band_index(spark):
    """Passing the corpus's (band, bucket) signature index directly — the
    maintained-index production path — must admit the same set as
    signaturing the raw corpus."""
    batch, corpus = _split(_docs(spark))
    index = band_signatures(corpus).select("band", "bucket")
    a = {r.doc_id for r in incremental_minhash_dedup(batch, corpus).collect()}
    b = {r.doc_id for r in incremental_minhash_dedup(batch, index).collect()}
    assert a == b


def test_bloom_index_no_false_negatives_and_bounded_fp(spark):
    """Every indexed key must probe True; absent keys probe True at no
    more than a loose multiple of the sized FP rate."""
    from etl_adsbx_spark.operators.dedup import bloom_index, bloom_maybe_contains

    keys = spark.range(0, 2000).select(
        F.sha2(F.col("id").cast("string"), 256).alias("text_sha")
    )
    bloom = bloom_index(keys, num_bits=1 << 16, num_hashes=5)
    nb, nh = bloom.select("num_bits", "num_hashes").first()
    assert (nb, nh) == (1 << 16, 5)
    probe = lambda df: df.crossJoin(F.broadcast(bloom.select("words"))).withColumn(  # noqa: E731
        "_maybe", bloom_maybe_contains(F.col("text_sha"), F.col("words"), nb, nh)
    )
    present = probe(keys)
    assert present.filter(~F.col("_maybe")).count() == 0, "false negative"
    absent = probe(
        spark.range(2000, 12000).select(
            F.sha2(F.col("id").cast("string"), 256).alias("text_sha")
        )
    )
    fp = absent.filter(F.col("_maybe")).count() / 10000
    # sized rate ~ (1 - e^(-5*2000/65536))^5 ~ 5e-5; allow wide slack
    assert fp < 0.01, f"false-positive rate {fp} out of bounds"


def test_incremental_exact_bloom_path_frame_identical(spark):
    """The bloom= fast path must admit exactly the rows the plain
    anti-join path admits (the filter only skips work, never decides)."""
    from etl_adsbx_spark.operators.dedup import bloom_index

    batch, corpus = _split(_docs(spark))
    bloom = bloom_index(
        exact_dedup(corpus).select("text_sha"), num_bits=1 << 18, num_hashes=5
    ).localCheckpoint()
    plain = incremental_exact_dedup(batch, corpus)
    fast = incremental_exact_dedup(batch, corpus, bloom=bloom)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, fast.collect()))


def test_incremental_exact_bloom_admits_map_side_when_definitely_new(spark):
    """A batch disjoint from the corpus (and below the FP odds) must admit
    every doc, and a batch of pure corpus copies must admit none."""
    from etl_adsbx_spark.operators.dedup import bloom_index

    _, corpus = _split(_docs(spark))
    bloom = bloom_index(
        exact_dedup(corpus).select("text_sha"), num_bits=1 << 18, num_hashes=5
    ).localCheckpoint()
    dup_batch = corpus.limit(20)
    assert incremental_exact_dedup(dup_batch, corpus, bloom=bloom).count() == 0
    new_batch = spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("definitely new text "), F.col("id")).alias("text"),
    )
    assert incremental_exact_dedup(new_batch, corpus, bloom=bloom).count() == 50


def test_bloom_word_table_probe_matches_map_form(spark):
    """The distributed (word, bits) form and the one-row map form are the
    same bitmap: identical maybe-verdicts on present and absent keys, and
    identical admission results through incremental_exact_dedup."""
    from etl_adsbx_spark.operators.dedup import (
        bloom_index,
        bloom_maybe_contains,
        bloom_probe,
        bloom_word_table,
    )

    keys = spark.range(0, 1500).select(
        F.sha2(F.col("id").cast("string"), 256).alias("text_sha")
    )
    probe_keys = spark.range(1000, 4000).select(
        F.sha2(F.col("id").cast("string"), 256).alias("text_sha")
    )
    kw = dict(num_bits=1 << 16, num_hashes=5)
    words = bloom_word_table(keys, **kw).localCheckpoint()
    bmap = bloom_index(keys, **kw).localCheckpoint()
    via_table = {
        r.text_sha: r._maybe for r in bloom_probe(probe_keys, words).collect()
    }
    nb, nh = bmap.select("num_bits", "num_hashes").first()
    via_map = {
        r.text_sha: r._maybe
        for r in probe_keys.crossJoin(F.broadcast(bmap.select("words")))
        .withColumn(
            "_maybe", bloom_maybe_contains(F.col("text_sha"), F.col("words"), nb, nh)
        )
        .collect()
    }
    assert via_table == via_map
    assert sum(via_table.values()) >= 500  # the 500 present keys all probe True

    batch, corpus = _split(_docs(spark))
    cw = bloom_word_table(
        exact_dedup(corpus).select("text_sha"), num_bits=1 << 18
    ).localCheckpoint()
    plain = incremental_exact_dedup(batch, corpus)
    fast = incremental_exact_dedup(batch, corpus, bloom=cw)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, fast.collect()))


def test_bloom_merge_equals_build_of_union(spark):
    """merge(build(A), build(B)) must be bit-identical to build(A ∪ B),
    and sizing mismatches must raise."""
    import pytest as _pytest

    from etl_adsbx_spark.operators.dedup import bloom_merge, bloom_word_table

    def keys(lo, hi):
        return spark.range(lo, hi).select(
            F.sha2(F.col("id").cast("string"), 256).alias("text_sha")
        )

    kw = dict(num_bits=1 << 16, num_hashes=5)
    merged = bloom_merge(
        bloom_word_table(keys(0, 800), **kw), bloom_word_table(keys(500, 1300), **kw)
    )
    direct = bloom_word_table(keys(0, 1300), **kw)
    as_map = lambda df: {  # noqa: E731
        r._word: r._bits for r in df.select("_word", "_bits").collect()
    }
    assert as_map(merged) == as_map(direct)
    with _pytest.raises(ValueError):
        bloom_merge(
            bloom_word_table(keys(0, 10), **kw),
            bloom_word_table(keys(0, 10), num_bits=1 << 15, num_hashes=5),
        )
