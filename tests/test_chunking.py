"""Document chunking (operators.chunk): Python-reference properties +
DuckDB oracle parity over the driver documents table."""

from __future__ import annotations

import re

import hypothesis.strategies as st
import pytest
from hypothesis import given, settings

from etl_adsbx_spark.operators.chunk import chunk_documents
from etl_adsbx_spark.testing import compare_query

from .conftest import SF_ORACLE


def ref_chunks(text: str, chunk_tokens: int, overlap: int):
    """Pure-Python reference of the chunking contract."""
    toks = [t for t in re.split(r"\s+", text.strip()) if t]
    n = len(toks)
    if n == 0:
        return []
    stride = chunk_tokens - overlap
    starts = range(1, max(n - overlap, 1) + 1, stride)
    return [
        (i, " ".join(toks[s - 1 : s - 1 + chunk_tokens]), min(chunk_tokens, n - s + 1))
        for i, s in enumerate(starts)
    ]


texts = st.lists(
    st.text(alphabet="ab \t\n", min_size=0, max_size=40), min_size=1, max_size=10
)
params = st.sampled_from([(4, 0), (4, 1), (5, 2), (8, 7), (3, 0)])


@settings(max_examples=25, deadline=None)
@given(texts, params)
def test_chunks_match_python_reference(spark, batch, cfg):
    chunk_tokens, overlap = cfg
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_text, r.n_chunk_tokens)
        for r in chunk_documents(df, chunk_tokens, overlap).collect()
    }
    want = {
        (i, idx): (txt, ntok)
        for i, t in enumerate(batch)
        for idx, txt, ntok in ref_chunks(t, chunk_tokens, overlap)
    }
    assert got == want


def test_chunk_invariants_on_documents(spark):
    """Coverage + overlap invariants on real driver data: chunks cover every
    token exactly once modulo the declared overlap, and reassembly with
    overlap=0 reproduces the token stream."""
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(200)
    ct, ov = 16, 4
    rows = chunk_documents(docs, ct, ov).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    originals = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        toks = [t for t in re.split(r"\s+", originals[doc_id].strip()) if t]
        stride = ct - ov
        # stitched = first chunk + the post-overlap tail of each later chunk
        stitched = chunks[0].chunk_text.split(" ")
        for c in chunks[1:]:
            stitched.extend(c.chunk_text.split(" ")[ov:])
        # trailing short chunks re-cover already-seen tokens; dedup the tail
        assert stitched[: len(toks)] == toks
        for c in chunks:
            assert 1 <= c.n_chunk_tokens <= ct
            assert len(c.chunk_text.split(" ")) == c.n_chunk_tokens
        # every chunk except the first starts exactly stride past its predecessor
        for a, b in zip(chunks, chunks[1:]):
            assert b.chunk_idx == a.chunk_idx + 1
    # zero-token docs produce zero chunks
    empty = spark.createDataFrame([(1, " \t\n"), (2, "")], "doc_id long, text string")
    assert chunk_documents(empty, ct, ov).count() == 0


def test_chunking_oracle_parity(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    got = chunk_documents(docs, chunk_tokens=16, overlap=4)
    compare_query(
        got,
        """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks
          FROM documents
        ), s AS (
          SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0
        ), st AS (
          SELECT doc_id, toks, n,
                 unnest(range(1, greatest(n - 4, 1) + 1, 12)) AS start
          FROM s
        )
        SELECT doc_id,
          CAST((start - 1) // 12 AS BIGINT) AS chunk_idx,
          array_to_string(list_slice(toks, start, least(start + 15, n)), ' ') AS chunk_text,
          CAST(least(16, n - start + 1) AS BIGINT) AS n_chunk_tokens
        FROM st
        """,
        SF_ORACLE,
    )


def test_chunking_rejects_bad_overlap(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=-1)


def _cdc_python_reference(tokens, target, mn, mx, hashes):
    """Same boundary fold in Python, using the Spark-computed per-token
    cut flags (hashes) so the reference checks the ALGORITHM, not xxhash."""
    bounds = [0]
    for i in range(1, len(tokens) + 1):
        run = i - bounds[-1]
        if run >= mn and (hashes[i - 1] or run >= mx):
            bounds.append(i)
    if bounds[-1] < len(tokens):
        bounds.append(len(tokens))
    return [
        (j - 1, " ".join(tokens[bounds[j - 1]:bounds[j]]), bounds[j] - bounds[j - 1])
        for j in range(1, len(bounds))
    ]


def test_cdc_chunking_matches_python_reference_and_bounds(spark):
    from pyspark.sql import functions as F

    from etl_adsbx_spark.operators.chunk import chunk_documents_cdc
    from etl_adsbx_spark.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents").limit(200)
    target, mn, mx = 8, 3, 20
    out = chunk_documents_cdc(d, target, mn, mx)
    rows = sorted(
        ((r.doc_id, r.chunk_idx, r.chunk_text, r.n_chunk_tokens) for r in out.collect())
    )
    # per-token cut flags computed with the operator's own hash family
    flags = {
        r.doc_id: (r.toks, r.cuts)
        for r in d.select(
            "doc_id",
            F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != "").alias("toks"),
            F.transform(
                F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != ""),
                lambda t: F.pmod(F.xxhash64(t), F.lit(target)) == 0,
            ).alias("cuts"),
        ).collect()
    }
    want = sorted(
        (doc, idx, text, n)
        for doc, (toks, cuts) in flags.items()
        if toks
        for idx, text, n in _cdc_python_reference(toks, target, mn, mx, cuts)
    )
    assert rows == want
    # coverage: chunks re-concatenate to the token stream; size bounds hold
    # for all but each doc's final chunk
    by_doc = {}
    for doc, idx, text, n in rows:
        by_doc.setdefault(doc, []).append((idx, text, n))
    for doc, chunks in by_doc.items():
        chunks.sort()
        assert " ".join(t for _, t, _ in chunks) == " ".join(flags[doc][0])
        for _, _, n in chunks[:-1]:
            assert mn <= n <= mx
        assert chunks[-1][2] <= mx


def test_cdc_chunking_is_edit_resistant_unlike_fixed_windows(spark):
    """Insert a token at the front of a long document: CDC chunks after
    the first surviving boundary are IDENTICAL; fixed windows shift every
    chunk. This is the property that makes chunk-level dedup across
    re-crawled page versions work."""
    from etl_adsbx_spark.operators.chunk import chunk_documents, chunk_documents_cdc

    base = " ".join(f"tok{i % 97}x{i % 13}" for i in range(400))
    docs = spark.createDataFrame(
        [(1, base), (2, "INSERTED " + base)], "doc_id long, text string"
    )
    cdc = chunk_documents_cdc(docs, 8, 3, 20)
    texts = {
        did: {r.chunk_text for r in cdc.filter(cdc.doc_id == did).collect()}
        for did in (1, 2)
    }
    shared_cdc = len(texts[1] & texts[2]) / len(texts[1])
    assert shared_cdc > 0.9, f"CDC shared fraction {shared_cdc}"
    fixed = chunk_documents(docs, 8, 0)
    ftexts = {
        did: {r.chunk_text for r in fixed.filter(fixed.doc_id == did).collect()}
        for did in (1, 2)
    }
    shared_fixed = len(ftexts[1] & ftexts[2]) / len(ftexts[1])
    assert shared_fixed < shared_cdc, (shared_fixed, shared_cdc)


def test_pack_bins_whole_doc_packing(spark):
    """Every doc lands in exactly one bin; no non-oversize bin exceeds the
    budget; oversize docs are isolated and flagged; assignment is
    deterministic under repartitioning; fill efficiency beats a naive
    one-doc-per-bin baseline by a wide margin."""
    from pyspark.sql import functions as F

    from etl_adsbx_spark.functions import text as T
    from etl_adsbx_spark.operators.agg import pack_bins
    from etl_adsbx_spark.tables import load_table

    budget = 256
    d = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", T.token_count("text").cast("bigint").alias("n_tokens"))
    )
    out = pack_bins(d, budget, n_groups=8)
    rows = [(r.doc_id, r.n_tokens, r.bin_id, r.bin_fill, r.oversize) for r in out.collect()]
    assert len(rows) == d.count()
    assert len({doc for doc, *_ in rows}) == len(rows)
    fills = {}
    for doc, n, b, fill, over in rows:
        fills.setdefault(b, [0, False])
        fills[b][0] += n
        fills[b][1] |= over
    for b, (total, has_over) in fills.items():
        if has_over:
            assert len([1 for _, _, bb, _, _ in rows if bb == b]) == 1, "oversize not isolated"
        else:
            assert total <= budget, (b, total)
    # reported bin_fill matches the recomputed totals
    for doc, n, b, fill, over in rows:
        assert fill == fills[b][0]
    # determinism
    again = {
        (r.doc_id, r.bin_id)
        for r in pack_bins(d.repartition(7), budget, n_groups=8).collect()
    }
    assert again == {(doc, b) for doc, _, b, _, _ in rows}
    # efficiency: bins used ≲ 1.5x the fractional lower bound (FFD sharded
    # over 8 groups on ~500 docs); naive packing would use n_docs bins
    n_bins = len(fills)
    frac_lb = sum(n for _, n, _, _, _ in rows) / budget
    assert n_bins <= 1.5 * frac_lb + 8, (n_bins, frac_lb)
    assert n_bins < len(rows) / 2


def test_cdc_portable_hash_matches_python_reference(spark):
    """portable_hash=True (the oracle-graded config) runs the identical
    boundary fold over the md5-based 32-bit token hash; the reference
    replay uses md5 flags, so this pins the portable config end to end
    (the DuckDB recursive-CTE oracle replays the same hash at sf0.01)."""
    from pyspark.sql import functions as F

    from etl_adsbx_spark.operators.chunk import chunk_documents_cdc
    from etl_adsbx_spark.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents").limit(200)
    target, mn, mx = 8, 3, 20
    out = chunk_documents_cdc(d, target, mn, mx, portable_hash=True)
    rows = sorted(
        ((r.doc_id, r.chunk_idx, r.chunk_text, r.n_chunk_tokens) for r in out.collect())
    )
    toks_col = F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != "")
    md5_cut = lambda t: (  # noqa: E731
        F.pmod(
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint"),
            F.lit(target),
        )
        == 0
    )
    flags = {
        r.doc_id: (r.toks, r.cuts)
        for r in d.select(
            "doc_id",
            toks_col.alias("toks"),
            F.transform(toks_col, md5_cut).alias("cuts"),
        ).collect()
    }
    want = sorted(
        (doc, idx, text, n)
        for doc, (toks, cuts) in flags.items()
        if toks
        for idx, text, n in _cdc_python_reference(toks, target, mn, mx, cuts)
    )
    assert rows == want
    # different hash family ⇒ different boundaries than xxhash64, same
    # statistics contract (bounds hold; full coverage checked above via
    # the reference equality)
    xx = {
        (r.doc_id, r.chunk_idx, r.chunk_text)
        for r in chunk_documents_cdc(d, target, mn, mx).collect()
    }
    assert {(a, b, c) for a, b, c, _ in rows} != xx
