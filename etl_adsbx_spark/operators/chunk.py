"""[EXT] Document chunking — fixed token-window slicing with overlap.

The loader-side companion of sequence packing (operators.agg.
global_running_sum): packing lays documents end-to-end and cuts at global
token offsets; chunking cuts WITHIN each document into retrieval/embedding
windows (the RAG / context-window preprocessing step every training and
indexing pipeline runs between cleaning and embedding).

Scale shape: one per-row generator expression (split → sequence of chunk
starts → explode → slice) — no shuffle, no state, no Python. Output size
is input size × ~(n_tokens/stride) rows; the explode happens after any
filters the caller pushes down, and Spark pipelines Generate inside
whole-stage codegen, so at 100 TB this adds zero exchanges to whatever
plan consumes the chunks (typically an embedding mapInPandas or a write).

Token contract: tokens are maximal ``\\s+``-separated runs of the ORIGINAL
(un-lowercased) text; chunk text re-joins tokens with single spaces, so
intra-document whitespace runs are normalized (the same convention as
``functions.text.tokens`` — a chunk boundary can never split a token).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens_raw(col: Column | str) -> Column:
    """Whitespace tokens of the original-case text; empty/blank text → []."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.trim(c), r"\s+"), lambda x: x != ""
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 512,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into ``chunk_tokens``-token windows advancing by
    ``stride = chunk_tokens − overlap``; consecutive chunks share exactly
    ``overlap`` tokens (except a shorter final chunk).

    Start positions are ``1, 1+stride, …`` while ``start ≤ max(n−overlap,
    1)``: this emits every window that contributes at least one token
    beyond the previous window's overlap region and guarantees complete
    coverage (the last window always reaches token ``n``; proof in the
    test: coverage end ≥ (n−overlap) − stride + chunk_tokens = n).
    Documents with no tokens produce ZERO chunks (a blank doc has nothing
    to embed — callers wanting a sentinel row can left-join back on
    ``id_col``).

    Returns one row per chunk: (id_col, chunk_idx, chunk_text,
    n_chunk_tokens), where ``chunk_idx`` is 0-based in token order and
    ``n_chunk_tokens ∈ [1, chunk_tokens]``.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens): got overlap={overlap}, "
            f"chunk_tokens={chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    toks = _tokens_raw(text_col)
    out = (
        df.select(F.col(id_col), toks.alias("_toks"))
        .withColumn("_n", F.size("_toks"))
        .where(F.col("_n") > 0)
        .select(
            id_col,
            "_toks",
            F.posexplode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.col("_n") - F.lit(overlap), F.lit(1)),
                    F.lit(stride),
                )
            ).alias("chunk_idx", "_start"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.concat_ws(
                " ", F.slice(F.col("_toks"), F.col("_start"), chunk_tokens)
            ).alias("chunk_text"),
            F.size(F.slice(F.col("_toks"), F.col("_start"), chunk_tokens))
            .cast("bigint")
            .alias("n_chunk_tokens"),
        )
    )
    return out


def chunk_documents_cdc(
    df: DataFrame,
    target_tokens: int = 32,
    min_tokens: int = 8,
    max_tokens: int = 128,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable_hash: bool = False,
) -> DataFrame:
    """Content-defined chunking: cut after token t whenever
    ``xxhash64(t) % target_tokens == 0`` (subject to [min_tokens,
    max_tokens] bounds) — boundaries are a function of CONTENT, not
    position, so inserting or deleting text early in a document shifts
    only the chunks up to the next surviving cut point; everything after
    realigns byte-for-byte. That is the property fixed windows lack and
    the reason dedup-oriented storage (and chunk-level corpus dedup —
    re-crawled pages with an edited header) chunks this way: unchanged
    tails keep their chunk hashes, so ``exact_dedup`` over chunk_text
    deduplicates them across document versions.

    Mean chunk length ≈ ``target_tokens`` (each eligible token cuts with
    probability 1/target); ``max_tokens`` forces a cut through hashless
    runs, ``min_tokens`` suppresses pathological short chunks (the final
    chunk may still be shorter). Boundary selection is inherently
    sequential WITHIN a document (eligibility depends on the previous
    boundary) — expressed as one ``F.aggregate`` fold over the token
    array, still a pure per-row codegen expression: no shuffle, no
    Python, same scale shape as ``chunk_documents``. Output schema is
    identical: (id_col, chunk_idx, chunk_text, n_chunk_tokens).

    ``portable_hash=True`` selects cut tokens with the md5-based 32-bit
    hash (``conv(substr(md5(t),1,8),16,10)``) instead of ``xxhash64`` —
    identical boundary STATISTICS, but replayable in DuckDB (the same
    portable-hash convention the minhash/split oracles use), so it is
    the oracle-GRADED configuration; xxhash64 stays the default fast
    JVM path.
    """
    if not 1 <= min_tokens <= target_tokens <= max_tokens:
        raise ValueError(
            f"need 1 <= min_tokens <= target_tokens <= max_tokens: got "
            f"{min_tokens}, {target_tokens}, {max_tokens}"
        )
    toks = _tokens_raw(text_col)
    # fold token indices into the boundary list: state = array of cut
    # positions (0-based prefix lengths), starting [0]; token i appends a
    # cut at i iff the run since the last cut reaches min_tokens and
    # (its hash selects a cut or the run hit max_tokens)
    if portable_hash:
        tok_hash = lambda t: F.conv(  # noqa: E731
            F.substring(F.md5(t), 1, 8), 16, 10
        ).cast("bigint")
    else:
        tok_hash = F.xxhash64
    is_cut = F.transform(
        F.col("_toks"), lambda t: F.pmod(tok_hash(t), F.lit(target_tokens)) == 0
    )
    bounds = F.aggregate(
        F.zip_with(
            F.sequence(F.lit(1), F.size("_toks")),
            is_cut,
            lambda i, c: F.struct(i.alias("i"), c.alias("c")),
        ),
        F.array(F.lit(0)),
        lambda acc, x: F.when(
            (x["i"] - F.element_at(acc, -1) >= min_tokens)
            & (x["c"] | (x["i"] - F.element_at(acc, -1) >= max_tokens)),
            F.concat(acc, F.array(x["i"])),
        ).otherwise(acc),
    )
    closed = F.when(
        F.element_at(F.col("_bounds"), -1) < F.col("_n"),
        F.concat(F.col("_bounds"), F.array(F.col("_n"))),
    ).otherwise(F.col("_bounds"))
    return (
        df.select(F.col(id_col), toks.alias("_toks"))
        .withColumn("_n", F.size("_toks"))
        .where(F.col("_n") > 0)
        .withColumn("_bounds", bounds)
        .withColumn("_bounds", closed)
        .select(
            id_col,
            "_toks",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(2), F.size("_bounds")),
                    lambda j: F.struct(
                        (F.element_at(F.col("_bounds"), (j - 1).cast("int")) + 1).alias(
                            "start"
                        ),
                        (
                            F.element_at(F.col("_bounds"), j.cast("int"))
                            - F.element_at(F.col("_bounds"), (j - 1).cast("int"))
                        ).alias("len"),
                    ),
                )
            ).alias("chunk_idx", "_sl"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.concat_ws(
                " ", F.slice(F.col("_toks"), F.col("_sl.start"), F.col("_sl.len"))
            ).alias("chunk_text"),
            F.col("_sl.len").cast("bigint").alias("n_chunk_tokens"),
        )
    )
