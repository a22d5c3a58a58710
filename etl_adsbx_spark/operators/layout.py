"""[EXT] Multi-dimensional data layout — Z-order (Morton) clustering.

Parquet prunes with per-file and per-row-group min/max statistics, which
only help when the on-disk layout makes those ranges NARROW. Sorting on
one column gives perfect locality on that column and none on any other;
a corpus queried by several dimensions at once (lat AND lon, price AND
quantity, time AND key) wants a space-filling-curve order instead: quantize
each dimension to ``bits`` levels, bit-interleave the quantized cells into
one Morton key, and range-partition + sort by that key. Each output file
then covers a small HYPERCUBE of the value space — every dimension's
min/max range shrinks to roughly (1/n_files)^(1/n_dims) of the domain —
so a conjunctive range predicate skips most files on footer stats alone.

Scale shape: the quantization bounds come from ONE tiny min/max aggregate
(a 1-row frame, folded in as a broadcast crossJoin — the same shape the
scalar-subquery queries use); the key itself is a pure per-row expression
(codegen, ~bits·n_dims shift-and-mask terms); the write is a single
``repartitionByRange`` shuffle on the key — identical cost to a plain
global sort-write, with multi-dimensional instead of one-dimensional
locality. This is the layout step a 100-TB geo/time corpus runs once at
ingest so every later scan prunes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column | str, lo: Column, hi: Column, bits: int) -> Column:
    """Map a numeric column into integer cells [0, 2^bits) given inclusive
    bounds. Degenerate domains (hi == lo) and NULLs land in cell 0, the
    max lands in the top cell (the half-open grid is closed on the right)."""
    c = F.col(col) if isinstance(col, str) else col
    n_cells = 1 << bits
    span = (hi - lo).cast("double")
    cell = F.floor((c.cast("double") - lo.cast("double")) / span * n_cells)
    return F.coalesce(
        F.when(span > 0, F.greatest(F.lit(0), F.least(F.lit(n_cells - 1), cell))).otherwise(
            F.lit(0)
        ),
        F.lit(0),
    ).cast("bigint")


def interleave_bits(cells: list[Column], bits: int) -> Column:
    """Morton interleave: output bit (i·n_dims + j) = bit i of cells[j].
    Requires bits · len(cells) ≤ 62 (stays in a signed bigint)."""
    n = len(cells)
    if bits * n > 62:
        raise ValueError(f"bits*n_dims = {bits * n} exceeds a signed bigint")
    out: Column = F.lit(0).cast("bigint")
    for j, c in enumerate(cells):
        for i in range(bits):
            out = out + F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return out


def with_zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8, key_col: str = "_zkey"
) -> DataFrame:
    """Attach the Morton key for ``cols``: one broadcast min/max aggregate
    supplies the quantization bounds, then the key is pure codegen."""
    stats = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    )
    withb = df.crossJoin(F.broadcast(stats))
    cells = [
        quantize(c, F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), bits) for c in cols
    ]
    return withb.withColumn(key_col, interleave_bits(cells, bits)).drop(
        *[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet Z-order-clustered on ``cols``: range-partition on the
    Morton key into ``num_files`` contiguous key ranges (one file each) and
    sort within each so row-group stats prune too. ``num_files`` defaults
    to the current partition count; size it as total bytes / target file
    size, exactly like ``sinks.write_corpus``."""
    n = num_files or df.rdd.getNumPartitions()
    keyed = with_zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )


def shuffle_key(seed: int, *id_cols: Column | str) -> Column:
    """Pseudorandom-but-deterministic order key: xxhash64(seed, ids).
    Content-derived, so it survives task retries and input repartitioning
    (the rand()-salt hazard operators/skew.py documents)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in id_cols]
    return F.xxhash64(F.lit(seed), *cols)


def deterministic_shuffle(
    df: DataFrame, seed: int = 0, id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Global pseudorandom shuffle of training examples — the "randomize
    document order before sharding" step every pretraining run needs, as a
    deterministic total order: sort by (xxhash64(seed, ids), ids).

    Spark executes orderBy as a range-partition sort (sampled boundaries,
    then per-partition sorts) — fully distributed, no single-task stage,
    one shuffle. A new ``seed`` is a fresh independent permutation (epoch
    reshuffle); the same seed reproduces the byte-identical order on any
    cluster size or input partitioning, which is what makes training runs
    resumable and debuggable. The id tiebreak makes the order total even
    on the ~2^-64 hash-collision pairs."""
    key = shuffle_key(seed, *id_cols)
    return df.orderBy(key, *[F.col(c) for c in id_cols])
