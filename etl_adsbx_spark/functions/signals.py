"""[EXT] Quality signals that need a Python kernel (Arrow-batched, same
boundary rule as operators/multimodal.py: Python touches data only via
``mapInPandas``, only where no built-in expression can express the
semantics).

Currently one signal: the **compression-ratio** gibberish/repetition
detector used by the Gopher and RefinedWeb cleaning pipelines —
``len(zlib.compress(text)) / len(text)``. Natural prose lands in a
mid band (~0.3-0.7); heavy repetition compresses far below it (near-dup
spam, keyword stuffing); random or encrypted-looking character soup
refuses to compress (ratio ≈ 1+). No fixed-depth SQL expression can
compute LZ77+Huffman, hence the kernel; zlib is stdlib, so unlike the
media codecs there is nothing to stub."""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType


def with_compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "compression_ratio",
    level: int = 6,
) -> DataFrame:
    """df + ``out_col`` = compressed/raw UTF-8 byte ratio of
    ``text_col`` (empty/null text → 1.0 — "nothing to compress" reads as
    incompressible, so empty docs do not masquerade as high-quality
    prose). Map-side ``mapInPandas``: all input columns pass through the
    Arrow batch untouched, no shuffle, deterministic (zlib at a fixed
    level is a pure function of the bytes)."""
    out_schema = StructType(df.schema.fields + [StructField(out_col, DoubleType())])
    names = df.columns

    def ratios(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vals = []
            for text in pdf[text_col]:
                raw = (text or "").encode("utf-8")
                vals.append(
                    len(zlib.compress(raw, level)) / len(raw) if raw else 1.0
                )
            out = pdf[names].copy()
            out[out_col] = vals
            yield out

    return df.mapInPandas(ratios, out_schema)


def with_nfc_text(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Unicode NFC normalization of ``text_col`` (composing sequences
    like e + COMBINING ACUTE into the single é code point — without it,
    byte-identical-looking documents hash differently and dedup misses
    them). NFC is a data-driven many-to-many code-point mapping no
    fixed-depth SQL expression can express, hence the Arrow kernel
    (stdlib ``unicodedata``, nothing stubbed); map-side, all columns
    pass through, overwrites ``text_col`` unless ``out_col`` names a
    new column. Compose with the expression-side
    ``functions.text.canonicalize_text`` for the full normalization
    pass."""
    import unicodedata

    from pyspark.sql.types import StringType

    out = out_col or text_col
    if out == text_col:
        out_schema = StructType(
            [
                StructField(f.name, StringType()) if f.name == text_col else f
                for f in df.schema.fields
            ]
        )
    else:
        out_schema = StructType(df.schema.fields + [StructField(out, StringType())])
    names = df.columns

    def nfc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            res = pdf[names].copy()
            res[out] = [
                unicodedata.normalize("NFC", t) if t is not None else None
                for t in pdf[text_col]
            ]
            yield res

    return df.mapInPandas(nfc, out_schema)
