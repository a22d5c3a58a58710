"""[EXT] Multimodal column plumbing (BASELINE.json north star).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The decode/feature steps would use image/audio libraries that are
NOT in this container, so the *decode kernel* is stubbed behind a
deterministic fake — but every Spark-side piece (schema, Arrow batch shape,
``mapInPandas`` signature, partitioning) is real and tested.

At 100 TB the pattern is: binary payloads stay columnar in parquet, the
decode UDF runs `mapInPandas` (Arrow batches, no per-row overhead), and
partition sizing is driven by payload bytes (``maxPartitionBytes``), not
row count.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("payload_sha", StringType(), False),
        StructField("feat_mean", DoubleType(), False),
    ]
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Materialize a media table from the documents corpus: UTF-8 payload
    bytes + fake image metadata. Gives the binary-column path real data to
    flow through without bundled media files."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("n_chars") % 640).alias("width"),
        (F.col("n_chars") % 480).alias("height"),
    )


def decode_media(payload: bytes, mime: str) -> bytes:
    """Decode kernel stub. A real deployment plugs Pillow/ffmpeg here.

    Raises for real media types (libs not installed); for the synthetic
    octet-stream payloads it is a deterministic identity, which keeps the
    full pipeline testable.
    """
    if mime.startswith(("image/", "audio/", "video/")):
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in this "
            "container; plug a real decoder into decode_media()"
        )
    return payload


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each pandas batch holds many payloads; per-payload work
    is vectorized where possible. Output: byte count, sha256, and a fake
    'feature' (mean byte value) standing in for an embedding model.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                decode_media(p, m) for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(d) for d in decoded],
                    "payload_sha": [hashlib.sha256(d).hexdigest() for d in decoded],
                    "feat_mean": [
                        (sum(d) / len(d)) if len(d) else 0.0 for d in decoded
                    ],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)
