"""Sinks: FeatureCollection document assembly + file/HTTP emit
(task.ts:252-257, R28)."""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def feature_collection_json(features: DataFrame) -> str:
    """Assemble the single FeatureCollection document for the batch.

    The reference emits ONE document per tick (task.ts:252-255), so a
    driver-side collect of the (already deduped, O(10³-10⁴) row) feature set
    is the correct shape — this is the one place `collect()` is legitimate.
    For unbounded outputs use ``write_json`` instead.
    """
    docs = features.select(F.to_json(F.struct(*features.columns)).alias("j")).collect()
    return json.dumps(
        {"type": "FeatureCollection", "features": [json.loads(r.j) for r in docs]},
        separators=(",", ":"),
    )


def submit(features: DataFrame, post_fn: Callable[[str], None]) -> int:
    """`submit()` equivalent (task.ts:257): POST the FeatureCollection.
    Returns the feature count (the reference logs ids.size, task.ts:251)."""
    n = features.count()
    post_fn(feature_collection_json(features))
    return n


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_corpus(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_by: list[str] | None = None,
    files_per_partition: int = 1,
    max_records_per_file: int | None = None,
    salt_col: str | None = None,
    mode: str = "overwrite",
    file_format: str = "parquet",
) -> None:
    """Curated-corpus writer: hive-partitioned, small-file-safe,
    optionally clustered for row-group pruning. ``file_format`` selects
    the columnar container — "parquet" (default) or "orc"; both are
    Spark-native, support predicate pushdown + partition pruning, and get
    the identical shuffle/sort/file-budget treatment (ORC matters for
    Hive-ecosystem consumers of a published corpus).

    The naive ``df.write.partitionBy(cols)`` writes one file per (task ×
    live partition value) — at 100 TB with thousands of tasks and hundreds
    of partition values that is the classic small-files explosion (memory
    too: each task holds one open parquet writer PER value it encounters).
    This writer shuffles first so each hive partition's rows land on
    exactly ``files_per_partition`` tasks:

    - the shuffle key is (partition_by…, file slot), where the slot is
      ``pmod(xxhash64(salt_col), files_per_partition)`` — content-derived
      (deterministic under retry, unlike round-robin), and skew-safe: a
      single hot partition value still spreads over ``files_per_partition``
      tasks. Pick ``files_per_partition`` ≈ partition bytes / desired file
      size. With the default 1, each hive partition is exactly one file.
    - ``sort_by`` applies ``sortWithinPartitions(partition_by…, sort_by…)``
      after the shuffle, so parquet row-group min/max stats actually prune
      on those columns for readers filtering inside a partition. The
      partition columns MUST lead the sort: a dynamic-partition write whose
      input is not already ordered by the partition columns gets an
      implicit writer-side sort on exactly those columns (one open file per
      task), and that sort is NOT stable — it permutes rows within equal
      partition keys and silently destroys any secondary clustering
      (observed: hash-order clustering scrambled whenever one task carried
      several partition values). Leading with the partition columns makes
      the writer's required ordering a satisfied prefix, so it skips its
      own sort and the secondary order survives to the row groups.
    - ``max_records_per_file`` caps runaway files via the DataSource
      option of the same name (rows, not bytes — estimate from the
      corpus's average row width).
    """
    salt = salt_col or partition_by[-1]
    slot = F.pmod(F.xxhash64(F.col(salt)), F.lit(max(1, files_per_partition)))
    out = df.withColumn("_slot", slot).repartition(
        *[F.col(c) for c in partition_by], F.col("_slot")
    )
    if sort_by:
        out = out.sortWithinPartitions(*partition_by, *sort_by)
    w = out.drop("_slot").write.mode(mode).partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if file_format == "parquet":
        w.parquet(path)
    elif file_format == "orc":
        w.orc(path)
    else:
        raise ValueError(f"unsupported corpus file_format: {file_format!r}")


def _footer_summary(path: str) -> dict[str, dict[str, int]]:
    """Per hive-partition-directory {n_files, n_rows, n_bytes} from parquet
    footers — never scans row data (~KB of metadata per file)."""
    import os

    import pyarrow.parquet as pq

    parts: dict[str, dict[str, int]] = {}
    for root, _dirs, files in os.walk(path):
        pfiles = [f for f in files if f.endswith(".parquet")]
        if not pfiles:
            continue
        rel = os.path.relpath(root, path)
        ent = parts.setdefault(
            rel if rel != "." else "", {"n_files": 0, "n_rows": 0, "n_bytes": 0}
        )
        for f in pfiles:
            fp = os.path.join(root, f)
            ent["n_files"] += 1
            ent["n_rows"] += pq.ParquetFile(fp).metadata.num_rows
            ent["n_bytes"] += os.path.getsize(fp)
    return parts


def write_manifest(path: str) -> dict:
    """Write a ``_MANIFEST.json`` sidecar summarizing a parquet tree from
    its footers: per hive-partition directory {n_files, n_rows, n_bytes}
    plus totals. The ops half of a long-lived corpus: downstream
    consumers reconcile row counts without scanning data, incremental
    ingest records what each tick appended, and ``verify_manifest``
    detects partial writes / lost files later. At real scale generate it
    inside the same job that lists files for the write commit (the numbers
    come from metadata either way). Returns the manifest dict."""
    import json as _json
    import os

    parts = _footer_summary(path)
    manifest = {
        "partitions": parts,
        "total_files": sum(p["n_files"] for p in parts.values()),
        "total_rows": sum(p["n_rows"] for p in parts.values()),
        "total_bytes": sum(p["n_bytes"] for p in parts.values()),
    }
    with open(os.path.join(path, "_MANIFEST.json"), "w") as fh:
        _json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def verify_manifest(path: str) -> dict:
    """Recompute the footer summary and compare to ``_MANIFEST.json``;
    raises AssertionError naming the first diverging partition (missing
    files, truncated rows, size drift). Returns the stored manifest on
    success."""
    import json as _json
    import os

    with open(os.path.join(path, "_MANIFEST.json")) as fh:
        stored = _json.load(fh)
    parts = _footer_summary(path)
    for part, want in stored["partitions"].items():
        got = parts.get(part)
        assert got == want, f"partition {part!r}: manifest={want} actual={got}"
    extra = set(parts) - set(stored["partitions"])
    assert not extra, f"partitions not in manifest: {sorted(extra)}"
    return stored


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    mode: str = "overwrite",
) -> int:
    """Compact a small-files parquet directory into ~``target_file_bytes``
    files (the maintenance pass every long-lived ingest needs: per-tick
    micro-batch writes accumulate thousands of tiny files whose open/footer
    overhead eventually dominates scans). File count is sized from the
    *actual on-disk bytes* of the source, never a row-count guess;
    ``coalesce`` (not ``repartition``) avoids a full shuffle — compaction
    is IO-bound, so collapsing read tasks is exactly what we want. Returns
    the target file count. Partitioned layouts: compact per partition (this
    helper is the flat-directory case; hive-partitioned dirs keep their
    structure by re-running ``write_corpus`` instead)."""
    import os

    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(src)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, round(total / target_file_bytes))
    spark.read.parquet(src).coalesce(n_files).write.mode(mode).parquet(dst)
    return n_files


def write_corpus_atomic(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    **write_kwargs,
) -> dict:
    """All-or-nothing corpus publish: write to a staging sibling, verify
    the manifest against the freshly-written footers, then RENAME into
    place — readers either see the previous complete corpus or the new
    complete corpus, never a partial tree. A crashed writer leaves only
    an orphaned ``.__staging__`` directory (safe to delete); the final
    path flips in one metadata operation. Returns the manifest.

    Scope honesty: the commit step is ``os.rename``, atomic on a POSIX
    filesystem (and on HDFS via the equivalent NameNode op). Object
    stores (S3/GCS) have NO atomic directory rename — there, use the
    marker-file protocol (``exactly_once_batch_sink(commit="marker")``):
    staging write + manifest verify, then a single-PUT commit marker
    instead of the directory flip — exactly the pointer-commit protocol
    of table formats like Iceberg/Delta. The Spark-side plan is
    identical either way; only the final metadata flip differs.
    """
    import os
    import shutil

    staging = path.rstrip("/") + ".__staging__"
    if os.path.exists(staging):
        shutil.rmtree(staging)  # leftover from a crashed writer
    write_corpus(df, staging, partition_by, **write_kwargs)
    manifest = write_manifest(staging)
    verify_manifest(staging)
    prev = path.rstrip("/") + ".__prev__"
    if os.path.exists(prev):
        shutil.rmtree(prev)
    if os.path.exists(path):
        os.rename(path, prev)
    os.rename(staging, path)
    if os.path.exists(prev):
        shutil.rmtree(prev)
    return manifest


def corpus_diff(old: DataFrame, new: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Run-to-run corpus delta: one row per id present in exactly one
    side, tagged ``change`` = 'added' | 'removed'. The release-review
    tool for a re-published corpus (what did the new dedup threshold /
    quality gate actually change?). Two anti-joins on the id — each a
    single equi-join shuffle, no collects; at 100 TB both sides prune to
    the id column at the scan."""
    o = old.select(F.col(id_col))
    n = new.select(F.col(id_col))
    return (
        n.join(o, id_col, "left_anti").withColumn("change", F.lit("added"))
        .unionByName(
            o.join(n, id_col, "left_anti").withColumn("change", F.lit("removed"))
        )
    )


def corpus_diff_content(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Content-aware corpus delta: ``corpus_diff`` extended with
    'changed' (same id, different content) via ONE full-outer equi-join
    on the id comparing content fingerprints — the re-publish review
    that also answers "which surviving documents did the new
    normalization rewrite?". Output: (id_col, change) with change in
    {'added','removed','changed','unchanged'}.

    Scale shape: both sides prune to (id, md5) at the scan — the join
    ships 2 narrow columns regardless of document size; one shuffle
    keyed on the id. The full-outer join is the right primitive here
    (the anti-join pair of ``corpus_diff`` cannot see 'changed', and a
    3-way union of anti/anti/inner would scan each side twice)."""
    o = old.select(F.col(id_col), F.md5(F.col(content_col)).alias("_oh"))
    n = new.select(F.col(id_col), F.md5(F.col(content_col)).alias("_nh"))
    return (
        o.join(n, id_col, "full_outer")
        .select(
            F.col(id_col),
            F.when(F.col("_oh").isNull(), F.lit("added"))
            .when(F.col("_nh").isNull(), F.lit("removed"))
            .when(F.col("_oh") != F.col("_nh"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("change"),
        )
    )


def exactly_once_batch_sink(
    path: str,
    partition_by: list[str] | None = None,
    commit: str = "rename",
    **write_kwargs,
):
    """``foreachBatch`` sink with EXACTLY-ONCE publication per batchId —
    the task-retry story at the sink. Structured Streaming's foreachBatch
    is at-least-once: after a driver failure the restarted query RE-FIRES
    the last unacknowledged batch with the SAME batchId. Two commit
    protocols, selected by ``commit``:

    ``commit="rename"`` (POSIX/HDFS fast path): the committed unit is a
    per-batch directory whose atomic ``os.rename`` from staging IS the
    commit record:

    - batch dir ``<path>/batch=<id>`` already exists → the batch is
      committed; the replay is a NO-OP (the corpus stays byte-identical).
    - else: write to ``<path>/.staging-<id>`` (an interrupted previous
      attempt's leftover staging is removed first — its batch was, by
      the rename protocol, never committed), then rename into place.

    ``commit="marker"`` (object-store-safe: S3-class stores have NO
    atomic directory rename): the data is written STRAIGHT to the final
    ``batch=<id>`` prefix, and the commit record is one
    ``_COMMITTED.<id>`` marker object published with a single atomic
    PUT (``O_EXCL`` create locally) AFTER the data lands — the Iceberg/
    Delta pointer-flip protocol in one file:

    - marker exists → committed; replay is a NO-OP regardless of what
      the data prefix looks like.
    - marker absent → any bytes under ``batch=<id>`` are a TORN previous
      attempt (crash mid-write): they are deleted object-by-object (no
      rename, no directory ops) and the batch is rewritten, then the
      marker is PUT. The marker carries the file manifest (relpath →
      bytes), so ``read_committed_batches`` can verify every committed
      object is present and whole before exposing the batch.

    This Python layer never renames in marker mode (pinned by a
    monkeypatched-``os.rename`` test). Scope honesty: Spark's OWN file
    committer may still rename task files inside the batch write — on a
    real object store pair this sink with an S3A "magic"/zero-rename
    committer; the torn-write recovery above is exactly what makes that
    safe, because a partially-committed data prefix without a marker is
    indistinguishable from a crash and gets cleaned either way.

    Readers see only fully-committed batches: rename mode globs
    ``batch=*`` dirs (staging is dot-prefixed, which Spark's file index
    skips); marker mode lists markers and reads exactly those prefixes.

    Returns the (df, batch_id) callable for
    ``writeStream.foreachBatch(...)``. ``partition_by`` routes through
    the small-file-safe ``write_corpus``; without it the batch is a
    plain parquet write."""
    import os
    import shutil

    if commit not in ("rename", "marker"):
        raise ValueError(f"unknown commit protocol: {commit!r}")

    def write_batch(df: DataFrame, target: str) -> None:
        if partition_by:
            write_corpus(df, target, partition_by, **write_kwargs)
        else:
            df.write.mode("overwrite").parquet(target, **write_kwargs)

    def sink_rename(df: DataFrame, batch_id: int) -> None:
        final = os.path.join(path, f"batch={batch_id}")
        if os.path.exists(final):
            return  # committed by a previous attempt — idempotent replay
        staging = os.path.join(path, f".staging-{batch_id}")
        if os.path.exists(staging):
            shutil.rmtree(staging)
        write_batch(df, staging)
        os.makedirs(path, exist_ok=True)
        os.rename(staging, final)

    def sink_marker(df: DataFrame, batch_id: int) -> None:
        final = os.path.join(path, f"batch={batch_id}")
        marker = _marker_path(path, batch_id)
        if os.path.exists(marker):
            # a marker is the commit record ONLY if it parses: a crash
            # between the O_EXCL create and the write leaves an empty/
            # truncated marker, which must read as UNCOMMITTED — else the
            # replay no-ops forever while readers crash on it (wedged
            # batch). Torn marker -> delete it and fall through to the
            # torn-data path.
            try:
                with open(marker) as fh:
                    json.load(fh)
                return  # committed — replay is a NO-OP
            except (ValueError, OSError):
                os.unlink(marker)
        if os.path.exists(final):
            # torn previous attempt: delete object-by-object (the only
            # primitive an object store guarantees), never rename
            for root, _dirs, files in os.walk(final, topdown=False):
                for f in files:
                    os.unlink(os.path.join(root, f))
                os.rmdir(root)
        write_batch(df, final)
        files = {
            os.path.relpath(os.path.join(root, f), final): os.path.getsize(
                os.path.join(root, f)
            )
            for root, _dirs, fs in os.walk(final)
            for f in fs
            if not f.startswith(".") and not f.startswith("_")
        }
        body = json.dumps(
            {"batch_id": batch_id, "n_files": len(files), "files": files},
            sort_keys=True,
        ).encode()
        # single-object atomic publish: O_EXCL create + one write + fsync
        # (the local stand-in for an S3 PUT, which is all-or-nothing)
        fd = os.open(marker, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        try:
            os.write(fd, body)
            os.fsync(fd)
        finally:
            os.close(fd)

    return sink_rename if commit == "rename" else sink_marker


def _marker_path(path: str, batch_id: int | str) -> str:
    import os

    return os.path.join(path, f"_COMMITTED.{batch_id}")


def read_committed_batches(spark, path: str, commit: str = "rename") -> DataFrame:
    """Read every COMMITTED batch of an ``exactly_once_batch_sink``
    corpus. Rename mode: glob ``batch=*`` dirs (staging is dot-prefixed,
    which Spark's file index skips; the ``batch=<id>`` dirs read back as
    a hive partition column). Marker mode: list ``_COMMITTED.*`` markers
    and read exactly those batch prefixes — a data prefix without a
    marker is an uncommitted torn write and stays invisible; a MARKER
    whose manifest names a missing/short file is corruption and fails
    loudly before any row is served."""
    import glob as _glob
    import os

    if commit == "rename":
        return spark.read.option("basePath", path).parquet(path + "/batch=*")
    dirs = []
    for marker in sorted(_glob.glob(_marker_path(path, "*"))):
        with open(marker) as fh:
            try:
                meta = json.load(fh)
            except ValueError:
                # torn marker (crash mid-PUT): the batch is UNCOMMITTED —
                # the sink's replay deletes it and rewrites; skip it here
                # so the corpus stays readable in the meantime
                continue
        batch_dir = os.path.join(path, f"batch={meta['batch_id']}")
        for rel, size in meta["files"].items():
            fp = os.path.join(batch_dir, rel)
            if not os.path.exists(fp) or os.path.getsize(fp) != size:
                raise ValueError(
                    f"committed batch {meta['batch_id']} is missing or has a "
                    f"short object: {rel} (marker says {size} bytes)"
                )
        dirs.append(batch_dir)
    if not dirs:
        # zero committed batches: falling back to the batch=* glob would
        # expose torn uncommitted prefixes — fail loudly instead
        raise ValueError(f"no committed batches under {path!r}")
    return spark.read.option("basePath", path).parquet(*dirs)
