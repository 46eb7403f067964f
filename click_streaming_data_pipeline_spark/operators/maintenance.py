"""Table-maintenance operators: small-file compaction (the lakehouse
OPTIMIZE analogue).

Why this is a first-class operator at 100 TB: streaming sinks and
fine-grained upserts (operators/upsert.py writes per micro-batch)
accumulate files far below the parquet row-group sweet spot; scans
then pay per-file open/footer costs and lose row-group parallelism.
Compaction rewrites a directory into ceil(bytes/target) right-sized
files. The reference never needs this because Elasticsearch/Redis own
the storage; a Spark-native engine owns its files.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession

#: default target file size — parquet's happy zone (one fat row group
#: per file); small enough that maxPartitionBytes=128M scans split
#: cleanly, big enough that footer/open overhead is noise.
TARGET_FILE_BYTES = 128 * 1024 * 1024


def plan_compaction(
    path: str, *, target_bytes: int = TARGET_FILE_BYTES
) -> dict:
    """Inventory a parquet directory: file count, total bytes, and the
    partition count a compaction would rewrite to. Driver-side listing
    only (at warehouse scale this is the catalog/manifest query)."""
    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    total = sum(os.path.getsize(f) for f in files)
    return {
        "n_files": len(files),
        "total_bytes": total,
        "target_partitions": max(1, math.ceil(total / target_bytes)),
    }


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    *,
    target_bytes: int = TARGET_FILE_BYTES,
) -> dict:
    """Rewrite ``src`` into right-sized files at ``dst``; returns the
    before/after inventory. Uses coalesce (narrow — no shuffle: each
    output file unions whole input files) sized from actual bytes.
    Row-level content is preserved exactly; file-level layout is not
    (that's the point). Write to a new location then swap — the
    idempotent, interruption-safe pattern (a crashed compaction leaves
    ``src`` untouched).
    """
    before = plan_compaction(src, target_bytes=target_bytes)
    df: DataFrame = spark.read.parquet(src)
    df.coalesce(before["target_partitions"]).write.mode(
        "overwrite"
    ).parquet(dst)
    after = plan_compaction(dst, target_bytes=target_bytes)
    return {"before": before, "after": after}


# ---------------------------------------------------------------------------
# Z-order clustering (multi-dimensional data skipping)

#: bits interleaved per dimension (16+16 -> 32-bit key: enough
#: resolution for file-level skipping; production scales with the
#: key domains).
ZORDER_BITS = 16


def zorder_key(a, b, *, bits: int = ZORDER_BITS):
    """Morton/Z-order interleave of two non-negative integer columns:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.

    Sorting (then range-splitting into files) by this key clusters
    BOTH dimensions at once, so per-file min/max statistics prune
    scans filtered on either column — the Delta/Iceberg OPTIMIZE
    ZORDER primitive. Pure integer expression (fold of shift/mask
    terms collapsed by codegen); deterministic and engine-portable,
    so a DuckDB oracle reproduces it bit-for-bit.
    """
    from pyspark.sql import functions as F

    acol = F.col(a) if isinstance(a, str) else a
    bcol = F.col(b) if isinstance(b, str) else b
    acol, bcol = acol.cast("long"), bcol.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(acol, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(bcol, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def zorder_key_sql(a: str, b: str, *, bits: int = ZORDER_BITS) -> str:
    """DuckDB twin of ``zorder_key`` (bit-identical BIGINT)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({a} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({b} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def optimize_zorder(
    spark: SparkSession,
    src: str,
    dst: str,
    col_a: str,
    col_b: str,
    *,
    target_bytes: int = TARGET_FILE_BYTES,
    bits: int = ZORDER_BITS,
) -> dict:
    """OPTIMIZE ZORDER: rewrite ``src`` into right-sized files that
    are range-split and sorted along the Morton key of (col_a, col_b)
    — compaction and multi-dimensional clustering in ONE rewrite, the
    Delta/Iceberg `OPTIMIZE ... ZORDER BY` equivalent.

    File count comes from actual bytes (plan_compaction); the range
    partitioner samples the z-key so file boundaries follow the data
    distribution. Writes to a new location then swaps (idempotent,
    interruption-safe — same contract as compact_parquet). Returns
    the before/after inventory. Scale: one shuffle (the range
    exchange) + in-partition sort; per-file min/max footer stats on
    BOTH columns shrink by ~sqrt(#files) versus a single-column sort,
    which is what makes either-predicate scans prune."""
    before = plan_compaction(src, target_bytes=target_bytes)
    n = before["target_partitions"]
    df: DataFrame = spark.read.parquet(src)
    zkey = zorder_key(col_a, col_b, bits=bits)
    (
        df.withColumn("__zkey", zkey)
        .repartitionByRange(n, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(dst)
    )
    after = plan_compaction(dst, target_bytes=target_bytes)
    return {"before": before, "after": after}


def backfill_partitions(
    new_data: DataFrame,
    table_dir: str,
    partition_col: str,
) -> None:
    """Idempotent partition BACKFILL: rewrite exactly the partitions
    present in ``new_data``, leaving every other partition's files
    untouched (Spark's dynamic partitionOverwriteMode) — the
    recompute-one-day operation a warehouse runs after late data or a
    logic fix. Static overwrite would truncate the whole table; the
    dynamic mode scopes the overwrite to the partitions being
    written, so a backfill is safe to re-run (same input → same
    files) and safe to run concurrently with readers of other
    partitions."""
    (
        new_data.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(table_dir)
    )


def forget_keys(
    spark: SparkSession,
    table_dir: str,
    partition_col: str,
    key_col: str,
    keys: DataFrame,
) -> dict:
    """GDPR right-to-be-forgotten delete: remove every row whose
    ``key_col`` appears in ``keys``, rewriting ONLY the partitions
    that actually contain those keys (everything else's files are
    never read for the rewrite and never touched).

    Three steps, all key-bounded:
    1. locate dirty partitions — semi-join the table against the
       (broadcast) key list, distinct on the partition column; the
       collect is bounded by the partition count, not the data;
    2. rewrite dirty partitions — partition-pruned scan of just those
       directories, anti-join out the forgotten keys, dynamic
       partition overwrite (same idempotent, re-runnable contract as
       backfill_partitions);
    3. drop fully-emptied partitions — dynamic overwrite only rewrites
       partitions present in the output, so a partition whose every
       row is forgotten must be dropped explicitly (at warehouse scale
       this is a catalog metadata delete; here, the directory).

    Returns {"partitions_rewritten", "partitions_dropped",
    "rows_deleted"}. At 100 TB the cost is proportional to the dirty
    partitions' bytes — for a date-partitioned events table and a
    user-deletion request, that is the handful of days the user was
    active, not the corpus.
    """
    import shutil

    from pyspark.sql import functions as F

    table = spark.read.parquet(table_dir)
    klist = F.broadcast(keys.select(key_col).distinct())
    dirty = [
        r[0]
        for r in table.join(klist, key_col, "left_semi")
        .select(partition_col)
        .distinct()
        .collect()
    ]
    if not dirty:
        return {
            "partitions_rewritten": 0,
            "partitions_dropped": 0,
            "rows_deleted": 0,
        }

    pruned = table.filter(F.col(partition_col).isin(dirty))
    before = pruned.count()
    survivors = pruned.join(klist, key_col, "left_anti")
    # which dirty partitions still have rows — from the anti-join
    # result itself, BEFORE the write: dynamic overwrite never touches
    # a partition with zero output rows, so an emptied partition's old
    # files would survive the write and must be dropped explicitly.
    # (partition-count-bounded collect, like the dirty list.)
    per_part = {
        r[0]: r[1]
        for r in survivors.groupBy(partition_col).count().collect()
    }
    after = sum(per_part.values())
    if per_part:
        # partition column must ride along for partitionBy; pruned
        # scans reconstruct it from the directory name already
        (
            survivors.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(table_dir)
        )
    dropped = 0
    for part in dirty:
        if part not in per_part:
            d = os.path.join(table_dir, f"{partition_col}={part}")
            if os.path.isdir(d):
                shutil.rmtree(d)
                dropped += 1
    return {
        "partitions_rewritten": len(per_part),
        "partitions_dropped": dropped,
        "rows_deleted": before - after,
    }


def vacuum_orphans(
    table_dir: str,
    committed_files: set[str],
    *,
    min_age_seconds: float = 0.0,
) -> dict:
    """Manifest-based VACUUM: delete data files under ``table_dir``
    that are NOT in the committed set (failed-job debris, superseded
    compaction inputs, interrupted writes). The lakehouse GC
    primitive — readers only ever see committed files via the
    manifest, so removing orphans is invisible to queries; the
    ``min_age_seconds`` guard (Delta's retention check) keeps an
    in-flight writer's fresh files safe from a concurrent vacuum.

    ``committed_files`` holds paths relative to ``table_dir`` (as a
    manifest records them). Returns counts + bytes reclaimed.
    Driver-side listing: at warehouse scale this walks the object
    store listing against the manifest — O(files), no data read."""
    import time

    now = time.time()
    kept = removed = reclaimed = 0
    for dp, _, fs in os.walk(table_dir):
        for f in fs:
            full = os.path.join(dp, f)
            rel = os.path.relpath(full, table_dir)
            if not f.endswith(".parquet"):
                continue
            if rel in committed_files:
                kept += 1
                continue
            if now - os.path.getmtime(full) < min_age_seconds:
                kept += 1
                continue
            reclaimed += os.path.getsize(full)
            os.remove(full)
            removed += 1
    return {
        "files_kept": kept,
        "files_removed": removed,
        "bytes_reclaimed": reclaimed,
    }


def write_audit_publish(
    spark: SparkSession,
    df: DataFrame,
    table_dir: str,
    audits,
) -> dict:
    """WRITE-AUDIT-PUBLISH: stage the data, run audit queries against
    the STAGED files, and only then atomically swap staging into the
    published location — readers either see the old table or the
    fully-audited new one, never a half-written or failing state (the
    Iceberg/Netflix WAP pattern; dbt build's test-then-promote).

    ``audits`` is a list of (name, fn) where fn(DataFrame) -> number
    of violations in the staged data; any violation aborts publish
    and leaves the current table untouched (staging is kept for
    debugging, under ``<table_dir>.quarantine``).

    Returns {"published": bool, "violations": {name: n}}. Scale: the
    swap is a metadata move; audits are plain Spark jobs over staged
    files — the audit cost is the price of never publishing bad data.
    """
    import shutil

    staging = table_dir + ".staging"
    df.write.mode("overwrite").parquet(staging)
    staged = spark.read.parquet(staging)
    violations = {name: int(fn(staged)) for name, fn in audits}
    if any(v > 0 for v in violations.values()):
        quarantine = table_dir + ".quarantine"
        if os.path.isdir(quarantine):
            shutil.rmtree(quarantine)
        os.replace(staging, quarantine)
        return {"published": False, "violations": violations}
    old = table_dir + ".old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(table_dir):
        os.replace(table_dir, old)
    os.replace(staging, table_dir)
    if os.path.isdir(old):
        shutil.rmtree(old)
    return {"published": True, "violations": violations}
