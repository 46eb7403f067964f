"""SparkSession construction with scale-appropriate defaults.

The reference pipeline hand-tunes pools/batches (BASELINE.md); here the
equivalent knobs are Spark confs. Everything set here is *dynamic*
(safe on an externally-provided session too — see ``apply_runtime_conf``,
which the loaders call defensively because the driver owns the session
used by ``__spark_entry__.entry``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are safe (and required) to set at runtime on any session.
RUNTIME_CONF = {
    # The driver-generated parquet uses TIMESTAMP(NANOS) which Spark
    # refuses by default; read as long then convert (sources.tables).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # timestamp[us] parquet (round-2 testdata) reads as session-tz
    # TimestampType AT THE SCAN, not TIMESTAMP_NTZ + a cast Project.
    # The projection isn't just noise: it blocks Catalyst's runtime
    # bloom-filter injection (InjectRuntimeFilter wants a selective
    # filter directly over a scan) — measured: might_contain appears
    # without the cast, never with it.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Deterministic timestamps across engines (DuckDB oracle is UTC).
    "spark.sql.session.timeZone": "UTC",
    # Runtime re-planning: coalesce tiny post-shuffle partitions and
    # split skewed ones — the 100 TB safety net for uneven keys.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # NB: parallelismFirst stays at its default (true). The often-
    # recommended size-based alternative (parallelismFirst=false +
    # 32-64MB advisory) was MEASURED WORSE here (~20s vs ~16.5s bench):
    # with sub-advisory data volumes AQE coalesces every shuffle to one
    # partition and serializes multi-shuffle pipelines. Size-based
    # coalescing only pays off when shuffles actually exceed the
    # advisory size — i.e. at cluster scale, where it should be enabled.
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dims (region/nation/customer/part at small SF; any <=64 MB side)
    # should broadcast instead of shuffling the fact table.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Arrow for any pandas_udf / toPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def apply_runtime_conf(spark: SparkSession) -> SparkSession:
    """Set dynamic confs on an existing session (idempotent).

    Also right-sizes ``spark.sql.shuffle.partitions`` on externally-
    built sessions (the driver's): Spark's untouched default of 200
    reduce tasks per tiny local shuffle is pure scheduling overhead —
    match core count instead. Only applied while the conf still sits
    at the stock default, so sessions that chose a value (incl. our
    own builder) keep it.
    """
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf may be static on some builds; builder path sets it
    try:
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(max(spark.sparkContext.defaultParallelism, 8)),
            )
    except Exception:
        pass
    return spark


def get_spark(
    app_name: str = "csdp-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    local[N] dev default mirrors the driver: ``local[$SPARK_GRAFT_CPUS]``
    with shuffle partitions == cores. On a real cluster, leave
    ``spark.sql.shuffle.partitions`` to AQE (set high; AQE coalesces).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    # before the JVM spawns: put the vendored protobuf runtime (if the
    # native one is absent) on PYTHONPATH so every Python worker the
    # JVM ever launches — including the TWS schema-validation driver
    # worker, which skips the python-includes path — can import it.
    # No-op where google.protobuf is installed.
    from .streaming.stateful import ensure_protobuf_runtime

    ensure_protobuf_runtime()
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("CSDP_DRIVER_MEM", "8g"))
        # Pin the JVM default locale: Java toLowerCase (behind Spark's
        # lower()) is locale-sensitive for some mappings ('I' -> 'ı'
        # on tr_TR), which would break Arrow-kernel vs expression
        # parity (kernels use Python str.lower, locale-independent).
        # Applies when this builder launches the JVM (the normal local
        # path); a pre-existing JVM keeps its locale — the kernels'
        # parity claims assume en/ROOT lowercase semantics.
        .config(
            "spark.driver.extraJavaOptions",
            "-Duser.language=en -Duser.country=US",
        )
        .config(
            "spark.executor.extraJavaOptions",
            "-Duser.language=en -Duser.country=US",
        )
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or cpus),
        )
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return apply_runtime_conf(spark)
