"""Benchmark runner: times the 'bench'-tagged catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is fully materialized through the noop sink — unlike
``count()``, which lets Catalyst prune every projection (a scorer
query "benched" via count computes no scores at all), the noop write
evaluates every output column and discards the rows."""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from click_streaming_data_pipeline_spark.plans import QUERIES
    from click_streaming_data_pipeline_spark.session import get_spark

    spark = get_spark("csdp-bench")
    bench = {n: q for n, q in QUERIES.items() if "bench" in q.tags}

    # warm the JVM so timings measure the queries, not first-use
    # codegen: run the bench set once at the smallest SF (compiles
    # each query's generated stages — the dedup/search expression
    # pipelines alone are dozens of unique codegen units), then touch
    # the target-SF data
    warm_sf = "/root/testdata/sf0.001"
    for name, q in sorted(bench.items()):
        q.fn(spark, warm_sf).write.format("noop").mode("overwrite").save()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # best-of-3 per query: the machine is shared and noisy (±20%
    # run-to-run, SCALE.md; whole sessions have been observed +40%);
    # min-of-N is the standard estimator for the query's actual cost
    # under interference
    timings: dict[str, float] = {}
    for name, q in sorted(bench.items()):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    # host-speed denominator: round hosts have differed up to ~2x in
    # single-core speed; normalize cross-round walls by this before
    # reading a delta as a regression (tools/calibrate.py)
    try:
        from tools.calibrate import py_calibration_ms

        calib = py_calibration_ms()
    except Exception:
        calib = None
    print(
        json.dumps(
            {
                "metric": "bench_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "host_calib_md5_1m_ms": calib,
                # observability (additive): prove the env-var contract is
                # honored — the effective master / parallelism the session
                # actually runs with, checkable from the JSON line alone
                "master": spark.sparkContext.master,
                "default_parallelism": spark.sparkContext.defaultParallelism,
                "shuffle_partitions": int(
                    spark.conf.get("spark.sql.shuffle.partitions")
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
