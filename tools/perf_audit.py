"""Measure, don't guess: per-bench-query physical cost audit.

Runs every 'bench'-tagged catalog query at $SPARK_GRAFT_SF_DIR
(default sf0.1) with the Spark event log enabled, then parses the log
into per-query totals: input bytes/records read, shuffle write and
read bytes/records, spill, peak task count, executor CPU time. The
numbers are what SCALE.md's claims stand on — a query whose shuffle
bytes scale with the corpus instead of its key domain is the thing to
catch here before a 1000-executor cluster catches it for us.

Usage: python tools/perf_audit.py [--json]
Writes PERF_AUDIT.md (and prints the table) unless --json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _collect(log_dir: str) -> dict[str, dict[str, float]]:
    """Parse Spark event logs: job-group -> aggregated task metrics."""
    group_of_job: dict[int, str] = {}
    stages_of_job: dict[int, list[int]] = {}
    group_of_stage: dict[int, str] = {}
    agg: dict[str, dict[str, float]] = {}

    def bucket(name: str) -> dict[str, float]:
        return agg.setdefault(
            name,
            {
                "input_bytes": 0.0,
                "input_records": 0.0,
                "shuffle_write_bytes": 0.0,
                "shuffle_write_records": 0.0,
                "shuffle_read_bytes": 0.0,
                "spill_bytes": 0.0,
                "executor_cpu_ms": 0.0,
                "tasks": 0.0,
            },
        )

    # Spark 4 rolling event log v2: one DIRECTORY per app containing
    # events_* part files; walk everything that parses as JSON lines
    paths = []
    for root, _dirs, files in os.walk(log_dir):
        for fn in files:
            paths.append(os.path.join(root, fn))
    for path in sorted(paths):
        with open(path, encoding="utf-8", errors="ignore") as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerJobStart":
                    gid = (ev.get("Properties") or {}).get(
                        "spark.jobGroup.id"
                    )
                    if gid:
                        jid = ev["Job ID"]
                        group_of_job[jid] = gid
                        sids = [
                            s["Stage ID"] for s in ev.get("Stage Infos", [])
                        ]
                        stages_of_job[jid] = sids
                        for sid in sids:
                            group_of_stage[sid] = gid
                elif kind == "SparkListenerTaskEnd":
                    gid = group_of_stage.get(ev.get("Stage ID"))
                    if not gid:
                        continue
                    m = ev.get("Task Metrics") or {}
                    b = bucket(gid)
                    b["tasks"] += 1
                    b["executor_cpu_ms"] += (
                        m.get("Executor CPU Time", 0) / 1e6
                    )
                    b["spill_bytes"] += m.get("Memory Bytes Spilled", 0)
                    b["spill_bytes"] += m.get("Disk Bytes Spilled", 0)
                    im = m.get("Input Metrics") or {}
                    b["input_bytes"] += im.get("Bytes Read", 0)
                    b["input_records"] += im.get("Records Read", 0)
                    sw = m.get("Shuffle Write Metrics") or {}
                    b["shuffle_write_bytes"] += sw.get(
                        "Shuffle Bytes Written", 0
                    )
                    b["shuffle_write_records"] += sw.get(
                        "Shuffle Records Written", 0
                    )
                    sr = m.get("Shuffle Read Metrics") or {}
                    b["shuffle_read_bytes"] += sr.get(
                        "Remote Bytes Read", 0
                    ) + sr.get("Local Bytes Read", 0)
    return agg


def _fmt_bytes(n: float) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if abs(n) < 1024 or unit == "GB":
            return f"{n:.1f} {unit}" if unit != "B" else f"{int(n)} B"
        n /= 1024
    return f"{n:.1f} GB"


def main() -> None:
    as_json = "--json" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = tempfile.mkdtemp(prefix="csdp-eventlog-")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    from click_streaming_data_pipeline_spark.plans import QUERIES
    from click_streaming_data_pipeline_spark.session import (
        RUNTIME_CONF,
        apply_runtime_conf,
    )

    cpus = int(os.environ["SPARK_GRAFT_CPUS"])
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("csdp-perf-audit")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", log_dir)
        # Spark 4 zstd-compresses event logs by default; keep them
        # plain JSON lines for the parser
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    apply_runtime_conf(spark)

    bench = {n: q for n, q in QUERIES.items() if "bench" in q.tags}
    for name, q in sorted(bench.items()):
        spark.sparkContext.setJobGroup(name, name)
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(f"# ran {name}", file=sys.stderr)
    # per-task CPU floor: a null-work shuffle job measured LAST (fully
    # warm JVM), so its per-task CPU is pure environment overhead —
    # task serde, codec init, cgroup-accounted runtime — not compute.
    # Hosts have differed 2x+ on this constant between rounds; small
    # lanes are dominated by floor x tasks.
    spark.sparkContext.setJobGroup("__floor__", "__floor__")
    spark.range(10_000).repartition(32).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.stop()

    agg = _collect(log_dir)
    shutil.rmtree(log_dir, ignore_errors=True)

    if as_json:
        print(json.dumps(agg, indent=2, sort_keys=True))
        return

    from tools.calibrate import py_calibration_ms

    calib = py_calibration_ms()
    floor = agg.pop("__floor__", None)
    floor_ms = (
        floor["executor_cpu_ms"] / floor["tasks"]
        if floor and floor["tasks"]
        else 0.0
    )
    lines = [
        "# PERF_AUDIT — measured per-query physical cost "
        f"(sf_dir={sf_dir}, local[{cpus}])",
        "",
        "Generated by `tools/perf_audit.py` from Spark event-log task",
        "metrics (one cold run per query; bytes are exact task sums,",
        "wall time is NOT measured here — bench.py owns timing).",
        "",
        f"Host calibration: md5-fold of 1M strings = {calib:.0f} ms "
        "single-core (tools/calibrate.py); per-task CPU floor =",
        f"{floor_ms:.0f} ms (null-work shuffle, warm JVM). The floor "
        "is shape-dependent: sort/window-shaped tasks measure",
        "~10x the null floor on this host (a trivial 5,400-row",
        "window = ~9.5 CPU-s warm across 33 tasks), so small lanes",
        "are dominated by task-count overhead, not their compute.",
        "CPU-s columns are additionally COLD runs (one-time",
        "codegen/JIT, ~2x on small lanes), scale with host speed,",
        "and vary +-40% run-to-run on CPU-bound lanes. Compare",
        "rows within this file (all biases shared); across rounds,",
        "normalize by the calibration and trust only >2x deltas on",
        "lanes with few tasks.",
        "",
        "| query | input | in rows | shuf write | sw rows | shuf read |"
        " spill | cpu s | tasks |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name in sorted(agg):
        b = agg[name]
        lines.append(
            f"| {name} | {_fmt_bytes(b['input_bytes'])} "
            f"| {int(b['input_records'])} "
            f"| {_fmt_bytes(b['shuffle_write_bytes'])} "
            f"| {int(b['shuffle_write_records'])} "
            f"| {_fmt_bytes(b['shuffle_read_bytes'])} "
            f"| {_fmt_bytes(b['spill_bytes'])} "
            f"| {b['executor_cpu_ms'] / 1000:.1f} "
            f"| {int(b['tasks'])} |"
        )
    text = "\n".join(lines) + "\n"
    with open("PERF_AUDIT.md", "w", encoding="utf-8") as fh:
        fh.write(text)
    print(text)


if __name__ == "__main__":
    main()
