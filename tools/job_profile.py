"""Per-bench-lane job/stage/task counts via the status tracker.

The sf0.1 bench wall is dominated by sequential job/stage scheduling
latency, not CPU (PERF_AUDIT): this tool counts, for each bench-tagged
catalog query, how many jobs and stages one noop-sink execution
schedules — the structural number the round-8 stage-fusion work
targets. Counts are deterministic per plan shape (unlike wall times),
so this can run on a noisy host.

Usage: python tools/job_profile.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])
    from click_streaming_data_pipeline_spark.plans import QUERIES
    from click_streaming_data_pipeline_spark.session import get_spark

    spark = get_spark("job-profile")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    bench = {
        n: q
        for n, q in QUERIES.items()
        if "bench" in q.tags and (not only or n in only)
    }
    # warm first so codegen/first-use jobs don't pollute the counts
    for name, q in sorted(bench.items()):
        q.fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    out = {}
    for name, q in sorted(bench.items()):
        jobs0 = set(tracker.getJobIdsForGroup(None) or [])
        # jobs run outside any group land with group None; easier:
        # snapshot via the REST-free status tracker active/complete
        # ids — use job group isolation instead
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        jids = [j for j in (tracker.getJobIdsForGroup(name) or [])]
        n_stages = 0
        n_tasks = 0
        for j in jids:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numTasks > 0:
                    n_stages += 1
                    n_tasks += si.numTasks
        out[name] = {
            "jobs": len(jids),
            "stages": n_stages,
            "tasks": n_tasks,
            "wall": round(wall, 3),
        }
        print(
            f"# {name}: jobs={len(jids)} stages={n_stages} "
            f"tasks={n_tasks} wall={wall:.2f}s",
            file=sys.stderr,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
