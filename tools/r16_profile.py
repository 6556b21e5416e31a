"""Round-16 optimization profiler: per-query cost breakdown.

For each query name given (default: the bench HEADLINE), measures
separately — on the warmed singleton session, repeat times each:

- t_build : Python-side plan construction (the registry builder call)
- t_exec  : full materialization via .count() (bench methodology)
- jobs/stages: per-job wall time + per-stage task-time totals pulled
  from the Spark REST API (SPARK_UI=true), so the time can be
  attributed to scan / exchange / python stages instead of guessed.

Usage:
    SPARK_UI=true python tools/r16_profile.py [q01_... ...]
Env:
    PROFILE_REPEAT (default 3), SPARK_GRAFT_SF_DIR (default sf0.1)

Output: one JSON line per query with the timings and a stage table,
plus a final summary line. Purely a measurement tool — never touches
query semantics.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_UI", "true")


def _rest(path: str):
    base = "http://localhost:4040/api/v1"
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("PROFILE_REPEAT", "3"))

    from parquet_pipeline_spark import registry
    from parquet_pipeline_spark.session import get_spark, warm_up

    registry.load_all()
    spark = get_spark("r16_profile")
    warm_up(spark)

    import bench

    names = sys.argv[1:] or bench.HEADLINE
    app_id = spark.sparkContext.applicationId
    sc = spark.sparkContext

    for name in names:
        fn = registry.QUERIES[name]
        builds, execs = [], []
        first_jobs = None
        for i in range(repeat):
            sc.setJobDescription(f"profile:{name}#{i}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            jobs_before = {j["jobId"] for j in _rest(f"/applications/{app_id}/jobs")}
            t2 = time.time()
            df.count()
            t3 = time.time()
            builds.append(t1 - t0)
            execs.append(t3 - t2)
            if i == repeat - 1:  # warm run: attribute its jobs/stages
                jobs = [
                    j
                    for j in _rest(f"/applications/{app_id}/jobs")
                    if j["jobId"] not in jobs_before
                ]
                out_jobs = []
                for j in sorted(jobs, key=lambda j: j["jobId"]):
                    out_jobs.append(
                        {
                            "job": j["jobId"],
                            "stages": j.get("stageIds", []),
                            "tasks": j.get("numCompletedTasks"),
                        }
                    )
                first_jobs = out_jobs
        sc.setJobDescription(None)
        # stage table for the whole app is big; fetch per final run
        stages = _rest(f"/applications/{app_id}/stages?status=complete")
        stage_rows = {}
        if first_jobs:
            wanted = {s for j in first_jobs for s in j["stages"]}
            for s in stages:
                if s["stageId"] in wanted:
                    stage_rows[s["stageId"]] = {
                        "name": s["name"].split("\n")[0][:60],
                        "tasks": s["numCompleteTasks"],
                        "exec_ms": s.get("executorRunTime"),
                        "cpu_ms": (s.get("executorCpuTime") or 0) // 1_000_000,
                        "in_mb": round((s.get("inputBytes") or 0) / 1e6, 1),
                        "sh_r_mb": round((s.get("shuffleReadBytes") or 0) / 1e6, 2),
                        "sh_w_mb": round((s.get("shuffleWriteBytes") or 0) / 1e6, 2),
                    }
        print(
            json.dumps(
                {
                    "query": name,
                    "t_build": [round(x, 3) for x in builds],
                    "t_exec": [round(x, 3) for x in execs],
                    "jobs_last_run": first_jobs,
                    "stages_last_run": stage_rows,
                },
                default=str,
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
