"""Profile the bench-shaped crawl leg job-by-job via the REST API.

Runs the bench.py crawl section shape (warm mini-crawl, then one timed
leg) with the UI enabled, then dumps every Spark job's duration +
description sorted by cost, plus the inter-job driver gap — guide §1
(measure first) applied to the crawl's wave loop.

Usage: CUPHIC_UI=1 python scripts/profile_crawl_jobs.py
"""
from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
import urllib.request
from datetime import datetime

os.environ.setdefault("CUPHIC_UI", "1")

from cuphic_spark.frontier.crawl import CrawlConfig, crawl  # noqa: E402
from cuphic_spark.session import get_spark  # noqa: E402


def jobs_snapshot():
    base = "http://localhost:4040/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base, timeout=10))
    app = apps[0]["id"]
    return json.load(urllib.request.urlopen(f"{base}/{app}/jobs?limit=1000",
                                            timeout=10))


def stages_snapshot():
    base = "http://localhost:4040/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base, timeout=10))
    app = apps[0]["id"]
    return json.load(urllib.request.urlopen(
        f"{base}/{app}/stages?status=complete", timeout=20))


def ts(x):
    return datetime.strptime(
        x.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z").timestamp()


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="crawl-profile", cores=cpus)

    warm = tempfile.mkdtemp(prefix="cuphic_profwarm_")
    crawl(spark, CrawlConfig(universe=10_000, n_seeds=64,
                             budget_per_host=64, wave_cap=64,
                             n_waves=1, checkpoint_dir=warm))
    shutil.rmtree(warm, ignore_errors=True)

    before = {j["jobId"] for j in jobs_snapshot()}
    d = tempfile.mkdtemp(prefix="cuphic_profcrawl_")
    cfg = CrawlConfig(universe=1_000_000, n_seeds=200_000,
                      budget_per_host=65536, wave_cap=200_000,
                      n_waves=2, checkpoint_dir=d,
                      partitions=max(cpus, 8))
    t0 = time.perf_counter()
    summary = crawl(spark, cfg)
    wall = time.perf_counter() - t0
    after = jobs_snapshot()
    new_job_ids = {j["jobId"] for j in after} - before
    stage_to_job = {}
    for j in after:
        if j["jobId"] in new_job_ids:
            for sid in j.get("stageIds", []):
                stage_to_job.setdefault(sid, []).append(j["jobId"])
    stages = []
    for s in stages_snapshot():
        if s["stageId"] not in stage_to_job:
            continue
        stages.append({
            "stage": s["stageId"],
            "jobs": stage_to_job[s["stageId"]],
            "tasks": s.get("numCompleteTasks"),
            "runTime_s": round(s.get("executorRunTime", 0) / 1000, 2),
            "cpuTime_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
            "shuffle_read_mb": round(
                s.get("shuffleReadBytes", 0) / 1e6, 1),
            "shuffle_write_mb": round(
                s.get("shuffleWriteBytes", 0) / 1e6, 1),
            "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
            "output_mb": round(s.get("outputBytes", 0) / 1e6, 1),
            "name": s.get("name", "")[:160],
        })
    stages.sort(key=lambda s: -s["runTime_s"])
    shutil.rmtree(d, ignore_errors=True)

    new = [j for j in after if j["jobId"] not in before
           and "completionTime" in j]
    rows = []
    for j in new:
        s0, e0 = ts(j["submissionTime"]), ts(j["completionTime"])
        rows.append({
            "id": j["jobId"], "dur": round(e0 - s0, 3),
            "sub": round(s0, 3), "end": round(e0, 3),
            "name": (j.get("description") or j.get("name", ""))[:140],
            "tasks": j.get("numTasks"),
        })
    rows.sort(key=lambda r: r["sub"])
    ivs = sorted((r["sub"], r["end"]) for r in rows)
    busy, cur_s, cur_e = 0.0, None, None
    for s0, e0 in ivs:
        if cur_e is None or s0 > cur_e:
            if cur_e is not None:
                busy += cur_e - cur_s
            cur_s, cur_e = s0, e0
        else:
            cur_e = max(cur_e, e0)
    if cur_e is not None:
        busy += cur_e - cur_s
    print(json.dumps({"wall": round(wall, 3),
                      "jobs_busy_union": round(busy, 3),
                      "driver_gap": round(wall - busy, 3),
                      "n_jobs": len(rows),
                      "timings": summary["timings"],
                      "jobs": rows, "stages": stages}, indent=1))


if __name__ == "__main__":
    main()
