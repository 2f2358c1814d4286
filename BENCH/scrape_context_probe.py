"""Probe for the scrape in-bench elevation (round-5 verdict item 2).

Observed since round 4: scrape_relational/scrape_kernel run 6-7.5 s
inside the full bench but 3.1-3.8 s isolated in the SAME session and
window. GC was ruled out (System.gc A/B), code regression was ruled
out (r4-worktree A/B). This script reproduces the context switch
deterministically and decomposes the elevation:

  phase A: scrape_relational x N, scrape_kernel x N   (pristine session)
  phase B: one bench-shaped crawl leg                 (the suspect context)
  phase C: scrape_relational x N, scrape_kernel x N   (post-crawl)

All in ONE session with the UI enabled, so per-leg stage metrics from
the REST API separate the candidate causes:

  * executorRunTime up, wall up        -> tasks themselves slower
    (page-cache eviction of /tmp parquet, python-worker respawn,
    memory pressure);
  * executorRunTime flat, wall up      -> scheduler/driver gaps
    (listener-bus backlog, ContextCleaner RPCs blocking, broadcast
    cleanup);
  * task count / partition count shift -> a conf the crawl changed and
    failed to restore.

Also samples pyspark.daemon worker count + RSS before/after each
phase (worker churn shows up here) and the /proc page-cache stats.

Usage:  CUPHIC_UI=1 python BENCH/scrape_context_probe.py
Writes: BENCH/scrape_probe_r6.json
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("CUPHIC_UI", "1")

from pyspark.sql import functions as F  # noqa: E402

from cuphic_spark.compiler import compile_pattern, match_nodes  # noqa: E402
from cuphic_spark.frontier.crawl import CrawlConfig, crawl  # noqa: E402
from cuphic_spark.operators.parse import (  # noqa: E402
    pages_to_nodes,
    scrape_pages,
)
from cuphic_spark.session import get_spark  # noqa: E402
from cuphic_spark.sources.pagegen import synth_pages  # noqa: E402

PATTERNS = {
    "links": "[:a {:href href} ???]",
    "term": "[:term {:type term/type} term/name]",
    "p_id": "[:p {:id ?id} ???]",
    "title": "[:title {:id title/id} title/text]",
}
REPS = int(os.environ.get("PROBE_REPS", "3"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def rest(path: str):
    base = "http://localhost:4040/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base, timeout=10))
    return json.load(urllib.request.urlopen(
        f"{base}/{apps[0]['id']}/{path}", timeout=10))


def stage_floor() -> int:
    stages = rest("stages?status=complete")
    return max((s["stageId"] for s in stages), default=-1)


def stage_metrics_since(floor: int) -> dict:
    """Aggregate completed-stage metrics with stageId > floor."""
    stages = [s for s in rest("stages?status=complete")
              if s["stageId"] > floor]
    return {
        "n_stages": len(stages),
        "n_tasks": sum(s["numCompleteTasks"] for s in stages),
        "executor_run_sec": round(
            sum(s["executorRunTime"] for s in stages) / 1000, 3),
        "executor_cpu_sec": round(
            sum(s.get("executorCpuTime", 0) for s in stages) / 1e9, 3),
        "input_mb": round(
            sum(s["inputBytes"] for s in stages) / 2**20, 1),
        "shuffle_rw_mb": round(
            sum(s["shuffleReadBytes"] + s["shuffleWriteBytes"]
                for s in stages) / 2**20, 1),
    }


def worker_state() -> dict:
    out = subprocess.run(
        ["bash", "-c",
         "ps -o rss=,etimes= -C python3 --ppid 1 2>/dev/null; "
         "ps aux | grep -c 'pyspark.daemon' "],
        capture_output=True, text=True).stdout.strip().splitlines()
    daemons = subprocess.run(
        ["bash", "-c",
         "ps -eo rss,cmd | grep 'pyspark.daemon' | grep -v grep"],
        capture_output=True, text=True).stdout.strip().splitlines()
    rss = sum(int(line.split()[0]) for line in daemons if line)
    mem = {}
    with open("/proc/meminfo") as fh:
        for line in fh:
            k, v = line.split(":", 1)
            if k in ("Cached", "MemAvailable", "Dirty"):
                mem[k.lower() + "_mb"] = int(v.split()[0]) // 1024
    return {"py_daemon_procs": len(daemons),
            "py_daemon_rss_mb": rss // 1024, **mem}


def timed_leg(fn) -> tuple[float, dict]:
    floor = stage_floor()
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    m = stage_metrics_since(floor)
    return round(dt, 3), m


def main() -> None:
    spark = get_spark(app_name="scrape-probe", cores=CPUS)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
    spark.conf.set("spark.sql.files.openCostInBytes", str(16 * 1024))

    pages = synth_pages(spark, SF_DIR, 100).repartition(64)
    pages.write.mode("overwrite").parquet("/tmp/probe_pages")
    pages = spark.read.parquet("/tmp/probe_pages")
    compiled = [compile_pattern(k, v) for k, v in PATTERNS.items()]
    pages_to_nodes(pages).write.mode("overwrite").parquet(
        "/tmp/probe_nodes")
    nodes = spark.read.parquet("/tmp/probe_nodes")

    def rel():
        match_nodes(nodes, compiled).groupBy("pattern_key").count().collect()

    def ker():
        scrape_pages(pages, PATTERNS).groupBy("pattern_key").count().collect()

    # conf snapshot helper: catches any crawl-side conf left unrestored
    WATCH = ["spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions",
             "spark.sql.files.maxPartitionBytes",
             "spark.sql.autoBroadcastJoinThreshold"]

    def confs():
        return {k: spark.conf.get(k, None) for k in WATCH}

    out = {"reps": REPS, "cpus": CPUS, "phases": {}}
    rel(); ker()  # warm (codegen, classload, python workers)

    def scrape_phase(tag: str):
        ph = {"workers_before": worker_state(), "conf": confs(),
              "rel": [], "ker": []}
        for _ in range(REPS):
            for name, fn in (("rel", rel), ("ker", ker)):
                dt, m = timed_leg(fn)
                ph[name].append({"wall_sec": dt, **m})
        ph["workers_after"] = worker_state()
        out["phases"][tag] = ph
        print(f"[{tag}] rel={[r['wall_sec'] for r in ph['rel']]} "
              f"ker={[r['wall_sec'] for r in ph['ker']]}", flush=True)

    scrape_phase("A_pristine")

    # phase B: the bench crawl leg, verbatim shape
    crawl_dir = tempfile.mkdtemp(prefix="probe_crawl_")
    cfg = CrawlConfig(universe=1_000_000, n_seeds=200_000,
                      budget_per_host=65536, wave_cap=200_000,
                      n_waves=2, checkpoint_dir=crawl_dir,
                      partitions=max(CPUS, 8))
    dt, m = timed_leg(lambda: crawl(spark, cfg))
    shutil.rmtree(crawl_dir, ignore_errors=True)
    out["phases"]["B_crawl"] = {"wall_sec": dt, **m,
                                "workers_after": worker_state(),
                                "conf": confs()}
    print(f"[B_crawl] {dt}s", flush=True)

    scrape_phase("C_post_crawl")

    # phase D: does it recover after idle / a second crawl-free pass?
    time.sleep(10)
    scrape_phase("D_after_idle")

    with open(os.path.join(os.path.dirname(__file__),
                           "scrape_probe_r6.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print("WROTE BENCH/scrape_probe_r6.json", flush=True)


if __name__ == "__main__":
    main()
