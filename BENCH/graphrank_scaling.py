"""PageRank scaling evidence (north-rule two-parallelism protocol).

Runs the SAME pagerank job — identical input parquet, identical
shuffle topology (spark.sql.shuffle.partitions=32 at BOTH levels) —
taskset-pinned to 8 and 32 cores, min-of-2 alternating pairs
(32, 8, 32, 8) so a host-window drift hits both levels equally.
Writes one JSON artifact: throughput (edge-traversals/sec per
iteration) at both levels + scaling efficiency.

Usage: python BENCH/graphrank_scaling.py [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

UNIVERSE = int(os.environ.get("CUPHIC_PR_UNIVERSE", 10_000_000))
ITERS = int(os.environ.get("CUPHIC_PR_ITERS", 4))
EDGES_DIR = "/tmp/graphrank_scale_edges"

LEG_CODE = f"""
import json, time
from pyspark.sql import functions as F
from cuphic_spark.session import get_spark
from cuphic_spark.frontier.graphrank import pagerank, synthetic_edges

cpus = {{cpus}}
spark = get_spark(app_name="graphrank-scale", cores=cpus)
spark.conf.set("spark.sql.shuffle.partitions", "32")  # job constant
edges = spark.read.parquet({EDGES_DIR!r})
n_edges = edges.count()
best = float("inf")
for rep in range(2):  # warm + timed
    t0 = time.perf_counter()
    total = (pagerank(edges, {UNIVERSE}, iters={ITERS})
             .agg(F.sum("rank")).collect()[0][0])
    dt = time.perf_counter() - t0
    if rep:
        best = min(best, dt)
print(json.dumps({{{{"cpus": cpus, "sec": round(best, 3),
    "edge_traversals_per_sec": round(n_edges * {ITERS} / best, 1),
    "checksum": total}}}}))
"""


def leg(cpus: int) -> dict:
    argv = ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
            "-c", LEG_CODE.format(cpus=cpus)]
    out = subprocess.run(argv, cwd=str(REPO), capture_output=True,
                         text=True, timeout=1800,
                         env=dict(os.environ))
    if out.returncode:
        raise RuntimeError(f"leg cpus={cpus} failed:\n"
                           + out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 \
        else str(REPO / "BENCH" / "graphrank_scaling.json")
    # materialize the deterministic edge list once, shared by legs
    gen = f"""
from cuphic_spark.session import get_spark
from cuphic_spark.frontier.graphrank import synthetic_edges
spark = get_spark(app_name="graphrank-gen", cores=32)
(synthetic_edges(spark, {UNIVERSE}).repartition(32, "src")
 .write.mode("overwrite").parquet({EDGES_DIR!r}))
"""
    subprocess.run([sys.executable, "-c", gen], cwd=str(REPO),
                   check=True, capture_output=True, text=True,
                   timeout=900)
    legs = []
    for cpus in (32, 8, 32, 8):  # alternating pairs
        r = leg(cpus)
        legs.append(r)
        print(json.dumps(r), flush=True)
    by = {}
    for r in legs:
        c = r["cpus"]
        if c not in by or r["sec"] < by[c]["sec"]:
            by[c] = r
    assert len({r["checksum"] for r in legs}) == 1, \
        "rank checksum differs across legs — determinism broken"
    speedup = by[8]["sec"] / by[32]["sec"]
    result = {
        "metric": "pagerank edge-traversals/sec, min-of-2 pairs",
        "universe": UNIVERSE, "iters": ITERS,
        "shuffle_partitions": 32,
        "legs": legs,
        "local8": by[8], "local32": by[32],
        "speedup_8_to_32": round(speedup, 3),
        "efficiency_vs_4x": round(speedup / 4, 3),
        "checksum": by[8]["checksum"],
    }
    Path(out_path).write_text(json.dumps(result, indent=1))
    print(json.dumps({"speedup": result["speedup_8_to_32"],
                      "efficiency": result["efficiency_vs_4x"]}))


if __name__ == "__main__":
    main()
