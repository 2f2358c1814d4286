"""cProfile the DRIVER during the bench-shaped crawl leg.

The round-8 REST decomposition (prof_crawl_clean.json) shows ~2.5 s
of inter-job driver gap per crawl leg — time when no Spark job runs
and the Python driver is building plans / talking py4j. This probe
attributes that gap: warm mini-crawl first (codegen/classload), then
one bench-shaped leg under cProfile on the main thread (the pool
threads carry only the pipelined writes — their submission cost shows
up here, their Spark time does not).

Usage: python scripts/profile_driver_gap.py [sort] [topn]
"""
from __future__ import annotations

import cProfile
import io
import pstats
import shutil
import sys
import tempfile
import time

from cuphic_spark.frontier.crawl import CrawlConfig, crawl
from cuphic_spark.session import get_spark


def main() -> None:
    sort = sys.argv[1] if len(sys.argv) > 1 else "cumulative"
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    spark = get_spark(app_name="crawl-driver-profile", cores=32)

    warm = tempfile.mkdtemp(prefix="cuphic_dgwarm_")
    crawl(spark, CrawlConfig(universe=10_000, n_seeds=64,
                             budget_per_host=64, wave_cap=64,
                             n_waves=1, checkpoint_dir=warm))
    shutil.rmtree(warm, ignore_errors=True)

    d = tempfile.mkdtemp(prefix="cuphic_dgprof_")
    cfg = CrawlConfig(universe=1_000_000, n_seeds=200_000,
                      budget_per_host=65536, wave_cap=200_000,
                      n_waves=2, checkpoint_dir=d, partitions=32)
    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    crawl(spark, cfg)
    prof.disable()
    wall = time.perf_counter() - t0
    shutil.rmtree(d, ignore_errors=True)

    out = io.StringIO()
    stats = pstats.Stats(prof, stream=out)
    stats.sort_stats(sort).print_stats(topn)
    text = out.getvalue()
    print(f"crawl wall {wall:.2f}s")
    print(text)


if __name__ == "__main__":
    main()
