"""Isolate the crawl's fetch+link chain shapes (guide §1.4).

Times, over a 200k-url scheduled set shaped like a bench wave:
  A. fetch_extract -> noop                 (the Python stage floor)
  B. fetch_extract.cache() materialize     (stage + block-manager cost)
  C. links explode+canonicalize+distinct -> noop (from cached fetch)
  D. fetch -> parquet write, read back, distinct -> noop
     (materialize-instead-of-cache alternative)

Usage: PYTHONPATH=. python scripts/profile_fetch_chain.py [A B C D]
"""
from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

from cuphic_spark.frontier import webgraph
from cuphic_spark.frontier.crawl import _fetch_extract
from cuphic_spark.frontier.urlnorm import canonicalize_cols
from cuphic_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    which = set(sys.argv[1:]) or {"A", "B", "C", "D"}
    spark = get_spark(app_name="fetch-chain-profile", cores=cpus)
    n = 200_000
    universe = 1_000_000
    scheduled = (spark.range(n)
                 .select(F.col("id").cast("long").alias("uid"))
                 .selectExpr(
                     "concat('https://host', "
                     "case when uid % 3 = 0 then 0 else uid % 10 end, "
                     "'.example', case when uid % 11 = 0 "
                     "then concat('/private/doc/', uid) "
                     "else concat('/doc/', uid) end) as url",
                     "cast(uid % 10 as int) as host_ix")
                 .withColumn("host", F.lit("h"))
                 .withColumn("score", F.lit(1000))
                 .withColumn("depth", F.lit(0))
                 .withColumn("rank_in_wave", F.lit(1))
                 .repartition(cpus, "url"))
    scheduled.cache().count()

    def timed(name, fn, reps=2):
        fn()
        for r in range(reps):
            t0 = time.perf_counter()
            fn()
            print(f"{name} leg{r}: {time.perf_counter()-t0:.3f}s",
                  flush=True)

    if "A" in which:
        timed("A fetch->noop", lambda: noop(
            _fetch_extract(scheduled, universe)))
    if "B" in which:
        def run_b():
            f = _fetch_extract(scheduled, universe).cache()
            f.count()
            f.unpersist()
        timed("B fetch->cache.count", run_b)
    if "C" in which:
        f = _fetch_extract(scheduled, universe).cache()
        f.count()

        def run_c():
            links = f.select(F.col("url").alias("base_url"),
                             F.explode("hrefs").alias("href"))
            canon = links.select(canonicalize_cols(
                F.col("href"), F.col("base_url")).alias("url"))
            noop(canon.groupBy("url").agg(F.count("*").alias("n_refs")))
        timed("C links-distinct from cache", run_c)
        f.unpersist()
    if "D" in which:
        def run_d():
            _fetch_extract(scheduled, universe).write.mode(
                "overwrite").parquet("/tmp/cuphic_fetch_probe")
            f2 = spark.read.parquet("/tmp/cuphic_fetch_probe")
            links = f2.select(F.col("url").alias("base_url"),
                              F.explode("hrefs").alias("href"))
            canon = links.select(canonicalize_cols(
                F.col("href"), F.col("base_url")).alias("url"))
            noop(canon.groupBy("url").agg(F.count("*").alias("n_refs")))
        timed("D parquet roundtrip + distinct", run_d)


if __name__ == "__main__":
    main()
