"""Measure the schedule-phase ranking shapes on a bench-shaped
frontier (guide §1): full (host, den) row_number window vs
budget-aware split (rank only hosts whose eligible count exceeds
their budget).

Usage: PYTHONPATH=. python scripts/profile_rank_shapes.py
"""
from __future__ import annotations

import os
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from cuphic_spark.session import get_spark


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="rank-profile", cores=cpus)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    n = 242_000
    budget = 65_536
    frontier = (spark.range(n).selectExpr(
        "concat('https://host', case when id % 3 = 0 then 0 else id % 10 "
        "end, '.example/doc/', id) as url",
        "concat('host', case when id % 3 = 0 then 0 else id % 10 end, "
        "'.example') as host",
        "cast(1 as int) as depth",
        "cast(9000 + id % 7 as long) as score",
        "cast(id % 23 = 0 as boolean) as den")
        .withColumn("host_budget", F.lit(budget))).cache()
    frontier.count()

    def timed(name, fn, reps=3):
        fn()
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            times.append(round(time.perf_counter() - t0, 3))
        print(name, times, flush=True)

    w_host = Window.partitionBy("host", "den").orderBy(
        F.desc("score"), F.asc("url"))

    def full_window():
        ranked = frontier.withColumn(
            "host_rank", F.row_number().over(w_host))
        return (ranked
                .where(F.col("den")
                       | (F.col("host_rank") <= F.col("host_budget")))
                .groupBy("den", "score").agg(F.count("*").alias("cnt"))
                .collect())

    def split():
        hcnt = (frontier.where(~F.col("den"))
                .groupBy("host", "host_budget")
                .agg(F.count("*").alias("n_elig")))
        over = hcnt.where(F.col("n_elig") > F.col("host_budget")) \
            .select("host")
        base = frontier.join(
            F.broadcast(over.withColumn("__over", F.lit(True))),
            "host", "left")
        w = Window.partitionBy("host").orderBy(
            F.desc("score"), F.asc("url"))
        ranked_part = (base.where(~F.col("den") & F.col("__over"))
                       .withColumn("host_rank", F.row_number().over(w)))
        budgeted = (base.where(~F.col("den") & F.col("__over").isNull())
                    .unionByName(
                        ranked_part
                        .where(F.col("host_rank")
                               <= F.col("host_budget"))
                        .drop("host_rank")))
        stats = (frontier.where(F.col("den"))
                 .select("den", "score")
                 .unionByName(budgeted.select("den", "score"))
                 .groupBy("den", "score").agg(F.count("*").alias("cnt"))
                 .collect())
        return stats

    a = timed("full_window", full_window)
    b = timed("split", split)
    ref = {(r.den, r.score): r.cnt for r in full_window()}
    got = {(r.den, r.score): r.cnt for r in split()}
    print("identical:", ref == got)


if __name__ == "__main__":
    main()
