"""Extra benchmarks for the optimization round — guide §1.4 noop-sink
isolation per section, plus plan capture. bench.py is FROZEN for the
driver's measurement; everything exploratory lives here.

Usage:
  python bench_extra.py [section ...]      # default: all sections
Env (same contract as bench.py):
  SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS   (default 32)
  CUPHIC_XREPS       timed reps per section (default 2)

Prints one JSON line {"sections": {name: [sec, ...]}, ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from cuphic_spark.compiler import compile_pattern, match_nodes
from cuphic_spark.frontier.crawl import CrawlConfig, crawl
from cuphic_spark.operators.dedup import minhash_signature
from cuphic_spark.operators.parse import (
    pages_extract_text,
    pages_to_nodes,
    scrape_pages,
)
from cuphic_spark.operators.similarity import inner_product_topk_quantized
from cuphic_spark.session import get_spark
from cuphic_spark.sources.pagegen import synth_pages

PATTERNS = {
    "links": "[:a {:href href} ???]",
    "term": "[:term {:type term/type} term/name]",
    "p_id": "[:p {:id ?id} ???]",
    "title": "[:title {:id title/id} title/text]",
}


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    copies = int(os.environ.get("CUPHIC_BENCH_COPIES", "100"))
    reps = int(os.environ.get("CUPHIC_XREPS", "2"))
    want = set(sys.argv[1:])

    spark = get_spark(app_name="cuphic-bench-extra", cores=cpus)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
    spark.conf.set("spark.sql.files.openCostInBytes", str(16 * 1024))

    pages = synth_pages(spark, sf_dir, copies).repartition(64)
    pages.write.mode("overwrite").parquet("/tmp/cuphic_bench_pages")
    pages = spark.read.parquet("/tmp/cuphic_bench_pages")
    n_pages = pages.count()

    compiled = [compile_pattern(k, v) for k, v in PATTERNS.items()]
    if not os.path.isdir("/tmp/cuphic_bench_nodes") or "nodes" in want:
        pages_to_nodes(pages).write.mode("overwrite").parquet(
            "/tmp/cuphic_bench_nodes")
    nodes = spark.read.parquet("/tmp/cuphic_bench_nodes")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = (emb.where(F.col("vec_id") < 8)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_embedding")))
    page_docs = pages.select(F.xxhash64("url").alias("doc_id"), "text")

    def crawl_leg():
        crawl_dir = tempfile.mkdtemp(prefix="cuphic_x_crawl_")
        cfg = CrawlConfig(universe=1_000_000, n_seeds=200000,
                          budget_per_host=65536, wave_cap=200000,
                          n_waves=2, checkpoint_dir=crawl_dir,
                          partitions=max(cpus, 8))
        crawl(spark, cfg)
        shutil.rmtree(crawl_dir, ignore_errors=True)

    sections = {
        # noop-isolated full-column computations (guide §1.4)
        "extract_text": lambda: noop(pages_extract_text(pages)),
        "scrape_relational": lambda: noop(match_nodes(nodes, compiled)),
        "scrape_kernel": lambda: noop(scrape_pages(pages, PATTERNS)),
        "minhash_pages": lambda: noop(
            minhash_signature(page_docs, k=3, n_hashes=4)),
        "ann_topk": lambda: noop(
            inner_product_topk_quantized(emb, queries, k=10)),
        "crawl": crawl_leg,
    }
    out: dict[str, list[float]] = {}
    for name, fn in sections.items():
        if want and name not in want:
            continue
        spark.sparkContext.setJobDescription(f"xbench:{name}")
        fn()  # warm
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            out.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sections": out, "n_pages": n_pages,
                      "cpus": cpus, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
