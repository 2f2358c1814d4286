"""Capture .explain('formatted') for the bench queries into
plans/r08/<query>_{before,after}.txt.

Usage: python scripts/capture_r08_plans.py before|after
Uses the bench corpus already materialized at /tmp/cuphic_bench_pages
and /tmp/cuphic_bench_nodes (run bench.py or bench_extra.py first).
"""

from __future__ import annotations

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from cuphic_spark.compiler import compile_pattern, match_nodes  # noqa: E402
from cuphic_spark.operators.dedup import minhash_signature  # noqa: E402
from cuphic_spark.operators.parse import (  # noqa: E402
    pages_extract_text,
    scrape_pages,
)
from cuphic_spark.operators.similarity import (  # noqa: E402
    inner_product_topk_quantized,
)
from cuphic_spark.plans import formatted_plan  # noqa: E402
from cuphic_spark.session import get_spark  # noqa: E402

PATTERNS = {
    "links": "[:a {:href href} ???]",
    "term": "[:term {:type term/type} term/name]",
    "p_id": "[:p {:id ?id} ???]",
    "title": "[:title {:id title/id} title/text]",
}


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    out = REPO / "plans" / "r08"
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="plan-capture", cores=8)
    sf_dir = "/root/testdata/sf0.1"
    pages = spark.read.parquet("/tmp/cuphic_bench_pages")
    nodes = spark.read.parquet("/tmp/cuphic_bench_nodes")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = (emb.where(F.col("vec_id") < 8)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_embedding")))
    compiled = [compile_pattern(k, v) for k, v in PATTERNS.items()]
    page_docs = pages.select(F.xxhash64("url").alias("doc_id"), "text")

    dfs = {
        "extract_text": pages_extract_text(pages),
        "scrape_relational": match_nodes(nodes, compiled),
        "scrape_kernel": scrape_pages(pages, PATTERNS),
        "minhash_pages": minhash_signature(page_docs, k=3, n_hashes=4),
        "ann_topk": inner_product_topk_quantized(emb, queries, k=10),
    }
    for name, df in dfs.items():
        p = out / f"{name}_{tag}.txt"
        p.write_text(formatted_plan(df))
        print(f"wrote {p}")


if __name__ == "__main__":
    main()
