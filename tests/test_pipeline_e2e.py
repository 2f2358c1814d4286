"""The whole product in one test: crawl → extract → text stats →
near-dup → embedding ANN, chained through the REAL operator
surfaces the way a training-data pipeline would run them.

Each stage is individually oracled elsewhere; this test pins the
COMPOSITION — schemas line up, row-set invariants hold across stage
boundaries, and planted signal (a duplicated page) survives the
whole chain. sf0.001 keeps it seconds-fast.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F


def test_crawl_to_training_data_pipeline(spark, tmp_path):
    from cuphic_spark.frontier.crawl import (
        CrawlConfig,
        crawl,
        read_fetch_log,
    )
    from cuphic_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from cuphic_spark.operators.parse import pages_extract_text
    from cuphic_spark.operators.similarity import cosine_topk
    from cuphic_spark.operators.textstats import quality_score, token_count
    from cuphic_spark.frontier import webgraph

    # ---- stage 1: crawl (2 waves over the deterministic graph) ----
    d = str(tmp_path / "pipeline_crawl")
    cfg = CrawlConfig(universe=5000, n_seeds=12, budget_per_host=4,
                      wave_cap=24, n_waves=2, checkpoint_dir=d)
    summary = crawl(spark, cfg)
    log = read_fetch_log(spark, cfg)
    n_fetched = log.count()
    assert n_fetched == sum(m["scheduled"] for m in summary["metrics"])

    # ---- stage 2: re-fetch + extract text for the crawled urls ----
    # (the crawl's fused stage extracts links; a training pipeline
    # re-extracts TEXT from the stored bodies — same simulator here)
    def refetch(batches):
        import pandas as pd

        for pdf in batches:
            pdf = pdf.copy()
            pdf["html"] = [
                webgraph.gen_html(u, cfg.universe, cfg.page_weight,
                                  cfg.n_hosts).encode()
                for u in pdf["url"]]
            yield pdf[["url", "html"]]

    pages = (log.select("url")
             .mapInPandas(refetch, "url string, html binary"))
    docs = (pages_extract_text(pages)
            .select(F.xxhash64("url").alias("doc_id"), "url", "text"))
    assert docs.count() == n_fetched          # no page dropped
    assert docs.where(F.length("text") < 1).count() == 0

    # ---- stage 3: text statistics over the extracted corpus ----
    stats = (token_count(docs)
             .join(quality_score(docs), "doc_id"))
    assert stats.count() == n_fetched
    row = stats.agg(F.min("n_tokens"), F.max("n_chars_actual")).first()
    assert row[0] > 0 and row[1] > 0

    # ---- stage 4: near-dup detection with a PLANTED duplicate ----
    # every page body is unique by construction, so the only LSH
    # pair that verifies at high Jaccard is the one we plant
    first = docs.orderBy("url").limit(1).select(
        (F.col("doc_id") + 1).alias("doc_id"), "url", "text")
    corpus = docs.unionByName(first).select("doc_id", "text")
    pairs = ngram_jaccard_pairs(
        corpus, minhash_lsh_pairs(corpus, k=3, n_hashes=8,
                                  band_size=2))
    exact = pairs.where(F.col("jaccard_milli") == 1000)
    assert exact.count() == 1                 # the planted dup, only

    # ---- stage 5: embedding ANN over deterministic embeddings ----
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = (emb.where(F.col("vec_id") < 2)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_embedding")))
    top = cosine_topk(emb, q, k=3)
    got = top.groupBy("query_id").count().collect()
    assert {r["count"] for r in got} == {3}

    # ---- stage 6: the round-7 cleaning chain over the same corpus
    # (mojibake repair → line dedup → quality/script/diversity
    # flags → document filter), composed the way a production
    # cleaning pass runs: each stage consumes the previous stage's
    # exact output schema.
    from cuphic_spark.operators.dedup import line_dedup
    from cuphic_spark.operators.webclean import (
        doc_filter_flags,
        fix_mojibake,
        ngram_diversity,
        script_detect,
    )

    moji = "é".encode("utf-8").decode("windows-1252")
    damaged = docs.select(
        "doc_id",
        F.concat(F.lit("caf" + moji + " "), "text").alias("text"))
    repaired = fix_mojibake(damaged)
    assert repaired.where(~F.col("mojibake_found")).count() == 0
    # every repaired text startswith the fixed prefix
    assert repaired.where(
        ~F.col("repaired").startswith("café ")).count() == 0

    # line shape: body on line 1, a SHARED footer line on line 2 —
    # line_dedup must keep the footer exactly once corpus-wide
    lined = repaired.select(
        "doc_id",
        F.concat(F.col("repaired"),
                 F.lit("\nshared footer line")).alias("text"))
    deduped = line_dedup(lined, min_chars=4)
    n_docs = repaired.count()
    assert deduped.count() == n_docs
    kept_footers = deduped.where(
        F.col("text").contains("shared footer line")).count()
    assert kept_footers == 1                  # first occurrence only
    assert (deduped.agg(F.sum("n_dropped")).first()[0]
            == n_docs - 1)

    flags = (deduped
             .join(script_detect(deduped), "doc_id")
             .join(ngram_diversity(deduped), "doc_id")
             .join(doc_filter_flags(
                 deduped.withColumn("source", F.lit("src0"))),
                 "doc_id"))
    assert flags.count() == n_docs
    # the corpus is latin webgraph text with no badwords: everything
    # passes the filter and scripts as latin
    assert flags.where(~F.col("keep")).count() == 0
    assert flags.where(F.col("script") != "latin").count() == 0
    assert flags.where(F.col("diversity_permille") <= 0).count() == 0

    # ---- stage 7: link-graph analytics off the CRAWLED pages —
    # edges from the kernel anchor pattern over the refetched html
    # (target id recovered from the canonical /doc/<id> path, which
    # survives source-host relative resolution), warm-start PageRank
    # seeded from a cold half-solve, host authority off the result.
    from cuphic_spark.compiler import compile_pattern, match_nodes
    from cuphic_spark.frontier.graphrank import (
        host_authority,
        pagerank,
    )
    from cuphic_spark.operators.parse import pages_to_nodes

    nodes = pages_to_nodes(pages)
    m = match_nodes(nodes, [compile_pattern(
        "anchors", "[:a {:href href} anchor]")])
    edges = (m.select(
        F.regexp_extract("url", r"/doc/(\d+)$", 1)
        .cast("long").alias("src"),
        F.regexp_extract(F.element_at("bindings", "href"),
                         r"/doc/(\d+)", 1).cast("long").alias("dst"))
        .where(F.col("dst").isNotNull()))
    n_edges = edges.count()
    # every crawled page's links are recovered exactly (webgraph
    # closed form: page i emits (i*7+3)%6 anchors)
    exp_edges = sum(
        webgraph.n_links(webgraph.id_of_url(r.url))
        for r in log.select("url").collect())
    assert n_edges == exp_edges

    cold3 = pagerank(edges, cfg.universe, iters=3)
    ranks = pagerank(edges, cfg.universe, iters=2, init_ranks=cold3)
    auth = host_authority(ranks)
    # mass conservation within floor loss, and host 0 (the i%3==0
    # absorber) holds the most pages
    total = ranks.agg(F.sum("rank")).first()[0]
    assert cfg.universe * 10**9 * 0.98 < total <= cfg.universe * 10**9
    top_host = auth.orderBy(F.desc("n_pages")).first()
    assert top_host.host == 0

    shutil.rmtree(d, ignore_errors=True)
