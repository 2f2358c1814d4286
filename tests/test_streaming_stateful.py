"""applyInPandasWithState operator: running per-lang accounting over
a paged stream, state carried across micro-batches."""


def test_stateful_lang_accounting(spark, tmp_path):
    from pyspark.sql import functions as F

    from cuphic_spark.sources.tei import tei_pages
    from cuphic_spark.streaming.pages_stream import read_pages_stream
    from cuphic_spark.streaming.stateful import lang_ingest_accounting

    src = str(tmp_path / "in")
    pages = tei_pages(spark)
    # two langs so two state groups; 4 files -> multiple micro-batches
    pages = pages.withColumn(
        "lang", F.when(F.length("html") % 2 == 0, "da").otherwise("en"))
    pages.repartition(4).write.parquet(src)

    stream = read_pages_stream(spark, src, max_files_per_trigger=1)
    out = lang_ingest_accounting(stream)
    q = (out.writeStream.format("memory").queryName("acct")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "chk"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    # last update per lang == full batch totals (state accumulated
    # correctly across micro-batches)
    rows = spark.sql("""
        SELECT lang, max(n_pages) n_pages, max(total_bytes) total_bytes
        FROM acct GROUP BY lang""").collect()
    got = {r.lang: (r.n_pages, r.total_bytes) for r in rows}
    expected = {r.lang: (r.n, r.b) for r in
                pages.groupBy("lang")
                .agg(F.count("*").alias("n"),
                     F.sum(F.length("html")).alias("b")).collect()}
    assert got == expected


def test_streaming_dedup_exact(spark, tmp_path):
    """Duplicate page content arriving in LATER micro-batches must be
    dropped; distinct content passes. State is watermark-bounded."""
    import datetime
    import os

    from cuphic_spark.sources.tei import PAGES_SCHEMA
    from cuphic_spark.streaming.pages_stream import (
        read_pages_stream,
        run_to_sink,
        streaming_dedup_exact,
    )

    ts = datetime.datetime(2024, 1, 1)
    src = str(tmp_path / "in")
    os.makedirs(src)
    b1 = [("u1", ts, b"<d>alpha</d>", "", "en"),
          ("u2", ts, b"<d>beta</d>", "", "en")]
    b2 = [("u3", ts, b"<d>beta</d>", "", "en"),     # dup content
          ("u4", ts, b"<d>gamma</d>", "", "en")]
    spark.createDataFrame(b1, PAGES_SCHEMA).write.mode("append").parquet(src)
    spark.createDataFrame(b2, PAGES_SCHEMA).write.mode("append").parquet(src)

    stream = read_pages_stream(spark, src, max_files_per_trigger=1)
    out_dir = str(tmp_path / "out")
    q = run_to_sink(streaming_dedup_exact(stream), out_dir,
                    str(tmp_path / "ckpt"), once=True)
    q.awaitTermination(120)
    rows = spark.read.parquet(out_dir).collect()
    contents = sorted(bytes(r.html) for r in rows)
    assert contents == [b"<d>alpha</d>", b"<d>beta</d>", b"<d>gamma</d>"]


def test_streaming_crawl_reproduces_batch(spark, tmp_path):
    """foreachBatch crawl wrapper (round-5 verdict item 5): a
    rate-source-driven streaming query advancing one wave per
    micro-batch must reproduce the batch crawl's fetch_log
    BYTE-IDENTICALLY on the toy universe for 3 waves, and a second
    query over the same checkpoint dir must resume mid-crawl (the
    crawl's lineage markers are the streaming state)."""
    from cuphic_spark.frontier.crawl import (
        CrawlConfig,
        crawl,
        read_fetch_log,
    )
    from cuphic_spark.streaming.crawl_stream import streaming_crawl

    kw = dict(universe=5000, n_seeds=12, budget_per_host=4,
              wave_cap=24)
    bd = str(tmp_path / "batch")
    sd = str(tmp_path / "stream")
    crawl(spark, CrawlConfig(checkpoint_dir=bd, n_waves=3, **kw))

    # first query: two waves only, then stop (mid-crawl shutdown)
    out1 = streaming_crawl(spark,
                           CrawlConfig(checkpoint_dir=sd, n_waves=2,
                                       **kw),
                           timeout_sec=240)
    assert out1["last_wave"] == 1 and out1["waves_run"] == 2
    # second query: resumes from the lineage markers, finishes wave 2
    out2 = streaming_crawl(spark,
                           CrawlConfig(checkpoint_dir=sd, n_waves=3,
                                       **kw),
                           timeout_sec=240)
    assert out2["last_wave"] == 2 and out2["waves_run"] == 1

    b = read_fetch_log(spark, CrawlConfig(checkpoint_dir=bd, **kw)) \
        .orderBy("wave", "rank_in_wave").collect()
    s = read_fetch_log(spark, CrawlConfig(checkpoint_dir=sd, **kw)) \
        .orderBy("wave", "rank_in_wave").collect()
    assert [(r.wave, r.rank_in_wave, r.url, r.bytes) for r in b] == \
        [(r.wave, r.rank_in_wave, r.url, r.bytes) for r in s]


def test_streaming_ingest_dedup_state_across_batches(spark, tmp_path):
    """The explicit-state dedup EMITS a decision per page: content
    seen in an EARLIER micro-batch flags is_new=false (state carried
    via checkpoint), within-batch repeats resolve in arrival order,
    and distinct content stays new. Unlike the watermark variant the
    duplicate rows are still visible downstream."""
    import datetime
    import os

    from cuphic_spark.sources.tei import PAGES_SCHEMA
    from cuphic_spark.streaming.pages_stream import read_pages_stream
    from cuphic_spark.streaming.stateful import streaming_ingest_dedup

    ts = datetime.datetime(2024, 1, 1)
    src = str(tmp_path / "in")
    os.makedirs(src)
    b1 = [("u1", ts, b"<d>alpha</d>", "", "en"),
          ("u2", ts, b"<d>beta</d>", "", "en")]
    b2 = [("u3", ts, b"<d>beta</d>", "", "en"),     # cross-batch dup
          ("u4", ts, b"<d>gamma</d>", "", "en")]
    spark.createDataFrame(b1, PAGES_SCHEMA).write.mode("append") \
        .parquet(src)
    spark.createDataFrame(b2, PAGES_SCHEMA).write.mode("append") \
        .parquet(src)

    stream = read_pages_stream(spark, src, max_files_per_trigger=1)
    out = streaming_ingest_dedup(stream)
    q = (out.writeStream.format("memory").queryName("sdedup")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "chk"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = spark.sql("SELECT url, is_new FROM sdedup").collect()
    got = {r.url: r.is_new for r in rows}
    assert len(got) == 4                       # every page emitted
    assert got["u1"] and got["u2"] and got["u4"]
    assert got["u3"] is False                  # duplicate visible+flagged
