"""Structured Streaming ingest: a pages directory as a stream.

The crawl loop itself is deliberately incremental-batch (SURVEY
§2.G.10 — per-wave global priority re-sort can't be expressed in a
streaming stateful shuffle), but page INGESTION and extraction are
stream-friendly: the same mapInPandas extraction operators run
unchanged under readStream, with watermarked tumbling windows on
warc_ts handling late pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.parse import pages_extract_text
from ..sources.tei import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int = 4) -> DataFrame:
    return (spark.readStream
            .schema(PAGES_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def streaming_extract(pages_stream: DataFrame) -> DataFrame:
    """Extraction under streaming: identical operator, narrow map."""
    return pages_extract_text(pages_stream)


def windowed_page_counts(pages_stream: DataFrame,
                         window: str = "10 minutes",
                         watermark: str = "30 minutes") -> DataFrame:
    """Watermarked tumbling-window page/byte counts by warc_ts —
    late pages beyond the watermark are dropped deterministically."""
    return (pages_stream
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window), F.col("lang"))
            .agg(F.count("*").alias("n_pages"),
                 F.sum(F.length("html")).alias("bytes")))


def run_to_sink(df: DataFrame, out_dir: str, checkpoint_dir: str,
                once: bool = True):
    """Start a file-sink query (append mode). `once=True` drains all
    available input then stops — the testable configuration."""
    writer = (df.writeStream
              .format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_dedup_exact(pages_stream: DataFrame,
                          watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact dedup — the streaming twin of
    ``operators.dedup.exact_dedup_groups``: content-digest keyed
    ``dropDuplicatesWithinWatermark``, so duplicate pages arriving in
    later micro-batches are dropped while the dedup STATE stays
    bounded (digests older than the watermark age out — at crawl
    scale an unbounded exact-dedup state would grow with the whole
    corpus)."""
    return (pages_stream
            .withColumn("digest", F.md5(F.col("html")))
            .withWatermark("warc_ts", watermark)
            .dropDuplicatesWithinWatermark(["digest"]))
