"""Custom stateful streaming operator via applyInPandasWithState.

Running per-language ingest accounting for the page stream: each
group (lang) keeps (n_pages, total_bytes, last_ts_micros) across
micro-batches — the pattern a crawl-rate limiter or per-host
politeness accountant uses when the crawl is driven by a stream
instead of batch waves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_pages long, total_bytes long, last_ts_micros long"
OUTPUT_SCHEMA = T.StructType([
    T.StructField("lang", T.StringType()),
    T.StructField("n_pages", T.LongType()),
    T.StructField("total_bytes", T.LongType()),
    T.StructField("last_ts_micros", T.LongType()),
])


def _account(key, pdfs, state: GroupState):
    import pandas as pd

    if state.exists:
        n, total, last = state.get
    else:
        n, total, last = 0, 0, 0
    for pdf in pdfs:
        n += len(pdf)
        total += int(pdf["nbytes"].sum())
        if len(pdf):
            last = max(last, int(pdf["ts_micros"].max()))
    state.update((n, total, last))
    yield pd.DataFrame({"lang": [key[0]], "n_pages": [n],
                        "total_bytes": [total], "last_ts_micros": [last]})


def lang_ingest_accounting(pages_stream: DataFrame) -> DataFrame:
    """Streaming DF (pages schema) -> running per-lang totals.
    Update-mode output; state persists across micro-batches via the
    checkpoint."""
    prepped = pages_stream.select(
        "lang",
        F.length("html").cast("long").alias("nbytes"),
        F.unix_micros(F.col("warc_ts").cast("timestamp"))
        .alias("ts_micros"))
    return (prepped.groupBy("lang")
            .applyInPandasWithState(
                _account, OUTPUT_SCHEMA, STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))


# ---------------------------------------------------------------------------
# Streaming ingest dedup with explicit cross-batch state — the
# second applyInPandasWithState operator: unlike
# dropDuplicatesWithinWatermark (whose state the engine manages and
# ages out), this keeps an explicit per-shard digest set and EMITS
# the dedup decision per page, so downstream stages can route
# duplicates (count them, divert to a quarantine sink) instead of
# just losing them. Sharding the state by digest prefix bounds each
# group's state row and parallelizes the membership check.
# ---------------------------------------------------------------------------

DEDUP_OUTPUT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("digest", T.StringType()),
    T.StructField("is_new", T.BooleanType()),
])
# state: the shard's known digests, concatenated (32 hex chars each)
DEDUP_STATE_SCHEMA = "digests string"


def _dedup_shard(key, pdfs, state: GroupState):
    import pandas as pd

    known = set()
    if state.exists:
        blob = state.get[0]
        known = {blob[i:i + 32] for i in range(0, len(blob), 32)}
    urls, digs, flags = [], [], []
    for pdf in pdfs:
        for url, dig in zip(pdf["url"], pdf["digest"]):
            fresh = dig not in known
            if fresh:
                known.add(dig)
            urls.append(url)
            digs.append(dig)
            flags.append(fresh)
    state.update(("".join(sorted(known)),))
    yield pd.DataFrame({"url": urls, "digest": digs,
                        "is_new": flags})


def streaming_ingest_dedup(pages_stream: DataFrame,
                           n_shards: int = 16) -> DataFrame:
    """Streaming DF (url, html, ...) -> (url, digest, is_new) in
    append mode: is_new is false for any content digest seen in ANY
    earlier micro-batch (state persists via the checkpoint).
    Duplicates within one batch resolve in arrival order inside the
    shard group. State is sharded by digest prefix — each group
    holds only its slice of the digest set."""
    digest = F.md5(F.col("html"))
    prepped = pages_stream.select(
        "url", digest.alias("digest"),
        (F.conv(F.substring(digest, 1, 2), 16, 10).cast("int")
         % F.lit(n_shards)).alias("shard_id"))
    return (prepped.groupBy("shard_id")
            .applyInPandasWithState(
                _dedup_shard, DEDUP_OUTPUT_SCHEMA, DEDUP_STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))
