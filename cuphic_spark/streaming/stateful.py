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
