"""Golden corpus source: the reference's 12 TEI files as a `pages`
DataFrame (url = "tei://{filename}") — FIXTURES.md §2."""

from __future__ import annotations

import datetime
import pathlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TEI_DIR = pathlib.Path("/root/reference/resources/examples/tei")

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])


def tei_pages(spark: SparkSession,
              goldens_dir: str | pathlib.Path | None = None) -> DataFrame:
    """Load the TEI corpus in the pages shape. If ``goldens_dir`` is
    given, the `text` column carries the committed golden extraction
    (byte-identity target); else empty string."""
    rows = []
    ts = datetime.datetime(2024, 1, 1)
    for i, path in enumerate(sorted(TEI_DIR.glob("*.xml"))):
        golden = ""
        if goldens_dir is not None:
            gp = pathlib.Path(goldens_dir) / "text" / (path.stem + ".txt")
            golden = gp.read_text(encoding="utf-8")
        rows.append((f"tei://{path.name}",
                     ts + datetime.timedelta(seconds=i),
                     path.read_bytes(), golden, "da"))
    return spark.createDataFrame(rows, PAGES_SCHEMA)
