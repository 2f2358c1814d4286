"""URL-seen set: broadcast bloom pre-filter + partitioned cuckoo
filters + exact anti-join.

Correctness contract: the FILTERS only prune (false positives allowed,
false negatives impossible); exactness always comes from the
``left_anti`` join against the seen table. That keeps results
identical at any parallelism level — the crux of matching crawl
ordering at local[8] vs local[32] (SURVEY §7.4).

Scale design (10^10 urls):

* the seen table is parquet partitioned by ``pmod(xxhash64(host), P)``;
  the exact check has two physical strategies (``_anti_seen``): a
  plain shuffle anti-join, or a broadcast semi/anti two-phase where
  the seen table only STREAMS — the steady-state choice once seen
  dwarfs a wave's candidates;
* the broadcast bloom is FIXED SIZE (default 2^22 bits = 512 KiB):
  built distributedly as per-partition bitmaps (tree-merged, driver
  cost bounded by 8·m/8 bytes) and maintained INCREMENTALLY by
  OR-ing each wave's delta; at extreme scale it saturates toward
  no-op pruning but never breaks correctness;
* cuckoo shards give per-partition ~8 bits/key membership with
  deletions (needed when a frontier partition is re-scored); bucket
  counts are powers of two so the xor-fold alternate bucket is an
  involution (a non-involutive fold silently loses evicted
  fingerprints — round-1 advisor finding); stored as parquet
  alongside the seen snapshot.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark import AccumulatorParam
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOOM_BITS_DEFAULT = 1 << 22
_K_HASHES = 3


def _bit_indices(urls_hash: "pd.Series", m: int) -> np.ndarray:
    # xxhash64 is a signed long column; reinterpret, don't range-cast
    h = urls_hash.to_numpy(dtype=np.int64).view(np.uint64)
    idx = np.empty((len(h), _K_HASHES), dtype=np.int64)
    for k in range(_K_HASHES):
        salt = np.uint64((0x9E3779B97F4A7C15 * (k + 1)) % (1 << 64))
        with np.errstate(over="ignore"):
            idx[:, k] = ((h * np.uint64(2 * k + 1) + salt)
                         % np.uint64(m)).astype(np.int64)
    return idx


def _set_bits(arr: np.ndarray, h: "pd.Series", m: int) -> None:
    idx = _bit_indices(h, m).reshape(-1)
    np.bitwise_or.at(arr, idx // 8, (1 << (idx % 8)).astype(np.uint8))


def bloom_merge_urls(urls: DataFrame, m: int = BLOOM_BITS_DEFAULT,
                     base: bytes | None = None,
                     max_parts: int | None = None) -> bytes:
    """Fold a url set into a bloom bitmap, DISTRIBUTEDLY.

    Each partition builds its own fixed-size uint8 bitmap (Arrow
    batches, no per-row Python); partial bitmaps are OR-merged down to
    <= 8 rows executor-side before the driver touches anything, so the
    driver cost is bounded by 8 * m/8 bytes — independent of |urls| and
    of the partition count (the round-1 implementation collected the
    DISTINCT bit set, O(min(|urls|*k, m)) rows through the driver).

    ``base`` OR-merges into an existing bitmap — the crawl maintains
    its bloom INCREMENTALLY (seed once, fold each wave's delta), never
    re-scanning the full seen table per wave.

    ``max_parts`` (round 8) coalesces the input first (narrow, no
    shuffle): every partition allocates and sends an m/8-byte partial
    bitmap, so folding a SMALL url set (a wave's delta, often cached
    in 100+ tiny partitions) at a large m pays partitions x m/8 of
    allocation+merge for rows that fit in a handful of tasks. Callers
    folding big tables (build_bloom over a full seen set) leave it
    None to keep full scan parallelism.
    """
    nbytes = m // 8 + 1
    if max_parts is not None and urls.rdd.getNumPartitions() > max_parts:
        urls = urls.coalesce(max_parts)

    def to_bitmap(batches):
        arr = np.zeros(nbytes, dtype=np.uint8)
        n = 0
        for pdf in batches:
            if len(pdf):
                _set_bits(arr, pdf["h"], m)
                n += len(pdf)
        if n:
            yield pd.DataFrame({"bitmap": [arr.tobytes()]})

    def or_merge(batches):
        arr = np.zeros(nbytes, dtype=np.uint8)
        n = 0
        for pdf in batches:
            for blob in pdf["bitmap"]:
                arr |= np.frombuffer(bytes(blob), dtype=np.uint8)
                n += 1
        if n:
            yield pd.DataFrame({"bitmap": [arr.tobytes()]})

    parts = (urls.select(F.xxhash64("url").alias("h"))
             .mapInPandas(to_bitmap, "bitmap binary"))
    # tree-merge only pays when there are MANY partial bitmaps (the
    # extra stage + shuffle costs ~0.5s of job latency); below 64
    # partitions the driver ORs them directly
    n_parts = urls.rdd.getNumPartitions()
    if n_parts > 64:
        parts = parts.repartition(8).mapInPandas(or_merge, "bitmap binary")
    rows = parts.collect()
    out = (np.frombuffer(base, dtype=np.uint8).copy() if base is not None
           else np.zeros(nbytes, dtype=np.uint8))
    for r in rows:
        out |= np.frombuffer(bytes(r.bitmap), dtype=np.uint8)
    return out.tobytes()


def bloom_popcount(bloom: bytes) -> int:
    """Number of set bits — the saturation signal. A fixed-size bloom
    silently degrades: beyond ~m/10 keys (k=3) the false-positive
    rate climbs toward 1 and the pre-filter becomes a no-op (still
    CORRECT — filters only prune — but every candidate then pays the
    anti-join). Driver-side numpy over <= a few MiB."""
    return int(np.unpackbits(np.frombuffer(bloom, dtype=np.uint8)).sum())


def bloom_est_fp(popcount: int, m: int) -> float:
    """Estimated false-positive rate from the observed fill fraction:
    a probe hits iff all k bits are set, so fp ≈ (popcount/m)^k.
    Pure function of two ints — the oracle twin computes the
    identical float."""
    return (popcount / m) ** _K_HASHES


class _ListParam(AccumulatorParam):
    def zero(self, value):
        return []

    def addInPlace(self, a, b):
        a.extend(b)
        return a


class BloomUpdateAccumulator:
    """Fold bloom maintenance INTO the seen-delta write (one pass):
    tasks accumulate their delta's bit positions while the rows
    stream to parquet — the separate per-wave bloom job disappears.

    Each task contributes ONE update — either its raw position
    arrays (small deltas) or a pre-folded partial bitmap (when the
    positions would outweigh m/8 bytes) — so the driver-bound update
    volume per wave is min(24·|delta_rows_in_task|, m/8) per task
    (accumulating per Arrow BATCH instead would make the bitmap
    fallback unreachable — batches are always small — and ship
    24 bytes/url unconditionally: GBs at 10^8-url waves). OR-ing
    bitmaps is IDEMPOTENT, so task retries/speculation can only
    re-set the same bits — the merged bitmap is exact even when
    accumulator updates are delivered more than once (unlike
    counting accumulators).
    """

    def __init__(self, spark, m: int):
        self.m = m
        self.acc = spark.sparkContext.accumulator([], _ListParam())

    def positions(self, h: "pd.Series") -> np.ndarray:
        """Executor-side: one batch's bit positions (no send)."""
        return _bit_indices(h, self.m).reshape(-1).astype(np.int64)

    def add_positions(self, chunks: list) -> None:
        """Executor-side, once per TASK: send the task's accumulated
        position chunks — as positions if small, else folded into a
        single partial bitmap."""
        if not chunks:
            return
        nbytes = self.m // 8 + 1
        total = sum(c.nbytes for c in chunks)
        if total < nbytes:
            self.acc.add([("pos", c.tobytes()) for c in chunks])
        else:
            arr = np.zeros(nbytes, dtype=np.uint8)
            for idx in chunks:
                np.bitwise_or.at(arr, idx // 8,
                                 (1 << (idx % 8)).astype(np.uint8))
            self.acc.add([("bmp", arr.tobytes())])

    def merged(self, base: bytes | None = None) -> bytes:
        """Driver-side: fold the accumulated updates into ``base``."""
        nbytes = self.m // 8 + 1
        out = (np.frombuffer(base, dtype=np.uint8).copy()
               if base is not None else np.zeros(nbytes, dtype=np.uint8))
        for kind, blob in self.acc.value:
            if kind == "bmp":
                out |= np.frombuffer(blob, dtype=np.uint8)
            else:
                idx = np.frombuffer(blob, dtype=np.int64)
                np.bitwise_or.at(out, idx // 8,
                                 (1 << (idx % 8)).astype(np.uint8))
        return out.tobytes()


def build_bloom(seen: DataFrame, m: int = BLOOM_BITS_DEFAULT) -> bytes:
    """Full bloom build over a seen table (first activation / resume
    without a persisted bitmap). Per-wave maintenance should use
    ``bloom_merge_urls(delta, m, base=prev)`` instead."""
    return bloom_merge_urls(seen.select("url"), m)


def bloom_maybe_seen(candidates: DataFrame, bloom: bytes,
                     m: int = BLOOM_BITS_DEFAULT) -> DataFrame:
    """Adds boolean ``maybe_seen``: False = definitely new (bloom
    negative), True = must confirm via anti-join."""
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(bloom)

    @F.pandas_udf(T.BooleanType())
    def probe(h: pd.Series) -> pd.Series:
        arr = np.frombuffer(bc.value, dtype=np.uint8)
        idx = _bit_indices(h, m)
        hit = np.ones(len(h), dtype=bool)
        for k in range(_K_HASHES):
            b = idx[:, k]
            hit &= (arr[b // 8] >> (b % 8).astype(np.uint8) & 1).astype(bool)
        return pd.Series(hit)

    return candidates.withColumn("maybe_seen", probe(F.xxhash64("url")))


def _anti_seen(candidates: DataFrame, seen: DataFrame,
               strategy: str) -> DataFrame:
    """The exact membership check, three physical strategies:

    * ``shuffle`` — plain left_anti: BOTH sides shuffle on url. Right
      when seen and candidates are comparable in size.
    * ``broadcast`` — two-phase semi/anti: ``hits`` = seen ⋉
      broadcast(candidates) (the seen table only STREAMS through a
      map-side broadcast hash join — no shuffle, no sort of 10^10
      rows), then candidates ⟕̸ broadcast(hits). Right when seen
      dwarfs the wave's candidates (the steady-state crawl); driver
      memory is bounded by the candidate set, which bloom+cuckoo
      pruning keeps small — the crawl enforces a hard candidate
      ceiling (CrawlConfig.broadcast_max_candidates) via the previous
      wave's links_distinct and falls back to shuffle above it.
    * ``pruned`` — the caller already replaced ``seen`` with a
      partition-pruned read (``prune_seen_paths``: only the seen
      files whose part range intersects the candidates' partition
      ids); the join itself is a plain left_anti over that shrunken
      side, which AQE is free to broadcast. Right when dupes dominate
      candidates AND candidates cluster in few host partitions.
    Results are identical; the crawl pins this at test scale.
    """
    if strategy == "broadcast":
        hits = seen.select("url").join(
            F.broadcast(candidates.select("url")), "url", "left_semi")
        return candidates.join(F.broadcast(hits), "url", "left_anti")
    return candidates.join(seen.select("url"), "url", "left_anti")


SEEN_FILE_SCHEMA = "url string, added_wave int, host string, part int"


def candidate_parts(candidates: DataFrame, n_partitions: int) -> list[int]:
    """Distinct seen-partition ids hit by a candidate url set — at
    most ``n_partitions`` rows through the driver (the partition id is
    a pure function of host, identical to the one baked into seen
    writes by crawl._partitioned_write)."""
    rows = (candidates
            .select(_partition_of(F.col("url"), n_partitions).alias("p"))
            .distinct().collect())
    return sorted(int(r.p) for r in rows)


def select_seen_files(seen_paths: list[str], parts: list[int],
                      with_stats: bool = False):
    """File-level pruning via parquet FOOTER stats (pyarrow, metadata-
    only — no row IO): keep a file iff at least one of its row groups
    has a ``part`` min/max range intersecting ``parts``. Files without
    stats (or without the column) are conservatively kept — pruning
    may only ever widen, never lose rows.

    ``with_stats=True`` additionally returns the kept and total byte
    footprints ``(kept, kept_bytes, total_bytes)`` — the cost signal
    the crawl's auto routing uses (one footer walk serves both the
    decision and the read; file sizes are deterministic functions of
    the partitioned write, so the decision is parallelism-independent).
    """
    import os

    import pyarrow.parquet as pq

    wanted = set(int(p) for p in parts)
    kept: list[str] = []
    kept_bytes = 0
    total_bytes = 0
    for root in seen_paths:
        for name in sorted(os.listdir(root)):
            if not name.endswith(".parquet"):
                continue
            fpath = os.path.join(root, name)
            fsize = os.path.getsize(fpath) if with_stats else 0
            total_bytes += fsize
            md = pq.ParquetFile(fpath).metadata
            col_idx = {md.schema.column(i).name: i
                       for i in range(md.num_columns)}
            if "part" not in col_idx:
                kept.append(fpath)  # legacy file without part: keep
                kept_bytes += fsize
                continue
            ci = col_idx["part"]
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or st.min is None:
                    kept.append(fpath)
                    kept_bytes += fsize
                    break
                if any(st.min <= p <= st.max for p in wanted):
                    kept.append(fpath)
                    kept_bytes += fsize
                    break
    if with_stats:
        return kept, kept_bytes, total_bytes
    return kept


def prune_seen_paths(spark, seen_paths: list[str],
                     parts: list[int],
                     kept: list[str] | None = None) -> "DataFrame":
    """Partition-pruned seen read: ``select_seen_files`` picks the
    files whose footer stats intersect the candidates' partition ids;
    kept files are read with an explicit schema plus a pushed
    ``part IN (...)`` filter so the parquet reader also skips
    non-matching ROW GROUPS inside kept files (seen writes sort by
    (part, url) within tasks, keeping row-group part ranges tight).

    This is manifest-style pruning done with footer stats — exactly
    what an Iceberg table partitioned by ``part`` would give via its
    manifests; at 10^10-url scale the footer listing is replaced by
    the catalog's manifest files, same plan shape. The file list is
    computed driver-side, so tests can assert untouched partitions
    are literally never opened for row IO. A caller that already ran
    ``select_seen_files`` (the auto router) passes ``kept`` to skip
    the second footer walk.
    """
    if kept is None:
        kept = select_seen_files(seen_paths, parts)
    if not kept:
        return (spark.createDataFrame([], SEEN_FILE_SCHEMA)
                .select("url", "added_wave"))
    # part IS NULL must pass the filter: a kept file WITHOUT a part
    # column (select_seen_files keeps it conservatively) comes back
    # with part=NULL under the pinned schema, and a bare isin() treats
    # NULL as false — silently dropping every row of the kept file
    # from the seen side (seen urls re-emitted as new: duplicate
    # fetches, violating "pruning may only ever widen, never lose
    # rows"). Advisor round-3 (medium).
    return (spark.read.schema(SEEN_FILE_SCHEMA).parquet(*kept)
            .where(F.col("part").isNull()
                   | F.col("part").isin([int(p) for p in parts]))
            .select("url", "added_wave"))


def filter_new_urls(candidates: DataFrame, seen: DataFrame,
                    bloom: bytes | None = None,
                    m: int = BLOOM_BITS_DEFAULT,
                    strategy: str = "shuffle") -> DataFrame:
    """Exact new-url filter: bloom prune (optional) then the exact
    membership check (see ``_anti_seen`` for the strategy choice).
    Candidates with maybe_seen=False skip the join entirely."""
    if bloom is None:
        return _anti_seen(candidates, seen, strategy)
    flagged = bloom_maybe_seen(candidates, bloom, m)
    definitely_new = flagged.where(~F.col("maybe_seen")).drop("maybe_seen")
    to_confirm = flagged.where(F.col("maybe_seen")).drop("maybe_seen")
    confirmed = _anti_seen(to_confirm, seen, strategy)
    return definitely_new.unionByName(confirmed)


# --------------------------------------------------------------------------
# Sharded bloom (the 10^10-url design point)
# --------------------------------------------------------------------------
#
# A single global bitmap at 16 bits/key is ~20 GB at 10^10 urls — past
# executor broadcast comfort. The sharded mode keys one bitmap per seen
# partition (same pmod(xxhash64(host), P) as the seen table and cuckoo
# shards), probed via a partition-local cogroup: each task materializes
# ONLY its shard (m_shard/8 bytes per executor-task, never the global
# bitmap), and maintenance ORs a wave's delta into each touched shard
# executor-side — no driver-side bitmap at any point. Bit semantics are
# IDENTICAL to the global bloom (same _bit_indices family over m_shard),
# and blooms only prune, so scheduling is byte-identical between modes
# (pinned by the invariance test).

BLOOM_SHARD_SCHEMA = T.StructType([
    T.StructField("partition", T.IntegerType()),
    T.StructField("bitmap", T.BinaryType()),
])


def bloom_shard_bits(bitmap: bytes) -> int:
    """m_shard is persisted via the bitmap length (same nbytes = m//8
    + 1 convention as the global bloom)."""
    return (len(bitmap) - 1) * 8


def _check_shard_m(m_shard: int) -> int:
    """m_shard must be a positive multiple of 8: the probe re-derives
    the modulus from bitmap length as (nbytes - 1) * 8, which only
    round-trips m // 8 + 1 bytes exactly when 8 | m. Any other m
    would make the probe use a DIFFERENT modulus than the build —
    bloom FALSE NEGATIVES, i.e. already-seen urls skipping the exact
    anti-join (advisor round-6). Rejected loudly instead."""
    if m_shard <= 0 or m_shard % 8:
        raise ValueError(
            f"m_shard must be a positive multiple of 8, got {m_shard} "
            "(the shard modulus is persisted via bitmap length; a "
            "non-multiple-of-8 m cannot round-trip and would produce "
            "bloom false negatives on probe/resume)")
    return m_shard


def build_bloom_shards(seen: DataFrame, n_partitions: int,
                       m_shard: int) -> DataFrame:
    """One bloom bitmap per seen partition, built executor-side
    (applyInPandas over the partition group — bit-setting is
    order-independent, so shards are byte-deterministic at any
    parallelism)."""
    _check_shard_m(m_shard)
    keyed = seen.select(
        _partition_of(F.col("url"), n_partitions).alias("partition"),
        F.xxhash64("url").alias("h"))

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        arr = np.zeros(m_shard // 8 + 1, dtype=np.uint8)
        _set_bits(arr, pdf["h"], m_shard)
        part = int(pdf["partition"].iloc[0]) if len(pdf) else 0
        return pd.DataFrame({"partition": [part],
                             "bitmap": [arr.tobytes()]})

    return keyed.groupBy("partition").applyInPandas(
        build, BLOOM_SHARD_SCHEMA)


def merge_bloom_shards(shards: DataFrame, delta: DataFrame,
                       n_partitions: int, m_shard: int) -> DataFrame:
    """OR a wave's new-url delta into the shard bitmaps (cogroup —
    partition-local, each shard touched once, O(delta) work). Shards
    with no delta pass through unchanged; delta urls landing in a
    partition with no shard yet create it."""
    _check_shard_m(m_shard)
    keyed = delta.select(
        _partition_of(F.col("url"), n_partitions).alias("partition"),
        F.xxhash64("url").alias("h"))

    def merge(key, url_pdf: pd.DataFrame, shard_pdf: pd.DataFrame):
        if len(shard_pdf):
            arr = np.frombuffer(bytes(shard_pdf["bitmap"].iloc[0]),
                                dtype=np.uint8).copy()
        else:
            arr = np.zeros(m_shard // 8 + 1, dtype=np.uint8)
        if len(url_pdf):
            _set_bits(arr, url_pdf["h"], m_shard)
        return pd.DataFrame({"partition": [int(key[0])],
                             "bitmap": [arr.tobytes()]})

    return (keyed.groupBy("partition")
            .cogroup(shards.groupBy("partition"))
            .applyInPandas(merge, BLOOM_SHARD_SCHEMA))


def bloom_shards_prune(candidates: DataFrame, shards: DataFrame,
                       n_partitions: int) -> DataFrame:
    """Adds boolean ``maybe_seen`` via a partition-local shard probe
    (cogroup): False = definitely new. A task holds exactly one
    shard's bitmap — the executor-memory contract of the sharded
    design. Candidates in a partition with no shard are all
    definitely-new (their partition has never seen a url)."""
    keyed = (candidates
             .withColumn("partition",
                         _partition_of(F.col("url"), n_partitions))
             .withColumn("h", F.xxhash64("url")))
    out_schema = T.StructType(
        keyed.schema.fields
        + [T.StructField("maybe_seen", T.BooleanType())])

    def probe(key, cand_pdf: pd.DataFrame, shard_pdf: pd.DataFrame):
        cand_pdf = cand_pdf.copy()
        if not len(shard_pdf):
            cand_pdf["maybe_seen"] = False
            return cand_pdf
        bitmap = bytes(shard_pdf["bitmap"].iloc[0])
        m = bloom_shard_bits(bitmap)
        arr = np.frombuffer(bitmap, dtype=np.uint8)
        idx = _bit_indices(cand_pdf["h"], m)
        hit = np.ones(len(cand_pdf), dtype=bool)
        for k in range(_K_HASHES):
            b = idx[:, k]
            hit &= (arr[b // 8] >> (b % 8).astype(np.uint8) & 1) \
                .astype(bool)
        cand_pdf["maybe_seen"] = hit
        return cand_pdf

    return (keyed.groupBy("partition")
            .cogroup(shards.groupBy("partition"))
            .applyInPandas(probe, out_schema)
            .drop("h", "partition"))


def bloom_shards_stats(shards: DataFrame) -> tuple[int, int]:
    """(total_bits, total_popcount) across shards — P rows through
    the driver, never a bitmap. Feeds the same est-fp saturation
    signal as the global mode (keys distribute uniformly across
    equal-sized shards, so the aggregate ratio is the per-shard
    ratio in expectation)."""

    @F.pandas_udf(T.LongType())
    def pc(b: pd.Series) -> pd.Series:
        return b.apply(lambda x: int(np.unpackbits(
            np.frombuffer(bytes(x), dtype=np.uint8)).sum()))

    @F.pandas_udf(T.LongType())
    def bits(b: pd.Series) -> pd.Series:
        return b.apply(lambda x: (len(bytes(x)) - 1) * 8)

    row = (shards.select(pc(F.col("bitmap")).alias("pc"),
                         bits(F.col("bitmap")).alias("m"))
           .agg(F.coalesce(F.sum("m"), F.lit(0)).alias("m"),
                F.coalesce(F.sum("pc"), F.lit(0)).alias("pc"))
           .collect()[0])
    return int(row.m), int(row.pc)


def filter_new_urls_sharded(candidates: DataFrame, seen: DataFrame,
                            shards: DataFrame, n_partitions: int,
                            strategy: str = "shuffle") -> DataFrame:
    """filter_new_urls with the sharded-bloom prune in place of the
    broadcast bitmap: identical output (both blooms only prune; the
    anti-join is the exactness), different memory shape."""
    flagged = bloom_shards_prune(candidates, shards, n_partitions)
    definitely_new = flagged.where(~F.col("maybe_seen")) \
        .drop("maybe_seen")
    to_confirm = flagged.where(F.col("maybe_seen")).drop("maybe_seen")
    confirmed = _anti_seen(to_confirm, seen, strategy)
    return definitely_new.unionByName(confirmed)


# --------------------------------------------------------------------------
# Cuckoo filter (per-partition membership shards)
# --------------------------------------------------------------------------

class CuckooFilter:
    """Minimal (2,4)-cuckoo filter over uint16 fingerprints.

    Deterministic given insertion order; the crawl inserts urls in
    sorted order per partition, so shards are reproducible across
    parallelism levels. 0 is the empty slot (fingerprints are mapped
    to 1..65535)."""

    SLOTS = 4
    MAX_KICKS = 256

    def __init__(self, n_buckets: int):
        # POWER OF TWO is load-bearing: the alternate-bucket map
        # i2 = (i ^ fp*M) & (n-1) is an involution only under a
        # power-of-two mask. With a plain modulus, evicted
        # fingerprints can land in buckets contains_hash never
        # probes — a false negative, which the crawl's
        # definitely-new bypass turns into a re-crawl (correctness
        # bug, found by the round-1 advisor).
        self.n_buckets = 1 << (max(2, n_buckets) - 1).bit_length()
        self.table = np.zeros((self.n_buckets, self.SLOTS), dtype=np.uint16)

    @staticmethod
    def _fingerprint(h: np.ndarray) -> np.ndarray:
        fp = (h >> np.uint64(48)).astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)

    def _fp_i1_i2(self, h_arr: np.ndarray):
        """Vectorized (fingerprint, bucket, alt-bucket) for a uint64
        hash array — ONE numpy pass instead of per-key allocations
        (the probe/insert hot loops are executor-side Python)."""
        fp = self._fingerprint(h_arr)
        i1 = (h_arr % np.uint64(self.n_buckets)).astype(np.int64)
        i2 = (i1 ^ (fp.astype(np.int64) * 0x5BD1E995)) \
            & (self.n_buckets - 1)
        return fp, i1, i2

    def _i1(self, h):
        return int(h % np.uint64(self.n_buckets))

    def _i2(self, i1, fp):
        # xor-then-mask: involutive because n_buckets is a power of two
        return (i1 ^ (int(fp) * 0x5BD1E995)) & (self.n_buckets - 1)

    def _insert_fp(self, fp: int, i1: int, i2: int) -> bool:
        table = self.table
        for idx in (i1, i2):
            row = table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        # evict deterministically: rotate victim slots with kick count
        idx = i2
        for kick in range(self.MAX_KICKS):
            slot = kick % self.SLOTS
            victim = int(table[idx][slot])
            table[idx][slot] = fp
            fp = victim
            idx = self._i2(idx, fp)
            row = table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        return False  # overfull: caller resizes (membership safety is
        # ultimately backed by the exact anti-join regardless)

    def insert_hash(self, h: int) -> bool:
        h_arr = np.array([h], dtype=np.uint64)
        fp, i1, i2 = self._fp_i1_i2(h_arr)
        return self._insert_fp(int(fp[0]), int(i1[0]), int(i2[0]))

    def insert_many(self, h_arr: np.ndarray) -> bool:
        """Insert hashes IN ORDER (eviction chains depend on it — the
        crawl inserts sorted-by-url for cross-parallelism determinism).
        Returns False if any insert overflowed."""
        fp, i1, i2 = self._fp_i1_i2(h_arr.astype(np.uint64))
        ok = True
        for j in range(len(h_arr)):
            ok &= self._insert_fp(int(fp[j]), int(i1[j]), int(i2[j]))
        return ok

    def contains_hash(self, h: int) -> bool:
        return bool(self.contains_many(np.array([h], dtype=np.uint64))[0])

    def contains_many(self, h_arr: np.ndarray) -> np.ndarray:
        """Vectorized membership probe: boolean array, no per-key
        Python."""
        fp, i1, i2 = self._fp_i1_i2(h_arr.astype(np.uint64))
        fpc = fp[:, None]
        return ((self.table[i1] == fpc).any(axis=1)
                | (self.table[i2] == fpc).any(axis=1))

    def delete_hash(self, h: int) -> bool:
        h_arr = np.array([h], dtype=np.uint64)
        fp_a, i1_a, i2_a = self._fp_i1_i2(h_arr)
        fp = int(fp_a[0])
        for idx in (int(i1_a[0]), int(i2_a[0])):
            row = self.table[idx]
            hits = np.nonzero(row == fp)[0]
            if len(hits):
                row[hits[0]] = 0
                return True
        return False

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, n_buckets: int) -> "CuckooFilter":
        if n_buckets & (n_buckets - 1):
            raise ValueError(
                f"cuckoo shard n_buckets={n_buckets} is not a power of "
                "two — shard written by a pre-fix build; rebuild from "
                "the seen table (maintain_cuckoo_shards)")
        cf = cls(n_buckets)
        cf.table = np.frombuffer(data, dtype=np.uint16).reshape(
            (n_buckets, cls.SLOTS)).copy()
        return cf


CUCKOO_SHARD_SCHEMA = T.StructType([
    T.StructField("partition", T.IntegerType()),
    T.StructField("n_buckets", T.IntegerType()),
    T.StructField("blob", T.BinaryType()),
])


def _partition_of(url_col, n_partitions: int):
    return F.pmod(
        F.xxhash64(F.regexp_extract(url_col, r"^[a-z]+://([^/:?#]+)", 1)),
        F.lit(n_partitions)).cast("int")


def update_cuckoo_shards(shards: DataFrame | None, new_urls: DataFrame,
                         n_partitions: int,
                         load_factor: float = 0.5) -> DataFrame:
    """Incrementally fold newly-seen urls into the per-partition
    cuckoo shards (cogroup — each shard is touched once, O(new) work,
    never a rebuild over the full seen set). Insertion order is
    sorted-by-url within partition -> byte-deterministic shards at
    any parallelism."""
    spark = new_urls.sparkSession
    keyed = new_urls.select(
        "url", _partition_of(F.col("url"), n_partitions).alias("partition"),
        F.xxhash64("url").alias("h"))
    if shards is None:
        shards = spark.createDataFrame([], CUCKOO_SHARD_SCHEMA)

    def merge(key, new_pdf: pd.DataFrame, shard_pdf: pd.DataFrame):
        part = int(key[0])
        hashes = (new_pdf.sort_values("url")["h"]
                  .to_numpy(dtype=np.int64).view(np.uint64))
        if len(shard_pdf):
            cf = CuckooFilter.from_bytes(bytes(shard_pdf["blob"].iloc[0]),
                                         int(shard_pdf["n_buckets"].iloc[0]))
        else:
            n = max(4, int(len(hashes) / (CuckooFilter.SLOTS * load_factor)) + 1)
            cf = CuckooFilter(n)
        overflow = not cf.insert_many(hashes)
        # On overflow the shard is INCOMPLETE for this delta (cuckoo
        # fingerprints cannot be re-keyed for a resize). A false
        # negative here is a CORRECTNESS bug downstream (the
        # definitely-new bypass would re-crawl a seen url), so the
        # caller MUST rebuild flagged partitions from the seen table
        # (maintain_cuckoo_shards does; amortized-geometric cost).
        return pd.DataFrame({"partition": [part],
                             "n_buckets": [cf.n_buckets],
                             "blob": [cf.to_bytes()],
                             "overflow": [overflow]})

    out_schema = T.StructType(CUCKOO_SHARD_SCHEMA.fields
                              + [T.StructField("overflow", T.BooleanType())])
    return (keyed.groupBy("partition")
            .cogroup(shards.groupBy("partition"))
            .applyInPandas(merge, out_schema))


def _any_overflow(path: str) -> bool:
    """True iff any row of the committed shard parquet has
    overflow=True — read driver-side (pyarrow, tiny file), zero
    Spark jobs."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(path, columns=["overflow"])
    col = tbl.column("overflow")
    import pyarrow.compute as pc

    return bool(pc.any(col).as_py() or False)


def maintain_cuckoo_shards(shards: DataFrame | None, delta_urls: DataFrame,
                           full_seen: DataFrame,
                           n_partitions: int,
                           path: str | None = None) -> DataFrame:
    """The safe maintenance protocol: incremental fold of the delta;
    if ANY partition overflowed, rebuild all shards from the seen
    table (source of truth) with extra headroom — restoring the
    no-false-negative invariant the definitely-new bypass relies on.
    Geometric headroom makes full rebuilds amortized-rare.

    With ``path`` set, the updated shards are written there directly
    and the committed parquet is returned — the cogroup executes
    exactly once (the write IS the materialization; the overflow
    check reads the tiny committed file, not a second pass)."""
    if shards is None:
        fresh = build_cuckoo_shards(full_seen, n_partitions,
                                    load_factor=0.25)
        if path is None:
            return fresh
        fresh.write.mode("overwrite").parquet(path)
        return delta_urls.sparkSession.read.parquet(path)
    updated = update_cuckoo_shards(shards, delta_urls, n_partitions)
    if path is None:
        updated = updated.cache()
        if updated.where(F.col("overflow")).limit(1).count() > 0:
            return build_cuckoo_shards(full_seen, n_partitions,
                                       load_factor=0.25)
        return updated.drop("overflow")
    spark = delta_urls.sparkSession
    updated.write.mode("overwrite").parquet(path)
    # overflow probe reads the just-committed tiny parquet (P rows)
    # driver-side via pyarrow — the probe was a whole Spark job per
    # wave (limit(1).count()), pure fixed cost on the crawl's
    # steady-state path; the checkpoint dir is local/shared FS by
    # the same contract every manifest footer read already relies on
    if _any_overflow(path):
        rebuilt = build_cuckoo_shards(full_seen, n_partitions,
                                      load_factor=0.25)
        rebuilt.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).select("partition", "n_buckets",
                                           "blob")


def cuckoo_prune(candidates: DataFrame, shards: DataFrame,
                 n_partitions: int) -> DataFrame:
    """Adds boolean ``maybe_seen_cuckoo`` via a partition-local
    cogroup probe: False = definitely new (cuckoo filters never
    false-negative), True = confirm via anti-join."""
    keyed = (candidates
             .withColumn("partition",
                         _partition_of(F.col("url"), n_partitions))
             .withColumn("h", F.xxhash64("url")))
    out_schema = T.StructType(
        keyed.schema.fields
        + [T.StructField("maybe_seen_cuckoo", T.BooleanType())])

    def probe(key, cand_pdf: pd.DataFrame, shard_pdf: pd.DataFrame):
        cand_pdf = cand_pdf.copy()
        if not len(shard_pdf):
            cand_pdf["maybe_seen_cuckoo"] = False
            return cand_pdf
        cf = CuckooFilter.from_bytes(bytes(shard_pdf["blob"].iloc[0]),
                                     int(shard_pdf["n_buckets"].iloc[0]))
        hashes = cand_pdf["h"].to_numpy(dtype=np.int64).view(np.uint64)
        cand_pdf["maybe_seen_cuckoo"] = cf.contains_many(hashes)
        return cand_pdf

    return (keyed.groupBy("partition")
            .cogroup(shards.groupBy("partition"))
            .applyInPandas(probe, out_schema)
            .drop("h"))


def build_cuckoo_shards(seen: DataFrame, n_partitions: int,
                        load_factor: float = 0.5) -> DataFrame:
    """One cuckoo filter per seen partition, built executor-side with
    applyInPandas (urls sorted within partition -> deterministic)."""
    keyed = seen.select(
        "url",
        F.pmod(F.xxhash64(F.regexp_extract("url", r"^[a-z]+://([^/:?#]+)", 1)),
               F.lit(n_partitions)).cast("int").alias("partition"),
        F.xxhash64("url").alias("h"))

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("url")
        hashes = pdf["h"].to_numpy(dtype=np.int64).view(np.uint64)
        n = max(4, int(len(pdf) / (CuckooFilter.SLOTS * load_factor)) + 1)
        while True:  # resize-on-overflow keeps the filter exact-negative
            cf = CuckooFilter(n)
            if cf.insert_many(hashes):
                break
            n *= 2
        part = int(pdf["partition"].iloc[0]) if len(pdf) else 0
        return pd.DataFrame({"partition": [part],
                             "n_buckets": [cf.n_buckets],
                             "blob": [cf.to_bytes()]})

    return keyed.groupBy("partition").applyInPandas(build, CUCKOO_SHARD_SCHEMA)
