"""URL-seen set: broadcast bloom pre-filter + partitioned cuckoo
filters + exact anti-join.

Correctness contract: the FILTERS only prune (false positives allowed,
false negatives impossible); exactness always comes from the
``left_anti`` join against the seen table. That keeps results
identical at any parallelism level — the crux of matching crawl
ordering at local[8] vs local[32] (SURVEY §7.4).

Scale design (10^10 urls):

* the seen table is parquet partitioned by ``pmod(xxhash64(host), P)``
  — the anti-join shuffles only candidate urls (tiny per wave) against
  co-partitioned seen shards;
* the broadcast bloom is FIXED SIZE (default 2^22 bits = 512 KiB):
  built distributedly (distinct bit indices, never the url set) so the
  driver cost is bounded by m, not |seen|; at extreme scale it
  saturates toward no-op pruning but never breaks correctness;
* cuckoo shards give per-partition ~8 bits/key membership with
  deletions (needed when a frontier partition is re-scored); stored
  as parquet alongside the seen snapshot.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def build_bloom(seen: DataFrame, m: int = BLOOM_BITS_DEFAULT) -> bytes:
    """Distributed bloom build: compute bit indices executor-side,
    collect only the DISTINCT bit set (bounded by m/8 bytes)."""
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def bits_of(h: pd.Series) -> pd.Series:
        return pd.Series(list(_bit_indices(h, m)))

    bits = (seen.select(F.xxhash64("url").alias("h"))
            .select(F.explode(bits_of("h")).alias("bit"))
            .distinct().collect())
    arr = np.zeros(m // 8 + 1, dtype=np.uint8)
    idx = np.array([r.bit for r in bits], dtype=np.int64)
    if len(idx):
        np.bitwise_or.at(arr, idx // 8, (1 << (idx % 8)).astype(np.uint8))
    return arr.tobytes()


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


def filter_new_urls(candidates: DataFrame, seen: DataFrame,
                    bloom: bytes | None = None,
                    m: int = BLOOM_BITS_DEFAULT) -> DataFrame:
    """Exact new-url filter: bloom prune (optional) then left_anti.
    Candidates with maybe_seen=False skip the join entirely."""
    if bloom is None:
        return candidates.join(seen.select("url"), "url", "left_anti")
    flagged = bloom_maybe_seen(candidates, bloom, m)
    definitely_new = flagged.where(~F.col("maybe_seen")).drop("maybe_seen")
    to_confirm = flagged.where(F.col("maybe_seen")).drop("maybe_seen")
    confirmed = to_confirm.join(seen.select("url"), "url", "left_anti")
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

    def _i1(self, h):
        return int(h % np.uint64(self.n_buckets))

    def _i2(self, i1, fp):
        # xor-then-mask: involutive because n_buckets is a power of two
        return (i1 ^ (int(fp) * 0x5BD1E995)) & (self.n_buckets - 1)

    def insert_hash(self, h: int) -> bool:
        h = np.uint64(h)
        fp = int(self._fingerprint(np.array([h], dtype=np.uint64))[0])
        i = self._i1(h)
        for idx in (i, self._i2(i, fp)):
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        # evict deterministically: rotate victim slots with kick count
        idx = self._i2(i, fp)
        for kick in range(self.MAX_KICKS):
            slot = kick % self.SLOTS
            victim = int(self.table[idx][slot])
            self.table[idx][slot] = fp
            fp = victim
            idx = self._i2(idx, fp)
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        return False  # overfull: caller resizes (membership safety is
        # ultimately backed by the exact anti-join regardless)

    def contains_hash(self, h: int) -> bool:
        h = np.uint64(h)
        fp = int(self._fingerprint(np.array([h], dtype=np.uint64))[0])
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def delete_hash(self, h: int) -> bool:
        h = np.uint64(h)
        fp = int(self._fingerprint(np.array([h], dtype=np.uint64))[0])
        for idx in (self._i1(h), self._i2(self._i1(h), fp)):
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
        hashes = [np.uint64(np.int64(h))
                  for h in new_pdf.sort_values("url")["h"].astype("int64")]
        if len(shard_pdf):
            cf = CuckooFilter.from_bytes(bytes(shard_pdf["blob"].iloc[0]),
                                         int(shard_pdf["n_buckets"].iloc[0]))
        else:
            n = max(4, int(len(hashes) / (CuckooFilter.SLOTS * load_factor)) + 1)
            cf = CuckooFilter(n)
        overflow = not all(cf.insert_hash(h) for h in hashes)
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


def maintain_cuckoo_shards(shards: DataFrame | None, delta_urls: DataFrame,
                           full_seen: DataFrame,
                           n_partitions: int) -> DataFrame:
    """The safe maintenance protocol: incremental fold of the delta;
    if ANY partition overflowed, rebuild all shards from the seen
    table (source of truth) with extra headroom — restoring the
    no-false-negative invariant the definitely-new bypass relies on.
    Geometric headroom makes full rebuilds amortized-rare."""
    if shards is None:
        return build_cuckoo_shards(full_seen, n_partitions,
                                   load_factor=0.25)
    updated = update_cuckoo_shards(shards, delta_urls, n_partitions).cache()
    if updated.where(F.col("overflow")).limit(1).count() > 0:
        return build_cuckoo_shards(full_seen, n_partitions,
                                   load_factor=0.25)
    return updated.drop("overflow")


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
        cand_pdf["maybe_seen_cuckoo"] = [
            cf.contains_hash(np.uint64(np.int64(h)))
            for h in cand_pdf["h"].astype("int64")]
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
        hashes = [np.uint64(np.int64(h)) for h in pdf["h"].astype("int64")]
        n = max(4, int(len(pdf) / (CuckooFilter.SLOTS * load_factor)) + 1)
        while True:  # resize-on-overflow keeps the filter exact-negative
            cf = CuckooFilter(n)
            if all(cf.insert_hash(h) for h in hashes):
                break
            n *= 2
        part = int(pdf["partition"].iloc[0]) if len(pdf) else 0
        return pd.DataFrame({"partition": [part],
                             "n_buckets": [cf.n_buckets],
                             "blob": [cf.to_bytes()]})

    return keyed.groupBy("partition").applyInPandas(build, CUCKOO_SHARD_SCHEMA)
