"""Deterministic sampling + sharding for training-data mixes.

A corpus pipeline's last mile is mix construction: down-sample each
source to a target proportion and shard the result for the trainer.
Random sampling is the wrong tool at 100 TB — `rand()` differs per
task retry and per partitioning, so a resumed job double-samples.
Everything here derives from **md5 of (key, seed)**: a pure column
expression, identical on any executor count, Spark task retry, and
in the DuckDB twin (the gate hashes it exactly).

* ``hash_sample``      — keep iff uint32(md5(key:seed)[:8]) <
                         floor(fraction * 2^32). Exact-in-expectation
                         Bernoulli, deterministic membership.
* ``stratified_sample``— per-stratum fractions (a dict) applied with
                         one CASE over the same hash — the per-source
                         quota knob.
* ``assign_shards``    — shard = uint32-hash mod n_shards over an
                         INDEPENDENT hash stream (different salt), so
                         shard assignment is uncorrelated with the
                         sampling decision.

Scale shape: all three are scan-side Projects/Filters — no shuffle,
no UDF, whole-stage codegen; sharded writes then partition by the
shard column. The hash threshold pushes to the parquet scan as a
filter on derived columns (post-scan codegen filter; membership
never needs a shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["hash_sample", "stratified_sample", "assign_shards",
           "sample_oracle_sql"]


def _hash_u32(key_col, salt: str):
    """First 8 hex digits of md5(key || ':' || salt) as a uint32 in
    a long — the shared deterministic stream (conv is JVM-side)."""
    return F.conv(F.substring(
        F.md5(F.concat(key_col.cast("string"), F.lit(":" + salt))),
        1, 8), 16, 10).cast("long")


def _threshold(fraction: float) -> int:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} out of [0, 1]")
    return int(fraction * (1 << 32))


def hash_sample(docs: DataFrame, fraction: float, seed: str = "0",
                key_col: str = "doc_id") -> DataFrame:
    """Deterministic Bernoulli(fraction) membership by key hash."""
    return docs.where(
        _hash_u32(F.col(key_col), seed) < F.lit(_threshold(fraction)))


def stratified_sample(docs: DataFrame, strata_col,
                      fractions: dict, seed: str = "0",
                      key_col: str = "doc_id") -> DataFrame:
    """Per-stratum deterministic sampling: ``fractions`` maps each
    stratum value to its keep fraction; strata absent from the map
    are DROPPED (explicit mixes only — a silent keep-all default
    would make a typo'd source name pass through at 100%)."""
    h = _hash_u32(F.col(key_col), seed)
    expr = None
    for k, frac in fractions.items():
        cond = (strata_col == F.lit(k)) & (h < F.lit(_threshold(frac)))
        expr = cond if expr is None else (expr | cond)
    if expr is None:
        raise ValueError("fractions must be non-empty")
    return docs.where(expr)


def assign_shards(docs: DataFrame, n_shards: int, seed: str = "0",
                  key_col: str = "doc_id",
                  out_col: str = "shard") -> DataFrame:
    """Deterministic shard id in [0, n_shards) from an independent
    hash stream (salt 'shard:<seed>' — uncorrelated with
    hash_sample's membership stream at the same seed)."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    return docs.withColumn(
        out_col,
        (_hash_u32(F.col(key_col), "shard:" + seed)
         % F.lit(n_shards)).cast("long"))


def sample_oracle_sql(fractions: dict, n_shards: int,
                      strata_sql: str, seed: str = "0") -> str:
    """DuckDB twin of stratified_sample + assign_shards over
    documents: the same md5-prefix uint32 arithmetic (DuckDB's
    ::UBIGINT hex cast) with ``strata_sql`` as the stratum
    expression over doc_id."""
    def u32(salt: str) -> str:
        return ("('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '"
                f":{salt}'), 1, 8))::UBIGINT")

    cases = " OR ".join(
        f"(({strata_sql}) = {k} AND {u32(seed)} < {_threshold(f)})"
        for k, f in fractions.items())
    return f"""
        SELECT doc_id,
               ({strata_sql})::BIGINT AS stratum,
               ({u32('shard:' + seed)} % {n_shards})::BIGINT AS shard
        FROM documents
        WHERE {cases}
    """
