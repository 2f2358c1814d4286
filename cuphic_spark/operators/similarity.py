"""Similarity search over embedding columns.

* ``cosine_topk`` — brute-force cosine top-k: broadcast the (small)
  query set against the corpus; dot products via zip_with/aggregate
  (JVM-side, codegen'd); rank with a per-query window. The baseline.
* ``ivf_topk`` — the scale path: coarse-quantize the corpus into
  buckets (sign-prefix cells here; k-means centroids on a real
  deployment), probe only the query's cell + neighbors. Turns the
  all-pairs scan into a pruned equi-join; at 1000 executors the
  corpus stays partitioned by cell and only candidate cells shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def _norm(c):
    return F.sqrt(F.aggregate(
        F.transform(c, lambda x: (x * x).cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Brute-force cosine top-k.

    ``queries``: (query_id, q_embedding) — small, broadcast.
    Returns (query_id, neighbor_id, rank, cos_milli), self-matches
    excluded, ties broken by neighbor_id (total order).
    """
    j = emb.crossJoin(F.broadcast(queries)).where(
        F.col("vec_id") != F.col("query_id"))
    cos = _dot(F.col("embedding"), F.col("q_embedding")) / (
        _norm(F.col("embedding")) * _norm(F.col("q_embedding")))
    scored = j.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (cos * 1000000).cast("long").alias("cos_micro"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_micro"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos_micro"))


def inner_product_topk_quantized(emb: DataFrame, queries: DataFrame,
                                 k: int = 5, scale: int = 10000) -> DataFrame:
    """Top-k by INTEGER-quantized inner product (MIPS formulation).

    Quantizing each component to round(x*scale) makes the similarity
    an exact integer — bit-identical across engines and partitionings
    (float dot products are not: summation order and float32/64
    promotion differ), so this is the oracle-checkable ANN baseline.
    """
    q = lambda c: F.round(c.cast("double") * scale).cast("long")  # noqa: E731
    j = emb.crossJoin(F.broadcast(queries)).where(
        F.col("vec_id") != F.col("query_id"))
    dot_q = F.aggregate(
        F.zip_with(F.col("embedding"), F.col("q_embedding"),
                   lambda x, y: q(x) * q(y)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    scored = j.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        dot_q.alias("dot_q"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("dot_q"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "dot_q"))


def sign_cell(col, bits: int = 6):
    """Coarse cell id from the sign pattern of the first ``bits``
    dims (stand-in for IVF centroids; deterministic, join-friendly)."""
    out = F.lit(0)
    for i in range(bits):
        out = out * 2 + (F.element_at(col, i + 1) >= 0).cast("int")
    return out


def ivf_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
             bits: int = 4) -> DataFrame:
    """IVF-style pruned top-k: corpus bucketed by sign cell; each
    query probes its own cell plus all Hamming-distance-1 cells
    (guaranteed recall loss is the documented ANN trade-off)."""
    corpus = emb.withColumn("cell", sign_cell(F.col("embedding"), bits))
    probe_cells = F.array(*(
        [sign_cell(F.col("q_embedding"), bits)]
        + [sign_cell(F.col("q_embedding"), bits)
           .bitwiseXOR(F.lit(1 << i)) for i in range(bits)]))
    probes = (queries
              .withColumn("cell", F.explode(probe_cells))
              .select("query_id", "q_embedding", "cell"))
    j = corpus.join(F.broadcast(probes), "cell").where(
        F.col("vec_id") != F.col("query_id"))
    cos = _dot(F.col("embedding"), F.col("q_embedding")) / (
        _norm(F.col("embedding")) * _norm(F.col("q_embedding")))
    scored = j.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        (cos * 1000000).cast("long").alias("cos_micro"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_micro"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos_micro"))


def _probe_cells_expr(bits: int):
    return F.array(*(
        [sign_cell(F.col("q_embedding"), bits)]
        + [sign_cell(F.col("q_embedding"), bits)
           .bitwiseXOR(F.lit(1 << i)) for i in range(bits)]))


def build_ivf_index(emb: DataFrame, path: str, bits: int = 4) -> None:
    """Materialize the IVF index: the corpus written PARTITIONED BY
    CELL. At 100 TB this is how the scale path actually runs — the
    index lives as cell-partitioned parquet (or an Iceberg table
    partitioned on cell) and a probe reads ONLY the probed cells'
    directories via Catalyst partition pruning; everything else is
    never opened. ``ivf_topk`` (in-memory celling) remains the
    index-free variant for ad-hoc corpora."""
    (emb.withColumn("cell", sign_cell(F.col("embedding"), bits))
     .repartition("cell")
     .write.mode("overwrite").partitionBy("cell").parquet(path))


def ivf_topk_indexed(spark, path: str, queries: DataFrame, k: int = 5,
                     bits: int = 4,
                     max_probe_cells: int = 4096) -> DataFrame:
    """Probe a PERSISTED IVF index (see build_ivf_index): the probe
    cell set (own cell + Hamming-1 neighbors per query) is collected
    driver-side — queries are small by the ANN contract — and applied
    as a literal partition filter, so the scan plans with
    PartitionFilters on ``cell`` and touches only probed directories
    (test-asserted via inputFiles). Ranking is identical to
    ``ivf_topk``.

    ``max_probe_cells`` guards the driver-side collect (advisor
    round-3): the probe-cell count is bounded by |queries|·(bits+1)
    under the contract, but nothing stops a caller passing a huge
    query set — above the ceiling the literal partition filter is
    skipped and the probe becomes a plain equi-join on cell (identical
    results, no driver-side cell list; the scan loses partition
    pruning but the join itself still prunes rows)."""
    probes = (queries
              .withColumn("cell", F.explode(_probe_cells_expr(bits)))
              .select("query_id", "q_embedding", "cell"))
    # limit(max+1) bounds the collect itself — the guard must not cost
    # an unbounded driver transfer to discover it should have tripped
    probe_rows = (probes.select("cell").distinct()
                  .limit(max_probe_cells + 1).collect())
    corpus = spark.read.parquet(path)
    if len(probe_rows) <= max_probe_cells:
        cells = sorted({int(r.cell) for r in probe_rows})
        corpus = corpus.where(F.col("cell").isin(cells))
    j = corpus.join(F.broadcast(probes), "cell").where(
        F.col("vec_id") != F.col("query_id"))
    cos = _dot(F.col("embedding"), F.col("q_embedding")) / (
        _norm(F.col("embedding")) * _norm(F.col("q_embedding")))
    scored = j.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        (cos * 1000000).cast("long").alias("cos_micro"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_micro"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos_micro"))
