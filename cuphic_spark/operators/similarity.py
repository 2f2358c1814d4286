"""Similarity search over embedding columns.

* ``cosine_topk`` — brute-force cosine top-k: broadcast the (small)
  query set against the corpus; dot products via zip_with/aggregate
  (JVM-side, codegen'd); rank with a per-query window. The baseline.
* ``ivf_topk`` — the scale path: coarse-quantize the corpus into
  buckets (sign-prefix cells, the deterministic oracle-checkable
  baseline), probe only the query's cell + neighbors. Turns the
  all-pairs scan into a pruned equi-join; at 1000 executors the
  corpus stays partitioned by cell and only candidate cells shuffle.
* ``train_ivf_centroids`` + ``build_ivf_index(centroids=...)`` — the
  TRAINED coarse quantizer (deterministic Lloyd's k-means): cells
  follow the data distribution instead of blind sign bits, which is
  what keeps probe recall up at 10^10 vectors; the probe plan shape
  (literal PartitionFilters on cell) is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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
    # quantize each side ONCE before the cross join (round 8): the
    # zip_with/aggregate lambdas are interpreted (CodegenFallback), so
    # quantizing inside the pair lambda paid 2 rounds + 2 casts per
    # (pair, element) — pre-quantized long arrays leave only x*y in
    # the per-pair loop. Same longs, bit-identical dot products.
    emb_q = emb.select("vec_id",
                       F.transform(F.col("embedding"), q).alias("embedding"))
    queries_q = queries.select(
        "query_id", F.transform(F.col("q_embedding"), q).alias("q_embedding"))
    j = emb_q.crossJoin(F.broadcast(queries_q)).where(
        F.col("vec_id") != F.col("query_id"))
    dot_q = F.aggregate(
        F.zip_with(F.col("embedding"), F.col("q_embedding"),
                   lambda x, y: x * y),
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


def train_ivf_centroids(emb: DataFrame, n_cells: int = 16,
                        max_iter: int = 8):
    """Deterministic Lloyd's k-means over the embedding column — the
    TRAINED coarse quantizer for the persisted IVF index (round-4
    verdict item 5: sign-bit cells give 2^bits data-blind cells; at
    10^10 vectors the cells must follow the data distribution or
    probe recall collapses).

    Spark shape per iteration: broadcast centroids -> Arrow-batched
    assignment (numpy argmin, one matmul per batch) -> per-dimension
    averages via JVM aggregates (dim x n_cells scalars through the
    driver — tiny). Deterministic: init = the n_cells lowest vec_ids,
    fixed iteration count, argmin ties to the lowest cell. Returns a
    (n_cells, dim) float64 numpy array."""
    first = emb.select("embedding").limit(1).collect()
    if not first:
        raise ValueError("train_ivf_centroids: empty corpus")
    dim = len(first[0].embedding)
    init_rows = (emb.orderBy("vec_id").limit(n_cells)
                 .select("embedding").collect())
    if len(init_rows) < n_cells:
        raise ValueError(f"corpus has {len(init_rows)} rows < "
                         f"n_cells={n_cells}")
    centroids = np.array([list(r.embedding) for r in init_rows],
                         dtype=np.float64)
    for _ in range(max_iter):
        assign, bc = _kmeans_cell_udf(emb.sparkSession, centroids)
        assigned = emb.select(
            assign(F.col("embedding")).alias("cell"), "embedding")
        aggs = [F.count("*").alias("n")] + [
            F.avg(F.element_at("embedding", i + 1)).alias(f"d{i}")
            for i in range(dim)]
        rows = assigned.groupBy("cell").agg(*aggs).collect()
        # the collect() completed the only job reading this iteration's
        # centroid broadcast — free its blocks now, or a long-lived
        # session running many trainings accumulates one broadcast per
        # iteration (advisor round-5)
        bc.unpersist()
        new = centroids.copy()  # empty cells keep their old centroid
        for r in rows:
            new[int(r.cell)] = [getattr(r, f"d{i}") for i in range(dim)]
        if np.allclose(new, centroids, atol=1e-12):
            break
        centroids = new
    return centroids


def _kmeans_cell_udf(spark, centroids):
    """Arrow-batched nearest-centroid assignment (one numpy matmul
    per batch; ties -> lowest cell id via argmin). Returns
    ``(udf, broadcast)`` — the caller owns the broadcast's lifetime
    and must ``unpersist()`` it once the job(s) using the udf have
    completed (per-iteration accumulation was advisor round-5)."""
    from pyspark.sql import types as T

    bc = spark.sparkContext.broadcast(np.asarray(centroids,
                                                 dtype=np.float64))

    @F.pandas_udf(T.IntegerType())
    def assign(col: pd.Series) -> pd.Series:
        c = bc.value
        if not len(col):
            return pd.Series([], dtype="int32")
        x = np.stack(col.apply(np.asarray).to_numpy()).astype(np.float64)
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 constant
        # per row, so argmin over (-2 x.c + ||c||^2) suffices
        d = -2.0 * (x @ c.T) + (c * c).sum(axis=1)[None, :]
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return assign, bc


def _centroids_sidecar(path: str) -> str:
    import os

    return os.path.join(path, "_ivf_centroids.json")


def build_ivf_index(emb: DataFrame, path: str, bits: int = 4,
                    centroids=None) -> None:
    """Materialize the IVF index: the corpus written PARTITIONED BY
    CELL. At 100 TB this is how the scale path actually runs — the
    index lives as cell-partitioned parquet (or an Iceberg table
    partitioned on cell) and a probe reads ONLY the probed cells'
    directories via Catalyst partition pruning; everything else is
    never opened. ``ivf_topk`` (in-memory celling) remains the
    index-free variant for ad-hoc corpora.

    ``centroids`` (from train_ivf_centroids) switches the coarse
    quantizer from sign-bit cells to the trained k-means cells; the
    centroids are persisted as a sidecar inside the index dir so
    ``ivf_topk_indexed`` probes with the matching quantizer."""
    import json as _json

    bc = None
    if centroids is None:
        celled = emb.withColumn("cell",
                                sign_cell(F.col("embedding"), bits))
    else:
        assign, bc = _kmeans_cell_udf(emb.sparkSession, centroids)
        celled = emb.withColumn("cell", assign(F.col("embedding")))
    (celled.repartition("cell")
     .write.mode("overwrite").partitionBy("cell").parquet(path))
    if bc is not None:
        bc.unpersist()  # the write was the broadcast's only reader
    if centroids is not None:
        with open(_centroids_sidecar(path), "w") as fh:
            _json.dump([[float(v) for v in row] for row in centroids],
                       fh)


def _kmeans_probe_udf(spark, centroids, n_probe: int):
    """Arrow-batched probe expansion: the ``n_probe`` nearest
    centroid ids per query, deterministically ordered (distance, then
    cell id — numpy lexsort). The broadcast inside lives as long as
    the returned (lazy) probe plan — it cannot be unpersisted here;
    it is one small (n_cells, dim) array per ``ivf_topk_indexed``
    call, and Spark's ContextCleaner reclaims it when the udf is
    garbage-collected."""
    from pyspark.sql import types as T

    bc = spark.sparkContext.broadcast(np.asarray(centroids,
                                                 dtype=np.float64))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe(col: pd.Series) -> pd.Series:
        c = bc.value
        if not len(col):
            return pd.Series([], dtype=object)
        x = np.stack(col.apply(np.asarray).to_numpy()).astype(np.float64)
        d = -2.0 * (x @ c.T) + (c * c).sum(axis=1)[None, :]
        order = np.lexsort((np.arange(c.shape[0])[None, :]
                            .repeat(len(x), 0), d), axis=1)
        return pd.Series([row[:n_probe].astype(np.int32).tolist()
                          for row in order])

    return probe


def ivf_topk_indexed(spark, path: str, queries: DataFrame, k: int = 5,
                     bits: int = 4, n_probe: int = 2,
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
    pruning but the join itself still prunes rows).

    An index built with TRAINED centroids (build_ivf_index
    ``centroids=...``) is detected via its sidecar: probes become the
    ``n_probe`` nearest centroids per query instead of the sign-cell
    Hamming ball; the plan shape (literal PartitionFilters on cell)
    is identical."""
    import json as _json
    import os as _os

    sidecar = _centroids_sidecar(path)
    if _os.path.exists(sidecar):
        with open(sidecar) as fh:
            centroids = _json.load(fh)
        probe = _kmeans_probe_udf(spark, centroids, n_probe)
        probes = (queries
                  .withColumn("cell",
                              F.explode(probe(F.col("q_embedding"))))
                  .select("query_id", "q_embedding", "cell"))
    else:
        probes = (queries
                  .withColumn("cell",
                              F.explode(_probe_cells_expr(bits)))
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
