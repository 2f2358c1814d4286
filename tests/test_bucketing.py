"""Bucketed co-located join: nodes and matches bucketed by url join
WITHOUT a shuffle — the parse-once/query-many layout for repeated
pattern queries over a stored crawl (ARCHITECTURE scale table)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # embedded catalog writes to spark.sql.warehouse.dir (set at
    # session build time to the default local dir); use explicit
    # database-less table names and clean up after
    yield
    spark.sql("DROP TABLE IF EXISTS nodes_bucketed")
    spark.sql("DROP TABLE IF EXISTS matches_bucketed")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    from cuphic_spark.compiler import compile_pattern, match_nodes
    from cuphic_spark.operators.parse import pages_to_nodes
    from cuphic_spark.sources.tei import tei_pages

    nodes = pages_to_nodes(tei_pages(spark))
    (nodes.write.mode("overwrite")
     .bucketBy(8, "url").sortBy("url", "node_id")
     .saveAsTable("nodes_bucketed"))

    nb = spark.table("nodes_bucketed")
    m = match_nodes(nb, [compile_pattern("ref", "[_ {:ref ref} ???]")])
    (m.write.mode("overwrite")
     .bucketBy(8, "url").sortBy("url")
     .saveAsTable("matches_bucketed"))

    mb = spark.table("matches_bucketed")
    joined = mb.join(nb, ["url", "node_id"]).select(
        "url", "node_id", "tag",
        F.element_at("bindings", "ref").alias("ref"))

    from cuphic_spark.plans import executed_plan

    plan = executed_plan(joined)
    # co-located buckets: the join must not shuffle either side
    assert "Exchange hashpartitioning" not in plan
    rows = joined.collect()
    assert len(rows) == mb.count()  # every match row joined
    assert all(r.ref is not None for r in rows)
