"""SQL-surface tests: the engine's registered SQL functions must
agree with the DataFrame operators on the same pages."""

import datetime

import pytest
from pyspark.sql import functions as F

from cuphic_spark.sql import register_sql_functions
from cuphic_spark.sources.tei import PAGES_SCHEMA


@pytest.fixture(scope="module")
def sql_pages(spark):
    register_sql_functions(spark)
    ts = datetime.datetime(2024, 1, 1)
    rows = [
        ("u1", ts, b'<div><a href="x.html">one</a>'
                   b'<a href="y.html">two</a><b>bold</b></div>', "", "en"),
        ("u2", ts, b'<div><b>plain</b> text</div>', "", "en"),
        ("u3", ts, b'junk <div>soup &</div>', "", "en"),   # fixup rung
        ("u4", ts, b'<<<hopeless', "", "en"),              # dropped -> NULL
    ]
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    df.createOrReplaceTempView("sql_pages")
    return df


def test_sql_extract_text_matches_operator(spark, sql_pages):
    from cuphic_spark.operators.parse import pages_extract_text

    got = {r.url: r.t for r in spark.sql(
        "SELECT url, cuphic_extract_text(html) AS t FROM sql_pages"
    ).collect()}
    op = {r.url: r.text for r in pages_extract_text(sql_pages).collect()}
    for url, text in op.items():
        assert got[url] == text
    assert got["u4"] is None  # unsalvageable -> SQL NULL


def test_sql_scrape_matches_operator(spark, sql_pages):
    from cuphic_spark.operators.parse import scrape_pages

    rows = spark.sql("""
        SELECT url, m.node_id, m.bindings
        FROM sql_pages
        LATERAL VIEW explode(
            cuphic_scrape(html, '[:a {:href href} ???]')) AS m
    """).collect()
    got = sorted((r.url, r.node_id, dict(r.bindings)["href"])
                 for r in rows)
    op = sorted((r.url, r.node_id, dict(r.bindings)["href"])
                for r in scrape_pages(
                    sql_pages, {"a": "[:a {:href href} ???]"}).collect())
    assert got == op
    assert got == [("u1", 1, "x.html"), ("u1", 2, "y.html")]


def test_sql_rewrite_matches_operator(spark, sql_pages):
    from cuphic_spark.operators.rewrite import rewrite_pages

    got = {r.url: r.t for r in spark.sql(
        "SELECT url, cuphic_rewrite(html, '[:b {} x]', "
        "'[:strong {} x]') AS t FROM sql_pages").collect()}
    op = {r.url: r.rewritten for r in rewrite_pages(
        sql_pages, [[("[:b {} x]", "[:strong {} x]")]]).collect()}
    for url, edn in op.items():
        assert got[url] == edn
    assert "[:strong" in got["u2"]
    assert got["u4"] is None
