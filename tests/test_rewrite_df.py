"""DataFrame-level rewrite operator tests."""

import datetime

import pytest
from pyspark.sql import functions as F

from cuphic_spark.operators.rewrite import rewrite_pages, select_one_df
from cuphic_spark.sources.tei import PAGES_SCHEMA


@pytest.fixture(scope="module")
def small_pages(spark):
    ts = datetime.datetime(2024, 1, 1)
    rows = [
        ("u1", ts, b'<div><b>bold</b><i>it</i></div>', "", "en"),
        ("u2", ts, b'<div><b>two</b><b>bees</b></div>', "", "en"),
    ]
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def test_rewrite_pages_single_stage(spark, small_pages):
    out = {r.url: (r.rewritten, r.text)
           for r in rewrite_pages(
               small_pages,
               stages=[[("[:b {} x]", "[:strong {} x]")]]).collect()}
    assert out["u1"][0] == '[:div {} [:strong {} "bold"] [:i {} "it"]]'
    assert out["u2"][0] == '[:div {} [:strong {} "two"] [:strong {} "bees"]]'
    assert out["u1"][1] == "boldit"  # text preserved through rewrite


def test_rewrite_pages_stage_chaining(spark, small_pages):
    out = {r.url: r.rewritten
           for r in rewrite_pages(
               small_pages,
               stages=[[("[:b {} x]", "[:i {} x]")],
                       [("[:i {} x]", "[:em {} x]")]]).collect()}
    assert out["u1"] == '[:div {} [:em {} "bold"] [:em {} "it"]]'


def test_rewrite_pages_first_transformer_wins(spark, small_pages):
    out = {r.url: r.rewritten
           for r in rewrite_pages(
               small_pages,
               stages=[[("[:b {} x]", "[:one {} x]"),
                        ("[:b {} x]", "[:two {} x]")]]).collect()}
    assert "[:one" in out["u1"] and "[:two" not in out["u1"]


def test_select_one_df(spark, small_pages):
    from cuphic_spark.operators.parse import scrape_pages

    m = scrape_pages(small_pages, {"b": "[:b {} content]"})
    first = {r.url: r.bindings["content"]
             for r in select_one_df(m, "b").collect()}
    # document order: first :b on each page
    assert first == {"u1": "bold", "u2": "two"}
    assert select_one_df(m, "b").count() == 2


def test_rewrite_pages_lenient_ladder_and_drop_counter(spark):
    """rewrite_pages must route through the lenient parse ladder like
    every other page consumer: soup pages are repaired, unsalvageable
    pages are COUNTED via the accumulator, never silently dropped."""
    ts = datetime.datetime(2024, 1, 1)
    rows = [
        ("ok", ts, b"<div><b>fine</b></div>", "", "en"),
        # bare & + junk preamble: the fixup rung salvages this
        ("soup", ts, b"junk <div><b>a &amp; b</b> &</div>", "", "en"),
        # nothing salvages this
        ("hopeless", ts, b"<<<<not xml at all", "", "en"),
    ]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    acc = spark.sparkContext.accumulator(0)
    out = {r.url: r.rewritten
           for r in rewrite_pages(
               pages, stages=[[("[:b {} x]", "[:strong {} x]")]],
               dropped_acc=acc).collect()}
    assert set(out) == {"ok", "soup"}
    assert "[:strong" in out["ok"] and "[:strong" in out["soup"]
    assert acc.value == 1  # the hopeless page is counted, not silent
