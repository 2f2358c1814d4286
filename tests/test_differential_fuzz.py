"""Seeded-random differential fuzz for the session-2 operators:
the Spark implementation and its DuckDB twin are run on RANDOM
corpora (seeded — reproducible) and must agree exactly. This is the
same twin-equality contract the gate checks at sf0.01, pushed into
adversarial shape space: tiny/empty docs, heavy token collisions,
unicode, URL edge cases."""

from __future__ import annotations

import random

import duckdb
import pytest


def _random_docs(seed: int, n: int = 60) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    words = ["a", "b", "ab", "the", "x1", "é", "αβ", ""]
    rows = []
    for i in range(n):
        k = rng.randint(0, 14)
        text = " ".join(rng.choice(words) for _ in range(k))
        if rng.random() < 0.3:  # newlines exercise line-ish paths
            text = text.replace(" ", "\n", 1) if text else text
        rows.append((i, text))
    rows.append((n, ""))       # empty doc
    rows.append((n + 1, " "))  # whitespace-only
    return rows


def _duck_with_docs(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    return con


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_lm_fluency_fuzz_matches_duckdb(spark, seed):
    from cuphic_spark.operators.textstats import (
        lm_fluency, lm_fluency_oracle_sql)

    rows = _random_docs(seed)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.fluency_sum, r.n_bigrams)
           for r in lm_fluency(docs).collect()}
    con = _duck_with_docs(rows)
    ora = {r[0]: (r[1], r[2])
           for r in con.execute(lm_fluency_oracle_sql()).fetchall()}
    assert got == ora


@pytest.mark.parametrize("seed", [4, 5, 6])
def test_span_dedup_fuzz_matches_duckdb(spark, seed):
    from cuphic_spark.operators.dedup import (
        span_dedup_flags, span_dedup_oracle_sql)

    # small k so random corpora actually produce duplicate windows
    rng = random.Random(seed)
    words = ["a", "b", "c"]
    rows = [(i, " ".join(rng.choice(words) for _ in range(
        rng.randint(0, 8)))) for i in range(80)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_ppm)
           for r in span_dedup_flags(docs, k=3).collect()}
    con = _duck_with_docs(rows)
    ora = {r[0]: (r[1], r[2], r[3])
           for r in con.execute(span_dedup_oracle_sql(k=3)).fetchall()}
    assert got == ora
    assert any(v[1] > 0 for v in got.values())  # dups actually occur


@pytest.mark.parametrize("seed", [7, 8, 9])
def test_url_traps_fuzz_matches_duckdb(spark, seed):
    from cuphic_spark.frontier.urltrap import (
        trap_signals_oracle_sql, url_trap_signals)

    rng = random.Random(seed)
    segs = ["a", "b", "2024", "01", "doc", "x" * 3, "7"]
    params = ["a=1", "PHPSESSID=zz", "sid=9", "q=", "p2=x"]
    urls = []
    for _ in range(120):
        path = "/".join(rng.choice(segs)
                        for _ in range(rng.randint(0, 14)))
        q = "&".join(rng.choice(params)
                     for _ in range(rng.randint(0, 9)))
        u = "https://h.example" + ("/" + path if path else "")
        if q:
            u += "?" + q
        if rng.random() < 0.2:
            u += "#frag"
        urls.append((u,))
    docs = spark.createDataFrame(urls, "url string")
    got = {}
    for r in url_trap_signals(docs).collect():
        got.setdefault(r.url, []).append(
            (r.n_segments, r.max_repeat, r.n_digit_segments,
             r.n_params, r.has_session, r.is_trap))
    con = duckdb.connect()
    con.execute("CREATE TABLE raw_urls(url VARCHAR)")
    con.executemany("INSERT INTO raw_urls VALUES (?)", urls)
    ora = {}
    for r in con.execute(trap_signals_oracle_sql(
            "SELECT url FROM raw_urls")).fetchall():
        ora.setdefault(r[0], []).append(tuple(r[1:]))
    assert {k: sorted(v) for k, v in got.items()} \
        == {k: sorted(v) for k, v in ora.items()}


def test_scan_side_operators_have_no_shuffle_no_python(spark):
    """Plan contract for the scan-side claims: url_trap_signals is a
    pure Project/Filter chain (zero Exchange, zero Python stages);
    lm_fluency's only Python-free plan has exactly the documented
    shuffles (two count aggregates + join-backs), no MapInPandas."""
    import re

    from cuphic_spark.frontier.urltrap import url_trap_signals
    from cuphic_spark.operators.textstats import lm_fluency

    urls = spark.createDataFrame(
        [("https://h.example/a/b?x=1",)], "url string")
    plan = (url_trap_signals(urls)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
    assert "InPandas" not in plan and "BatchEvalPython" not in plan

    docs = spark.createDataFrame([(1, "a b c")],
                                 "doc_id long, text string")
    lplan = (lm_fluency(docs)
             ._jdf.queryExecution().executedPlan().toString())
    assert "InPandas" not in lplan and "BatchEvalPython" not in lplan
    # bounded shuffle count: c2 agg, c1 agg, joins + final agg —
    # under AQE the executed plan shows the exchanges pre-reuse
    assert len(re.findall(r"\bExchange\b", lplan)) <= 8, lplan


@pytest.mark.parametrize("seed", [10, 11])
def test_contamination_fuzz_matches_duckdb(spark, seed):
    from cuphic_spark.operators.dedup import (
        contamination_flags, contamination_oracle_sql)

    rng = random.Random(seed)
    words = ["a", "b", "c", "d"]
    rows = [(i, " ".join(rng.choice(words) for _ in range(
        rng.randint(0, 12)))) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = docs.where("doc_id < 10")
    corpus = docs.where("doc_id >= 10")
    got = {r.doc_id: (r.n_windows, r.n_contaminated, r.contaminated)
           for r in contamination_flags(corpus, bench, k=4).collect()}
    con = _duck_with_docs(rows)
    ora = {r[0]: (r[1], r[2], r[3]) for r in con.execute(
        contamination_oracle_sql(k=4, bench_pred="doc_id < 10"))
        .fetchall()}
    assert got == ora
    assert any(v[2] for v in got.values())  # collisions occur at k=4
