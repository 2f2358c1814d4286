"""SQL surface: the cuphic engine as registered Spark SQL functions.

A reference user drives cuphic from Clojure calls; a Spark SQL user
gets the same operations as session-registered functions — pure
``spark.sql`` workflows (the driver brief's DataFrame/SQL-throughout
requirement) without importing the Python API:

    SELECT cuphic_extract_text(html)             FROM pages
    SELECT cuphic_scrape(html, '[:a {:href href} ???]') FROM pages
    SELECT cuphic_rewrite(html,
                          '[:b {} x]', '[:strong {} x]') FROM pages

All three are Arrow-batched pandas UDFs over the SAME kernels the
DataFrame operators use (streaming extractor + lenient ladder;
Matcher scan; template rewrite) — no row-at-a-time Python. Patterns
are compiled once per distinct source text per batch (in SQL use the
pattern argument is a literal, so this is once per batch).

Unsalvageable pages yield NULL (SQL's drop signal — counting happens
at the relation level via ``pages_dropped`` accumulators in the
DataFrame API; a scalar function has no side channel).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCRAPE_RESULT_TYPE = T.ArrayType(T.StructType([
    T.StructField("node_id", T.LongType()),
    T.StructField("bindings", T.MapType(T.StringType(), T.StringType())),
]))


def _to_bytes(v):
    return bytes(v) if not isinstance(v, (bytes, type(None))) else v


@F.pandas_udf(T.StringType())
def cuphic_extract_text(html: pd.Series) -> pd.Series:
    from .kernel.xmlparse import extract_text_streaming
    from .operators.parse import parse_html_lenient

    out = []
    for h in html:
        if h is None:
            out.append(None)
            continue
        text, _mode = parse_html_lenient(_to_bytes(h),
                                         parser=extract_text_streaming)
        out.append(text)
    return pd.Series(out, dtype="object")


@F.pandas_udf(SCRAPE_RESULT_TYPE)
def cuphic_scrape(html: pd.Series, pattern: pd.Series) -> pd.Series:
    from .kernel import reader
    from .kernel.match import Matcher
    from .kernel.scan import scan as kernel_scan
    from .kernel.values import Symbol
    from .operators.parse import encode_value, parse_html_lenient

    matchers: dict[str, Matcher] = {}
    out = []
    for h, src in zip(html, pattern):
        if h is None or src is None:
            out.append(None)
            continue
        m = matchers.get(src)
        if m is None:
            m = matchers[src] = Matcher(reader.parse(src))
        tree, _mode = parse_html_lenient(_to_bytes(h))
        if tree is None:
            out.append(None)
            continue
        rows = []
        for node_id, _node, results in kernel_scan(tree, m):
            b = results[0]
            if b is not None:
                rows.append({
                    "node_id": node_id,
                    "bindings": {
                        (s.name if isinstance(s, Symbol) else str(s)):
                        encode_value(v) for s, v in b.items()},
                })
        out.append(rows)
    return pd.Series(out, dtype="object")


@F.pandas_udf(T.StringType())
def cuphic_rewrite(html: pd.Series, from_pat: pd.Series,
                   to_pat: pd.Series) -> pd.Series:
    from .kernel import reader
    from .kernel.template import make_transformer, rewrite
    from .operators.parse import parse_html_lenient

    stages: dict[tuple[str, str], list] = {}
    out = []
    for h, f_src, t_src in zip(html, from_pat, to_pat):
        if h is None or f_src is None or t_src is None:
            out.append(None)
            continue
        key = (f_src, t_src)
        stage = stages.get(key)
        if stage is None:
            stage = stages[key] = [
                {"transformers": [make_transformer(reader.parse(f_src),
                                                   reader.parse(t_src))]}]
        tree, _mode = parse_html_lenient(_to_bytes(h))
        if tree is None:
            out.append(None)
            continue
        out.append(reader.dumps(rewrite(tree, *stage)))
    return pd.Series(out, dtype="object")


def register_sql_functions(spark: SparkSession) -> None:
    """Register the engine's SQL functions on the session (idempotent;
    names are session-scoped)."""
    spark.udf.register("cuphic_extract_text", cuphic_extract_text)
    spark.udf.register("cuphic_scrape", cuphic_scrape)
    spark.udf.register("cuphic_rewrite", cuphic_rewrite)
