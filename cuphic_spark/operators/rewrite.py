"""DataFrame-level tree rewriting — the Spark face of the reference's
transform/rewrite pipeline (cuphic.cljc:309-379, SURVEY §2.C).

Stages run INSIDE one Arrow batch kernel per page (same page ->
no shuffle between stages, exactly the reference's stage loop), so a
multi-stage rewrite costs one parse + one serialize per page
regardless of stage count.

Stage specs are declarative (pattern-text pairs), so the operator
ships to executors as plain strings; Python-fn transformers (the
reference's escape hatches) are supported via ``fn_stages`` when the
caller accepts closure pickling.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

REWRITE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("rewritten", T.StringType()),   # EDN text of the tree
    T.StructField("text", T.StringType()),        # extracted text AFTER rewrite
])


def rewrite_pages(pages: DataFrame,
                  stages: list[list[tuple[str, str]]],
                  fn_stages: list[dict] | None = None,
                  dropped_acc=None) -> DataFrame:
    """Parse each page, apply rewrite stages, emit the rewritten tree
    (EDN) and its extracted text.

    ``stages``: list of stages; each stage is a list of
    (from_pattern_text, to_pattern_text) transformers — first
    successful transformer wins per node (cuphic.cljc:340-342).
    ``fn_stages``: optional full stage dicts (transformers/wrapper/
    default callables) appended after the declarative ones.
    ``dropped_acc``: optional SparkContext accumulator counting pages
    the lenient parse ladder could not salvage — same contract as
    ``parse.pages_to_nodes`` (drops are counted, never silent).
    """
    stage_specs = [[(f, t) for f, t in stage] for stage in stages]
    extra = fn_stages or []

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel import reader
        from ..kernel.template import make_transformer, rewrite
        from ..kernel.xmlparse import extract_text
        from .parse import _html_to_tree

        compiled = [
            {"transformers": [
                make_transformer(reader.parse(f), reader.parse(t))
                for f, t in stage]}
            for stage in stage_specs
        ] + list(extra)

        for pdf in batches:
            urls, trees, texts = [], [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                tree = _html_to_tree(html, dropped_acc)
                if tree is None:
                    continue
                out = rewrite(tree, *compiled)
                urls.append(url)
                trees.append(reader.dumps(out))
                texts.append(extract_text(out))
            yield pd.DataFrame({"url": urls, "rewritten": trees,
                                "text": texts})

    return pages.select("url", "html").mapInPandas(gen, REWRITE_SCHEMA)


def select_one_df(matches: DataFrame, pattern_key: str) -> DataFrame:
    """select-one over the matches table: first match per url in
    document order == min node_id (node ids are preorder ranks) —
    cuphic.cljc:415-418 as ORDER BY + per-url aggregation."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("url").orderBy("node_id")
    return (matches.where(F.col("pattern_key") == pattern_key)
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1).drop("rn"))
