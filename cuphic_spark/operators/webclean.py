"""Web-corpus cleaning operators: mojibake repair (UTF-8 bytes
mis-decoded as windows-1252 — the single most common encoding damage
in crawled text) and document-level filtering (source blocklist +
badword ratio, the C4-style corpus gate).

All pure built-in column expressions (JVM-side, codegen'd); each has
a closed-form DuckDB twin generated from the SAME tables below —
single-sourced like textstats.PII_PATTERNS, so the oracle can never
drift from the operator.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 (pandas_udf annotations)

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Characters whose UTF-8 encodings, when mis-decoded as cp1252,
# produce the classic mojibake sequences ("Ã©" for "é", "â€™" for
# "’"). The table is GENERATED from the codec pair rather than
# hand-typed: repair is replace(mojibake_seq -> char), applied
# longest-sequence-first (3-byte punctuation before 2-byte accents —
# fixed deterministic order, no prefix of a longer entry can fire
# early because every sequence is consumed whole).
_MOJIBAKE_CHARS = (
    # Latin-1 accents (2-byte UTF-8)
    "éèêëàâäçîïôöùûüñ"
    # Windows punctuation (3-byte UTF-8): curly quotes, dashes,
    # ellipsis, euro — the ones real crawls actually contain
    "’‘“”–—…€"
)


def _mojibake_pairs() -> list[tuple[str, str]]:
    pairs = []
    for ch in _MOJIBAKE_CHARS:
        try:
            moji = ch.encode("utf-8").decode("windows-1252")
        except UnicodeDecodeError:
            # UTF-8 byte hits one of cp1252's five undefined slots
            # (0x81 0x8D 0x8F 0x90 0x9D) — that char's mojibake form
            # cannot round-trip through strict cp1252, skip it
            continue
        pairs.append((moji, ch))
    # longest first, then by codepoint: deterministic, and no shorter
    # sequence can consume the head of a longer one
    pairs.sort(key=lambda p: (-len(p[0]), p[1]))
    return pairs


MOJIBAKE_PAIRS = _mojibake_pairs()


def fix_mojibake(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Repair cp1252 mojibake via a chained literal replace (zero
    regex, zero UDF — whole-stage codegen'd). ``mojibake_found``
    derives from the materialized repaired column (single evaluation
    of the chain, the scrub_pii lesson)."""
    col = F.col(text_col)
    for moji, ch in MOJIBAKE_PAIRS:
        col = F.replace(col, F.lit(moji), F.lit(ch))
    out = docs.select("doc_id", F.col(text_col).alias("_orig"),
                      col.alias("repaired"))
    return out.select(
        "doc_id", "repaired",
        F.coalesce(F.col("repaired") != F.col("_orig"),
                   F.lit(False)).alias("mojibake_found"))


def mojibake_oracle_sql(inner: str, text_expr: str = "text") -> str:
    """DuckDB twin: the same replace chain, generated from the same
    MOJIBAKE_PAIRS table, non-ASCII expressed as chr() calls so the
    SQL text itself stays ASCII-safe."""

    def lit(s: str) -> str:
        return "||".join(f"chr({ord(c)})" for c in s)

    expr = text_expr
    for moji, ch in MOJIBAKE_PAIRS:
        expr = f"replace({expr}, {lit(moji)}, {lit(ch)})"
    return f"""
        WITH src AS ({inner})
        SELECT doc_id, {expr} AS repaired,
               coalesce({expr} <> {text_expr}, FALSE) AS mojibake_found
        FROM src
    """


# Unicode script ranges for script detection — expressed as \uXXXX
# escapes (Java regex) with \x{XXXX} twins (RE2/DuckDB) so BOTH
# pattern strings stay pure ASCII. Order = deterministic dominance
# tie-break (earlier wins on equal counts).
SCRIPT_RANGES = (
    ("latin", "A-Za-z", "A-Za-z"),
    ("cjk", "\\u4E00-\\u9FFF", "\\x{4E00}-\\x{9FFF}"),
    ("cyrillic", "\\u0400-\\u04FF", "\\x{0400}-\\x{04FF}"),
    ("arabic", "\\u0600-\\u06FF", "\\x{0600}-\\x{06FF}"),
    ("greek", "\\u0370-\\u03FF", "\\x{0370}-\\x{03FF}"),
)


def script_detect(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document script detection: character counts per Unicode
    script range (integer — hash-stable) and the dominant script
    (max count, ties to the SCRIPT_RANGES order, 'unknown' when
    every count is zero). Pure regexp_count column exprs."""
    counts = {name: F.regexp_count(F.col(text_col),
                                   F.lit(f"[{java}]"))
              for name, java, _ in SCRIPT_RANGES}
    # dominance: later scripts are tested FIRST (outermost when) but
    # must be STRICTLY greater than every earlier script's count to
    # take over — so equal counts resolve to the earliest entry in
    # SCRIPT_RANGES, deterministically
    dominant = F.lit("unknown")
    for i, (name, _, _) in enumerate(SCRIPT_RANGES):
        cond = F.col(f"n_{name}") > 0
        for j in range(i):
            cond = cond & (F.col(f"n_{name}")
                           > F.col(f"n_{SCRIPT_RANGES[j][0]}"))
        dominant = F.when(cond, F.lit(name)).otherwise(dominant)
    with_counts = docs.select(
        "doc_id", *[c.alias(f"n_{n}") for n, c in counts.items()])
    return with_counts.select("doc_id",
                              *[f"n_{n}" for n in counts],
                              dominant.alias("script"))


def script_detect_oracle_sql(inner: str) -> str:
    """DuckDB twin generated from the same SCRIPT_RANGES table."""
    cols = ", ".join(
        f"CAST(len(regexp_extract_all(text, '[{re2}]')) AS INTEGER)"
        f" AS n_{name}" for name, _, re2 in SCRIPT_RANGES)
    dominant = "'unknown'"
    for i, (name, _, _) in enumerate(SCRIPT_RANGES):
        cond = f"n_{name} > 0"
        for j in range(i):
            cond += f" AND n_{name} > n_{SCRIPT_RANGES[j][0]}"
        dominant = f"CASE WHEN {cond} THEN '{name}' ELSE {dominant} END"
    return f"""
        WITH src AS ({inner}),
        counted AS (SELECT doc_id, {cols} FROM src)
        SELECT doc_id, {', '.join('n_' + n for n, _, _ in SCRIPT_RANGES)},
               {dominant} AS script
        FROM counted
    """


def ngram_diversity(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """RefinedWeb-style n-gram diversity signal: total and distinct
    word bigrams per document plus the distinct/total ratio in
    integer permille (floor — hash-stable). Repetitive boilerplate
    scores low; natural text scores near 1000. Pure array exprs over
    the existing split (zip_with of the two shifted slices), no
    explode, no shuffle."""
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    bigrams = F.zip_with(
        F.slice(words, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b))
    total = F.size(bigrams)
    distinct = F.size(F.array_distinct(bigrams))
    return docs.select(
        "doc_id",
        total.alias("n_bigrams"),
        distinct.alias("n_distinct_bigrams"),
        F.when(total > 0,
               F.floor(distinct * 1000 / total).cast("int"))
        .otherwise(F.lit(0).cast("int")).alias("diversity_permille"))


# The C4-style document gate: a tiny deterministic badword list (the
# real pipelines use the public LDNOOBW lists; the mechanism — word-
# membership ratio over the split — is what matters here) plus a
# source blocklist.
BADWORDS = ("casino", "viagra", "lottery", "xxx")


def doc_filter_flags(docs: DataFrame, badwords=BADWORDS,
                     blocked_sources=("srcX",),
                     max_badword_permille: int = 20) -> DataFrame:
    """Document-filter flags: blocked source, badword count and
    per-mille (integer — hash-stable), and the combined keep verdict.
    Pure column exprs: one array filter over the existing split, no
    shuffle, predicate stays in the scan stage."""
    words = F.split(F.col("text"), " ")
    bad = F.size(F.filter(words, lambda w: w.isin(*badwords)))
    n_words = F.size(words)
    permille = F.floor(bad * 1000 / n_words).cast("int")
    blocked = F.col("source").isin(list(blocked_sources))
    return docs.select(
        "doc_id",
        blocked.alias("blocked_source"),
        bad.alias("badword_count"),
        permille.alias("badword_permille"),
        ((~blocked) & (permille <= max_badword_permille)).alias("keep"),
    )


def normalize_nfc(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Unicode NFC normalization (UAX #15) — the prerequisite for
    every downstream equality-keyed operator: 'café' spelled with a
    combining acute and with the precomposed character are DIFFERENT
    byte strings (md5 dedup, line dedup, span windows, simhash
    tokens all miss the duplicate) until composed.

    Arrow-batched pandas UDF over stdlib unicodedata (composition is
    table-driven; no column-expression equivalent exists), one narrow
    pass, no shuffle. Returns doc_id, normalized, was_denormalized.
    The DuckDB twin is built-in ``nfc_normalize`` — two independent
    UAX #15 implementations agreeing byte-for-byte is the gate."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda t: None if t is None
                     else unicodedata.normalize("NFC", t))

    out = docs.withColumn("normalized", nfc(F.col(text_col)))
    return out.withColumn(
        "was_denormalized",
        F.coalesce(F.col("normalized") != F.col(text_col),
                   F.lit(False)))
