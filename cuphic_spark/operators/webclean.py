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
