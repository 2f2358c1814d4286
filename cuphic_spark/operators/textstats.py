"""Text-analysis operators for a training-data pipeline: token
counting, quality scoring, language-ID heuristic, fingerprinting.

All pure built-in ``pyspark.sql.functions`` column expressions —
JVM-side, whole-stage-codegen'd, no Python in the hot path. Each has
a closed-form SQL equivalent for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Deliberately deterministic + SQL-replicable (substring occurrence
# counts), not a statistical model.
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "es": ["el", "los", "que"],
}


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (ceil of
    chars/4 per word, a common rough proxy)."""
    words = F.split(F.col("text"), " ")
    n_tokens = F.size(words)
    n_subwords = F.aggregate(
        words, F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("int"))
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_subwords.alias("n_subwords"),
        F.length("text").alias("n_chars_actual"),
    )


def quality_score(docs: DataFrame,
                  min_words: int = 20, max_words: int = 80,
                  max_avg_word_len: int = 8) -> DataFrame:
    """Deterministic quality gates over integer metrics (length,
    word count, mean word length, uppercase start)."""
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    n_chars = F.length("text")
    # mean word length in tenths (integer — avoids float hash drift;
    # explicit floor: Spark's double->int cast truncates while DuckDB's
    # rounds, so the cast must never see a fractional value)
    avg_len_tenths = F.floor((n_chars - (n_words - 1)) * 10 / n_words).cast("int")
    passes = (
        (n_words >= min_words) & (n_words <= max_words)
        & (avg_len_tenths <= max_avg_word_len * 10)
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_chars.alias("n_chars_len"),
        avg_len_tenths.alias("avg_word_len_tenths"),
        passes.cast("int").alias("quality_pass"),
    )


# Gopher rule constants (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", Table A1) —
# shared verbatim with the DuckDB twin.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have",
                    "with"]
GOPHER_BULLETS = ["- ", "* ", "•"]


def gopher_quality(docs: DataFrame, text_col: str = "text",
                   min_words: int = 50,
                   max_words: int = 100_000) -> DataFrame:
    """The FULL Gopher quality rule set (Rae et al. 2021 Table A1;
    round-6 verdict #7 — quality_score carries the length subset) as
    pure column expressions over INTEGER metrics (ratios compared by
    cross-multiplication, so no float ever reaches the output):

    * word count in [min_words, max_words]
    * mean word length in [3, 10] chars (tenths, floored)
    * symbol-to-word ratio (``#`` + non-overlapping ``...``) <= 0.1
    * < 90% of lines starting with a bullet (``- ``/``* ``/U+2022)
    * < 30% of lines ending with ``...``
    * >= 80% of words containing an alphabetic character
    * >= 2 distinct Gopher stop words present

    The duplication rules of the same table live in
    ``repetition_stats``. One projection, zero UDFs, zero shuffles —
    at 100 TB this runs scan-speed alongside the other corpus
    filters."""
    text = F.col(text_col)
    words = F.split(text, " ")
    n_words = F.size(words)
    n_chars = F.length(text)
    avg_tenths = F.floor(
        (n_chars - (n_words - 1)) * 10 / n_words).cast("int")
    n_hash = (F.length(text)
              - F.length(F.replace(text, F.lit("#"), F.lit("")))
              ).cast("int")
    n_ellipsis = ((F.length(text)
                   - F.length(F.replace(text, F.lit("..."),
                                        F.lit("")))) / 3).cast("int")
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    def _is_bullet(li):
        cond = li.startswith(GOPHER_BULLETS[0])
        for b in GOPHER_BULLETS[1:]:
            cond = cond | li.startswith(b)
        return cond

    n_bullet = F.size(F.filter(lines, _is_bullet))
    n_ell_lines = F.size(F.filter(lines,
                                  lambda li: li.endswith("...")))
    n_alpha = F.size(F.filter(words,
                              lambda w: w.rlike("[A-Za-z]")))
    padded = F.concat(F.lit(" "),
                      F.replace(text, F.lit("\n"), F.lit(" ")),
                      F.lit(" "))
    n_stop = F.lit(0)
    for s in GOPHER_STOPWORDS:
        n_stop = n_stop + padded.contains(f" {s} ").cast("int")
    n_sym = n_hash + n_ellipsis
    passes = ((n_words >= min_words) & (n_words <= max_words)
              & (avg_tenths >= 30) & (avg_tenths <= 100)
              & (n_sym * 10 <= n_words)
              & (n_bullet * 10 < n_lines * 9)
              & (n_ell_lines * 10 < n_lines * 3)
              & (n_alpha * 10 >= n_words * 8)
              & (n_stop >= 2))
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        avg_tenths.alias("avg_word_len_tenths"),
        n_sym.cast("int").alias("n_symbols"),
        n_lines.alias("n_lines"),
        n_bullet.alias("n_bullet_lines"),
        n_ell_lines.alias("n_ellipsis_lines"),
        n_alpha.alias("n_alpha_words"),
        n_stop.alias("n_stopwords"),
        passes.cast("int").alias("gopher_pass"))


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word-count language heuristic. hits_xx = number of
    marker-word occurrences (space-padded substring count)."""
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    cols = [F.col("doc_id")]
    hit_cols = {}
    for lang, markers in LANG_MARKERS.items():
        total = F.lit(0)
        for m in markers:
            needle = f" {m} "
            # occurrences = (len(s) - len(replace(s, needle, ''))) / len(needle)
            # NOTE: overlapping pads (' the the ') undercount — the
            # oracle uses the identical formula, so both sides agree.
            total = total + (
                (F.length(padded) - F.length(F.replace(padded, F.lit(needle),
                                                       F.lit(""))))
                / len(needle)
            ).cast("int")
        hit_cols[lang] = total
        cols.append(total.alias(f"hits_{lang}"))
    # predicted = argmax with fixed tie order en > de > es, 'und' if all 0
    pred = (
        F.when((hit_cols["en"] >= hit_cols["de"])
               & (hit_cols["en"] >= hit_cols["es"])
               & (hit_cols["en"] > 0), F.lit("en"))
        .when((hit_cols["de"] >= hit_cols["es"]) & (hit_cols["de"] > 0),
              F.lit("de"))
        .when(hit_cols["es"] > 0, F.lit("es"))
        .otherwise(F.lit("und"))
    )
    cols.append(pred.alias("predicted_lang"))
    return docs.select(*cols)


def lang_id_oracle_sql() -> str:
    def occ(m):
        return ("CAST((length(p) - length(replace(p, ' {m} ', '')))"
                " / {n} AS INT)").format(m=m, n=len(m) + 2)

    hits = {lang: " + ".join(occ(m) for m in ms)
            for lang, ms in LANG_MARKERS.items()}
    return f"""
    SELECT doc_id,
           {hits['en']} AS hits_en,
           {hits['de']} AS hits_de,
           {hits['es']} AS hits_es,
           CASE
             WHEN {hits['en']} >= {hits['de']} AND {hits['en']} >= {hits['es']}
                  AND {hits['en']} > 0 THEN 'en'
             WHEN {hits['de']} >= {hits['es']} AND {hits['de']} > 0 THEN 'de'
             WHEN {hits['es']} > 0 THEN 'es'
             ELSE 'und'
           END AS predicted_lang
    FROM (SELECT doc_id, ' ' || text || ' ' AS p FROM documents)
    """


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 whole-text hash + a 31-base rolling
    hash over the first 32 chars (mod 2^31, closed form both sides)."""
    prefix = F.substring("text", 1, 32)
    chars = F.split(prefix, "")
    rolling = F.aggregate(
        chars, F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % (2 ** 31))
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("text_md5"),
        rolling.alias("rolling_hash"),
    )


def winnow_fingerprints(docs: DataFrame, k: int = 3,
                        w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the standard fingerprint-selection scheme for
    large-scale near-dup/overlap detection): hash every k-word gram,
    slide a window of ``w`` consecutive hashes, select each window's
    minimum (leftmost on ties). Guarantees any shared run of
    w + k - 1 words between two documents shares a fingerprint,
    while keeping ~2/(w+1) of the grams.

    Pure column expressions (O(n·w) per doc, JVM-side): the selection
    uses the string trick min(hash || ':' || zero-padded position) —
    hex md5 is fixed-width so lexicographic = (hash asc, pos asc),
    making the leftmost-min tie-break a plain array_min. Returns
    (doc_id, pos, gram_hash), distinct. Docs with fewer than
    k + w - 1 words yield no fingerprints (no full window)."""
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(0), n_words - k),
        lambda i: F.md5(F.concat_ws(
            " ", F.slice(words, i + 1, k))))

    def sel(i):
        window = F.transform(
            F.sequence(i, i + w - 1),
            lambda j: F.concat(F.element_at(grams, j + 1),
                               F.lit(":"),
                               F.lpad(j.cast("string"), 6, "0")))
        return F.array_min(window)

    fps = F.array_distinct(
        F.transform(F.sequence(F.lit(0), n_words - k - w + 1),
                    lambda i: sel(i)))
    return (docs
            .where(n_words >= k + w - 1)
            .select("doc_id", F.explode(fps).alias("fp"))
            .select("doc_id",
                    F.substring("fp", 34, 6).cast("int").alias("pos"),
                    F.substring("fp", 1, 32).alias("gram_hash"))
            .distinct())


# Shared PII patterns: kept to constructs with IDENTICAL semantics in
# Java regex (Spark) and RE2 (DuckDB) — character classes, bounded
# repetition, \b, non-capturing groups — so the oracle can run the
# very same strings. Order matters: emails first (their local part
# can contain digits a later pass would mangle), then IPs, then
# phones.
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    (r"\+[0-9][0-9 ().-]{7,}[0-9]", "<PHONE>"),
]


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4s / international-format phone numbers —
    the standard pre-training hygiene pass. Pure column expressions
    (chained regexp_replace, JVM-side); patterns shared verbatim
    with the DuckDB oracle (PII_PATTERNS). Adds ``scrubbed`` plus a
    ``pii_found`` flag (text changed; null text -> false)."""
    scrubbed = F.col(text_col)
    for pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    # materialize the chained regex ONCE and derive the flag from the
    # materialized column in a second projection — one projection
    # would evaluate the replace chain twice per row (column + flag),
    # doubling regex cost on the hottest corpus path; CollapseProject
    # keeps the two Projects apart because the alias is non-cheap and
    # referenced twice (advisor round-6)
    return (docs
            .select("*", scrubbed.alias("scrubbed"))
            .select("*",
                    F.coalesce(F.col("scrubbed") != F.col(text_col),
                               F.lit(False)).alias("pii_found")))


def chunk_text(docs: DataFrame, max_words: int = 50,
               stride: int | None = None) -> DataFrame:
    """Split each document into word-window chunks for a model
    context budget: chunk i covers words [i*stride, i*stride +
    max_words). ``stride`` defaults to max_words (disjoint chunks);
    a smaller stride yields overlapping chunks (standard for
    retrieval corpora). Pure column expressions — the shingle array
    is built once and sliced per chunk; one explode, no UDF. Empty
    texts yield one empty chunk (documents are never silently
    dropped)."""
    stride = max_words if stride is None else stride
    if stride <= 0:
        raise ValueError(f"stride must be positive, got {stride}")
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    # number of windows: 1 + ceil(max(0, n - max_words) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(F.lit(0), n - max_words) / F.lit(stride)
    ).cast("int")
    idx = F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id")
    return (docs
            .select("doc_id", "text", idx)
            .select(
                "doc_id",
                "chunk_id",
                F.array_join(
                    F.slice(F.split(F.col("text"), " "),
                            F.col("chunk_id") * stride + 1, max_words),
                    " ").alias("chunk"))
            .withColumn("n_chunk_words",
                        F.size(F.split(F.col("chunk"), " "))))


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher/C4-style repetition signals: the fraction of a
    document's word mass inside its MOST FREQUENT word and bigram
    (natural-language text sits low; boilerplate/spam/keyword-stuffed
    pages spike). Relational shape: one explode per n-gram order,
    count per (doc, gram), window-max per doc — two doc-keyed
    shuffles with map-side partial aggregation, no UDF. Ties break by
    count only (the FRACTION is tie-invariant). Docs shorter than 2
    words report 0 for the bigram fraction."""
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    base = docs.select("doc_id", words.alias("w"), n.alias("n_words"))

    uni = (base.select("doc_id", "n_words",
                       F.explode("w").alias("g"))
           .groupBy("doc_id", "n_words", "g")
           .agg(F.count("*").alias("c"))
           .groupBy("doc_id", "n_words")
           .agg(F.max("c").alias("top_c")))
    top_word_frac = F.floor(
        F.col("top_c") * 1000 / F.col("n_words")).cast("int")

    bi = (base.where(F.col("n_words") >= 2)
          .select("doc_id", "n_words",
                  F.explode(F.transform(
                      F.sequence(F.lit(0), F.col("n_words") - 2),
                      lambda i: F.concat_ws(
                          " ", F.slice(F.col("w"), i + 1, 2))))
                  .alias("g"))
          .groupBy("doc_id", "n_words", "g")
          .agg(F.count("*").alias("c"))
          .groupBy("doc_id")
          .agg(F.max("c").alias("top_bi_c"),
               F.first("n_words").alias("nb")))
    top_bigram_frac = F.floor(
        F.col("top_bi_c") * 1000 / (F.col("nb") - 1)).cast("int")

    out = (uni.select("doc_id",
                      F.col("n_words").alias("n_words"),
                      top_word_frac.alias("top_word_permille"))
           .join(bi.select("doc_id",
                           top_bigram_frac
                           .alias("top_bigram_permille")),
                 "doc_id", "left"))
    return out.select(
        "doc_id", "n_words", "top_word_permille",
        F.coalesce("top_bigram_permille", F.lit(0))
        .alias("top_bigram_permille"))


def top_terms_tfidf(docs: DataFrame, k: int = 3) -> DataFrame:
    """Corpus-level TF-IDF: per document, the top-k terms by
    tf * ln(N / df) — the classic relational analytics shape (term
    explode → document-frequency aggregate → broadcast-sized idf
    join → per-doc window top-k). Scores are returned in integer
    permille (round(1000 * tf*idf)) so the DuckDB twin is
    hash-stable; ties break lexicographically by term for a total
    order."""
    from pyspark.sql import Window

    words = F.split(F.col("text"), " ")
    terms = (docs.select("doc_id",
                         F.size(words).alias("n_words"),
                         F.explode(words).alias("term"))
             .groupBy("doc_id", "n_words", "term")
             .agg(F.count("*").alias("tf")))
    n_docs = docs.select(F.countDistinct("doc_id")).first()[0]
    df = (terms.groupBy("term")
          .agg(F.countDistinct("doc_id").alias("df")))
    scored = (terms.join(df, "term")
              .select("doc_id", "term",
                      F.round(F.col("tf") * 1000 / F.col("n_words")
                              * F.log(F.lit(float(n_docs))
                                      / F.col("df")))
                      .cast("int").alias("score_permille")))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_permille"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("doc_id", "rank", "term", "score_permille"))


def lm_fluency(docs: DataFrame) -> DataFrame:
    """Corpus-trained bigram LM fluency score — the CCNet-style
    quality axis (score documents by how typical their word
    transitions are for THIS corpus), kept integer-exact.

    For every bigram (prev, nxt) the corpus MLE conditional is
    c2(prev,nxt) / c1(prev) where c1 counts prev as a bigram PREFIX
    (so the denominator matches the numerator's event space with no
    end-of-document edge). Each document scores

        fluency_sum = sum over its bigrams of (c2 * 10^6) div c1

    i.e. the summed conditional probability in integer parts-per-
    million — floor division keeps every term an int64, so the sum
    is partitioning-invariant and hash-exact against the DuckDB
    twin (float log-probs would not be). n_bigrams lets callers
    normalize to a mean; docs with < 2 tokens score (0, 0).

    Scale shape: one explode (no Python), two count aggregates —
    c2 is vocabulary²-bounded and c1 derives from c2's partial
    sums — then two joins back; common-word skew on the c1 join is
    AQE-handled (skew-join), and both count tables are usually
    broadcastable at web vocabulary sizes."""
    ws = F.split(F.col("text"), " ")
    bigr = (docs.withColumn("ws", ws)
            .where(F.size("ws") >= 2)
            .select("doc_id",
                    F.explode(F.expr(
                        "arrays_zip(slice(ws, 1, size(ws) - 1), "
                        "slice(ws, 2, size(ws) - 1))")).alias("bg"))
            .select("doc_id",
                    F.col("bg")["0"].alias("prev"),
                    F.col("bg")["1"].alias("nxt")))
    c2 = bigr.groupBy("prev", "nxt").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("prev").agg(F.sum("c2").alias("c1"))
    scored = (bigr.join(c2, ["prev", "nxt"]).join(c1, "prev")
              .groupBy("doc_id")
              .agg(F.sum(F.expr("(c2 * 1000000) div c1"))
                   .alias("fluency_sum"),
                   F.count("*").alias("n_bigrams")))
    return (docs.select("doc_id").join(scored, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("fluency_sum", F.lit(0))
                    .cast("long").alias("fluency_sum"),
                    F.coalesce("n_bigrams", F.lit(0))
                    .cast("long").alias("n_bigrams")))


def lm_fluency_oracle_sql() -> str:
    """DuckDB twin of :func:`lm_fluency` (same integer ppm floor)."""
    return """
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS ws
          FROM documents),
        b AS (
          SELECT doc_id, ws[t.i] AS prev, ws[t.i + 1] AS nxt
          FROM w, UNNEST(range(1, len(ws))) AS t(i)),
        c2 AS (SELECT prev, nxt, count(*) AS c2
               FROM b GROUP BY prev, nxt),
        c1 AS (SELECT prev, sum(c2) AS c1 FROM c2 GROUP BY prev),
        s AS (
          SELECT b.doc_id,
                 sum((c2.c2 * 1000000) // c1.c1) AS fsum,
                 count(*) AS nb
          FROM b
          JOIN c2 ON b.prev = c2.prev AND b.nxt = c2.nxt
          JOIN c1 ON b.prev = c1.prev
          GROUP BY b.doc_id)
        SELECT d.doc_id,
               coalesce(s.fsum, 0)::BIGINT AS fluency_sum,
               coalesce(s.nb, 0)::BIGINT AS n_bigrams
        FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
    """
