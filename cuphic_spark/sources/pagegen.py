"""Deterministic Common-Crawl-style `pages` synthesis.

BASELINE.json ``input_hint`` fixes the input shape:
``(url string, warc_ts timestamp, html binary, text string, lang
string)``. No driver-generated pages table exists, so this module
synthesizes one — **entirely with built-in Spark SQL expressions**
(no UDF, no Python row loop) from the read-only ``documents`` table,
so that

* every derived quantity (link count, term presence, extracted text)
  has a closed form a DuckDB oracle can recompute independently, and
* generation itself scales: it is a projection over a scan × a small
  range cross join — embarrassingly parallel, no shuffle.

Page layout for uid = doc_id * copies + copy  (uid < U = n_docs * copies):

    <doc><title id="t{uid}">Doc {uid}</title>
    <p id="p{uid}">{text}</p>
    {for k in 0..(uid % 5)-1:
       <a href="https://host{(uid+k)%10}.example/doc/{(uid*31+k*7)%U}">L{uid}-{k}</a>}
    {if uid%3==0: <term type="kw{uid%7}">w{uid%7}</term>}
    {if uid%4==0: <li>•<b>B{uid%9}</b></li>}
    {if uid%4==2: <li>•</li>}</doc>

(single line — no inter-tag whitespace, so extracted text needs no
blank-dropping and equals the closed form below byte-for-byte)

    text_expected = "Doc {uid}" + text + concat("L{uid}-{k}")
                    + ("w{uid%7}" if uid%3==0)
                    + ("•B{uid%9}" if uid%4==0 else "•" if uid%4==2 else "")

Hosts are deliberately skewed (uid%3==0 -> host0 gets ~40% of pages)
to exercise salting/AQE in the frontier stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_COPIES = 4
N_HOSTS = 10


def synth_pages(spark: SparkSession, sf_dir: str,
                copies: int = DEFAULT_COPIES) -> DataFrame:
    """documents.parquet -> pages(url, warc_ts, html, text, lang)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()  # small dim table; one cheap job
    u = n_docs * copies
    rng = spark.range(copies).withColumnRenamed("id", "copy")
    df = docs.crossJoin(F.broadcast(rng))
    uid = F.col("doc_id") * copies + F.col("copy")
    df = df.withColumn("uid", uid.cast("long"))

    host = F.when(F.col("uid") % 3 == 0, F.lit(0)).otherwise(F.col("uid") % 10)
    url = F.concat(F.lit("https://host"), host.cast("string"),
                   F.lit(".example/doc/"), F.col("uid").cast("string"))

    n_links = (F.col("uid") % 5).cast("int")
    link_k = (
        lambda k: F.concat(
            F.lit('<a href="https://host'),
            ((F.col("uid") + k) % N_HOSTS).cast("string"),
            F.lit(".example/doc/"),
            ((F.col("uid") * 31 + k * 7) % u).cast("string"),
            F.lit('">L'), F.col("uid").cast("string"),
            F.lit("-"), k.cast("string"), F.lit("</a>"),
        )
    )
    links_html = F.when(
        n_links > 0,
        F.aggregate(
            F.transform(F.sequence(F.lit(0), n_links - 1),
                        lambda k: link_k(k)),
            F.lit(""), lambda acc, x: F.concat(acc, x)),
    ).otherwise(F.lit(""))
    links_text = F.when(
        n_links > 0,
        F.aggregate(
            F.transform(F.sequence(F.lit(0), n_links - 1),
                        lambda k: F.concat(F.lit("L"), F.col("uid").cast("string"),
                                           F.lit("-"), k.cast("string"))),
            F.lit(""), lambda acc, x: F.concat(acc, x)),
    ).otherwise(F.lit(""))

    term_word = F.concat(F.lit("w"), (F.col("uid") % 7).cast("string"))
    term_html = F.when(
        F.col("uid") % 3 == 0,
        F.concat(F.lit('<term type="kw'), (F.col("uid") % 7).cast("string"),
                 F.lit('">'), term_word, F.lit("</term>")),
    ).otherwise(F.lit(""))
    term_text = F.when(F.col("uid") % 3 == 0, term_word).otherwise(F.lit(""))

    # literal-prefix bullet item (exercises the compiler's literal
    # child-prefix path [:li {} "•" body]): uid%4==0 -> bullet + bold
    # element (subtree bind), uid%4==2 -> bare bullet (nil bind)
    li_case = F.col("uid") % 4
    li_bold = F.concat(F.lit("B"), (F.col("uid") % 9).cast("string"))
    li_html = (F.when(li_case == 0,
                      F.concat(F.lit("<li>•<b>"), li_bold,
                               F.lit("</b></li>")))
               .when(li_case == 2, F.lit("<li>•</li>"))
               .otherwise(F.lit("")))
    li_text = (F.when(li_case == 0, F.concat(F.lit("•"), li_bold))
               .when(li_case == 2, F.lit("•"))
               .otherwise(F.lit("")))

    title_text = F.concat(F.lit("Doc "), F.col("uid").cast("string"))
    html = F.concat(
        F.lit("<doc><title id=\"t"), F.col("uid").cast("string"), F.lit("\">"),
        title_text,
        F.lit("</title><p id=\"p"), F.col("uid").cast("string"), F.lit("\">"),
        F.col("text"),
        F.lit("</p>"), links_html, term_html, li_html, F.lit("</doc>"),
    )
    text_expected = F.concat(title_text, F.col("text"), links_text,
                             term_text, li_text)

    return df.select(
        url.alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(secs=F.col("uid").cast("double"))).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        text_expected.alias("text"),
        F.col("lang"),
        F.col("uid"),
    )


def oracle_pages_cte(copies: int = DEFAULT_COPIES) -> str:
    """DuckDB CTE reproducing synth_pages' closed forms over the
    pre-registered ``documents`` view (url/uid/links/term/text only —
    the oracle never builds html). Compose as::

        WITH pages AS ({cte}) SELECT ... FROM pages
    """
    return f"""
    SELECT
      d.doc_id * {copies} + c.copy AS uid,
      'https://host' || (CASE WHEN (d.doc_id * {copies} + c.copy) % 3 = 0
                         THEN 0 ELSE (d.doc_id * {copies} + c.copy) % 10 END)
        || '.example/doc/' || (d.doc_id * {copies} + c.copy) AS url,
      d.text AS doc_text,
      d.lang AS lang,
      ((d.doc_id * {copies} + c.copy) % 5)::INT AS n_links,
      ((d.doc_id * {copies} + c.copy) % 3 = 0) AS has_term,
      'w' || ((d.doc_id * {copies} + c.copy) % 7) AS term_word,
      'kw' || ((d.doc_id * {copies} + c.copy) % 7) AS term_type,
      ((d.doc_id * {copies} + c.copy) % 4)::INT AS li_case,
      'B' || ((d.doc_id * {copies} + c.copy) % 9) AS li_bold,
      'Doc ' || (d.doc_id * {copies} + c.copy) AS title_text
    FROM documents d
    CROSS JOIN (SELECT UNNEST(range({copies})) AS copy) c
    """
