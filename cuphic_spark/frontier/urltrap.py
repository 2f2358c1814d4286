"""Crawler-trap / URL-hygiene signals.

At 10^10-frontier scale a crawl lives or dies on cheap URL-shape
filters: infinite calendars, session-id explosions, and
self-referential path loops generate unbounded URL spaces that pass
every content filter (each page is "new") while contributing nothing.
The standard defence is a per-url signal vector computed BEFORE
scheduling — pure string/array expressions, JVM-side, no Python, no
shuffle — that the wave loop (or an offline rescore) can threshold.

Signals (all deterministic, integer/boolean — hash-exact vs the
DuckDB twin):

* ``n_segments``      — path depth (non-empty '/'-segments).
* ``max_repeat``      — the most-repeated path segment's count
                        (`/a/b/a/a` -> 3); self-loop traps repeat.
* ``n_digit_segments``— all-digit segments (`/2024/01/07/...`);
                        calendar traps stack them.
* ``n_params``        — query parameters.
* ``has_session``     — a session-id parameter name is present
                        (phpsessid / jsessionid / sessionid / sid).
* ``is_trap``         — the disjunction at conventional thresholds
                        (repeat >= 3, digit-segments >= 3,
                        depth >= 12, any session id, params >= 8).

The repeat count is a nested array lambda (O(depth^2) per url, depth
is tiny) instead of an explode+groupBy — zero shuffle, stays inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["url_trap_signals", "trap_signals_oracle_sql"]

_SESSION_RE = "^(phpsessid|jsessionid|sessionid|sid)="


def url_trap_signals(df: DataFrame, url_col: str = "url",
                     max_repeat: int = 3, max_digit_segs: int = 3,
                     max_depth: int = 12,
                     max_params: int = 8) -> DataFrame:
    """Append the trap-signal columns to ``df`` (see module doc)."""
    url = F.col(url_col)
    # path = after the authority, before ? or #; query = after ?
    # (scheme class covers RFC 3986 incl. UPPERCASE — trap signals
    # must fire on raw, not-yet-canonicalized urls too)
    path = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    params = F.filter(F.split(query, "&"), lambda p: p != "")
    repeat = F.coalesce(
        F.array_max(F.transform(
            segs, lambda s: F.size(F.filter(segs, lambda x: x == s)))),
        F.lit(0))
    digit_segs = F.size(F.filter(segs, lambda s: s.rlike("^[0-9]+$")))
    has_session = F.exists(
        params, lambda p: F.lower(p).rlike(_SESSION_RE))
    out = (df
           .withColumn("n_segments", F.size(segs))
           .withColumn("max_repeat", repeat)
           .withColumn("n_digit_segments", digit_segs)
           .withColumn("n_params", F.size(params))
           .withColumn("has_session",
                       F.coalesce(has_session, F.lit(False))))
    is_trap: Column = (
        (F.col("max_repeat") >= max_repeat)
        | (F.col("n_digit_segments") >= max_digit_segs)
        | (F.col("n_segments") >= max_depth)
        | (F.col("n_params") >= max_params)
        | F.col("has_session"))
    return out.withColumn("is_trap", is_trap)


def trap_signals_oracle_sql(urls_cte: str, max_repeat: int = 3,
                            max_digit_segs: int = 3,
                            max_depth: int = 12,
                            max_params: int = 8) -> str:
    """DuckDB twin over ``urls_cte`` (a CTE body yielding (url)).
    Same extraction regexes, same nested-lambda repeat count."""
    return f"""
        WITH urls AS ({urls_cte}),
        parts AS (
          SELECT url,
                 list_filter(string_split(
                   regexp_extract(url,
                     '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)',
                     1), '/'),
                   s -> s <> '') AS segs,
                 list_filter(string_split(
                   regexp_extract(url, '\\?([^#]*)', 1), '&'),
                   p -> p <> '') AS params
          FROM urls),
        sig AS (
          SELECT url,
                 len(segs)::INTEGER AS n_segments,
                 coalesce(list_max(list_transform(segs,
                   s -> len(list_filter(segs, x -> x = s)))),
                   0)::INTEGER AS max_repeat,
                 len(list_filter(segs,
                   s -> regexp_matches(s, '^[0-9]+$')))::INTEGER
                   AS n_digit_segments,
                 len(params)::INTEGER AS n_params,
                 coalesce(len(list_filter(params,
                   p -> regexp_matches(lower(p), '{_SESSION_RE}')))
                   > 0, FALSE) AS has_session
          FROM parts)
        SELECT url, n_segments, max_repeat, n_digit_segments,
               n_params, has_session,
               (max_repeat >= {max_repeat}
                OR n_digit_segments >= {max_digit_segs}
                OR n_segments >= {max_depth}
                OR n_params >= {max_params}
                OR has_session) AS is_trap
        FROM sig"""
