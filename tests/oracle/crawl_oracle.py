"""Single-process crawl oracle — defines the expected crawl ordering
and URL-seen membership (BASELINE.json north_rule: "matching the
reference crawl ordering ... given the same seed list and politeness
budget"; cuphic has no crawler, so this oracle IS the reference).

Deliberately independent of the Spark implementation: plain Python
sets/sorted lists, its own canonicalization (urllib), its own robots
logic, its own link extraction (regex over the generated html). Only
the web-graph spec (cuphic_spark.frontier.webgraph) is shared — it is
the simulated *input*, not frontier logic.

The frontier model mirrors the manifest protocol exactly
(frontier/bands.py): score bands split into score-sorted RUNS
("segments"), waves reading a deterministic segment set with a score
cut (scheduling sees the exact prefix {score >= cut}; consumed rows
below the cut pass through), segment creation order (seq), and
band consolidation — all pure functions of per-score row counts, so
no Spark-side physical detail leaks in.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urljoin, urlsplit, urlunsplit

from cuphic_spark.frontier import webgraph

_HREF_RE = re.compile(r'<a href="([^"]*)"')
_DEFAULT_PORTS = {"http": 80, "https": 443}


def canonicalize(href: str, base: str) -> str:
    absolute = urljoin(base, href)
    parts = urlsplit(absolute)
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = parts.port
    netloc = host if port in (None, _DEFAULT_PORTS.get(scheme)) \
        else f"{host}:{port}"
    return urlunsplit((scheme, netloc, parts.path or "/", parts.query, ""))


def score(url: str, depth: int, is_seed: bool) -> int:
    url_id = int(re.search(r"(\d+)$", url).group(1))
    return (10000 - 1000 * min(depth, 9)) + url_id % 7 \
        + (5000 if is_seed else 0)


def host_of_url(url: str) -> str:
    return re.match(r"^[a-z]+://([^/:?#]+)", url).group(1)


def path_of_url(url: str) -> str:
    m = re.match(r"^[a-z]+://[^/]+(/[^#?]*)", url)
    return m.group(1) if m else "/"


def robots_deny(url: str, version: int = 0) -> bool:
    """Robots epoch ``version`` denies hosts h % 7 == version % 7
    (v=0 = the static spec) — twin of crawl.robots_rules."""
    m = re.match(r"host(\d+)\.example$", host_of_url(url))
    return (m is not None and int(m.group(1)) % 7 == version % 7
            and path_of_url(url).startswith(webgraph.DENY_PREFIX))


@dataclass
class OracleState:
    frontier: dict = field(default_factory=dict)  # url -> (depth, score, wave)
    seen: dict = field(default_factory=dict)      # url -> added_wave
    fetch_log: list = field(default_factory=list)
    metrics: list = field(default_factory=list)


# -------------------------------------------------------------------------
# Manifest model (twin of frontier/bands.py): segments = score-sorted
# runs per band, each {"urls", "count", "lo", "hi", "seq"}.
# -------------------------------------------------------------------------


def _split_runs(rows: dict, band_width: int, split_rows: int):
    """Split delta rows into per-band runs by per-score counts —
    every distinct score lands wholly in one run (twin of
    bands._with_runs). ``rows``: url -> (depth, score, wave).
    Yields (band, run, urls, lo, hi) in (band asc, run asc) order."""
    by_band: dict[int, dict[int, list[str]]] = {}
    for u, (_d, sc, _w) in rows.items():
        by_band.setdefault(sc // band_width, {}) \
            .setdefault(sc, []).append(u)
    for band in sorted(by_band):
        runs: dict[int, list[tuple[int, list[str]]]] = {}
        cum = 0
        for sc in sorted(by_band[band], reverse=True):
            urls = by_band[band][sc]
            runs.setdefault(cum // split_rows, []).append((sc, urls))
            cum += len(urls)
        for run in sorted(runs):
            scores = [sc for sc, _u in runs[run]]
            urls = [u for _sc, us in runs[run] for u in us]
            yield band, run, urls, min(scores), max(scores)


def _append_delta(segments: dict, delta_rows: dict, band_width: int,
                  split_rows: int, next_seq: int) -> int:
    for band, _run, urls, lo, hi in _split_runs(delta_rows, band_width,
                                                split_rows):
        segments.setdefault(band, []).append(
            {"urls": urls, "count": len(urls), "lo": lo, "hi": hi,
             "seq": next_seq})
        next_seq += 1
    return next_seq


def _consolidate(segments: dict, frontier: dict, band_width: int,
                 split_rows: int, band_max_paths: int,
                 next_seq: int) -> int:
    """Twin of the band_max_paths consolidation: a band whose file
    references outgrow its IDEAL run count (ceil(count/split)) by
    more than band_max_paths is merged and re-split into fresh runs
    with fresh seqs (band asc order)."""
    for band in sorted(segments):
        segs = segments[band]
        count = sum(s["count"] for s in segs)
        ideal = -(-count // split_rows)
        if len(segs) <= ideal + band_max_paths:  # 1 path per segment
            continue
        merged = {u: frontier[u] for s in segs for u in s["urls"]}
        fresh = []
        for b2, _run, urls, lo, hi in _split_runs(merged, band_width,
                                                  split_rows):
            assert b2 == band
            fresh.append({"urls": urls, "count": len(urls), "lo": lo,
                          "hi": hi, "seq": next_seq})
            next_seq += 1
        segments[band] = fresh
    return next_seq


def _plan(segments: dict, band_width: int, need: int):
    """Twin of bands.plan_read: greedy band descent, score-cut
    refinement + closure inside the final band. Returns
    (consumed: dict band -> [segs], s_cut, rows_read, exhausted)."""
    consumed: dict[int, list[dict]] = {}
    s_cut = 0
    total = 0
    order = sorted(segments, reverse=True)
    for i, b in enumerate(order):
        segs = sorted(segments[b],
                      key=lambda s: (-s["hi"], -s["lo"], s["seq"]))
        bcount = sum(s["count"] for s in segs)
        if total + bcount < need or bcount == 0:
            consumed[b] = segs
            total += bcount
            s_cut = b * band_width
            continue
        cuts = sorted({s["lo"] for s in segs},
                      reverse=True) + [b * band_width]
        for cut in cuts:
            cover = [s for s in segs if s["hi"] >= cut]
            if total + sum(s["count"] for s in cover) >= need:
                break
        consumed[b] = cover
        total += sum(s["count"] for s in cover)
        s_cut = b * band_width if len(cover) == len(segs) else cut
        exhausted = (len(cover) == len(segs) and i == len(order) - 1)
        return consumed, s_cut, total, exhausted
    return consumed, s_cut, total, True


def run(universe: int, n_seeds: int, budget_per_host: int, wave_cap: int,
        n_waves: int, page_weight: int = 30,
        band_width: int = 1000, band_split_rows: int = 0,
        band_max_paths: int = 16,
        robots_ttl_waves: int = 0) -> OracleState:
    split_rows = band_split_rows or max(wave_cap, 1)
    st = OracleState()
    for i in range(n_seeds):
        url = webgraph.url_of(i)
        st.frontier[url] = (0, score(url, 0, True), 0)
        st.seen[url] = 0
    # seed manifest: the seed frontier written through the same
    # run-split path as every later wave delta
    segments: dict[int, list[dict]] = {}
    next_seq = _append_delta(segments, st.frontier, band_width,
                             split_rows, 0)
    next_seq = _consolidate(segments, st.frontier, band_width,
                            split_rows, band_max_paths, next_seq)

    for wave in range(n_waves):
        # ----- segment read protocol (mirrors bands.plan_read + the
        # extension loop in crawl.run_wave): a wave reads only the
        # top segments whose counts cover wave_cap — scheduling sees
        # the exact score prefix {score >= s_cut}; consumed rows
        # below the cut pass through — extending when robots/
        # politeness leave fewer than wave_cap budgeted rows.
        robots_version = (wave // robots_ttl_waves
                          if robots_ttl_waves else 0)
        need = wave_cap
        while True:
            consumed, s_cut, rows_read, exhausted = _plan(
                segments, band_width, need)
            read_urls = [u for segs in consumed.values()
                         for s in segs for u in s["urls"]]
            eligible_urls = [u for u in read_urls
                             if st.frontier[u][1] >= s_cut]
            denied = [u for u in eligible_urls
                      if robots_deny(u, robots_version)]
            denied_set = set(denied)
            eligible = sorted(
                ((u, st.frontier[u]) for u in eligible_urls
                 if u not in denied_set),
                key=lambda kv: (-kv[1][1], kv[0]))
            # politeness: per-host budget in (score desc, url asc)
            # order — ranks over the prefix equal full-frontier ranks
            # (rows outside the prefix all score strictly lower)
            per_host: dict[str, int] = {}
            budgeted = []
            for url, (depth, sc, dw) in eligible:
                h = host_of_url(url)
                if per_host.get(h, 0) < budget_per_host:
                    per_host[h] = per_host.get(h, 0) + 1
                    budgeted.append((url, depth, sc))
            if len(budgeted) >= wave_cap or exhausted:
                break
            need = rows_read + (wave_cap - len(budgeted))
        passthrough = [u for u in read_urls
                       if st.frontier[u][1] < s_cut]
        # denied rows drop at first ELIGIBLE read of their segment
        # (they stay in seen, so they can never re-enter or schedule)
        for u in denied:
            del st.frontier[u]
        scheduled = budgeted[:wave_cap]

        links: dict[str, int] = {}
        total_links = 0
        total_bytes = 0
        for rank, (url, depth, sc) in enumerate(scheduled, start=1):
            html = webgraph.gen_html(url, universe, page_weight)
            total_bytes += len(html.encode())
            st.fetch_log.append({
                "wave": wave, "rank_in_wave": rank, "url": url,
                "host": host_of_url(url), "depth": depth, "score": sc,
                "bytes": len(html.encode()),
            })
            for href in _HREF_RE.findall(html):
                canon = canonicalize(href, url)
                links[canon] = links.get(canon, 0) + 1
                total_links += 1

        new_urls = [u for u in links
                    if u not in st.seen and u not in st.frontier]
        scheduled_set = {u for u, _d, _s in scheduled}
        for url in scheduled_set:
            del st.frontier[url]
        for u in new_urls:
            st.frontier[u] = (wave + 1, score(u, wave + 1, False), wave + 1)
            st.seen[u] = wave + 1

        # wave delta = residual of the consumed segments (unscheduled
        # eligible ∪ below-cut passthrough) + new discoveries; the
        # manifest replaces consumed segments with the delta's runs —
        # untouched segments carry by reference (copied verbatim)
        delta_rows = {u: st.frontier[u]
                      for u in read_urls
                      if u in st.frontier and u not in scheduled_set}
        for u in new_urls:
            delta_rows[u] = st.frontier[u]
        consumed_seqs = {(b, s["seq"]) for b, segs in consumed.items()
                         for s in segs}
        segments = {b: [s for s in segs
                        if (b, s["seq"]) not in consumed_seqs]
                    for b, segs in segments.items()}
        segments = {b: segs for b, segs in segments.items() if segs}
        next_seq = _append_delta(segments, delta_rows, band_width,
                                 split_rows, next_seq)
        next_seq = _consolidate(segments, st.frontier, band_width,
                                split_rows, band_max_paths, next_seq)

        st.metrics.append({
            "wave": wave, "scheduled": len(scheduled),
            "fetched": len(scheduled), "denied": len(denied),
            "links_total": total_links, "links_distinct": len(links),
            "new_urls": len(new_urls),
            "dupes": len(links) - len(new_urls), "bytes": total_bytes,
            # the synthetic graph always parses strictly; real crawls
            # surface lenient-ladder drops here
            "pages_dropped": 0,
            "frontier_rows_read": rows_read,
            # wave delta = residual of consumed segments + new — the
            # O(rows_read + new) write-volume invariant the banded
            # manifest exists to enforce (passthrough rows are read
            # and rewritten, so the formula is unchanged)
            "frontier_rows_written": (rows_read - len(denied)
                                      - len(scheduled) + len(new_urls)),
            "frontier_size": len(st.frontier),
        })
    return st
