"""Single-process crawl oracle — defines the expected crawl ordering
and URL-seen membership (BASELINE.json north_rule: "matching the
reference crawl ordering ... given the same seed list and politeness
budget"; cuphic has no crawler, so this oracle IS the reference).

Deliberately independent of the Spark implementation: plain Python
sets/sorted lists, its own canonicalization (urllib), its own robots
logic, its own link extraction (regex over the generated html). Only
the web-graph spec (cuphic_spark.frontier.webgraph) is shared — it is
the simulated *input*, not frontier logic.
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


def run(universe: int, n_seeds: int, budget_per_host: int, wave_cap: int,
        n_waves: int, page_weight: int = 30,
        band_width: int = 1000, robots_ttl_waves: int = 0) -> OracleState:
    st = OracleState()
    for i in range(n_seeds):
        url = webgraph.url_of(i)
        st.frontier[url] = (0, score(url, 0, True), 0)
        st.seen[url] = 0

    for wave in range(n_waves):
        # ----- banded read protocol (mirrors bands.plan_read_bands +
        # the extension loop in crawl.run_wave): a wave reads only the
        # top score bands whose counts cover wave_cap, extending when
        # robots/politeness leave fewer than wave_cap budgeted rows.
        by_band: dict[int, list[str]] = {}
        for u, (_d, sc, _w) in st.frontier.items():
            by_band.setdefault(sc // band_width, []).append(u)
        order = sorted(by_band, reverse=True)
        read_bands: list[int] = []
        rows_read = 0
        i = 0
        while i < len(order) and rows_read < wave_cap:
            b = order[i]
            read_bands.append(b)
            rows_read += len(by_band[b])
            i += 1
        robots_version = (wave // robots_ttl_waves
                          if robots_ttl_waves else 0)
        while True:
            read_urls = [u for b in read_bands for u in by_band[b]]
            denied = [u for u in read_urls
                      if robots_deny(u, robots_version)]
            denied_set = set(denied)
            eligible = sorted(
                ((u, st.frontier[u]) for u in read_urls
                 if u not in denied_set),
                key=lambda kv: (-kv[1][1], kv[0]))
            # politeness: per-host budget in (score desc, url asc)
            # order — ranks over the read set equal full-frontier
            # ranks (unread rows all score strictly lower)
            per_host: dict[str, int] = {}
            budgeted = []
            for url, (depth, sc, dw) in eligible:
                h = host_of_url(url)
                if per_host.get(h, 0) < budget_per_host:
                    per_host[h] = per_host.get(h, 0) + 1
                    budgeted.append((url, depth, sc))
            if len(budgeted) >= wave_cap or i >= len(order):
                break
            deficit = wave_cap - len(budgeted)
            added = 0
            while i < len(order) and added < deficit:
                b = order[i]
                read_bands.append(b)
                added += len(by_band[b])
                i += 1
            rows_read += added
        # denied rows drop at first READ of their band (they stay in
        # seen, so they can never re-enter or schedule)
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
        for url, depth, sc in scheduled:
            del st.frontier[url]
        for u in new_urls:
            st.frontier[u] = (wave + 1, score(u, wave + 1, False), wave + 1)
            st.seen[u] = wave + 1

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
            # wave delta = residual of read bands + new discoveries —
            # the O(rows_read + new) write-volume invariant the banded
            # manifest exists to enforce
            "frontier_rows_written": (rows_read - len(denied)
                                      - len(scheduled) + len(new_urls)),
            "frontier_size": len(st.frontier),
        })
    return st
