"""The crawl wave loop: frontier -> robots -> politeness -> schedule
-> fetch -> extract -> discover -> merge, checkpointed per wave.

north_rule implementation (BASELINE.json): bloom/cuckoo URL-seen,
per-host politeness buckets, robots cache, priority queue as
host-salted score-sorted partitions, resumable from checkpoint with
per-partition lineage + metrics. The reference (cuphic) has no
crawler; the deterministic contract below is pinned by the
single-process oracle in tests/oracle/crawl_oracle.py.

Determinism contract (identical at ANY parallelism level):

* every ordering uses the total order (score DESC, url ASC);
* depth of a discovered url = discovery wave (independent of which
  page linked it);
* the seen set = every url ever entered into the frontier (seeds
  included; robots-denied urls stay in it, so they never re-enter);
* bloom/cuckoo structures only prune — membership truth is always
  the anti-join against the seen table.

Wave w, given the frontier MANIFEST (score-band files split into
score-sorted runs — see frontier/bands.py) and seen_w:

0. read    = top segments whose manifest counts cover W (greedy
   descent with a score-cut refinement inside the last band —
   plan_read; deterministically extended if robots/politeness leave
   fewer than W budgeted rows) — unread segments are never touched;
   consumed rows BELOW the cut pass straight through to the residual
1. denied   = eligible-prefix rows (score >= cut) whose (host, path)
   hits a robots deny rule (dropped+counted at first eligible read
   of their segment; they can never schedule either way)
2. eligible = prefix - denied
3. per-host rank by (score desc, url asc); keep rank <= budget B
   (ranks over the prefix equal full-frontier ranks: every row
   outside the prefix scores strictly below every prefix row)
4. global top-W by (score desc, url asc) -> scheduled (rank_in_wave)
5. fetch scheduled (simulated: webgraph.gen_html)
6. extract hrefs with the cuphic engine ([:a {:href href} ???]),
   canonicalize (column expressions), distinct
7. new = links - seen_w  (bloom prune + exact anti-join)
8. frontier_{w+1} = manifest{unread bands carried BY REFERENCE}
   + written delta{(eligible - scheduled) ∪ new(depth=w+1, scored)}
   — checkpoint write volume is O(rows_read + new), never O(|frontier|)
9. seen_{w+1} = seen_w ∪ new
10. checkpoint: frontier delta + manifest, seen delta, fetch_log,
    metrics, lineage json
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from xml.parsers import expat as _expat

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import webgraph
from .seen import (
    bloom_est_fp,
    bloom_merge_urls,
    bloom_popcount,
    build_bloom,
    filter_new_urls,
)
from .urlnorm import canonicalize_cols, host_col, path_col

FRONTIER_SCHEMA = "url string, host string, depth int, score long, discovered_wave int"
SEEN_SCHEMA = "url string, added_wave int"


@dataclass
class CrawlConfig:
    universe: int = 100_000
    n_hosts: int = 10             # synthetic-universe host count (10 =
    # the oracle-pinned spec). Production-shaped benchmarks raise it:
    # a 10^6-url wave over 10 hosts caps every per-host window at 10
    # tasks and makes politeness degenerate — real waves spread over
    # 10^4-10^6 hosts (webgraph.host_of keeps the host-0 skew and the
    # h%7 robots rule at any count)
    n_seeds: int = 8
    budget_per_host: int = 8      # politeness B
    wave_cap: int = 64            # global W
    n_waves: int = 3
    checkpoint_dir: str = "/tmp/cuphic_crawl"
    partitions: int = 8           # seen/frontier partition count
    bloom_bits: int = 1 << 20     # INITIAL size — auto-resized ×8 at
    # the next wave boundary whenever the estimated false-positive
    # rate (from the bitmap popcount, emitted per wave as
    # bloom_est_fp) crosses bloom_fp_rebuild; a fixed-size bloom
    # saturates silently at ~m/10 keys and quietly becomes a no-op
    use_bloom: bool = True
    bloom_mode: str = "global"    # 'global' (broadcast bitmap,
    # accumulator-maintained on the seen write — right up to ~10^8
    # seen urls) | 'sharded' (one bitmap per seen partition, probed
    # and maintained via partition-local cogroups — the 10^10 design
    # point where a single 16-bits/key bitmap is ~20 GB and cannot
    # broadcast; executor memory is ONE shard, m_shard/8 bytes).
    # Blooms only prune, so scheduling is byte-identical between the
    # modes (invariance-pinned); only bloom_m/popcount metrics and
    # the memory shape differ.
    bloom_min_seen: int = 50_000  # skip bloom build below this (the
    # prefilter only pays once the seen table dwarfs the candidates)
    bloom_fp_rebuild: float = 0.2  # est-fp threshold that schedules a
    # rebuild (from the seen table, with 8x the bits) at the next
    # wave boundary; filters only prune, so scheduling is byte-
    # identical across any resize history (pinned by the forced-
    # saturation test)
    use_cuckoo: bool = True       # partition-local cuckoo shard prune
    cuckoo_min_seen: int = 50_000
    cuckoo_probe_min_ratio: float = 8.0  # probe the cuckoo shards
    # only when the seen set is at least this many times the previous
    # wave's distinct-link count: the probe Arrow-ships EVERY
    # candidate through a cogroup to let definitely-new urls skip the
    # anti-join, which only pays when seen DWARFS the candidates
    # (steady-state crawl over a 10^10 frontier). In the expansion
    # phase (candidates comparable to seen) it is pure overhead —
    # measured -17% wall on a production-shaped 10^6-url wave. Shard
    # MAINTENANCE follows the same prediction (see maintain_cuckoo in
    # the wave loop): skipped waves DROP the shards — never leave
    # them stale — and the ratio crossing triggers a full rebuild
    # from the seen table. 0 forces probe + maintenance whenever
    # shards can exist.
    salt_buckets: int = 4         # host-salt fan-out for skewed hosts
    compact_every: int = 0        # auto-compact seen deltas every N
    # waves (0 = off; offline compaction via snapshots.compact_seen)
    page_weight: int = 30         # filler paragraphs per synthetic
    # page (~4 KB default; Common-Crawl-style bodies = 100-700)
    seen_check: str = "auto"      # 'shuffle' | 'broadcast' | 'pruned' |
    # 'auto': broadcast = two-phase semi/anti where the seen table only
    # STREAMS (never shuffles) — the steady-state choice once seen
    # dwarfs a wave's candidates; pruned = read ONLY the seen files
    # whose part range intersects the candidates' partition ids (see
    # seen.prune_seen_paths); auto switches at broadcast_seen_min
    broadcast_seen_min: int = 5_000_000
    broadcast_max_candidates: int = 2_000_000  # hard candidate ceiling
    # for the broadcast strategy: a wave whose PREVIOUS links_distinct
    # exceeded this falls back to shuffle (advisor: forcing
    # F.broadcast over an unbounded candidate set can blow the driver)
    max_score_histogram: int = 10_000  # loud-failure guard: the
    # distributed top-W relies on scores being COARSE (few distinct
    # values); a fine-grained score_expr would silently turn the
    # histogram collect into an O(|frontier|) driver transfer
    band_width: int = 1000        # frontier score-band width: band =
    # score div band_width; bands are the unit of lazy frontier IO
    # (untouched bands carry forward by manifest reference)
    band_max_paths: int = 16      # rewrite a band once its manifest
    # path list exceeds this (bounds read fan-in per band)
    band_split_rows: int = 0      # sub-band run size: a wave delta is
    # split per band into score-sorted runs of ~this many rows, so a
    # band far larger than the wave cap is read as a run PREFIX, not
    # whole (round-3 verdict item 2). 0 = auto (the wave cap)
    link_extract: str = "streaming"  # 'streaming' (tree-free expat
    # twin of the fixed link pattern, default) | 'kernel' (general
    # engine scan); results pinned identical by tests
    pruned_seen_byte_frac: float = 0.5  # auto routing: take the
    # footer-pruned seen read only when the kept files' byte footprint
    # is at most this fraction of the full seen footprint (the cost
    # signal comes from the same footer walk the pruned read needs
    # anyway — round-3 verdict item 5 replaced the old partition-count
    # ratio, which ignored how bytes actually cluster across files)
    robots_ttl_waves: int = 0     # robots-cache TTL in waves: epoch =
    # wave // ttl selects the rules version (0 = static spec, the
    # deterministic default); oracle models the same schedule
    redirect_mod: int = 0         # deterministic 3xx spec: url ids
    # with i % redirect_mod == 0 answer 301 + Location instead of a
    # page (0 = no redirects, the pinned default). The Location
    # flows through the SAME link pipeline as an extracted href
    # (canonicalize -> seen -> frontier), so chains resolve across
    # waves and loops terminate via the seen set; fetch_log carries
    # the status and the wave metrics count redirects. A custom
    # fetch_fn reports real statuses via the (status, location,
    # body) return shape.
    aqe: str = "off"              # crawl-session AQE profile: 'off'
    # (default) disables spark.sql.adaptive for the duration of the
    # crawl (restoring the caller's setting on exit), 'inherit'
    # leaves the session untouched. The crawl pre-partitions and
    # host-salts explicitly, so AQE's runtime re-planning buys
    # nothing inside a wave while its per-stage materialization
    # barriers cost ~15 extra Spark jobs per wave (measured: 25
    # jobs/wave AQE-on vs 10 off; steady-wave 8->32 speedup 1.94x vs
    # 2.12x — BENCH/crawl_steady_r5.json aqe_off_experiment).
    # Results are byte-identical either way (the determinism
    # contract holds at any parallelism/plan): this knob is purely a
    # scheduling-overhead profile.
    broadcast_timeout: int = 3600  # spark.sql.broadcastTimeout for
    # the crawl session (restored on exit; <= 0 leaves it untouched).
    # The seen-check broadcast side's lineage embeds the wave's whole
    # fetch+parse chain — its BUILD time grows with wave_cap, so the
    # 300 s Spark default is a latent production failure (measured:
    # a 4M-url bootstrap wave on 8 cores exceeded it). The router
    # additionally never broadcasts without an affirmative volume
    # hint; this timeout covers the legitimately-broadcast waves.
    extra: dict = field(default_factory=dict)


def score_expr(id_col, depth_col, is_seed):
    """Priority: depth-decayed base + per-url jitter + seed bonus.
    Integer arithmetic only (exact everywhere)."""
    base = (10000 - 1000 * F.least(depth_col, F.lit(9)))
    bonus = id_col % 7
    seed_bonus = F.when(F.lit(is_seed), F.lit(5000)).otherwise(F.lit(0))
    return (base + bonus + seed_bonus).cast("long")


def score_py(url_id: int, depth: int, is_seed: bool) -> int:
    return (10000 - 1000 * min(depth, 9)) + url_id % 7 + (5000 if is_seed else 0)


# _seed_score_counts' closed form is only valid under the DEFAULT
# scoring pair; tests (and deployments) may monkeypatch score_expr /
# score_py as an extension point, and the seed write must then fall
# back to the data-derived histogram.
_SCORE_EXPR_DEFAULT = score_expr
_SCORE_PY_DEFAULT = score_py


def robots_rules(spark: SparkSession, version: int = 0,
                 n_hosts: int = webgraph.N_HOSTS) -> DataFrame:
    """The robots CACHE: tiny dim table, broadcast at join time,
    refreshed per TTL (SURVEY §2.H "cached with TTL").

    ``version`` models a refresh epoch: epoch v denies hosts with
    h % 7 == v % 7 under DENY_PREFIX (v=0 reproduces the static
    spec). In production the refresh fetches robots.txt per host and
    the version is a fetch timestamp bucket; in the deterministic
    sandbox the spec is versioned closed-form so the oracle can
    reproduce every epoch. The crawl derives the epoch from the wave
    number (``CrawlConfig.robots_ttl_waves``): rules stay CACHED —
    one tiny broadcast per wave, never per url.

    The dim shape is (host, deny_prefixes array) — the same shape
    ``frontier.robots.prefix_rules`` derives from REAL robots.txt
    bodies via the RFC 9309 parser, so a production crawl swaps the
    spec for parsed bodies (``CrawlConfig.extra['robots_txt_fn']``)
    without touching the wave loop."""
    rows = [(f"host{h}.example", [webgraph.DENY_PREFIX])
            for h in range(n_hosts) if h % 7 == version % 7]
    # LocalRelation via the Arrow/pandas path (round 8): list-of-rows
    # createDataFrame builds a PYTHON-RDD-backed DF, so every
    # per-wave broadcast build of this dim was a 32-task Spark job
    # each invoking a Python worker for a near-empty partition; a
    # LocalRelation broadcast builds driver-side with zero tasks.
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["host", "deny_prefixes"]),
        schema="host string, deny_prefixes array<string>")


def seed_frontier(spark: SparkSession, cfg: CrawlConfig) -> DataFrame:
    ids = spark.range(cfg.n_seeds).select(F.col("id").cast("long"))
    urls = ids.select(
        F.concat(
            F.lit("https://host"),
            F.when(F.col("id") % 3 == 0, F.lit(0))
            .otherwise(F.col("id") % cfg.n_hosts)
            .cast("string"),
            F.lit(".example"),
            F.when(F.col("id") % 11 == 0,
                   F.concat(F.lit("/private/doc/"), F.col("id").cast("string")))
            .otherwise(F.concat(F.lit("/doc/"), F.col("id").cast("string"))),
        ).alias("url"),
        F.col("id"))
    return urls.select(
        "url",
        host_col(F.col("url")).alias("host"),
        F.lit(0).alias("depth"),
        score_expr(F.col("id"), F.lit(0), True).alias("score"),
        F.lit(0).alias("discovered_wave"))


def _hrefs_streaming(xml) -> list[str]:
    """Streaming expat twin of the kernel scan for the crawl's FIXED
    link pattern ``[:a {:href href} ???]``: every element whose
    verbatim name is exactly ``a`` (keywordize('a') == :a; names with
    a colon keywordize into a namespace and cannot match) and which
    carries an ``href`` attribute binds that attribute, in preorder —
    exactly the matches the kernel emits for this pattern, with no
    tree materialized. Differentially pinned against the kernel path
    (tests/test_frontier.py: streaming vs kernel link extraction on
    webgraph + soup pages; the crawl oracle pins end-to-end order).

    Raises on malformed input exactly like parse_xml (same expat),
    so it slots into the lenient ladder. The handler is a closure over
    a local list (round 8): the crawl fetch path runs this once per
    page at ~35 elements/page, where the bound-method dispatch + the
    per-page collector-instance construction of the previous class
    shape measured ~8% of the parse cost."""
    if isinstance(xml, str):
        xml = xml.encode("utf-8")
    hrefs: list[str] = []
    append = hrefs.append

    def start(name, attrs, _a="a", _h="href"):
        if name == _a and _h in attrs:
            append(attrs[_h])

    p = _expat.ParserCreate()
    p.buffer_text = True
    p.StartElementHandler = start
    p.Parse(bytes(xml), True)
    return hrefs


def _fetch_extract(scheduled: DataFrame, universe: int,
                   page_weight: int = 30, dropped_acc=None,
                   link_extract: str = "streaming",
                   n_hosts: int = webgraph.N_HOSTS,
                   fetch_fn=None, redirect_mod: int = 0) -> DataFrame:
    """Simulated fetch FUSED with link extraction: ONE Arrow stage
    generates the page body, parses it through the lenient ladder,
    and runs the cuphic kernel scan for ``[:a {:href href} ???]`` —
    the raw html never crosses the executor boundary. Two rejected
    shapes, both measured at Common-Crawl page weights (~40 KB):

    * fetch stage emitting html + relational match over the nodes
      table — materializes ~300 nested-struct rows per page through
      pandas→Arrow for pages read exactly once (the nodes encoding
      is for parse-once/query-MANY; see compiler.match_nodes);
    * fetch stage emitting html + a second kernel-scrape stage —
      Arrow-ships every page body into the cache and back out to a
      second Python worker, costing more than the parse itself.

    Output = scheduling columns + bytes + href array (~5 entries/
    page); a production variant that persists raw pages would write
    them from this same stage. Unsalvageable pages are counted via
    ``dropped_acc`` (surfaced as the pages_dropped metric).

    ``link_extract='streaming'`` (default) runs the tree-free expat
    twin of the link pattern through the same lenient ladder — the
    fixed-pattern specialization of the fused scan (no Hiccup tree
    per page). ``'kernel'`` keeps the general engine scan; both are
    pinned identical by tests.

    ``fetch_fn(url) -> bytes | (status, location, bytes)`` is the
    pluggable FETCHER (default: the deterministic webgraph simulator
    — this sandbox has no network). A bare ``bytes`` return means
    status 200; the tuple shape lets an HTTP fetcher report real
    statuses. A 3xx status with a Location SHORT-CIRCUITS the parse:
    the Location becomes the page's single outlink and rides the
    normal link pipeline (canonicalize -> seen -> frontier), so
    redirect chains resolve across waves and loops terminate via the
    seen set. A production deployment drops an httpx/aiohttp batch
    fetcher in here (`CrawlConfig.extra['fetch_fn']`); everything
    downstream — lenient parse ladder, link extraction, politeness,
    seen set, checkpointing — is fetcher-agnostic (pinned by the
    custom-fetcher crawl test)."""
    import pandas as pd

    from ..operators.parse import parse_html_lenient

    schema = T.StructType(scheduled.schema.fields + [
        T.StructField("status", T.IntegerType()),
        T.StructField("bytes", T.LongType()),
        T.StructField("hrefs", T.ArrayType(T.StringType())),
    ])

    if fetch_fn is None:
        def fetch_fn(u):
            i = webgraph.id_of_url(u)
            if webgraph.is_redirector(i, redirect_mod):
                return (301,
                        webgraph.redirect_target_url(i, universe,
                                                     n_hosts),
                        b"")
            return webgraph.gen_html(u, universe, page_weight,
                                     n_hosts).encode()

    def gen(batches):
        if link_extract == "streaming":
            def page_hrefs(data):
                hrefs, _mode = parse_html_lenient(
                    data, parser=_hrefs_streaming)
                return hrefs
        else:
            from ..kernel import reader
            from ..kernel.match import Matcher
            from ..kernel.scan import scan as kernel_scan

            matcher = Matcher(reader.parse("[:a {:href href} ???]"))

            def page_hrefs(data):
                tree, _mode = parse_html_lenient(data)
                if tree is None:
                    return None
                hrefs: list[str] = []
                for _nid, _node, results in kernel_scan(tree, matcher):
                    b = results[0]
                    if b is not None:
                        for sym, val in b.items():
                            if getattr(sym, "name", None) == "href":
                                hrefs.append(val)
                return hrefs

        import pyarrow as pa

        # mapInArrow (round 8): scheduling columns ride through the
        # fetch stage untouched — as Arrow arrays they are reused in
        # the output batch zero-copy (the old pandas path paid a full
        # arrow->pandas->arrow conversion of every passthrough column
        # per batch); only `url` is materialized to Python.
        url_ix = None
        for batch in batches:
            if url_ix is None:
                url_ix = batch.schema.get_field_index("url")
            status_col, nbytes, hrefs_col = [], [], []
            for u in batch.column(url_ix).to_pylist():
                res = fetch_fn(u)
                if isinstance(res, tuple):
                    status, location, data = res
                else:
                    status, location, data = 200, None, res
                if 300 <= status < 400 and location:
                    hrefs = [location]
                else:
                    hrefs = page_hrefs(data)
                    if hrefs is None:
                        if dropped_acc is not None:
                            dropped_acc.add(1)
                        hrefs = []
                status_col.append(status)
                nbytes.append(len(data))
                hrefs_col.append(hrefs)
            yield pa.RecordBatch.from_arrays(
                list(batch.columns)
                + [pa.array(status_col, type=pa.int32()),
                   pa.array(nbytes, type=pa.int64()),
                   pa.array(hrefs_col,
                            type=pa.list_(pa.string()))],
                names=list(batch.schema.names)
                + ["status", "bytes", "hrefs"])

    return scheduled.mapInArrow(gen, schema)


_COL_MEMO: dict = {}


def _memo_cols(key, build):
    """Reuse wave-invariant Column expression trees across waves and
    bench legs (round 8): building a deep Column tree (the url
    canonicalizer is ~50 nested calls) costs dozens of py4j round
    trips per wave. The trees memoized here depend only on column
    NAMES plus the literals baked into the key — never on a
    DataFrame — so a single JVM expression instance can appear in any
    number of plans (Columns are immutable expression wrappers; the
    analyzer resolves them per-plan). Keyed on the active
    SparkContext so a restarted session never sees stale JVM refs."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    hit = _COL_MEMO.get(key)
    if hit is not None and hit[0] is sc:
        return hit[1]
    if len(_COL_MEMO) >= 4096:
        # bound the memo: wave-keyed entries accumulate over very long
        # crawls, and each holds a py4j ref that pins a JVM expression
        # — drop stale-context entries first, everything if still full
        # (rebuild is the pre-memo behavior: a few ms per tree)
        stale = [k for k, v in _COL_MEMO.items() if v[0] is not sc]
        for k in stale:
            del _COL_MEMO[k]
        if len(_COL_MEMO) >= 4096:
            _COL_MEMO.clear()
    val = build()
    _COL_MEMO[key] = (sc, val)
    return val


def run_wave(spark: SparkSession, cfg: CrawlConfig, wave: int,
             manifest: dict, seen: DataFrame,
             n_seen_hint: int | None = None,
             cuckoo_shards: DataFrame | None = None,
             bloom: bytes | None = None,
             prev_links_hint: int | None = None,
             seen_paths: list[str] | None = None,
             bloom_m: int | None = None,
             bloom_shards: DataFrame | None = None,
             pool=None):
    """Returns (frontier_delta_prepped, seen_delta, fetch_log, finish,
    caches, plan, seen_strategy, delta_counts, seen_delta_out).

    The wave never touches the whole frontier: ``manifest`` (see
    frontier/bands.py) describes the frontier as score-band files
    split into score-sorted RUNS, and the wave reads only the top
    segments whose counts cover wave_cap — a band larger than the cap
    is read as a PREFIX of its runs, never whole — extending
    deterministically when robots/politeness eat into the read set
    (rare: one extra stats pass per extension round). Scheduling sees
    exactly the frontier rows with ``score >= plan.s_cut`` (an exact
    score prefix — see bands.ReadPlan); consumed rows below the cut
    pass through to the residual untouched. The returned
    ``frontier_delta`` is the residual of the READ segments ∪ newly
    discovered rows; crawl() writes it band/run-partitioned and
    carries every unread segment forward by manifest reference — wave
    checkpoint write volume is O(rows_read + new), never O(|frontier|).

    Spark-job budget per wave — the crawl's FIXED cost, which is what
    bounds throughput once waves are large enough to saturate cores:

    * ONE aggregation job over the ranked read set (score histogram
      for the distributed top-W *and* the denied count, same pass);
    * the checkpoint writes issued by crawl() — every remaining
      metric (scheduled, bytes, links, new urls) rides on those
      writes via ``observe()``: zero additional actions.

    ``finish()`` must be called AFTER the checkpoint writes ran; it
    reads the observations and returns the metrics row. ``caches``
    are the DataFrames to unpersist once the wave is committed.
    """
    from . import bands as bands_mod

    robots_version = (wave // cfg.robots_ttl_waves
                      if cfg.robots_ttl_waves else 0)
    robots_txt_fn = cfg.extra.get("robots_txt_fn")
    robots_full = False
    if robots_txt_fn is not None:
        # production robots source: (host, robots_txt) bodies ->
        # RFC 9309 parse -> a broadcast dim in one of two shapes:
        # the prefix fast path (host, deny_prefixes) when every rule
        # is a plain Disallow prefix, else the FULL RFC dim (host,
        # robots_rules) whose longest-match/Allow-wins verdict is
        # evaluated row-local by denied_by_rules — same broadcast
        # join, zero extra shuffles or jobs either way. Mode
        # ``auto`` (default) decides with one bounded limit(1) probe
        # (the same job prefix_rules spends on validation); the spec
        # path below stays the oracle-pinned default
        from .robots import (
            _non_prefix_probe,
            _prefix_dim,
            _select_group,
            parse_robots,
            prefix_rules,
            rules_dim,
        )

        agent = cfg.extra.get("robots_agent", "cuphicbot")
        mode = cfg.extra.get("robots_mode", "auto")
        if mode not in ("auto", "prefix", "full"):
            raise ValueError(f"robots_mode must be auto|prefix|full, "
                             f"got {mode!r}")
        parsed = parse_robots(robots_txt_fn(spark, robots_version,
                                            cfg.n_hosts))
        if mode == "auto":
            rules = _select_group(parsed, "rule", agent)
            mode = "full" if _non_prefix_probe(rules) else "prefix"
            robots = (rules_dim(parsed, agent=agent) if mode == "full"
                      else _prefix_dim(rules))
        elif mode == "full":
            robots = rules_dim(parsed, agent=agent)
        else:  # explicit prefix: keep the loud refusal on wildcards
            robots = prefix_rules(parsed, agent=agent)
        robots_full = mode == "full"
    else:
        robots = robots_rules(spark, version=robots_version,
                              n_hosts=cfg.n_hosts)
    # optional per-host politeness budgets (e.g. derived from robots
    # Crawl-delay via robots.budgets_from_delays): a tiny (host,
    # host_budget) dim broadcast like the robots rules; hosts absent
    # from it fall back to the scalar budget_per_host
    budgets_fn = cfg.extra.get("host_budgets_fn")
    host_budgets = (budgets_fn(spark, wave, cfg.n_hosts)
                    if budgets_fn is not None else None)
    plan = bands_mod.plan_read(manifest, cfg.wave_cap)

    # ONE window ranks eligible rows per host; denied rows rank inside
    # their own (host, den) group so eligible ranks are unaffected —
    # this lets a single aggregation job return the score histogram
    # AND the denied count (previously two frontier scans). Per-host
    # ranks over the ELIGIBLE prefix (score >= plan.s_cut) equal
    # full-frontier ranks: every row outside the prefix scores
    # strictly below every prefix row.
    w_host = Window.partitionBy("host", "den").orderBy(
        F.desc("score"), F.asc("url"))
    w_score = Window.partitionBy("score").orderBy(F.asc("url"))
    # cumulative offset of each score group = rows in strictly higher
    # score groups (see the top-W comment below)
    w_off = (Window.orderBy(F.desc("score"))
             .rowsBetween(Window.unboundedPreceding, -1))
    import uuid
    frontier = ranked = None
    frontier_caches: list[DataFrame] = []  # all rounds' caches; the
    # earlier rounds stay alive inside the union lineage and are
    # unpersisted with the wave's other caches
    read_paths: list[str] = []
    while True:
        # plan_read is monotone (the extension's read set is a strict
        # superset), so an extension round reads ONLY the added
        # segment files and unions them with the already-cached rows
        # (round 8) — previously every round re-read and re-decoded
        # every consumed segment from parquet. Row set identical:
        # segment paths are disjoint, and nothing downstream depends
        # on row order (ranks sort explicitly).
        new_paths = [p for p in plan.paths() if p not in set(read_paths)]
        read_paths += new_paths
        if frontier is None:
            frontier = bands_mod.read_plan_df(spark, manifest,
                                              plan).cache()
        else:
            frontier = frontier.unionByName(
                bands_mod._read_paths(spark, new_paths)).cache()
        frontier_caches.append(frontier)
        eligible_src = frontier.where(F.col("score") >= plan.s_cut)
        fr = eligible_src.withColumn(
            "path", _memo_cols("path_url",
                               lambda: path_col(F.col("url"))))
        joined = fr.join(F.broadcast(robots), "host", "left")
        if host_budgets is not None:
            joined = (joined
                      .join(F.broadcast(host_budgets), "host", "left")
                      .withColumn("host_budget",
                                  F.coalesce(F.col("host_budget"),
                                             F.lit(cfg.budget_per_host))))
        else:
            joined = joined.withColumn("host_budget",
                                       F.lit(cfg.budget_per_host))
        if robots_full:
            from .robots import denied_by_rules

            is_denied = denied_by_rules(F.col("path"),
                                        F.col("robots_rules"))
            robots_col = "robots_rules"
        else:
            is_denied = _memo_cols("denied_prefix", lambda: F.coalesce(
                F.exists(F.col("deny_prefixes"),
                         lambda p: F.col("path").startswith(p)),
                F.lit(False)))
            robots_col = "deny_prefixes"
        ranked = (joined.withColumn("den", is_denied)
                  .withColumn("host_rank", F.row_number().over(w_host))
                  .drop(robots_col, "path")).cache()
        # CACHED: the stats collect below materializes this tiny agg
        # (<= max_score_histogram rows), and the in-plan offsets then
        # read the cached rows instead of re-aggregating the 10^5-row
        # ranked cache inside the seen-delta write's broadcast build —
        # which sat on the wave's critical path (round 8, ~0.2-0.3 s)
        stats_q = (ranked
                   .where(F.col("den")
                          | (F.col("host_rank") <= F.col("host_budget")))
                   .groupBy("den", "score").agg(F.count("*").alias("cnt"))
                   .cache())
        # The stats job runs on the POOL while the wave's entire lazy
        # chain is constructed below (round 8): plan construction is
        # ~0.9 s/wave of pure driver work (py4j round trips + JVM
        # analysis) that previously serialized behind this collect —
        # the in-plan rank offsets below are what free construction
        # from the collected values. The collected stats are joined
        # at the bottom of the loop, where the extension decision (and
        # the coarse-score guard) needs them; on the rare extension
        # round the optimistically built chain is discarded unrun
        # (fresh Observations/accumulator per iteration, caches
        # unpersisted) and rebuilt over the extended read set.
        f_stats = (pool.submit(stats_q.collect)
                   if pool is not None else None)

        # consumed rows BELOW the cut: physically read (their runs
        # span the cut) but semantically unread — pass through to the
        # residual delta verbatim, outside robots/politeness/scheduling
        passthrough = frontier.where(F.col("score") < plan.s_cut)
        budgeted = (ranked
                    .where(~F.col("den")
                           & (F.col("host_rank") <= F.col("host_budget")))
                    .drop("den", "host_rank", "host_budget"))

        # Global top-W WITHOUT TakeOrdered (orderBy+limit would merge
        # W rows x partitions single-threaded on the driver — at
        # W=10^5+ that serializes the wave). Scores are coarse by
        # construction, so: per-score counts -> cumulative offsets
        # over the score groups in descending-score order -> per-score
        # windows ordered by url (distributed across score groups) ->
        # global rank = offset + in-group rank. Identical total order
        # (score desc, url asc), no driver merge. The offsets are
        # computed IN-PLAN (tiny agg + single-partition window over
        # <= max_score_histogram rows + broadcast join) rather than
        # collected to the driver: a score group is rankable iff the
        # rows above it don't already cover the cap (off < cap),
        # exactly the driver loop's break condition, and keeping the
        # offsets out of the driver lets this whole chain be built
        # while the stats job runs.
        # the budgeted per-score counts ARE the stats agg's !den rows —
        # read them from the cached stats_q (warm once the stats job
        # ran) rather than re-aggregating the budgeted rows
        offs = (stats_q.where(~F.col("den")).select("score", "cnt")
                .withColumn("off",
                            F.coalesce(F.sum("cnt").over(w_off),
                                       F.lit(0)))
                .where(F.col("off") < cfg.wave_cap)
                .select("score", "off"))
        with_rank = (budgeted
                     .join(F.broadcast(offs), "score", "left")
                     .withColumn(
                         "rank_in_wave",
                         F.when(F.col("off").isNotNull(),
                                F.col("off")
                                + F.row_number().over(w_score))
                         .cast("int"))
                     .select("url", "host", "depth", "score",
                             "discovered_wave", "rank_in_wave")
                     .cache())
        scheduled = with_rank.where(F.col("rank_in_wave") <= cfg.wave_cap)
        # leftover budgeted rows: re-derived from the SAME rank window
        # (cached) instead of an eligible-minus-fetched anti-join —
        # membership is identical by construction and two url-keyed
        # shuffles per wave disappear
        unscheduled = (with_rank
                       .where(F.col("rank_in_wave").isNull()
                              | (F.col("rank_in_wave") > cfg.wave_cap))
                       .drop("rank_in_wave"))

        # the global rank window collapses to one partition; fan back
        # out so fetch+parse of the wave runs partition-parallel (rank
        # is already assigned, so redistribution cannot change output)
        scheduled = scheduled.repartition(cfg.partitions, "url")

        # fetch carries scheduling columns through — fetch_log needs
        # no join; scheduled/bytes counts ride on the fetch_log write.
        # obs_fetch sits ABOVE the cache, on the fetch_log plan (not
        # on `fetched` itself): the fetch_log and seen-delta writes
        # run CONCURRENTLY and cooperate on materializing the fetch
        # cache (block locks make each partition compute exactly
        # once), so a below-cache CollectMetrics would split its
        # counts across the two racing executions — above the cache,
        # every fetch_log row streams through the observe exactly
        # once, in the one execution that owns it.
        tag = uuid.uuid4().hex[:8]  # observation names unique per run
        obs_fetch = Observation(f"fetch_w{wave}_{tag}")
        dropped_acc = spark.sparkContext.accumulator(0)
        fetched = (_fetch_extract(scheduled, cfg.universe,
                                  cfg.page_weight,
                                  dropped_acc=dropped_acc,
                                  link_extract=cfg.link_extract,
                                  n_hosts=cfg.n_hosts,
                                  fetch_fn=cfg.extra.get("fetch_fn"),
                                  redirect_mod=cfg.redirect_mod)
                   .cache())

        links = fetched.select(F.col("url").alias("base_url"),
                               F.explode("hrefs").alias("href"))
        canon = links.select(_memo_cols(
            "canon",
            lambda: canonicalize_cols(F.col("href"),
                                      F.col("base_url")).alias("url")))
        obs_links = Observation(f"links_w{wave}_{tag}")
        distinct_links = (canon.groupBy("url")
                          .agg(F.count("*").alias("n_refs"))
                          .observe(obs_links,
                                   F.count(F.lit(1)).alias("d"),
                                   F.coalesce(F.sum("n_refs"),
                                              F.lit(0)).alias("t"))
                          .cache())

        use_bloom = (bloom is not None or bloom_shards is not None) \
            and cfg.use_bloom and (
                n_seen_hint is None or n_seen_hint >= cfg.bloom_min_seen)
        if not use_bloom:
            bloom = None
            bloom_shards = None

        def _seen_filter(cand, seen_side):
            """Bloom prune (global broadcast bitmap OR partition-local
            shards — identical pruning semantics) + exact anti-join."""
            nonlocal bloom
            if bloom_shards is not None:
                from .seen import filter_new_urls_sharded

                return filter_new_urls_sharded(
                    cand, seen_side, bloom_shards, cfg.partitions,
                    strategy=seen_strategy)
            if hasattr(bloom, "result"):
                # activation/rebuild build submitted as a pool future
                # by _crawl_loop — joined HERE, the first point the
                # bitmap bytes are needed, so the build job overlapped
                # the schedule phase's stats job instead of preceding
                # it
                bloom = bloom.result()
            return filter_new_urls(cand, seen_side, bloom,
                                   bloom_m or cfg.bloom_bits,
                                   strategy=seen_strategy)

        # the broadcast strategy forces F.broadcast(candidates): its
        # correctness is unconditional but its MEMORY is bounded only by
        # the candidate set, so both auto and explicit 'broadcast' fall
        # back to shuffle when the previous wave's distinct-link volume
        # (the best available predictor of this wave's candidates) exceeds
        # the configured ceiling (advisor round-2 finding).
        over_candidate_cap = (prev_links_hint is not None
                              and prev_links_hint > cfg.broadcast_max_candidates)
        parts_hit = None  # auto's probe is reused by the pruned branch —
        # candidate_parts is a Spark job on the candidate chain; computing
        # it twice per wave was a redundant action (advisor round-3, low)
        kept_files = None  # ditto for the footer walk
        if cfg.seen_check == "auto":
            big_seen = (n_seen_hint is not None
                        and n_seen_hint >= cfg.broadcast_seen_min)
            # auto broadcasts only on an AFFIRMATIVE volume prediction: a
            # MISSING hint (wave 0, or a resume without lineage metrics)
            # must route conservatively — a first wave at production
            # scale has unbounded candidates, and broadcasting them both
            # risks driver memory (the cap exists for exactly this) and
            # races spark.sql.broadcastTimeout, because the broadcast
            # side's lineage embeds the whole fetch+parse chain (measured:
            # the 4M-wave bootstrap blew the 300 s default on 8 cores —
            # BENCH/crawl_steady_r7.json note)
            can_broadcast = (prev_links_hint is not None
                             and prev_links_hint
                             <= cfg.broadcast_max_candidates)
            if big_seen and can_broadcast:
                seen_strategy = "broadcast"
            elif big_seen and seen_paths is not None:
                # candidates too big to broadcast against a huge seen
                # table: if they cluster in few host partitions, a
                # footer-pruned read of just those partitions beats
                # shuffling the whole seen side. The parts probe is a
                # <= cfg.partitions-row collect off the cached candidate
                # chain; the cost model compares BYTES the pruned read
                # would open vs the full seen footprint, from the same
                # footer walk the pruned read needs anyway — the decision
                # depends only on DATA (file sizes are deterministic
                # functions of the partitioned writes: deterministic at
                # any parallelism).
                from .seen import candidate_parts, select_seen_files

                parts_hit = candidate_parts(distinct_links, cfg.partitions)
                kept_files, kept_b, total_b = select_seen_files(
                    seen_paths, parts_hit, with_stats=True)
                seen_strategy = (
                    "pruned"
                    if kept_b <= cfg.pruned_seen_byte_frac * total_b
                    else "shuffle")
            else:
                seen_strategy = "shuffle"
        else:
            seen_strategy = cfg.seen_check
            if seen_strategy == "broadcast" and over_candidate_cap:
                import warnings

                warnings.warn(
                    f"seen_check='broadcast' with prev links_distinct="
                    f"{prev_links_hint} > broadcast_max_candidates="
                    f"{cfg.broadcast_max_candidates}; falling back to "
                    "'shuffle' for this wave (broadcasting an unbounded "
                    "candidate set can exceed driver memory)")
                seen_strategy = "shuffle"

        # the pruned strategy replaces the seen side with a footer-pruned
        # read of ONLY the files intersecting the candidates' partition
        # ids (see seen.prune_seen_paths); the partition-id collect is at
        # most cfg.partitions rows and rides the cached distinct_links —
        # candidate parts are computed from the full candidate set, a
        # superset of the post-cuckoo to_check set (supersets only keep
        # MORE files: always safe).
        seen_for_check = seen
        if seen_strategy == "pruned":
            if seen_paths is None:
                raise ValueError(
                    "seen_check='pruned' needs the seen PATHS (run_wave "
                    "seen_paths=...); a bare DataFrame cannot be file-"
                    "pruned")
            from .seen import candidate_parts, prune_seen_paths

            if parts_hit is None:  # explicit seen_check='pruned' (auto
                # already computed the probe while routing)
                parts_hit = candidate_parts(distinct_links, cfg.partitions)
            seen_for_check = prune_seen_paths(spark, seen_paths, parts_hit,
                                              kept=kept_files)

        candidates = distinct_links
        use_cuckoo = (cfg.use_cuckoo and cuckoo_shards is not None
                      and (n_seen_hint is None
                           or n_seen_hint >= cfg.cuckoo_min_seen))
        if (use_cuckoo and n_seen_hint is not None
                and prev_links_hint is not None
                and n_seen_hint < cfg.cuckoo_probe_min_ratio
                * prev_links_hint):
            # expansion-phase routing: candidates are comparable to the
            # seen set, so the per-candidate probe cogroup costs more
            # than the anti-join rows it saves (see CrawlConfig
            # docstring) — route straight to bloom + anti-join
            use_cuckoo = False
        if use_cuckoo:
            # partition-local prune: candidates flagged definitely-new by
            # their host partition's cuckoo shard skip the anti-join
            from .seen import cuckoo_prune

            flagged = cuckoo_prune(candidates, cuckoo_shards, cfg.partitions)
            fresh = (flagged.where(~F.col("maybe_seen_cuckoo"))
                     .drop("maybe_seen_cuckoo", "partition"))
            to_check = (flagged.where(F.col("maybe_seen_cuckoo"))
                        .drop("maybe_seen_cuckoo", "partition"))
            confirmed = _seen_filter(to_check, seen_for_check)
            new_urls = fresh.unionByName(confirmed)
        else:
            new_urls = _seen_filter(candidates, seen_for_check)
        # no frontier anti-join needed: every frontier url is already in
        # seen (seeds via seen_seed, discoveries via their wave's delta),
        # so surviving the seen anti-join implies not-pending either —
        # one less shuffle per wave

        obs_new = Observation(f"new_w{wave}_{tag}")
        # Under the DEFAULT scoring pair, a wave's new rows take exactly 7
        # scores (base + id%7 at the fixed depth wave+1), so their
        # per-score counts — the "late" half of the frontier write's run
        # map — ride obs_new as 7 conditional sums on the seen-delta
        # write instead of costing a separate post-commit job (round 8).
        # Overridden scoring falls back to the data-derived counts job.
        default_scoring = (score_expr is _SCORE_EXPR_DEFAULT
                           and score_py is _SCORE_PY_DEFAULT)
        new_score_base = 10000 - 1000 * min(wave + 1, 9)

        def _build_new_aggs():
            aggs = [F.count(F.lit(1)).alias("n")]
            if default_scoring:
                aggs += [
                    F.coalesce(
                        F.sum((F.col("score")
                               == F.lit(new_score_base + r))
                              .cast("long")), F.lit(0)).alias(f"c{r}")
                    for r in range(7)]
            return aggs

        # memo keys carry every input the trees bake in: the wave's
        # literals and (for the score tree) the scoring function
        # object itself, which tests rebind
        new_aggs = _memo_cols(("new_aggs", wave, default_scoring),
                              _build_new_aggs)
        new_row_cols = _memo_cols(
            ("new_row_cols", wave, score_expr),
            lambda: [
                F.col("url"),
                host_col(F.col("url")).alias("host"),
                F.lit(wave + 1).alias("depth"),
                score_expr(F.regexp_extract("url", r"(\d+)$", 1)
                           .cast("long"),
                           F.lit(wave + 1), False).alias("score"),
                F.lit(wave + 1).alias("discovered_wave")])
        new_rows = (new_urls.select(*new_row_cols)
                    .observe(obs_new, *new_aggs)
                    .cache())

        cols = ["url", "host", "depth", "score", "discovered_wave"]
        over_budget = (ranked
                       .where(~F.col("den")
                              & (F.col("host_rank") > F.col("host_budget")))
                       .select(*cols))
        # the wave's frontier DELTA: residual of the consumed segments
        # (over-budget ∪ unscheduled ∪ below-cut passthrough — denied
        # rows drop here, at first eligible read of their segment) plus
        # new discoveries; unread segments never appear — crawl() carries
        # them forward by manifest reference
        frontier_delta = (over_budget
                          .unionByName(unscheduled.select(*cols))
                          .unionByName(passthrough.select(*cols))
                          .unionByName(new_rows))
        # every frontier url is already in seen (added at discovery), so
        # denied rows need no re-insert; seen grows only by new discoveries
        # -> the wave emits a DELTA, never a rewritten snapshot (rewriting
        # a 10^10-row seen table every wave is the scale killer)
        seen_delta = new_rows.select("url",
                                     F.lit(wave + 1).alias("added_wave"))
        # write-ready layouts built NOW, inside the overlapped
        # construction window (round 8): every transformation over
        # these deep trees re-analyzes the whole tree eagerly, which
        # previously happened at write time — seen-delta layout ahead
        # of the wave's longest job, frontier layout on the wave
        # tail's critical path. The writers consume these as-is. The
        # builds run on the POOL (a second py4j connection): they are
        # leaf branches nothing else below depends on, so they overlap
        # both the stats job and the rest of this construction;
        # resolved after the stats join, before run_wave returns.
        def _build_layouts():
            seen_out = _partition_layout(
                seen_delta.withColumn("host", host_col(F.col("url")))
                .select("url", "added_wave", "host"), cfg)
            prepped = bands_mod._prep_delta(frontier_delta, cfg)
            # run-map precount branches (see delta_counts below); the
            # zero-job driver half derives from the collected stats
            early = (over_budget.select("score")
                     .unionByName(passthrough.select("score")))
            late = new_rows.select("score")
            return seen_out, prepped, early, late

        f_layouts = (pool.submit(_build_layouts)
                     if pool is not None else None)

        fetch_log = (fetched.select(
            F.lit(wave).alias("wave"), "rank_in_wave", "url",
            "host", "depth", "score", "status", "bytes")
            .observe(obs_fetch,
                     F.count(F.lit(1)).alias("n"),
                     F.coalesce(F.sum("bytes"), F.lit(0)).alias("b"),
                     F.coalesce(F.sum(((F.col("status") >= 300)
                                       & (F.col("status") < 400))
                                      .cast("long")), F.lit(0)).alias("r")))
        # ---- join the stats job: the extension decision (and the
        # coarse-score guard) needs the collected histogram; under no
        # extension the chain built above is the wave's final plan ----
        stats = (f_stats.result() if f_stats is not None
                 else stats_q.collect())
        if len(stats) > cfg.max_score_histogram:
            raise ValueError(
                f"score histogram has {len(stats)} distinct (den, score) "
                f"rows > max_score_histogram={cfg.max_score_histogram}: "
                "score_expr must produce COARSE scores (the distributed "
                "top-W collects one row per distinct score — a fine-"
                "grained score would silently turn this into an "
                "O(|frontier|) driver transfer). Coarsen score_expr or "
                "raise cfg.max_score_histogram deliberately.")
        n_budgeted = sum(r.cnt for r in stats if not r.den)
        if n_budgeted >= cfg.wave_cap or plan.exhausted:
            (seen_delta_out, frontier_delta_prepped,
             early_counts_df, late_counts_df) = (
                f_layouts.result() if f_layouts is not None
                else _build_layouts())
            break
        # deterministic extension: re-plan with a larger coverage
        # target (plan_read is monotone in need — the new read set is
        # a superset, so the rebuild only ever adds rows). The
        # provisional chain above never ran (everything below the
        # ranked cache is lazy; its Observations and accumulator die
        # with it) — drop its cache registrations and rebuild over
        # the extended read set.
        for c in (ranked, stats_q, with_rank, fetched, distinct_links,
                  new_rows):
            c.unpersist()
        plan = bands_mod.plan_read(
            manifest, plan.rows_read + (cfg.wave_cap - n_budgeted))
    n_denied = sum(r.cnt for r in stats if r.den)
    # driver copy of the cumulative offsets — IDENTICAL math to the
    # in-plan offs above (same histogram source, same off < cap cut);
    # it feeds only the frontier run map's zero-job unscheduled counts
    # (delta_counts["driver"] below), never the rank computation.
    hist = sorted(((r.score, r.cnt) for r in stats if not r.den),
                  key=lambda x: -x[0])
    offsets = {}
    cum = 0
    for s, c in hist:
        if cum >= cfg.wave_cap:
            break
        offsets[s] = cum
        cum += c

    def _obs_get(obs, fallback):
        """Observed metrics, with a fallback for degenerate waves: a
        provably-empty branch can be optimizer-folded to an empty
        LocalRelation, dropping the CollectMetrics row (seen at
        frontier exhaustion). The fallback aggregates the CACHED
        DataFrame — trivial work in exactly the case it triggers.
        The except is surfaced as a warning (advisor round-2: a
        GENUINE failure — misattached observation, JVM error — must
        not be silently absorbed into a recomputation); the intended
        folded-empty-plan trigger yields all-zero fallback metrics,
        so any non-degenerate warning in logs is a real bug signal."""
        try:
            return obs.get
        except Exception as e:
            import warnings

            warnings.warn(
                f"observation {getattr(obs, '_name', '?')} unavailable "
                f"({type(e).__name__}: {str(e)[:120]}); recomputing from "
                "the cached DataFrame — expected only at frontier "
                "exhaustion (folded-empty plans drop CollectMetrics)")
            return fallback()

    def finish() -> dict:
        """Read the wave's observed metrics — valid only after the
        checkpoint writes ran (each observation rides on a write)."""
        fetch_m = _obs_get(obs_fetch, lambda: fetched.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("bytes"), F.lit(0)).alias("b"),
            F.coalesce(F.sum(((F.col("status") >= 300)
                              & (F.col("status") < 400))
                             .cast("long")), F.lit(0)).alias("r"))
            .collect()[0].asDict())
        links_m = _obs_get(obs_links, lambda: distinct_links.agg(
            F.count(F.lit(1)).alias("d"),
            F.coalesce(F.sum("n_refs"), F.lit(0)).alias("t"))
            .collect()[0].asDict())
        new_m = _obs_get(obs_new, lambda: new_rows.agg(
            F.count(F.lit(1)).alias("n")).collect()[0].asDict())
        return {
            "wave": wave,
            "scheduled": int(fetch_m["n"]),
            "fetched": int(fetch_m["n"]),
            "denied": int(n_denied),
            "links_total": int(links_m["t"]),
            "links_distinct": int(links_m["d"]),
            "new_urls": int(new_m["n"]),
            "dupes": int(links_m["d"]) - int(new_m["n"]),
            "bytes": int(fetch_m["b"]),
            "pages_dropped": int(dropped_acc.value),
            "redirects": int(fetch_m["r"]),
        }

    def n_new() -> int:
        """The wave's new-url count alone — available as soon as the
        seen-delta write (which obs_new rides) has committed, without
        blocking on the fetch_log write's observation the way
        finish() does; crawl() uses it to decide cuckoo activation
        while the fetch_log write may still be running."""
        return int(_obs_get(obs_new, lambda: new_rows.agg(
            F.count(F.lit(1)).alias("n")).collect()[0].asDict())["n"])

    def n_links_distinct() -> int:
        """This wave's distinct-candidate count (rides the seen-delta
        write like obs_new) — the predictor for next wave's cuckoo
        probe routing."""
        return int(_obs_get(obs_links, lambda: distinct_links.agg(
            F.count(F.lit(1)).alias("d"),
            F.coalesce(F.sum("n_refs"), F.lit(0)).alias("t"))
            .collect()[0].asDict())["d"])

    def new_score_counts():
        """Per-score counts of the wave's new rows, read from obs_new
        (rides the seen-delta write) — None when non-default scoring
        made the conditional sums unavailable (caller then runs the
        data-derived counts job)."""
        if not default_scoring:
            return None
        m = _obs_get(obs_new, lambda: new_rows.agg(
            F.count(F.lit(1)).alias("n"),
            *[F.coalesce(
                F.sum((F.col("score") == F.lit(new_score_base + r))
                      .cast("long")), F.lit(0)).alias(f"c{r}")
              for r in range(7)]).collect()[0].asDict())
        return [(new_score_base + r, int(m[f"c{r}"]))
                for r in range(7) if int(m[f"c{r}"])]

    finish.n_new = n_new
    finish.n_links_distinct = n_links_distinct
    finish.new_score_counts = new_score_counts
    finish.cuckoo_probed = use_cuckoo  # routing decision -> lineage

    caches = [*frontier_caches, ranked, stats_q, fetched,
              distinct_links, new_rows, with_rank]
    # Per-score counts of the delta's four branches, split by HOW
    # they are knowable (round 8): "early" (over-budget ∪ passthrough)
    # reads only the schedule-phase caches (ranked/frontier — warm
    # once the stats job ran) and is counted on the pool WHILE the
    # seen-delta write runs; "late" (new rows) needs that write's
    # cache and is counted right after it commits; the unscheduled
    # branch needs NO job at all — its counts derive exactly from the
    # stats histogram and the rank offsets: per budgeted score s with
    # count c, the wave schedules max(0, min(c, cap - offset_s)) rows
    # (ranks offset_s+1..offset_s+c, kept iff <= cap; scores outside
    # the offset map schedule none). The frontier write's run map
    # then needs no aggregation pass over the full delta chain
    # (bands._with_runs precounts).
    unsched_counts: dict[int, int] = {}
    for s, c in hist:
        off = offsets.get(s)
        sched = 0 if off is None else max(0, min(c, cfg.wave_cap - off))
        if c - sched:
            unsched_counts[s] = c - sched
    delta_counts = {
        "early": early_counts_df,
        "late": late_counts_df,
        "driver": unsched_counts,
    }
    # frontier_delta_prepped carries the band/part/salt layout columns
    # (write_wave_frontier prepped=True); seen_delta_out is the
    # write-ready seen-delta layout; seen_delta itself stays the plain
    # projection the bloom/cuckoo maintenance reads straight off the
    # new_rows cache (the layouts' repartition would cost those folds
    # an extra shuffle)
    return (frontier_delta_prepped, seen_delta, fetch_log, finish,
            caches, plan, seen_strategy, delta_counts, seen_delta_out)


def _wave_dir(cfg: CrawlConfig, wave: int) -> str:
    return os.path.join(cfg.checkpoint_dir, f"wave={wave:05d}")


def _score_counts(df: DataFrame):
    """Exact per-score row counts of a delta branch — the run-map
    precount the frontier write consumes (bands._with_runs
    precounts). limit() bounds the collect itself; over-coarse inputs
    surface via the run-map size guard downstream, never as a silent
    O(|delta|) driver transfer."""
    from . import bands as bands_mod

    return (df.groupBy("score").agg(F.count("*").alias("cnt"))
            .limit(bands_mod.MAX_RUN_MAP_ROWS + 1).collect())


def _seed_score_counts(cfg: CrawlConfig) -> list[tuple[int, int]]:
    """Per-score counts of seed_frontier(cfg) in closed form: seed
    scores are score_py(id, 0, True) = 15000 + id % 7 over ids
    0..n_seeds-1, so residue r contributes ceil((n_seeds - r) / 7)
    rows. Differentially pinned against the Spark histogram
    (tests/test_frontier.py) — lets the seed frontier write skip its
    run-map aggregation job, the bootstrap's most expensive action."""
    counts: dict[int, int] = {}
    for r in range(min(7, cfg.n_seeds)):
        counts[score_py(r, 0, True)] = (cfg.n_seeds - r + 6) // 7
    return sorted(counts.items())


def _partition_layout(df: DataFrame, cfg: CrawlConfig,
                      salt: bool = False) -> DataFrame:
    """The host-salted, sorted physical layout every seen write uses
    (see _partitioned_write) as a pure TRANSFORMATION — factored out
    (round 8) so the crawl wave can build it inside its overlapped
    plan-construction window: each transformation over the wave's
    deep delta tree pays a full eager re-analysis, which used to land
    at write time on the wave tail's critical path."""
    part = F.pmod(F.xxhash64("host"), F.lit(cfg.partitions)).cast("int")
    df = df.withColumn("part", part)
    if salt:
        df = df.withColumn(
            "host_salt",
            F.pmod(F.xxhash64("url"), F.lit(cfg.salt_buckets)).cast("int"))
    # seen writes (no score) sort by (part, url): part-first keeps
    # row-group part ranges tight, which is what lets the pruned seen
    # strategy skip row groups via footer stats (seen.prune_seen_paths)
    sort_keys = ([F.desc("score"), F.asc("url")]
                 if "score" in df.columns
                 else [F.asc("part"), F.asc("url")])
    return (df.repartition(cfg.partitions, "part")
            .sortWithinPartitions(*sort_keys))


def _partitioned_write(df: DataFrame, path: str, cfg: CrawlConfig,
                       salt: bool = False, dir_partitioned: bool = True,
                       bloom_acc=None):
    """Seen snapshots/deltas (frontier writes go through
    bands.write_wave_frontier, which applies the same layout INSIDE
    each score band): partitioned by pmod(xxhash64(host),P)
    (+ optional intra-host salt for skewed hosts), score-sorted within
    partitions — the 'priority queue as host-salted, score-sorted
    partitions' of the north rule.

    dir_partitioned=False keeps `part` as a data column (flat layout)
    — required for the seen DELTA dirs, which are read as a multi-root
    union (partition-directory inference would see conflicting
    structures across roots).

    ``bloom_acc`` (a seen.BloomUpdateAccumulator) folds bloom
    maintenance INTO this write: an order-preserving mapInPandas
    stage accumulates each batch's bit positions while the rows
    stream to parquet — one pass, no separate per-wave bloom job.
    The hashes are JVM-computed (F.xxhash64, the same expression the
    probe uses) and dropped before the write, so the on-disk layout
    is unchanged."""
    out = _partition_layout(df, cfg, salt=salt)
    if bloom_acc is not None:
        if dir_partitioned:
            raise ValueError("bloom_acc is wired for the flat seen-"
                             "delta layout only")
        out_schema = out.schema
        acc = bloom_acc

        def fold(batches):
            # one accumulator update per TASK (see
            # BloomUpdateAccumulator): chunks collected across the
            # generator's batches, sent once at partition end
            chunks = []
            for pdf in batches:
                if len(pdf):
                    chunks.append(acc.positions(pdf["__h"]))
                yield pdf.drop(columns="__h")
            acc.add_positions(chunks)

        out = (out.withColumn("__h", F.xxhash64("url"))
               .mapInPandas(fold, out_schema))
    writer = out.write.mode("overwrite")
    if dir_partitioned:
        writer = writer.partitionBy("part")
    writer.parquet(path)


#: 2^27 bits = 16 MiB — the broadcast-comfort ceiling shared by first
#: activation (bloom_auto_bits) and the ×8 saturation rebuild path.
BLOOM_MAX_BITS = 1 << 27


def bloom_auto_bits(n_seen: int) -> int:
    """Power-of-two bloom size giving ~16 bits per already-seen key
    at first activation (k=3 -> est-fp ~0.5%), floored at 2^8 and
    capped at BLOOM_MAX_BITS = 2^27 (16 MiB broadcast). Pure function
    — the crawl oracle computes the identical value."""
    bits = max(8, (16 * max(n_seen, 1) - 1).bit_length())
    return min(1 << bits, BLOOM_MAX_BITS)


def _max_job_id(spark) -> int:
    """Highest Spark job id submitted without a job group (the crawl
    sets none): per-wave deltas give the jobs-per-wave count recorded
    in timings — the fixed-cost budget the pipelined writes exist to
    shrink. Informational (not oracle-pinned): concurrent foreign
    jobs in the same session would inflate it."""
    ids = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    return max(ids) if ids else -1


def last_complete_wave(cfg: CrawlConfig) -> int:
    """Highest wave with a committed lineage marker, or -1."""
    w = -1
    if not os.path.isdir(cfg.checkpoint_dir):
        return w
    for name in sorted(os.listdir(cfg.checkpoint_dir)):
        d = os.path.join(cfg.checkpoint_dir, name)
        if name.startswith("wave=") and \
                os.path.exists(os.path.join(d, "_lineage.json")):
            w = max(w, int(name.split("=")[1]))
    return w


def _seen_delta_paths(cfg: CrawlConfig, upto_wave: int,
                      use_compact: bool = True) -> list[str]:
    """Seed delta + per-wave discovery deltas — the seen table is the
    UNION of immutable delta snapshots (append-only; a snapshot
    rewrite per wave would be O(|seen|) and unsustainable at 10^10).
    When a compacted snapshot exists (snapshots.compact_seen — the
    offline maintenance job), reads use it as the base and union only
    the deltas past its horizon, keeping the root count bounded."""
    if use_compact:
        from .snapshots import read_compact_marker

        marker = read_compact_marker(cfg)
        if (marker is not None and marker["upto_wave"] <= upto_wave
                and os.path.isdir(marker["path"])):
            paths = [marker["path"]]
            for w in range(marker["upto_wave"] + 1, upto_wave + 1):
                p = os.path.join(_wave_dir(cfg, w), "seen_delta")
                if os.path.isdir(p):
                    paths.append(p)
            return paths
    paths = [os.path.join(cfg.checkpoint_dir, "seen_seed")]
    for w in range(0, upto_wave + 1):
        p = os.path.join(_wave_dir(cfg, w), "seen_delta")
        if os.path.isdir(p):
            paths.append(p)
    return paths


def _read_seen(spark: SparkSession, cfg: CrawlConfig,
               upto_wave: int) -> DataFrame:
    # explicit (pruned) schema: every seen root carries url+added_wave
    # (SEEN_SCHEMA), so handing the reader the projection up front
    # skips the per-wave driver-side footer/schema inference — the
    # multi-root union is re-created after every wave
    return (spark.read.schema(SEEN_SCHEMA)
            .parquet(*_seen_delta_paths(cfg, upto_wave)))


def crawl(spark: SparkSession, cfg: CrawlConfig) -> dict:
    """Run (or resume) the crawl up to cfg.n_waves. Returns summary.

    Applies the crawl-session AQE profile (see CrawlConfig.aqe) around
    the wave loop and restores the caller's setting on exit — the
    profile changes Spark-job count per wave, never any output."""
    from concurrent.futures import ThreadPoolExecutor

    prior = None
    if cfg.aqe == "off":
        prior = spark.conf.get("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    prior_bt = None
    if cfg.broadcast_timeout > 0:
        prior_bt = spark.conf.get("spark.sql.broadcastTimeout", "300")
        spark.conf.set("spark.sql.broadcastTimeout",
                       str(cfg.broadcast_timeout))
    # two more crawl-session profile knobs (restored on exit; both are
    # plan-shape only — results are identical at any setting):
    # * limit.initialNumPartitions: the run-map / probe collects are
    #   `limit(N).collect()` with a TINY true row count (coarse-score
    #   contract); the default incremental take (1, 4, 16, ... parts)
    #   turns each into 3-5 sequential mini-jobs of pure scheduling
    #   latency per wave — one job over all partitions is strictly
    #   better here at ANY scale, because the bound is on the row
    #   count, not the partition count.
    # * preferSortMergeJoin=false: lets the planner use shuffled-hash
    #   for the seen anti-join (guide §3.1) — skips sorting both
    #   sides; Spark's own build-side size conditions still gate it,
    #   so oversized partitions fall back to sort-merge.
    prior_take = spark.conf.get("spark.sql.limit.initialNumPartitions",
                                None)
    spark.conf.set("spark.sql.limit.initialNumPartitions", str(1 << 20))
    prior_smj = spark.conf.get("spark.sql.join.preferSortMergeJoin",
                               None)
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    # the pool that runs the pipelined checkpoint writes is owned HERE
    # so any exception inside the loop still joins in-flight writes
    # (a write racing session teardown is worse than a leaked cache)
    # 5 slots: fetch_log + frontier + cuckoo + sharded-bloom writes +
    # the bloom bitmap fold can all be in flight once the seen delta
    # commits
    pool = ThreadPoolExecutor(max_workers=5)
    try:
        return _crawl_loop(spark, cfg, pool)
    finally:
        pool.shutdown(wait=True)
        if prior is not None:
            spark.conf.set("spark.sql.adaptive.enabled", prior)
        if prior_bt is not None:
            spark.conf.set("spark.sql.broadcastTimeout", prior_bt)
        for key, val in (("spark.sql.limit.initialNumPartitions",
                          prior_take),
                         ("spark.sql.join.preferSortMergeJoin",
                          prior_smj)):
            if val is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, val)


def _crawl_loop(spark: SparkSession, cfg: CrawlConfig, pool) -> dict:
    from . import bands as bands_mod

    start = last_complete_wave(cfg) + 1
    seed_path = os.path.join(cfg.checkpoint_dir, "seen_seed")
    seed_frontier_dir = os.path.join(cfg.checkpoint_dir, "frontier_seed")
    prev_links = None
    if start == 0:
        seeds = seed_frontier(spark, cfg)
        # the two seed writes are independent (separate dirs, and the
        # seeds chain is a cheap range->concat recomputed by each):
        # run seen_seed on the pool while the frontier seed's
        # histogram + band write run on this thread — the crawl's
        # fixed bootstrap cost was two sequential writes (round-8
        # driver profile: ~2.5 s of the bench leg)
        f_seed = pool.submit(
            _partitioned_write,
            seeds.select("url", F.lit(0).alias("added_wave"),
                         F.col("host")), seed_path, cfg,
            dir_partitioned=False)
        # seed frontier = the wave -1 manifest (band-partitioned like
        # every later wave; nothing was read, so nothing is carried)
        default_scoring = (score_expr is _SCORE_EXPR_DEFAULT
                           and score_py is _SCORE_PY_DEFAULT)
        manifest, _ = bands_mod.write_wave_frontier(
            spark, seeds, seed_frontier_dir, cfg,
            bands_mod.empty_manifest(cfg), consumed=[],
            score_counts=(_seed_score_counts(cfg) if default_scoring
                          else None))
        bands_mod.write_manifest(seed_frontier_dir, manifest)
        f_seed.result()
        seen = _read_seen(spark, cfg, -1)
        n_seen = cfg.n_seeds
        seen_paths = _seen_delta_paths(cfg, -1)
    else:
        prev = _wave_dir(cfg, start - 1)
        # cuckoo shards bake the partition id they were built for;
        # resuming with a different cfg.partitions would silently
        # probe candidates against the wrong shard (false negatives
        # through the definitely-new bypass) — refuse loudly.
        with open(os.path.join(prev, "_lineage.json")) as fh:
            prev_lineage = json.load(fh)
        if prev_lineage.get("partitions") != cfg.partitions:
            raise ValueError(
                f"resume partitions mismatch: checkpoint {prev} was "
                f"written with partitions={prev_lineage.get('partitions')} "
                f"but cfg.partitions={cfg.partitions}; resume with the "
                "recorded value (shard/candidate partition ids must agree)")
        manifest = bands_mod.load_manifest(os.path.join(prev, "frontier"))
        if manifest["band_width"] != cfg.band_width:
            raise ValueError(
                f"resume band_width mismatch: checkpoint {prev} was "
                f"written with band_width={manifest['band_width']} but "
                f"cfg.band_width={cfg.band_width}; the read protocol "
                "(and its oracle) is a function of the band layout")
        prev_split = manifest.get("band_split_rows")
        if (prev_split is not None
                and prev_split != bands_mod.split_rows_of(cfg)):
            raise ValueError(
                f"resume band_split_rows mismatch: checkpoint {prev} "
                f"was written with run size {prev_split} but cfg "
                f"resolves to {bands_mod.split_rows_of(cfg)}; the read "
                "protocol (and its oracle) is a function of the run "
                "layout — resume with the recorded value")
        seen = _read_seen(spark, cfg, start - 1)
        n_seen = seen.count()  # parquet footer count — cheap
        seen_paths = _seen_delta_paths(cfg, start - 1)
        prev_links = prev_lineage.get("metrics", {}).get("links_distinct")

    cuckoo_shards = None
    if cfg.use_cuckoo and start > 0:
        prev_cuckoo = os.path.join(_wave_dir(cfg, start - 1), "cuckoo")
        if os.path.isdir(prev_cuckoo):
            cuckoo_shards = spark.read.parquet(prev_cuckoo)

    # bloom bitmap: maintained INCREMENTALLY (seed once when the seen
    # set crosses the threshold, then OR-in each wave's delta —
    # per-wave bloom cost is O(new urls), never an O(|seen|) rescan)
    # and persisted per wave for resume.
    bloom = None
    bloom_m = cfg.bloom_bits
    bloom_rebuild = False
    bloom_shards = None           # sharded mode: (partition, bitmap) DF
    shard_m = cfg.bloom_bits      # per-shard bit count
    if cfg.use_bloom and start > 0:
        prev_bloom = os.path.join(_wave_dir(cfg, start - 1), "bloom.bin")
        if cfg.bloom_mode != "sharded" and os.path.exists(prev_bloom):
            with open(prev_bloom, "rb") as fh:
                bloom = fh.read()
            # the effective bit count is persisted via the bitmap
            # length (nbytes = m//8 + 1); a pending saturation rebuild
            # is re-derived from the last wave's recorded est-fp so a
            # resumed run reproduces the uninterrupted one exactly
            bloom_m = (len(bloom) - 1) * 8
            prev_fp = prev_lineage.get("metrics", {}).get("bloom_est_fp")
            bloom_rebuild = (prev_fp is not None
                             and prev_fp > cfg.bloom_fp_rebuild)
        prev_shards = os.path.join(_wave_dir(cfg, start - 1),
                                   "bloom_shards")
        if cfg.bloom_mode == "sharded" and os.path.isdir(prev_shards):
            from .seen import bloom_shard_bits

            bloom_shards = spark.read.parquet(prev_shards)
            one = bloom_shards.select("bitmap").limit(1).collect()
            if one:  # shard_m persisted via bitmap length, like bloom.bin
                shard_m = bloom_shard_bits(bytes(one[0].bitmap))
            prev_fp = prev_lineage.get("metrics", {}).get("bloom_est_fp")
            bloom_rebuild = (prev_fp is not None
                             and prev_fp > cfg.bloom_fp_rebuild)

    import time as _time

    all_metrics = []
    all_timings = []
    pending = None  # deferred tail of the previous wave (see _finalize)

    def _finalize(p):
        """Drain the pending wave's fetch_log write, assemble its
        metrics + lineage, release its caches.

        WAVE OVERLAP (round-5 verdict item 1): nothing downstream of
        a wave depends on its fetch_log parquet except the metrics
        that ride it, so the wave loop defers this tail and calls it
        only after the NEXT wave's schedule phase (frontier read +
        ranking + stats job) has already run — the fetch_log
        serialization drain and the next wave's planning jobs share
        the cluster instead of serializing. Ordering safety: the
        deferred wave's lineage marker is always written BEFORE the
        next wave's own writes launch, so wave directories + lineage
        commit strictly in wave order and last_complete_wave stays
        contiguous (a crash mid-overlap re-runs the unfinalized wave
        deterministically). Metric VALUES are unaffected by the
        deferral — observations accumulate on their writes no matter
        when .get is read; the oracle pins them exactly."""
        t0 = _time.perf_counter()
        p["f_log"].result()
        p["tt"]["fetch_log_drain"] = round(_time.perf_counter() - t0, 3)
        metrics = p["finish"]()
        metrics.update(p["extra_metrics"])
        lineage = {**p["lineage_base"], "metrics": metrics}
        with open(os.path.join(p["dir"], "_lineage.json"), "w") as fh:
            json.dump(lineage, fh, indent=1)
        for c in p["caches"]:
            c.unpersist()
        all_timings.append({"wave": p["wave"], **p["tt"]})
        all_metrics.append(metrics)

    for wave in range(start, cfg.n_waves):
        tt, t0 = {}, _time.perf_counter()

        def _mark(name):
            nonlocal t0
            tt[name] = round(_time.perf_counter() - t0, 3)
            t0 = _time.perf_counter()

        jobs_before = _max_job_id(spark)
        # the previous wave's finalize (fetch_log drain + metrics +
        # lineage + cache release) runs on the POOL, overlapping this
        # wave's schedule phase; it is joined below, before this
        # wave's writes launch, so wave directories + lineage still
        # commit strictly in wave order (round 8 — previously the
        # drain overlapped but the metrics/lineage/unpersist tail ran
        # serially between the schedule phase and the writes)
        f_fin = (pool.submit(_finalize, pending)
                 if pending is not None else None)
        shards_cache = None  # activation/rebuild cache, freed post-merge
        if (cfg.use_bloom and cfg.bloom_mode == "sharded"
                and n_seen >= cfg.bloom_min_seen):
            # sharded activation / saturation rebuild: per-shard auto
            # size targets ~16 bits/key of the partition's share
            # (uniform pmod split); ×8 rebuild capped per shard at
            # the same BLOOM_MAX_BITS. The build is a distributed
            # applyInPandas — no driver bitmap at any point.
            if bloom_shards is None or (bloom_rebuild
                                        and shard_m < BLOOM_MAX_BITS):
                from .seen import build_bloom_shards

                if bloom_shards is None:
                    shard_m = bloom_auto_bits(
                        max(1, n_seen // max(1, cfg.partitions)))
                else:
                    shard_m = min(shard_m * 8, BLOOM_MAX_BITS)
                bloom_shards = build_bloom_shards(
                    seen, cfg.partitions, shard_m).cache()
                shards_cache = bloom_shards
        elif cfg.use_bloom and n_seen >= cfg.bloom_min_seen:
            if bloom is None:
                # first activation: size from the KNOWN seen count
                # (~16 bits/key -> est-fp ~0.5%) instead of starting
                # saturated and paying x8 rebuilds wave after wave;
                # cfg.bloom_bits stays the floor, 2^27 (16 MiB
                # broadcast) the ceiling. Oracle mirrors the formula.
                # Submitted to the pool as a FUTURE: run_wave only
                # consumes the bitmap when it builds the seen-filter
                # plan (after the schedule phase's stats job), so the
                # build job overlaps scheduling instead of serializing
                # ahead of it (round 8; bitmap bytes are identical —
                # only the launch point moves).
                bloom_m = max(bloom_m, bloom_auto_bits(n_seen))
                bloom = pool.submit(build_bloom, seen, bloom_m)
            elif bloom_rebuild and bloom_m < BLOOM_MAX_BITS:
                # saturation rebuild at the wave boundary (the est-fp
                # signal fired last wave): geometric ×8 growth,
                # rebuilt from the seen table — the source of truth
                # the bitmap only approximates. Amortized-rare by the
                # geometric growth; filters only prune, so scheduling
                # is identical across any resize history. Capped at
                # the same 2^27 (16 MiB) broadcast ceiling as first
                # activation — past the cap the bitmap stays saturated
                # but still-correct (it only prunes; the anti-join is
                # exact) and the cost router will stop consulting it.
                bloom_m = min(bloom_m * 8, BLOOM_MAX_BITS)
                bloom = pool.submit(build_bloom, seen, bloom_m)
        bloom_rebuild = False
        _mark("bloom_build")
        (frontier_delta, seen_delta, fetch_log, finish, caches,
         plan, seen_strategy, delta_counts, seen_delta_out) = run_wave(
            spark, cfg, wave, manifest, seen, n_seen_hint=n_seen,
            cuckoo_shards=cuckoo_shards, bloom=bloom,
            prev_links_hint=prev_links, seen_paths=seen_paths,
            bloom_m=bloom_m, bloom_shards=bloom_shards, pool=pool)
        # the residual half of the frontier delta's score histogram
        # reads only schedule-phase caches — count it on the pool NOW
        # so the collect overlaps the seen-delta write below; the
        # other half (unscheduled/new) is counted after that write
        # commits, inside write_frontier (see run_wave delta_counts)
        f_early_counts = pool.submit(_score_counts, delta_counts["early"])
        if hasattr(bloom, "result"):
            # activation/rebuild future: resolved inside run_wave's
            # seen-filter plan build (overlapping the stats job);
            # here it is already done — this just unwraps the bytes
            # for the accumulator fold below
            bloom = bloom.result()
        _mark("schedule")
        # the previous wave's fetch_log drain + finalize overlapped
        # the schedule phase above (pool future); it must complete
        # (and its lineage commit) before THIS wave's writes launch —
        # see _finalize
        if f_fin is not None:
            f_fin.result()
            pending = None
        _mark("prev_wave_drain")
        d = _wave_dir(cfg, wave)

        # The checkpoint writes ARE the wave's remaining Spark jobs;
        # per-wave metrics ride on them via observe(), and bloom
        # maintenance folds the committed delta's cache into the
        # bitmap on the POOL (overlapping the fetch_log/frontier
        # writes) — round 8: the previous shape rode the seen-delta
        # write itself via a mapInPandas accumulator, which put a
        # full Arrow->pandas->Arrow transpose of every delta column
        # on the wave's LONGEST job for work that only needs the url
        # hashes; bloom_merge_urls over the cached new_rows produces
        # the identical bitmap (same xxhash64 -> _bit_indices) off
        # the critical path. PIPELINED: the seen-delta write runs FIRST
        # and alone — it owns the fetch+link chain and materializes
        # the fetch cache with every task slot doing real work — then
        # the fetch_log write (a pure cache read + parquet encode)
        # launches with the frontier/cuckoo/bloom writes and drains
        # into the next wave's schedule phase via _finalize. The
        # round-7 shape raced fetch_log and seen-delta on the shared
        # fetch cache: block locks made each partition compute once,
        # but the losing job's 32 tasks sat BLOCKED on those locks
        # while HOLDING task slots (REST profile: fetch_log stage
        # run 31.5 core-s, cpu 2.9 core-s per wave) — half the
        # cluster waiting on the other half. Launch-after-commit
        # keeps the overlap (fetch_log serialization shares the
        # cluster with the frontier write + next wave's planning)
        # without the blocked-slot tax.
        def write_fetch_log():
            fetch_log.write.mode("overwrite").parquet(
                os.path.join(d, "fetch_log"))

        def write_seen_delta():
            # layout prebuilt by run_wave (seen_delta_out) inside the
            # overlapped construction window — only the write command
            # itself is planned here
            seen_delta_out.write.mode("overwrite").parquet(
                os.path.join(d, "seen_delta"))

        def write_frontier():
            # merge the overlapped residual counts, the driver-derived
            # unscheduled counts and the new-row counts (observed on
            # the seen-delta write under default scoring, else one
            # small job over the new-rows cache); the frontier write
            # then skips its run-map aggregation pass
            merged: dict[int, int] = dict(delta_counts["driver"])
            new_counts = finish.new_score_counts()
            if new_counts is None:
                new_counts = [(int(r["score"]), int(r["cnt"]))
                              for r in _score_counts(delta_counts["late"])]
            for s, c in new_counts:
                merged[s] = merged.get(s, 0) + c
            for r in f_early_counts.result():
                s = int(r["score"])
                merged[s] = merged.get(s, 0) + int(r["cnt"])
            return bands_mod.write_wave_frontier(
                spark, frontier_delta, os.path.join(d, "frontier"),
                cfg, manifest, plan,
                score_counts=sorted(merged.items()), prepped=True)

        def maintain_cuckoo(n_seen_after, probe_next):
            # Maintain shards only when the NEXT wave is predicted to
            # probe them (same seen/candidate ratio the probe router
            # uses): in the expansion phase every wave's incremental
            # fold is flat per-wave cost for a filter nobody reads.
            # Skipping maintenance DROPS the shards (returns None and
            # writes no cuckoo dir) — a stale shard would false-
            # negative, which the definitely-new bypass turns into a
            # correctness bug, so the only safe skip is drop-and-
            # rebuild-from-seen when the ratio finally crosses
            # (maintain_cuckoo_shards with shards=None does exactly
            # that full rebuild; amortized-rare by the ratio check).
            if not probe_next:
                return None
            from .seen import maintain_cuckoo_shards

            return maintain_cuckoo_shards(
                cuckoo_shards, seen_delta.select("url"),
                _read_seen(spark, cfg, wave), cfg.partitions,
                path=os.path.join(d, "cuckoo"))

        def maintain_bloom_shards():
            # sharded-mode maintenance: OR the wave's delta into each
            # touched shard (cogroup, partition-local) and persist —
            # the sharded twin of the accumulator fold, with zero
            # driver-side bitmap; stats feed the same est-fp signal
            if bloom_shards is None or cfg.bloom_mode != "sharded":
                return None
            from .seen import bloom_shards_stats, merge_bloom_shards

            p = os.path.join(d, "bloom_shards")
            merge_bloom_shards(bloom_shards, seen_delta.select("url"),
                               cfg.partitions, shard_m) \
                .write.mode("overwrite").parquet(p)
            new_df = spark.read.parquet(p)
            return (new_df,) + bloom_shards_stats(new_df)

        f_seen = pool.submit(write_seen_delta)
        f_seen.result()
        f_log = pool.submit(write_fetch_log)
        f_frontier = pool.submit(write_frontier)
        f_bshards = pool.submit(maintain_bloom_shards)
        # bloom maintenance: fold the committed delta (cached
        # new_rows — obs_new rode the seen write, so the cache is
        # warm) into the bitmap on the pool; bit-identical to the
        # old in-write accumulator (same xxhash64 -> _bit_indices
        # positions), overlapping the fetch_log/frontier writes
        # instead of taxing the seen-delta write with a pandas pass
        f_bloom = (pool.submit(bloom_merge_urls,
                               seen_delta.select("url"), bloom_m, bloom,
                               16)
                   if (cfg.use_bloom and bloom is not None) else None)
        # obs_new/obs_links rode the just-committed seen write —
        # the cuckoo maintenance decision needs the post-wave
        # seen count and candidate volume without blocking on the
        # fetch_log write's observation
        n_seen_after = n_seen + finish.n_new()
        probe_next = (
            cfg.use_cuckoo
            and n_seen_after >= cfg.cuckoo_min_seen
            and (cfg.cuckoo_probe_min_ratio == 0
                 or n_seen_after >= cfg.cuckoo_probe_min_ratio
                 * max(finish.n_links_distinct(), 1)))
        f_cuckoo = pool.submit(maintain_cuckoo, n_seen_after,
                               probe_next)
        # metrics that do NOT ride the fetch_log write are assembled
        # now (bloom fold needs only the committed seen delta — the
        # accumulator rode that write); the obs_fetch-backed ones are
        # read in _finalize, after the deferred f_log drain
        extra_metrics = {"frontier_rows_read": plan.rows_read}
        n_seen = n_seen_after
        if f_bloom is not None:
            # join the pool-side fold, persist + saturation signal
            bloom = f_bloom.result()
            with open(os.path.join(d, "bloom.bin"), "wb") as fh:
                fh.write(bloom)
            pc = bloom_popcount(bloom)
            extra_metrics["bloom_m"] = bloom_m
            extra_metrics["bloom_popcount"] = pc
            extra_metrics["bloom_est_fp"] = bloom_est_fp(pc, bloom_m)
            bloom_rebuild = (extra_metrics["bloom_est_fp"]
                             > cfg.bloom_fp_rebuild)
        bs = f_bshards.result()
        if bs is not None:
            if shards_cache is not None:
                shards_cache.unpersist()  # merged parquet replaces it
            bloom_shards, m_total, pc = bs
            extra_metrics["bloom_m"] = m_total
            extra_metrics["bloom_popcount"] = pc
            extra_metrics["bloom_est_fp"] = bloom_est_fp(pc, m_total)
            bloom_rebuild = (extra_metrics["bloom_est_fp"]
                             > cfg.bloom_fp_rebuild)
        new_manifest, rows_written = f_frontier.result()
        cuckoo_shards = f_cuckoo.result()
        bands_mod.write_manifest(os.path.join(d, "frontier"),
                                 new_manifest)
        # manifest bookkeeping (footer counts recorded at write time):
        # no Spark job, no observation, no exhaustion edge case
        extra_metrics["frontier_rows_written"] = rows_written
        extra_metrics["frontier_size"] = bands_mod.manifest_total(
            new_manifest)
        _mark("seen_frontier_cuckoo")
        # informational: with the wave overlap, the previous wave's
        # fetch_log job id may land inside this wave's delta — the
        # counter bounds per-wave job submissions, it does not
        # attribute them exactly
        tt["spark_jobs"] = _max_job_id(spark) - jobs_before

        # this wave's fetch_log drain + metrics/lineage/caches are
        # DEFERRED past the next wave's schedule phase (see _finalize)
        pending = {
            "wave": wave, "dir": d, "f_log": f_log, "finish": finish,
            "caches": caches, "extra_metrics": extra_metrics, "tt": tt,
            "lineage_base": {
                "wave": wave,
                "input_wave_dir": (_wave_dir(cfg, wave - 1) if wave
                                   else "seeds"),
                "partitions": cfg.partitions,
                "seen_deltas": _seen_delta_paths(cfg, wave),
                "frontier_manifest": bands_mod.manifest_path(
                    os.path.join(d, "frontier")),
                "frontier_bands_read": plan.read_bands,
                "frontier_segments_read": sorted(plan.consumed_keys()),
                "frontier_score_cut": plan.s_cut,
                "seen_strategy": seen_strategy,
                "cuckoo_probe": finish.cuckoo_probed,
                "config": {"universe": cfg.universe,
                           "n_seeds": cfg.n_seeds,
                           "budget_per_host": cfg.budget_per_host,
                           "wave_cap": cfg.wave_cap,
                           "band_width": cfg.band_width,
                           "band_split_rows":
                               bands_mod.split_rows_of(cfg)},
            },
        }
        manifest = new_manifest
        seen = _read_seen(spark, cfg, wave)
        seen_paths = _seen_delta_paths(cfg, wave)
        prev_links = finish.n_links_distinct()
        if cfg.compact_every and (wave + 1) % cfg.compact_every == 0:
            # compaction must see a fully-committed wave (and resume
            # correctness must never find a compacted snapshot ahead
            # of the lineage markers), so a compacting wave gives up
            # its overlap and finalizes in place
            _finalize(pending)
            pending = None
            from .snapshots import compact_seen

            compact_seen(spark, cfg, upto_wave=wave)
            seen = _read_seen(spark, cfg, wave)  # re-root on the compact
            seen_paths = _seen_delta_paths(cfg, wave)
    if pending is not None:
        _finalize(pending)
    return {"start_wave": start, "metrics": all_metrics,
            "timings": all_timings,
            "checkpoint_dir": cfg.checkpoint_dir}


def read_fetch_log(spark: SparkSession, cfg: CrawlConfig) -> DataFrame:
    return spark.read.parquet(os.path.join(cfg.checkpoint_dir, "wave=*",
                                           "fetch_log"))


def _main() -> None:
    """CLI: python -m cuphic_spark.frontier.crawl [options]"""
    import argparse

    from ..session import get_spark

    ap = argparse.ArgumentParser(
        description="Run the deterministic crawl wave loop.")
    ap.add_argument("--universe", type=int, default=100_000)
    ap.add_argument("--seeds", type=int, default=64)
    ap.add_argument("--budget", type=int, default=8)
    ap.add_argument("--wave-cap", type=int, default=256)
    ap.add_argument("--waves", type=int, default=3)
    ap.add_argument("--checkpoint-dir", default="/tmp/cuphic_crawl_cli")
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--compact-every", type=int, default=0,
                    help="auto-compact seen deltas every N waves")
    ap.add_argument("--seen-check", default="auto",
                    choices=["auto", "shuffle", "broadcast", "pruned"])
    args = ap.parse_args()

    spark = get_spark(app_name="cuphic-crawl", cores=args.cores)
    cfg = CrawlConfig(universe=args.universe, n_seeds=args.seeds,
                      budget_per_host=args.budget, wave_cap=args.wave_cap,
                      n_waves=args.waves,
                      checkpoint_dir=args.checkpoint_dir,
                      partitions=args.partitions,
                      compact_every=args.compact_every,
                      seen_check=args.seen_check)
    summary = crawl(spark, cfg)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    _main()
