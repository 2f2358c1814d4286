"""Checkpoint snapshot management: list / rollback / verify.

Wave checkpoints are immutable snapshot dirs with explicit lineage
(`_lineage.json`) — the same snapshot/rollback semantics Iceberg
provides via its catalog, kept catalog-free here (no Iceberg jars in
the sandbox; swap `.write.parquet` for `.writeTo(...).append()` when
one exists).

Rollback = delete wave dirs above the target; the crawl then resumes
from the target wave deterministically (pinned: resumed ordering ==
fresh ordering, tests/test_frontier.py)."""

from __future__ import annotations

import json
import os
import shutil

from .crawl import CrawlConfig, _wave_dir, last_complete_wave


def list_snapshots(cfg: CrawlConfig) -> list[dict]:
    """Lineage records of all complete waves, in order."""
    out = []
    w = 0
    while True:
        path = os.path.join(_wave_dir(cfg, w), "_lineage.json")
        if not os.path.exists(path):
            break
        with open(path) as fh:
            out.append(json.load(fh))
        w += 1
    return out


def rollback_to_wave(cfg: CrawlConfig, wave: int) -> int:
    """Drop all snapshots AFTER ``wave``; returns number removed.
    ``wave=-1`` resets to the seed state."""
    removed = 0
    last = last_complete_wave(cfg)
    for w in range(wave + 1, last + 1):
        d = _wave_dir(cfg, w)
        if os.path.isdir(d):
            shutil.rmtree(d)
            removed += 1
    if wave < 0:
        seed = os.path.join(cfg.checkpoint_dir, "seen_seed")
        if os.path.isdir(seed):
            shutil.rmtree(seed)
            removed += 1
    return removed


def verify_lineage(cfg: CrawlConfig) -> list[str]:
    """Consistency check: each wave's recorded input dir exists and
    wave numbers are contiguous. Returns a list of problems."""
    problems = []
    snaps = list_snapshots(cfg)
    for i, s in enumerate(snaps):
        if s["wave"] != i:
            problems.append(f"wave {i}: lineage says {s['wave']}")
        if i > 0 and not os.path.isdir(s["input_wave_dir"]):
            problems.append(f"wave {i}: missing input {s['input_wave_dir']}")
        for p in s.get("seen_deltas", []):
            if not os.path.isdir(p):
                problems.append(f"wave {i}: missing seen delta {p}")
    return problems
