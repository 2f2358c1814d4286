"""North-rule launch shape: spark-submit --py-files ships the engine
as a zip; the job must run WITHOUT the repo on the python path (cwd
outside the repo proves imports resolve from the zip)."""

import json
import os
import pathlib
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit")
def test_spark_submit_pyfiles_crawl(tmp_path):
    zpath = tmp_path / "cuphic_spark.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for p in (REPO / "cuphic_spark").rglob("*.py"):
            z.write(p, p.relative_to(REPO))
    ckpt = tmp_path / "ckpt"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--py-files", str(zpath),
         str(REPO / "scripts" / "submit_crawl.py"),
         "--universe", "5000", "--seeds", "12", "--budget", "4",
         "--wave-cap", "24", "--waves", "2",
         "--checkpoint-dir", str(ckpt), "--cores", "4"],
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout[out.stdout.index("{"):])
    assert [m["wave"] for m in summary["metrics"]] == [0, 1]
    assert summary["metrics"][0]["scheduled"] > 0
    assert (ckpt / "wave=00001" / "_lineage.json").exists()

    # the same seeds/budget produce the oracle's wave-0 schedule —
    # launch shape must not change results
    from tests.oracle import crawl_oracle

    oracle = crawl_oracle.run(universe=5000, n_seeds=12,
                              budget_per_host=4, wave_cap=24, n_waves=2)
    assert summary["metrics"] == oracle.metrics


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit")
def test_spark_submit_two_parallelism_levels(tmp_path):
    """North-rule launch shape at TWO cluster sizes: the same
    spark-submit --py-files job at N and 4N local workers must
    produce identical metrics and fetch ordering (the determinism
    contract through the launch path — the sandbox stand-in for the
    N vs 4N executor requirement; throughput at this toy scale is
    latency-bound and is recorded, not asserted — BENCH/BASELINE.md
    carries the measured scaling evidence)."""
    import time

    zpath = tmp_path / "cuphic_spark.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for p in (REPO / "cuphic_spark").rglob("*.py"):
            z.write(p, p.relative_to(REPO))
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)

    results = {}
    for workers in (2, 8):
        ckpt = tmp_path / f"ckpt_{workers}"
        t0 = time.perf_counter()
        out = subprocess.run(
            [SPARK_SUBMIT, "--master", f"local[{workers}]",
             "--py-files", str(zpath),
             str(REPO / "scripts" / "submit_crawl.py"),
             "--universe", "5000", "--seeds", "12", "--budget", "4",
             "--wave-cap", "24", "--waves", "2",
             "--checkpoint-dir", str(ckpt), "--cores", str(workers)],
            cwd=str(tmp_path), env=env, capture_output=True,
            text=True, timeout=600)
        assert out.returncode == 0, (workers, out.stderr[-2000:])
        summary = json.loads(out.stdout[out.stdout.index("{"):])
        sched = sum(m["scheduled"] for m in summary["metrics"])
        results[workers] = {
            "metrics": summary["metrics"],
            "urls_per_sec": sched / (time.perf_counter() - t0),
        }

    # identical results at both parallelism levels — the contract
    assert results[2]["metrics"] == results[8]["metrics"]
    from tests.oracle import crawl_oracle

    oracle = crawl_oracle.run(universe=5000, n_seeds=12,
                              budget_per_host=4, wave_cap=24, n_waves=2)
    assert results[8]["metrics"] == oracle.metrics
