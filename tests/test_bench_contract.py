"""Driver-contract tests for bench.py (BASELINE.json metric harness).

The driver runs ``python bench.py`` at the end of every round and records
its ONE stdout JSON line. The parent process's scheduling, partial-window
salvage, ratchet cache, and stale-recipe fallback guard are the pieces
that have actually broken across rounds — they are tested hermetically
here by stubbing the child command (GANLAB_BENCH_CHILD_STUB seam; the
stub is tests/bench_child_stub.py and the relay is never touched). One
slow test runs a REAL measuring child in smoke mode (tiny CPU config) to
cover measure() itself.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STUB = os.path.join(REPO, "tests", "bench_child_stub.py")


def run_parent(tmp_path, spec, cache=None, timeout=360, child_timeout=20):
    """Run bench.py's parent with stubbed children; return (row, cache).

    The stubbed child timeout must cover a Python interpreter start under
    a fully loaded machine (the suite once saw >5 s spawn latency while a
    hardware A/B run was scoring, which made every 'ok' stub read as a
    timed-out child and the parent correctly — but confusingly — serve
    the cache). 20 s keeps the hang-salvage tests bounded (~4 attempts)
    while being far above worst-case spawn latency.
    """
    cache_path = os.path.join(str(tmp_path), "cache.json")
    if cache is not None:
        with open(cache_path, "w") as f:
            json.dump(cache, f)
    env = dict(
        os.environ,
        GANLAB_BENCH_CHILD_STUB=STUB,
        GANLAB_BENCH_STUB_SPEC=json.dumps(spec),
        GANLAB_BENCH_CACHE=cache_path,
        GANLAB_BENCH_CHILD_TIMEOUT=str(child_timeout),
        GANLAB_BENCH_NO_COOLDOWN="1",
    )
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, timeout=timeout,
                         env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE json line, got: {lines}"
    cache_after = (json.load(open(cache_path))
                   if os.path.exists(cache_path) else None)
    return json.loads(lines[0]), cache_after


def test_parent_happy_path(tmp_path):
    row, cache = run_parent(tmp_path, {"single": "ok:200",
                                       "chunked": "ok:180"})
    assert row["value"] == 200.0
    assert row["vs_baseline"] == pytest.approx(5.0)
    assert row["unit"] == "images/sec/chip"
    assert row["stat"] == "median_of_5"
    assert row["recipe"] == "pen16-seq"
    assert row["dispatch"] == "single"
    assert set(row["modes"]) == {"single", "chunked"}
    assert len(row["windows_img_s"]) == 5
    # Ratchet cache records the measurement with its date.
    assert cache["value"] == 200.0 and "measured_at" in cache


def test_parent_salvages_partial_and_prefers_full_median(tmp_path):
    # 'single' hangs after streaming 2 healthy windows; 'chunked'
    # completes. A full 5-window median must outrank the salvaged
    # partial even though the partial's median is higher.
    # 12 s child timeout: the retried hanging mode costs 4 bounded
    # attempts; windows stream immediately after spawn, so the salvage
    # still has >2x margin over worst observed spawn latency (~5 s).
    row, _ = run_parent(tmp_path, {"single": "hang:170,175",
                                   "chunked": "ok:160"}, child_timeout=12)
    assert row["dispatch"] == "chunked"
    assert row["value"] == 160.0
    assert row["stat"] == "median_of_5"
    # The partial attempt is disclosed, with its salvage note.
    assert "partial" in row["modes"]["single"]
    assert row["modes"]["single"]["windows_img_s"] == [170.0, 175.0]
    # The hanging mode was retried (first attempt + retries, all hung).
    assert len(row["attempts"]) >= 3


def test_parent_allfail_rejects_stale_recipe_cache(tmp_path):
    stale = {"metric": "StyleGAN 256^2 training throughput",
             "value": 174.12, "unit": "images/sec/chip",
             "vs_baseline": 4.353, "recipe": "pen16-fusedseq"}
    row, _ = run_parent(tmp_path, {"single": "fail", "chunked": "fail"},
                        cache=stale)
    assert row["value"] == 0.0
    assert "no usable cache" in row["note"]


def test_parent_allfail_serves_matching_recipe_cache(tmp_path):
    good = {"metric": "StyleGAN 256^2 training throughput",
            "value": 170.0, "unit": "images/sec/chip",
            "vs_baseline": 4.25, "recipe": "pen16-seq",
            "measured_at": "2026-08-19 00:00"}
    row, _ = run_parent(tmp_path, {"single": "fail", "chunked": "fail"},
                        cache=good)
    assert row["value"] == 170.0
    assert "cached result" in row["note"]
    assert row["recipe"] == "pen16-seq"


def test_parent_ratchet_keeps_best_and_discloses_degraded(tmp_path):
    healthy = {"metric": "StyleGAN 256^2 training throughput",
               "value": 500.0, "unit": "images/sec/chip",
               "vs_baseline": 12.5, "recipe": "pen16-seq",
               "windows_img_s": [499, 500, 501],
               "measured_at": "2026-08-19 00:00"}
    row, cache = run_parent(tmp_path, {"single": "ok:200",
                                       "chunked": "ok:180"},
                            cache=healthy)
    # Live (degraded) row discloses the ratcheted healthy best ...
    assert row["value"] == 200.0
    assert row["best_known_healthy"]["value"] == 500.0
    # ... and the cache keeps the best, recording the latest live value.
    assert cache["value"] == 500.0
    assert cache["latest_value"] == 200.0


@pytest.mark.slow
def test_real_child_smoke():
    """One REAL measuring child (GANLAB_BENCH_SMOKE: tiny CPU config)
    covers measure() — compile, warmup, streamed windows, CHILD_RESULT."""
    env = dict(os.environ, GANLAB_BENCH_SMOKE="1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--child",
         "--mode", "single"],
        capture_output=True, text=True, timeout=570, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = out.stdout.splitlines()
    assert sum(ln.startswith("CHILD_WINDOW ") for ln in lines) == 5
    assert any(ln.startswith("CHILD_RECIPE pen16-seq") for ln in lines)
    result = json.loads(next(ln for ln in lines
                             if ln.startswith("CHILD_RESULT "))
                        [len("CHILD_RESULT "):])
    assert result["dispatch"] == "single"
    assert result["median"] > 0
    assert len(result["windows_img_s"]) == 5
