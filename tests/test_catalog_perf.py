"""Gated catalog-scale perf regression (VERDICT r3 task 7).

Run with SPACEPHARER_CATALOG_BENCH=1 (like the hardware tier's
SPACEPHARER_TPU_TESTS). Reproduces BASELINE.md's catalog row at the 2k
operating point: builds the corpora if absent, runs
tools/bench_catalog.py end to end, and asserts wall-time and peak-RSS
bounds. Bounds are deliberately loose — this host's page-fault cost
swings identical runs ±50% (CLAUDE.md) — so only real order-of-
magnitude regressions (e.g. a per-query Python driver sneaking back)
trip it.
"""
import glob
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SPACEPHARER_CATALOG_BENCH") != "1",
    reason="catalog bench tier: set SPACEPHARER_CATALOG_BENCH=1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ensure(path, tool, *args):
    if not glob.glob(os.path.join(path, "*")):
        subprocess.run([sys.executable, os.path.join(REPO, "tools", tool)]
                       + list(args) + [path], check=True,
                       capture_output=True)


def test_catalog_2k_wall_and_rss(tmp_path):
    catalog = "/tmp/catalog2k"
    genomes = "/tmp/scale100"
    _ensure(catalog, "make_catalog_corpus.py", "2000", "--spacers", "3")
    _ensure(genomes, "make_scale_corpus.py", "100")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_catalog.py"),
         catalog, genomes, str(tmp_path), "--rss-limit-mb", "3000"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    # round-4 measured: easy-predict 8.9-10.7 s, peak RSS ~0.8 GB
    # (reference binary: 10.3 s). 3x headroom for VM fault phases.
    assert out["easy_predict_s"] < 35, out
    assert out["createsetdb_s"] < 15, out
    assert out["peak_rss_mb"] < 3000, out
    assert out["n_matched_sets"] > 0, out
