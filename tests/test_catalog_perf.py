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


def test_flagship_100M_target_side(tmp_path):
    """Flagship target scale (VERDICT r4 ask #1): 2460 mutated genomes
    = 100.5 M nt x the 30k-set catalog. Round-5 measured 154 s /
    5.5 GB RSS (reference: 107 s at --threads 2 nondeterministic,
    191 s at its deterministic --threads 1 operating point, byte-
    identical to ours). Bounds are loose (VM fault phases)."""
    catalog = "/tmp/catalog30k"
    genomes = "/tmp/flagship100M"
    _ensure(catalog, "make_catalog_corpus.py", "30000", "--spacers", "3")
    _ensure(genomes, "make_flagship_corpus.py", "820")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_catalog.py"),
         catalog, genomes, str(tmp_path), "--rss-limit-mb", "12000"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["easy_predict_s"] < 450, out
    assert out["peak_rss_mb"] < 12000, out
    assert out["n_matched_sets"] > 10000, out


def test_dion_490k_query_side(tmp_path):
    """Dion-scale query side (VERDICT r4 ask #3: README.md:107-110,
    DownloadDb.cpp:32-57 — >490k spacer sets): 490k sets x 300
    genomes through easy-predict under an RSS cap, proving the
    key-blocked scoring + batched walk stream rather than
    materialize."""
    catalog = "/tmp/catalog490k"
    genomes = "/tmp/scale100"
    _ensure(catalog, "make_catalog_corpus.py", "490000", "--spacers", "3")
    _ensure(genomes, "make_scale_corpus.py", "100")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_catalog.py"),
         catalog, genomes, str(tmp_path), "--rss-limit-mb", "16000"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["peak_rss_mb"] < 16000, out
    assert out["n_matched_sets"] > 0, out
