#!/usr/bin/env python3
"""Catalog-scale easy-predict bench with a peak-RSS assertion.

Reproducible driver for the Shmakov-shaped scale proof (README.md:
107-110: >30k spacer sets): builds the target SetDBs, runs easy-predict
over a spacer-set catalog under rusage accounting, and prints one JSON
line with wall times and the peak RSS of the whole child tree.

    python tools/make_scale_corpus.py 100 /tmp/scale100
    python tools/make_catalog_corpus.py 30000 /tmp/catalog30k
    python tools/bench_catalog.py /tmp/catalog30k /tmp/scale100 \
        /tmp/cat30k_run --split-memory-limit 2000 --rss-limit-mb 6000

A nonzero exit means the RSS cap was exceeded or a stage failed.
"""
import argparse
import glob
import json
import os
import resource
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPACEPHARER = os.path.join(REPO, "bin", "spacepharer")


def run(args, cwd):
    t0 = time.time()
    r = subprocess.run(args, cwd=cwd, capture_output=True, text=True)
    dt = time.time() - t0
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + r.stderr[-2000:])
        sys.exit(f"stage failed: {' '.join(args[:3])}...")
    return dt


def main():
    global SPACEPHARER
    ap = argparse.ArgumentParser()
    ap.add_argument("catalog", help="dir of spacer-set .fas files")
    ap.add_argument("genomes", help="dir of target genome .fna.gz files")
    ap.add_argument("workdir")
    ap.add_argument("--split-memory-limit", type=int, default=0)
    ap.add_argument("--rss-limit-mb", type=int, default=0,
                    help="fail if the child tree's peak RSS exceeds this")
    ap.add_argument("--extra", nargs="*", default=[],
                    help="extra easy-predict flags")
    ap.add_argument("--binary", default=SPACEPHARER,
                    help="spacepharer executable (ours by default; pass "
                         "the reference build for like-for-like runs)")
    ap.add_argument("--threads", type=int, default=0,
                    help="thread count for EVERY stage (the reference "
                         "is only deterministic at --threads 1: its "
                         "per-thread DBWriter files + omp dynamic "
                         "scheduling make DB offset order racy, and "
                         "LINEAR_ACCCESS internal ids follow offsets)")
    args = ap.parse_args()

    SPACEPHARER = args.binary
    os.makedirs(args.workdir, exist_ok=True)
    genomes = sorted(glob.glob(os.path.join(args.genomes, "*.fna.gz")))
    sets = sorted(glob.glob(os.path.join(args.catalog, "*.fas")))
    assert genomes and sets, "empty corpus"

    thr = (["--threads", str(args.threads)] if args.threads else [])
    t_build = run([SPACEPHARER, "createsetdb"] + genomes
                  + ["targets", "tmp"] + thr, args.workdir)
    t_ctrl = run([SPACEPHARER, "createsetdb"] + genomes
                 + ["targets_rev", "tmp", "--reverse-fragments", "1"]
                 + thr, args.workdir)
    flags = list(args.extra) + thr
    if args.split_memory_limit:
        flags += ["--split-memory-limit", str(args.split_memory_limit)]
    # Dion-scale catalogs (490k files) exceed ARG_MAX: pass the
    # directory — parsespacer's dir-walk input (ParseSpacer.cpp:81-132)
    set_args = sets if len(sets) <= 60000 else [args.catalog]
    t_pred = run([SPACEPHARER, "easy-predict"] + set_args
                 + ["targets", "out.tsv", "tmp", "-v", "2"] + flags,
                 args.workdir)
    peak_mb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 1024
    n_hits = sum(1 for line in open(os.path.join(args.workdir, "out.tsv"))
                 if line.startswith("#"))
    out = {
        "n_sets": len(sets), "n_genomes": len(genomes),
        "createsetdb_s": round(t_build, 2),
        "control_s": round(t_ctrl, 2),
        "easy_predict_s": round(t_pred, 2),
        "peak_rss_mb": round(peak_mb, 1),
        "n_matched_sets": n_hits,
        "split_memory_limit_mb": args.split_memory_limit,
    }
    print(json.dumps(out))
    if args.rss_limit_mb and peak_mb > args.rss_limit_mb:
        sys.exit(f"peak RSS {peak_mb:.0f} MB exceeds cap "
                 f"{args.rss_limit_mb} MB")


if __name__ == "__main__":
    main()
