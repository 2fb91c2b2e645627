#!/usr/bin/env python3
"""Benchmark: batched Smith-Waterman scoring throughput on TPU.

Workload: all-pairs spacer-ORF x target-ORF scoring on the example
corpus (the alignment hot loop of predictmatch), queries and targets
packed on device, substitution tiles gathered on-chip, global top-k per
query — i.e. the sharded search step with one shard.

Baseline: the reference SpacePHARER `align` module timed on the same
machine over the same pair list (true-cell throughput). If the
reference binary is not present, a recorded measurement from this host
is used (see BASELINE_CELLS_PER_S provenance comment).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import glob
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Reference `align` (2 threads, SSE4.1/AVX2 build) on this host, all-pairs
# 305 spacer ORFs x 691 target ORFs (247.9M true cells): measured via
# tools/bench_reference.py -> ~0.33 s wall including DB load; repeated
# larger runs give the steady-state figure below.
BASELINE_CELLS_PER_S = 1.03e9

EXAMPLES = "/root/reference/examples"
REF_BINARY = "/tmp/refbuild/src/spacepharer"


def build_workload():
    from spacepharer_tpu.alphabet import encode_aa
    from spacepharer_tpu.io.setdb import (build_setdb_from_fasta,
                                          build_setdb_from_spacers)
    from spacepharer_tpu.io.spacer_formats import parse_spacers

    tdb = build_setdb_from_fasta(sorted(glob.glob(EXAMPLES + "/GCA_*.fna.gz")))
    recs, sources = parse_spacers(sorted(glob.glob(EXAMPLES + "/*.fas")))
    qdb = build_setdb_from_spacers(recs, sources)
    qs = [encode_aa(qdb.orf_aa(i).tobytes()) for i in range(qdb.n_orfs)]
    ts = [encode_aa(tdb.orf_aa(i).tobytes()) for i in range(tdb.n_orfs)]
    return qs, ts


def run_tpu_bench(qs, ts, n_lo=2, n_hi=12, dup=20):
    """Sustained device throughput of the packed all-pairs SW kernel.

    The target side is duplicated `dup`x so the lane-packing runs in
    its production regime (a 1x examples corpus cannot fill 128 lanes
    past the longest ORF's depth; real catalogs are 100-1000x larger).
    Throughput is true (unpadded) cells per second.

    Timing through the axon relay is treacherous: block_until_ready can
    return before execution and repeat executions of identical inputs
    are served from a cache, which once inflated this benchmark ~100x.
    The airtight protocol used here chains n data-dependent kernel
    invocations inside one jitted fori_loop (each iteration's c1
    constants depend on the previous iteration's checksum, so nothing
    folds or caches), fetches the scalar result to force completion,
    and reports the (n_hi - n_lo) subtraction — pure device compute,
    launch overhead cancelled."""
    import jax
    import jax.numpy as jnp

    from spacepharer_tpu.ops.matrices import load_matrix
    from spacepharer_tpu.ops.sw_packed import (pack_query_rows,
                                               pack_targets_segmented,
                                               sw_allpairs_packed)

    ts = ts * dup
    m = load_matrix("VTML40.out", 2.0)
    pack = pack_query_rows(qs, m.scores)
    tpack = pack_targets_segmented(ts)
    max_span = pack["max_span"]
    sq_block = pack["sq_block"]
    nq_block = pack["nq_block"]
    seg_len = tpack["seg_len"]
    args = [jax.device_put(jnp.asarray(x)) for x in
            (pack["prof"], pack["c1"], pack["c2"], pack["first"],
             pack["qoff"], pack["last"], tpack["t_seqs"], tpack["keep"],
             tpack["bounds"])]

    @jax.jit
    def chain(prof, c1, c2, first, qoff, last, t_seqs, keep, bounds, n):
        def body(i, carry):
            acc, c1v = carry
            best = sw_allpairs_packed(prof, c1v, c2, first, qoff, last,
                                      t_seqs, keep, bounds, 16, 2,
                                      max_span, sq_block, nq_block,
                                      seg_len)
            acc = acc + best.sum()
            return acc, c1 + (acc & 1)
        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.int32(0), c1))
        return acc

    np.asarray(chain(*args, 1))  # compile + warm
    t = {}
    for n in (n_lo, n_hi):
        t0 = time.perf_counter()
        np.asarray(chain(*args, n))
        t[n] = time.perf_counter() - t0
    dt = (t[n_hi] - t[n_lo]) / (n_hi - n_lo)

    q_lens = np.array([len(q) for q in qs], dtype=np.int64)
    t_lens = np.array([len(t) for t in ts], dtype=np.int64)
    true_cells = int(q_lens.sum() * t_lens.sum())
    return true_cells / dt, true_cells, dt


def _golden_dbs():
    """Unpack the golden reference run (tests/golden_run.tar.gz) and
    return (querySetDB, targetSetDB) paths, or None."""
    import tarfile
    root = "/tmp/spacepharer_bench_golden"
    run = os.path.join(root, "run")
    if not os.path.isdir(run):
        tar = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "tests", "golden_run.tar.gz")
        if not os.path.exists(tar):
            return None
        os.makedirs(root, exist_ok=True)
        with tarfile.open(tar) as tf:
            tf.extractall(root)
    golden_t = os.path.join(run, "targets")
    for d in os.listdir(os.path.join(run, "tmp")):
        q = os.path.join(run, "tmp", d, "qsetdb")
        if d != "latest" and os.path.exists(q + ".dbtype"):
            return q, golden_t
    return None


def measure_reference(qs, ts):
    """Time the reference align module on the same all-pairs workload."""
    if not os.path.exists(REF_BINARY):
        return None
    dbs = _golden_dbs()
    if dbs is None:
        return None
    golden_q, golden_t = dbs
    n_t = len(open(golden_t + ".index").readlines())
    n_q = len(open(golden_q + ".index").readlines())
    rows = "".join(f"{k}\t255\t0\n" for k in range(n_t))
    with open("/tmp/bench_prefall", "w") as d, \
            open("/tmp/bench_prefall.index", "w") as i:
        off = 0
        for qk in range(n_q):
            data = rows + "\0"
            d.write(data)
            i.write(f"{qk}\t{off}\t{len(data)}\n")
            off += len(data)
    with open("/tmp/bench_prefall.dbtype", "wb") as fh:
        fh.write((7).to_bytes(4, "little"))
    for f in glob.glob("/tmp/bench_alnall*"):
        os.unlink(f)
    t0 = time.perf_counter()
    subprocess.run([REF_BINARY, "align", golden_q, golden_t,
                    "/tmp/bench_prefall", "/tmp/bench_alnall",
                    "--threads", "2", "-e", "200", "--alignment-mode", "2",
                    "-a", "1", "--gap-open", "16", "--gap-extend", "2",
                    "--sub-mat", "VTML40.out", "-v", "0"],
                   check=True, capture_output=True)
    dt = time.perf_counter() - t0
    cells = int(np.outer([len(q) for q in qs],
                         [len(t) for t in ts]).astype(np.int64).sum())
    return cells / dt


def main():
    qs, ts = build_workload()
    tpu_cells_per_s, cells, dt = run_tpu_bench(qs, ts)
    ref = measure_reference(qs, ts)
    baseline = ref if ref else BASELINE_CELLS_PER_S
    print(json.dumps({
        "metric": "sw_true_cells_per_second",
        "value": round(tpu_cells_per_s, 1),
        "unit": "cells/s (all-pairs spacer-vs-ORF SW, 1 chip; baseline = "
                "reference align, 2 CPU threads, same host)",
        "vs_baseline": round(tpu_cells_per_s / baseline, 2),
    }))


if __name__ == "__main__":
    main()
