#!/usr/bin/env python3
"""blastn-mode throughput: our searchnucl vs the reference's
`search --search-type 3` on a scaled nucleotide corpus (VERDICT r4
ask #6: parity on the fixtures + a measured throughput row).

Corpus: targets = windows of the example phage genomes; queries =
~6%-mutated fragments (both strands) so real alignments dominate.
Output m8 is byte-compared after reordering targets to the reference
createdb's shuffled key order (duplicate-target tie-break convention,
tests/test_searchnucl_parity.py).

    python tools/bench_blastn.py /tmp/blastn_bench --queries 400
"""
import argparse
import glob
import gzip
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = "/tmp/refbuild/src/spacepharer"
EXAMPLES = "/root/reference/examples"
BASES = "ACGT"


def read_genomes():
    out = []
    for path in sorted(glob.glob(os.path.join(EXAMPLES, "GCA_*.fna.gz"))):
        parts = []
        with gzip.open(path, "rb") as fh:
            for line in fh:
                if not line.startswith(b">"):
                    parts.append(line.strip())
        out.append(np.frombuffer(b"".join(parts), dtype=np.uint8))
    return out


def revcomp(s):
    comp = dict(zip(b"ACGT", b"TGCA"))
    return bytes(comp.get(c, ord("N")) for c in s[::-1])


def mutate(rng, frag, sub=0.06, indel=0.01):
    out = bytearray()
    for b in frag:
        r = rng.random()
        if r < indel / 2:
            continue
        if r < indel:
            out.append(ord(rng.choice(list(BASES))))
        out.append(ord(rng.choice(list(BASES))) if rng.random() < sub else b)
    return bytes(out)


def build_corpus(outdir, n_queries, n_targets, rng):
    genomes = read_genomes()
    t_path = os.path.join(outdir, "t.fasta")
    with open(t_path, "w") as fh:
        for i in range(n_targets):
            g = genomes[i % len(genomes)]
            lo = int(rng.integers(0, max(len(g) - 30000, 1)))
            w = g[lo:lo + 30000].tobytes()
            fh.write(f">t{i:05d}\n{w.decode()}\n")
    q_path = os.path.join(outdir, "q.fasta")
    with open(q_path, "w") as fh:
        for i in range(n_queries):
            g = genomes[i % len(genomes)]
            ln = int(rng.integers(500, 3000))
            lo = int(rng.integers(0, max(len(g) - ln, 1)))
            frag = mutate(rng, g[lo:lo + ln].tobytes())
            if rng.random() < 0.5:
                frag = revcomp(frag)
            fh.write(f">q{i:05d}\n{frag.decode()}\n")
    return q_path, t_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--queries", type=int, default=400)
    ap.add_argument("--targets", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-reference", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    q_path, t_path = build_corpus(args.workdir, args.queries,
                                  args.targets, rng)

    out = {"n_queries": args.queries, "n_targets": args.targets}

    t0 = time.time()
    r = subprocess.run([os.path.join(REPO, "bin", "spacepharer"),
                        "searchnucl", q_path, t_path,
                        os.path.join(args.workdir, "ours.m8")],
                       capture_output=True, text=True)
    out["ours_s"] = round(time.time() - t0, 2)
    assert r.returncode == 0, r.stderr[-2000:]

    if not args.skip_reference and os.path.exists(REF):
        env = dict(os.environ)
        cwd = args.workdir
        t0 = time.time()
        for cmd in ([REF, "createdb", q_path, "qdb"],
                    [REF, "createdb", t_path, "tdb"],
                    [REF, "search", "qdb", "tdb", "aln", "tmp",
                     "--search-type", "3", "--threads", "2"],
                    [REF, "convertalis", "qdb", "tdb", "aln", "ref.m8",
                     "--threads", "1"]):
            r = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True,
                               text=True)
            assert r.returncode == 0, (cmd[:3], r.stderr[-2000:])
        out["reference_s"] = round(time.time() - t0, 2)
        # byte parity is defined at the reference's deterministic
        # --threads 1 operating point (its multi-threaded aln DB write
        # order is racy: per-thread DBWriter files; same finding as the
        # flagship protocol, BASELINE.md)
        for cmd in ([REF, "search", "qdb", "tdb", "aln1", "tmp1",
                     "--search-type", "3", "--threads", "1"],
                    [REF, "convertalis", "qdb", "tdb", "aln1",
                     "ref_t1.m8", "--threads", "1"]):
            r = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True,
                               text=True)
            assert r.returncode == 0, (cmd[:3], r.stderr[-2000:])

        # parity: rerun ours with targets in the reference's key order
        # both sides follow createdb's shuffled key order in the
        # reference's output: reorder like for like
        order = [ln.split("\t")[1]
                 for ln in open(os.path.join(cwd, "tdb.lookup"))]
        q_order = [ln.split("\t")[1]
                   for ln in open(os.path.join(cwd, "qdb.lookup"))]
        from spacepharer_tpu.io.fasta import iter_fasta
        from spacepharer_tpu.pipeline.searchnucl import search_nucl
        by_name = {e.name: e.seq for e in iter_fasta(t_path)}
        t_entries = [(n, by_name[n]) for n in order]
        q_by_name = {e.name: e.seq for e in iter_fasta(q_path)}
        q_entries = [(n, q_by_name[n]) for n in q_order]
        res = search_nucl(q_entries, t_entries)
        got = "".join(h.m8_row() + "\n"
                      for qn, _ in q_entries for h in res[qn])
        want = open(os.path.join(cwd, "ref_t1.m8")).read()
        want2 = open(os.path.join(cwd, "ref.m8")).read()
        out["m8_byte_identical_vs_threads1"] = got == want
        out["m8_multiset_identical_vs_threads2"] = \
            sorted(got.split("\n")) == sorted(want2.split("\n"))
        out["n_rows"] = want.count("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
