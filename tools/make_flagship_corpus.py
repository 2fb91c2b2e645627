#!/usr/bin/env python3
"""Generate a GenBank_phage_2018_09-shaped target corpus (VERDICT r4
ask #1): N mutated copies of each example phage genome, point-mutated
at --rate so that NO two contigs are identical — killing the
duplicate-contig tie-break artifact and restoring byte-equality as the
parity bar at flagship scale (reference README.md:77: ~8000 phage
genomes, ~400 Mbp; data/genbank_phages_2018_09.tsv).

    python tools/make_flagship_corpus.py 820 /tmp/flagship100M
        -> 2460 genomes, ~100.5 M nt

Each output file holds one genome (file number = set id, matching
createdb's set semantics, lib/mmseqs/src/util/createdb.cpp:15).
"""
import argparse
import glob
import gzip
import os

import numpy as np

EXAMPLES = "/root/reference/examples"
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def read_fasta_seq(path):
    opener = gzip.open if path.endswith(".gz") else open
    header = None
    parts = []
    with opener(path, "rb") as fh:
        for line in fh:
            if line.startswith(b">"):
                header = line[1:].strip().decode()
            else:
                parts.append(line.strip())
    return header, np.frombuffer(b"".join(parts), dtype=np.uint8)


def mutate(seq, rate, rng):
    """Point-substitute ~rate of the ACGT positions (always to a
    DIFFERENT base, so every copy differs from the original)."""
    out = seq.copy()
    # map ACGT (either case) -> 0..3; others untouched
    lut = np.full(256, 255, dtype=np.uint8)
    for i, b in enumerate(b"ACGT"):
        lut[b] = i
        lut[b + 32] = i
    code = lut[seq]
    is_base = code != 255
    hit = is_base & (rng.random(seq.shape[0]) < rate)
    n = int(hit.sum())
    if n:
        # new base = (old + 1..3) mod 4: never the same base
        shift = rng.integers(1, 4, size=n).astype(np.uint8)
        out[hit] = BASES[(code[hit] + shift) % 4]
    return out


def write_gz(path, header, seq, width=70):
    pad = (-len(seq)) % width
    mat = np.concatenate([seq, np.full(pad, ord(" "), np.uint8)])
    mat = mat.reshape(-1, width)
    lines = b"\n".join(row.tobytes().rstrip() for row in mat)
    with gzip.open(path, "wb", compresslevel=1) as fh:
        fh.write(b">" + header.encode() + b"\n" + lines + b"\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n_copies", type=int,
                    help="mutated copies per example genome")
    ap.add_argument("outdir")
    ap.add_argument("--rate", type=float, default=0.02,
                    help="per-base substitution rate (default 2%%)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.outdir, exist_ok=True)
    total = 0
    n_files = 0
    for src in sorted(glob.glob(os.path.join(EXAMPLES, "GCA_*.fna.gz"))):
        header, seq = read_fasta_seq(src)
        acc = header.split()[0]
        base = os.path.basename(src)[:-len(".fna.gz")]
        for ci in range(args.n_copies):
            mseq = mutate(seq, args.rate, rng)
            name = f"{base}_mut{ci:05d}.fna.gz"
            write_gz(os.path.join(args.outdir, name),
                     f"{acc}_mut{ci:05d} mutated copy {ci}", mseq)
            total += len(mseq)
            n_files += 1
    print(f"wrote {n_files} genomes, {total} nt to {args.outdir}")


if __name__ == "__main__":
    main()
