#!/usr/bin/env python3
"""Regenerate the synthetic scaled target corpora used for perf work.

Duplicates each example phage genome N times with dup{i}_-renamed
contigs (so every set is a distinct file / set id, like a real catalog
of N*3 genomes). Usage:

    python tools/make_scale_corpus.py 20  /tmp/scale
    python tools/make_scale_corpus.py 100 /tmp/scale100
    python tools/make_scale_corpus.py 500 /tmp/scale500

On these corpora the only output delta vs the reference is WHICH
identical duplicate contig is reported (tie-break artifact).
"""
import glob
import gzip
import os
import sys

EXAMPLES = "/root/reference/examples"


def main(n: int, outdir: str):
    os.makedirs(outdir, exist_ok=True)
    genomes = sorted(glob.glob(os.path.join(EXAMPLES, "GCA_*.fna.gz")))
    for src in genomes:
        with gzip.open(src, "rt") as fh:
            text = fh.read()
        base = os.path.basename(src)[:-len(".fna.gz")]
        for i in range(n):
            renamed = text.replace(">", f">dup{i}_")
            out = os.path.join(outdir, f"{base}_dup{i}.fna.gz")
            with gzip.open(out, "wt", compresslevel=1) as fh:
                fh.write(renamed)
    print(f"wrote {n * len(genomes)} genome files to {outdir}")


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2])
