#!/usr/bin/env python3
"""Generate a Shmakov-shaped spacer catalog (README.md:107-110: >30k
CRISPR spacer sets) for catalog-scale benchmarking.

Each set is one .fas file of `spacers_per_set` spacers. Most sets are
random nucleotide sequences (Shmakov-realistic: the vast majority of
host spacer sets match no phage in the DB); a `hit_fraction` of sets
reuse real example spacers (renamed) so the hit path is exercised too.

Usage:
    python tools/make_catalog_corpus.py 30000 /tmp/catalog30k
    python tools/make_catalog_corpus.py 2000 /tmp/catalog2k --spacers 3
"""
import argparse
import glob
import os
import random

EXAMPLES = "/root/reference/examples"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n_sets", type=int)
    ap.add_argument("outdir")
    ap.add_argument("--spacers", type=int, default=3,
                    help="spacers per set (default 3)")
    ap.add_argument("--hit-fraction", type=float, default=0.01,
                    help="fraction of sets drawn from real example "
                         "spacers (default 1%%)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = random.Random(args.seed)
    os.makedirs(args.outdir, exist_ok=True)

    real = []
    for path in sorted(glob.glob(os.path.join(EXAMPLES, "*.fas"))):
        with open(path) as fh:
            cur = None
            for line in fh:
                if line.startswith(">"):
                    cur = []
                elif cur is not None:
                    real.append(line.strip())
                    cur = None

    n_hit = int(args.n_sets * args.hit_fraction)
    for si in range(args.n_sets):
        lines = []
        for pi in range(args.spacers):
            if si < n_hit:
                seq = real[(si * args.spacers + pi) % len(real)]
            else:
                seq = "".join(rng.choice("ACGT")
                              for _ in range(rng.randint(28, 40)))
            lines.append(f">set{si:06d}_1_100_{pi + 1}_spacer_{pi * 61}_"
                         f"{len(seq)}\n{seq}\n")
        with open(os.path.join(args.outdir, f"set{si:06d}.fas"), "w") as fh:
            fh.write("".join(lines))
    print(f"wrote {args.n_sets} spacer-set files to {args.outdir} "
          f"({n_hit} with real spacers)")


if __name__ == "__main__":
    main()
