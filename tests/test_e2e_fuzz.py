"""Randomized end-to-end parity: synthetic genomes + planted spacers,
result.tsv byte-compared against the reference binary.

Genomes carry N runs and lowercase bases; spacers are planted genome
substrings (forward and reverse-complement, lightly mutated) plus pure
random ones. Requires the reference build at /tmp/refbuild (skipped in
environments without it); 28 seeds were verified identical during
development, a few run here to bound suite time.
"""
import os
import random
import subprocess
import sys

import pytest

SP = "/tmp/refbuild/src/spacepharer"
RC = str.maketrans("ACGT", "TGCA")

pytestmark = pytest.mark.skipif(not os.path.exists(SP),
                                reason="reference binary not built")


def _gen_genome(rng, L):
    out = []
    for _ in range(L):
        r = rng.random()
        if r < 0.001:
            out.append("N")
        elif r < 0.003:
            out.append(rng.choice("acgt"))
        else:
            out.append(rng.choice("ACGT"))
    return "".join(out)


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_e2e_random_corpus_matches_reference(seed, tmp_path):
    rng = random.Random(seed)
    genomes = []
    for g in range(rng.randrange(2, 4)):
        seq = _gen_genome(rng, rng.randrange(3000, 12000))
        p = tmp_path / f"g{g}.fna"
        with open(p, "w") as fh:
            fh.write(f">genome{seed}_{g} synthetic\n")
            for i in range(0, len(seq), 70):
                fh.write(seq[i:i + 70] + "\n")
        genomes.append((str(p), seq))
    spacers = []
    for _ in range(rng.randrange(6, 12)):
        if rng.random() < 0.6:
            _, gs = rng.choice(genomes)
            a = rng.randrange(0, max(1, len(gs) - 40))
            sp = gs[a:a + rng.randrange(25, 40)].upper().replace("N", "A")
            if rng.random() < 0.5:
                sp = sp.translate(RC)[::-1]
            sp = list(sp)
            for _ in range(rng.randrange(0, 3)):
                sp[rng.randrange(len(sp))] = rng.choice("ACGT")
            sp = "".join(sp)
        else:
            sp = "".join(rng.choice("ACGT")
                         for _ in range(rng.randrange(25, 40)))
        spacers.append(sp)
    qf = tmp_path / "spacers.fas"
    with open(qf, "w") as fh:
        for i, sp in enumerate(spacers):
            fh.write(f">sp{i}\n{sp}\n")
    gfiles = [p for p, _ in genomes]

    env = dict(os.environ, OMP_NUM_THREADS="1")
    rd = tmp_path / "ref"
    rd.mkdir()

    def ref(*a):
        r = subprocess.run([SP, *a, "--threads", "1", "-v", "0"],
                           capture_output=True, env=env)
        assert r.returncode == 0, r.stderr[-400:]

    ref("createsetdb", *gfiles, f"{rd}/t", f"{rd}/tmp")
    ref("createsetdb", *gfiles, f"{rd}/t_rev", f"{rd}/tmp",
        "--reverse-fragments", "1")
    ref("easy-predict", str(qf), f"{rd}/t", f"{rd}/res.tsv", f"{rd}/tmp2")

    md = tmp_path / "mine"
    md.mkdir()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def mine(*a):
        r = subprocess.run([sys.executable, "-m", "spacepharer_tpu", *a],
                           capture_output=True, cwd=repo)
        assert r.returncode == 0, r.stderr[-400:]

    mine("createsetdb", *gfiles, f"{md}/t", f"{md}/tmp")
    mine("createsetdb", *gfiles, f"{md}/t_rev", f"{md}/tmp",
         "--reverse-fragments", "1")
    mine("easy-predict", str(qf), f"{md}/t", f"{md}/res.tsv", f"{md}/tmp2")

    assert open(f"{md}/res.tsv").read() == open(f"{rd}/res.tsv").read()
