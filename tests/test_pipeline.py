"""End-to-end predictmatch parity: byte-identical result.tsv."""
import glob
import os

import pytest

from spacepharer_tpu.io.setdb import build_setdb_from_fasta, build_setdb_from_spacers
from spacepharer_tpu.io.spacer_formats import parse_spacers
from spacepharer_tpu.pipeline.predictmatch import PredictParams, predict_match


@pytest.fixture(scope="module")
def dbs(examples_dir):
    genomes = sorted(glob.glob(os.path.join(examples_dir, "GCA_*.fna.gz")))
    tdb = build_setdb_from_fasta(genomes)
    cdb = build_setdb_from_fasta(genomes, reverse_fragments=True)
    recs, sources = parse_spacers(
        sorted(glob.glob(os.path.join(examples_dir, "*.fas"))))
    qdb = build_setdb_from_spacers(recs, sources)
    return qdb, tdb, cdb


def test_predictmatch_matches_reference(dbs, golden):
    qdb, tdb, cdb = dbs
    res = predict_match(qdb, tdb, cdb)
    with open(os.path.join(golden, "result.tsv")) as fh:
        assert res.text == fh.read()


def test_regression_invariant_six_hits(dbs, golden):
    """util/run_regression.sh check 1: exactly 6 hits with p_bh < 1e-3."""
    qdb, tdb, cdb = dbs
    res = predict_match(qdb, tdb, cdb)
    cnt = 0
    for line in res.text.split("\n"):
        if line.startswith(">"):
            fields = line.split("\t")
            if float(fields[2]) < 1e-3:
                cnt += 1
    assert cnt == 6


def test_fmt0_and_fmt2(dbs):
    qdb, tdb, cdb = dbs
    p0 = PredictParams(fmt=0)
    res0 = predict_match(qdb, tdb, cdb, p0)
    assert res0.text and not any(l.startswith(">") for l in res0.text.split("\n"))
    p2 = PredictParams(fmt=2)
    res2 = predict_match(qdb, tdb, cdb, p2)
    # fmt 2 carries gapped alignment lines after each hit line
    lines = res2.text.split("\n")
    gt = [i for i, l in enumerate(lines) if l.startswith(">")]
    assert gt and all(set(lines[i + 1]) <= set("ACGTUNRYSWKMBDHV-acgtn")
                      for i in gt)
