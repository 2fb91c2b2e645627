"""Iterative sensitivity search (blastp.sh:24-99 STEPS loop /
Search.cpp --start-sens/--sens-steps) and MultiParam flag values."""
import glob
import os

import pytest

from spacepharer_tpu.cli import parse_multiparam
from spacepharer_tpu.io.setdb import (build_setdb_from_fasta,
                                      build_setdb_from_spacers)
from spacepharer_tpu.io.spacer_formats import parse_spacers
from spacepharer_tpu.pipeline.predictmatch import (PredictParams,
                                                   search_setdbs)


@pytest.fixture(scope="module")
def dbs(examples_dir):
    genomes = sorted(glob.glob(os.path.join(examples_dir, "GCA_*.fna.gz")))
    tdb = build_setdb_from_fasta(genomes)
    recs, sources = parse_spacers(
        sorted(glob.glob(os.path.join(examples_dir, "*.fas"))))
    qdb = build_setdb_from_spacers(recs, sources)
    return qdb, tdb


def test_sens_steps_early_stop_and_merge(dbs):
    qdb, tdb = dbs
    single = PredictParams(perform_nucl_aln=False, threads=1,
                           use_tpu=False)
    rows1 = search_setdbs(qdb, tdb, single)

    stepped = PredictParams(perform_nucl_aln=False, threads=1,
                            use_tpu=False)
    stepped.prefilter.sens_steps = 3
    stepped.prefilter.start_sens = 4.0
    rows3 = search_setdbs(qdb, tdb, stepped)

    assert set(rows3.keys()) == set(rows1.keys())
    # every query satisfied at a lower sensitivity stops there: its rows
    # must be a prefix-merge of per-step searches, and queries reaching
    # the final step at -s 5.7 see at least the single-step hit targets
    n_with_hits1 = sum(1 for r in rows1.values() if r)
    n_with_hits3 = sum(1 for r in rows3.values() if r)
    assert n_with_hits3 >= n_with_hits1 > 0
    for k, r1 in rows1.items():
        if len(rows3[k]) < 2:   # ran through all steps incl. -s 5.7
            assert {row[0] for row in r1} <= {row[0] for row in rows3[k]}


def test_sens_steps_same_sens_equals_single(dbs):
    """start_sens == sensitivity: every step searches identically, so
    satisfied queries return exactly the single-step rows."""
    qdb, tdb = dbs
    single = PredictParams(perform_nucl_aln=False, threads=1,
                           use_tpu=False)
    rows1 = search_setdbs(qdb, tdb, single)
    stepped = PredictParams(perform_nucl_aln=False, threads=1,
                            use_tpu=False)
    stepped.prefilter.sens_steps = 2
    stepped.prefilter.start_sens = 5.7
    rows2 = search_setdbs(qdb, tdb, stepped)
    for k, r1 in rows1.items():
        if len(r1) >= 2:
            assert rows2[k] == r1


def test_multiparam_syntax():
    assert parse_multiparam("16,nucl:10", 16, 10) == (16, 10)
    # a bare number sets BOTH values (MultiParam.cpp:37
    # nucleotides = aminoacids)
    assert parse_multiparam("12", 16, 10) == (12, 12)
    assert parse_multiparam("aa:14,nucl:8", 16, 10) == (14, 8)
    assert parse_multiparam("nucl:9,aa:14", 16, 10) == (14, 9)
    assert parse_multiparam("nucl:9", 16, 10) == (16, 9)
    assert parse_multiparam(7, 16, 10) == (7, 7)
