"""combine_pval_per_set vs the reference binary, all four modes.

Expected strings were produced by running the reference's
combinepvalperset (lib/mmseqs/src/multihit/combinepvalperset.cpp) on the
golden run's aggregate_merged/qsetdb/targets DBs with --alpha 1.0 via a
probe linked against /tmp/refbuild's libmmseqs-framework.a (the shipped
CLI entry crashes when OpenMP spawns more threads than --threads, an
upstream writer-buffer bug; OMP_NUM_THREADS=1 reproduces these bytes).
"""
import os

import pytest

from spacepharer_tpu.io.mmseqs_compat import MMseqsDB
from spacepharer_tpu.stats.aggregation import combine_pval_per_set

# reference output bytes per aggregation mode ('\0' entry separators,
# entries in key order 0, 1)
EXPECTED = {
    0: "0\t3\n1\t7.912E-03\n\x000\t3\n1\t3\n2\t1.959E-25\n\x00",
    1: "0\t3.000E+00\n1\t1.087E-03\n\x000\t3.000E+00\n1\t3.000E+00\n"
       "2\t4.796E-12\n\x00",
    2: "0\t3.000E+00\n1\t1.450E-05\n\x000\t3.000E+00\n1\t3.000E+00\n"
       "2\t5.391E-43\n\x00",
    3: "0\t0.000E+00\n1\t1.224E+01\n\x000\t0.000E+00\n1\t0.000E+00\n"
       "2\t7.456E+01\n\x00",
}


@pytest.fixture(scope="module")
def golden_inputs(golden):
    tmp_dirs = [
        d for d in os.listdir(os.path.join(golden, "tmp"))
        if d != "latest"
        and os.path.exists(os.path.join(golden, "tmp", d,
                                        "qsetdb_set_size.index"))
        and os.path.isdir(os.path.join(golden, "tmp", d, "predict"))]
    assert len(tmp_dirs) == 1, tmp_dirs
    tdir = os.path.join(golden, "tmp", tmp_dirs[0])
    predict = os.path.join(tdir, "predict")
    pdirs = [d for d in os.listdir(predict)
             if d != "latest"
             and os.path.exists(os.path.join(predict, d,
                                             "aggregate_merged.index"))]
    assert len(pdirs) == 1, pdirs
    agg = MMseqsDB(os.path.join(predict, pdirs[0], "aggregate_merged"))
    m2s = MMseqsDB(os.path.join(golden, "targets_member_to_set"))
    sizes = MMseqsDB(os.path.join(tdir, "qsetdb_set_size"))
    member_to_set = {int(k): int(m2s.get(int(k)).split()[0])
                     for k in m2s.keys}
    set_size = {int(k): int(sizes.get(int(k)).split()[0])
                for k in sizes.keys}
    return agg, member_to_set, set_size


@pytest.mark.parametrize("mode", [0, 1, 2, 3])
def test_combine_pval_per_set_matches_reference(golden_inputs, mode):
    agg, member_to_set, set_size = golden_inputs
    out = ""
    for qk in agg.keys:
        qk = int(qk)
        rows = [line.split("\t")
                for line in agg.get(qk).decode().rstrip("\n").split("\n")
                if line]
        res = combine_pval_per_set(rows, set_size[qk], 3, member_to_set,
                                   1.0, mode)
        out += "".join("\t".join(r) + "\n" for r in res) + "\x00"
    assert out == EXPECTED[mode]


def test_combine_pval_per_set_edge_cases():
    # alpha/(orfCount+1) == 1.0 branch and empty rows
    rows = [["5", "-3.0E+00", "0.5", "1.0E-3", "0", "9", "10", "0", "9",
             "50", "10M"]]
    out = combine_pval_per_set(rows, 0, 7, {5: 2}, 1.0, 0)
    # thr == 1.0: expMinusR * numTargetSets
    assert out[0][0] == "2"
    assert float(out[0][1]) > 0
    assert combine_pval_per_set([], 3, 7, {}, 1.0, 0) == []
