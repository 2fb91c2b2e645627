"""rescore_rows (rescorediagonal surface) vs the reference binary.

tests/rescorediagonal_ref.tar.gz holds the reference's rescorediagonal
output DBs for modes 0-3 on the golden run's pref_0 (qsetdb vs targets,
--sub-mat VTML40.out -e 200, OMP_NUM_THREADS=1).
"""
import os
import tarfile

import numpy as np
import pytest

from spacepharer_tpu.io.mmseqs_compat import MMseqsDB
from spacepharer_tpu.ops.matrices import load_matrix
from spacepharer_tpu.ops.rescore import ascii_submat, rescore_rows

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


@pytest.fixture(scope="module")
def ref_outputs(tmp_path_factory):
    tar = os.path.join(TESTS_DIR, "rescorediagonal_ref.tar.gz")
    if not os.path.exists(tar):
        pytest.skip("rescorediagonal fixture missing")
    dest = tmp_path_factory.mktemp("rd")
    with tarfile.open(tar) as tf:
        tf.extractall(dest)
    return dest


@pytest.fixture(scope="module")
def golden_search(golden):
    tdirs = [d for d in os.listdir(os.path.join(golden, "tmp"))
             if d != "latest"
             and os.path.exists(os.path.join(golden, "tmp", d,
                                             "qsetdb.dbtype"))]
    assert len(tdirs) == 1
    tdir = os.path.join(golden, "tmp", tdirs[0])
    pref = None
    for root, _, files in os.walk(tdir):
        if "pref_0.index" in files and "search_rev" not in root:
            pref = os.path.join(root, "pref_0")
    assert pref
    return MMseqsDB(pref), MMseqsDB(os.path.join(tdir, "qsetdb")), \
        MMseqsDB(os.path.join(golden, "targets"))


@pytest.mark.parametrize("mode", [0, 1, 2, 3])
def test_rescore_rows_matches_reference(ref_outputs, golden_search, mode):
    pref, qdb, tdb = golden_search
    m = load_matrix("VTML40.out", 2.0)
    amat = ascii_submat(m)
    db_res = sum(len(tdb.get(int(k)).rstrip(b"\n")) for k in tdb.keys)

    def t_ascii(k):
        return np.frombuffer(tdb.get(k).rstrip(b"\n"), dtype=np.uint8)

    ref = MMseqsDB(os.path.join(ref_outputs, f"rd_{mode}"))
    for qk in pref.keys:
        qk = int(qk)
        rows = [line.split("\t")
                for line in pref.get(qk).decode().rstrip("\n").split("\n")
                if line]
        q_ascii = np.frombuffer(qdb.get(qk).rstrip(b"\n"), dtype=np.uint8)
        out = rescore_rows(rows, q_ascii, t_ascii, "VTML40.out", m, db_res,
                           rescore_mode=mode, e_thr=200.0, amat=amat)
        mine = "".join("\t".join(r) + "\n" for r in out)
        assert mine == ref.get(qk).decode(), (mode, qk)
