"""Compressed MMseqs DB interop (VERDICT r3 missing #4 / task 9).

Fixture: tests/compressed_db.tar.gz holds the SAME ORF database written
by the reference binary twice — once with `--compressed 1` (zstd
per-entry streams, dbtype bit 31) and once plain — via
`/tmp/refbuild/src/spacepharer createsetdb GCA_000836905*.fna.gz db_c
tmp --compressed 1`. The compat reader must return byte-identical
entries from both.
"""
import os
import tarfile

import pytest

from spacepharer_tpu.io.mmseqs_compat import MMseqsDB, _zstd

FIXTURE = os.path.join(os.path.dirname(__file__), "compressed_db.tar.gz")


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    d = tmp_path_factory.mktemp("zstd_db")
    with tarfile.open(FIXTURE) as tf:
        tf.extractall(d)
    return MMseqsDB(str(d / "db_c")), MMseqsDB(str(d / "db_u"))


def test_compressed_flag_detected(dbs):
    c, u = dbs
    assert c.compressed and not u.compressed
    # the masked dbtype must agree (both are AA sequence DBs)
    assert c.dbtype == u.dbtype


@pytest.mark.skipif(_zstd() is None, reason="no system libzstd")
def test_compressed_entries_byte_identical(dbs):
    c, u = dbs
    assert len(c) == len(u) > 0
    for k in u.keys:
        assert c.get(int(k)) == u.get(int(k))
