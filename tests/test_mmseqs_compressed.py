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


REF_BIN = "/tmp/refbuild/src/spacepharer"


@pytest.mark.skipif(_zstd() is None, reason="no system libzstd")
def test_compressed_write_roundtrip(tmp_path):
    """write_mmseqs_db(compressed=True) (DBWriter.h:28-40 --compressed
    analog) round-trips through our own reader, including the <60-byte
    raw-copy escape (DBWriter.cpp:281-283)."""
    from spacepharer_tpu.io.mmseqs_compat import write_mmseqs_db
    payloads = [b"A" * 5, b"PEPTIDE" * 40, b"", b"M" * 59, b"K" * 60,
                bytes(range(65, 91)) * 100]
    path = str(tmp_path / "db_w")
    write_mmseqs_db(path, payloads, 0, compressed=True)
    db = MMseqsDB(path)
    assert db.compressed and db.dbtype == 0
    for i, p in enumerate(payloads):
        assert db.get(i) == p + b"\n"


@pytest.mark.skipif(_zstd() is None or not os.path.exists(REF_BIN),
                    reason="needs libzstd + reference build")
def test_compressed_write_read_by_reference_binary(tmp_path):
    """The reference binary's own DBReader must accept our compressed
    layout: `spacepharer decompress` on our DB reproduces the plain
    payloads byte for byte."""
    import subprocess
    from spacepharer_tpu.io.mmseqs_compat import write_mmseqs_db
    payloads = [b"MSEQWENCE" * 30, b"SHORT", b"LONGER" * 100]
    src = str(tmp_path / "db_c")
    out = str(tmp_path / "db_plain")
    write_mmseqs_db(src, payloads, 0, compressed=True)
    r = subprocess.run([REF_BIN, "decompress", src, out, "--threads", "1"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    plain = MMseqsDB(out)
    assert not plain.compressed
    for i, p in enumerate(payloads):
        assert plain.get(i) == p + b"\n"
