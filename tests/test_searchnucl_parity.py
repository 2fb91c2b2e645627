"""blastn-mode m8 parity vs the reference binary (VERDICT r3 task 6).

Fixtures (tests/blastn_fixtures.tar.gz) were produced by driving the
reference binary's full nucleotide search pipeline:

    spacepharer createdb q.fasta qdb && createdb t.fasta tdb
    spacepharer search qdb tdb aln tmp --search-type 3 --threads 1
    spacepharer convertalis qdb tdb aln ref.m8 --threads 1

- fix:  planted ~6%-mutated fragments, both strands, 20 queries
- fix2: 50x duplicated targets + exact long fragments (saturated-
        diagonal rescoring, max-seqs histogram) + N runs; tdb.lookup
        records createdb's shuffled key order (duplicate-target
        tie-breaks follow the internal keys)
- fix3: 25 kb target + 12 kb query (splitsequence 10 kb chunks: hits
        inside chunks, across the split boundary, on the minus strand,
        and a query spanning two chunks)

search_nucl must reproduce ref.m8 byte for byte.
"""
import os
import tarfile

import pytest

from spacepharer_tpu.io.fasta import iter_fasta
from spacepharer_tpu.pipeline.searchnucl import search_nucl

FIXTURES = os.path.join(os.path.dirname(__file__),
                        "blastn_fixtures.tar.gz")


@pytest.fixture(scope="module")
def fixdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("blastn")
    with tarfile.open(FIXTURES) as tf:
        tf.extractall(d)
    return d


@pytest.mark.parametrize("name", ["fix", "fix2", "fix3"])
def test_m8_byte_parity(fixdir, name):
    fix = str(fixdir / name)
    q_entries = [(e.name, e.seq) for e in iter_fasta(fix + "/q.fasta")]
    t_entries = [(e.name, e.seq) for e in iter_fasta(fix + "/t.fasta")]
    if os.path.exists(fix + "/tdb.lookup"):
        # reorder to the reference createdb's (shuffled) key numbering
        # so duplicate-target tie-breaks compare like for like
        by_name = {n: s for n, s in t_entries}
        order = [ln.split("\t")[1] for ln in open(fix + "/tdb.lookup")]
        t_entries = [(n, by_name[n]) for n in order]
    res = search_nucl(q_entries, t_entries)
    got = "".join(h.m8_row() + "\n"
                  for qn, _ in q_entries for h in res[qn])
    want = open(fix + "/ref.m8").read()
    assert got == want
