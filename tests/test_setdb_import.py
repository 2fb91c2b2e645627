"""Reference-setDB import (VERDICT r4 missing #4): a createsetdb
bundle built by the reference tool chain (data/createsetdb.sh:39-170)
loads as a SetDB and drives predictmatch to byte-identical output.

The golden tarball contains the reference's own regression-run target
bundles (targets / targets_rev, with taxonomy mappings), which makes
this an end-to-end interop test: a user holding a reference-built
downloaddb catalog can run our predictmatch on it directly.
"""
import glob
import os

import numpy as np
import pytest

from spacepharer_tpu.io.setdb import SetDB, build_setdb_from_spacers
from spacepharer_tpu.io.spacer_formats import parse_spacers
from spacepharer_tpu.pipeline.predictmatch import predict_match


@pytest.fixture(scope="module")
def imported(golden, examples_dir):
    tdb = SetDB.load(os.path.join(golden, "targets"))
    cdb = SetDB.load(os.path.join(golden, "targets_rev"))
    tdb.taxdump_path = os.path.join(examples_dir, "ncbi_taxdump")
    return tdb, cdb


def test_import_shape_and_flags(imported):
    tdb, cdb = imported
    assert (tdb.n_contigs, tdb.n_orfs, tdb.n_sets) == (3, 691, 3)
    assert not tdb.is_control and cdb.is_control
    assert tdb.set_size.tolist() == [192, 314, 185]
    # taxonomy mappings from _set_mapping / _nucl_mapping / _nucl_orf_mapping
    assert tdb.set_taxid.tolist() == [10679, 244310, 40521]
    assert tdb.contig_taxid is not None and tdb.orf_taxid is not None


def test_import_matches_our_build(imported, examples_dir):
    """The imported arrays equal our own builder's (both reproduce the
    reference's extractorfs/translatenucs semantics)."""
    from spacepharer_tpu.io.setdb import build_setdb_from_fasta
    tdb, cdb = imported
    ours = build_setdb_from_fasta(
        sorted(glob.glob(os.path.join(examples_dir, "GCA_*.fna.gz"))))
    assert np.array_equal(tdb.orf_aa_data, ours.orf_aa_data)
    assert np.array_equal(tdb.orf_aa_offsets, ours.orf_aa_offsets)
    assert np.array_equal(tdb.orf_from, ours.orf_from)
    assert np.array_equal(tdb.orf_to, ours.orf_to)
    assert np.array_equal(tdb.orf_contig, ours.orf_contig)
    assert np.array_equal(tdb.orf_complete, ours.orf_complete)
    assert np.array_equal(tdb.contig_data, ours.contig_data)


def test_nucl_reconstruction_roundtrip(imported, tmp_path):
    """save() drops orf_nucl_data; the derived reconstruction (and the
    control DB's codon reversal) must reproduce the reference's stored
    _nucl_orf entries after a save/load round trip."""
    for name, db in zip(("t", "c"), imported):
        stored = db.orf_nucl_data
        off = db.orf_nucl_offsets
        db.save(str(tmp_path / name))
        re = SetDB.load(str(tmp_path / name))
        assert re.orf_nucl_data is None
        for i in range(0, db.n_orfs, 37):
            assert np.array_equal(re.orf_nucl(i), stored[off[i]:off[i + 1]])


def test_predictmatch_on_imported_bundle_byte_identical(
        imported, golden, examples_dir):
    tdb, cdb = imported
    taxdump = os.path.join(examples_dir, "ncbi_taxdump")
    recs, sources = parse_spacers(
        sorted(glob.glob(os.path.join(examples_dir, "*.fas"))))
    qdb = build_setdb_from_spacers(
        recs, sources,
        tax_mapping_file=os.path.join(examples_dir, "spacer_taxa.tsv"),
        taxdump_dir=taxdump)
    res = predict_match(qdb, tdb, cdb)
    with open(os.path.join(golden, "result.tsv")) as fh:
        assert res.text == fh.read()
    with open(os.path.join(golden, "result.tsv_lca.tsv")) as fh:
        assert res.lca_tsv == fh.read()
    with open(os.path.join(golden, "result.tsv_lca_per_target.tsv")) as fh:
        assert res.lca_per_target_tsv == fh.read()
