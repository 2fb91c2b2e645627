"""SetDB build parity vs. the reference createsetdb bundle."""
import glob
import os

import numpy as np

from spacepharer_tpu.io.mmseqs_compat import MMseqsDB
from spacepharer_tpu.io.setdb import (
    SetDB, build_setdb_from_fasta, build_setdb_from_spacers)
from spacepharer_tpu.io.spacer_formats import parse_spacers


def _target_files(examples_dir):
    return sorted(glob.glob(os.path.join(examples_dir, "GCA_*.fna.gz")))


def test_target_setdb_matches_reference(golden, examples_dir, tmp_path):
    db = build_setdb_from_fasta(_target_files(examples_dir))
    ref_aa = MMseqsDB(os.path.join(golden, "targets"))
    ref_sizes = MMseqsDB(os.path.join(golden, "targets_set_size"))
    ref_m2s = MMseqsDB(os.path.join(golden, "targets_member_to_set"))

    assert db.n_sets == 3 and db.n_contigs == 3
    assert db.n_orfs == len(ref_aa)
    # set sizes (ORFs per set)
    for s in range(db.n_sets):
        assert int(ref_sizes.text(s).strip()) == int(db.set_size[s])
    # member -> set mapping
    for k in range(0, db.n_orfs, 17):
        assert int(ref_m2s.text(k).strip()) == int(db.orf_to_set[k])
    # AA sequences in identical key order
    for k in range(db.n_orfs):
        assert ref_aa.seq(k) == db.orf_aa(k).tobytes(), f"orf {k}"

    # save/load round trip
    p = str(tmp_path / "targets.spdb")
    db.save(p)
    db2 = SetDB.load(p)
    assert np.array_equal(db2.orf_aa_data, db.orf_aa_data)
    assert db2.set_names == db.set_names


def test_control_setdb_matches_reference(golden, examples_dir):
    db = build_setdb_from_fasta(_target_files(examples_dir), reverse_fragments=True)
    ref_aa = MMseqsDB(os.path.join(golden, "targets_rev"))
    assert db.n_orfs == len(ref_aa)
    for k in range(0, db.n_orfs, 7):
        assert ref_aa.seq(k) == db.orf_aa(k).tobytes(), f"orf {k}"


def test_query_setdb_matches_reference(golden, examples_dir):
    sub = [d for d in os.listdir(os.path.join(golden, "tmp"))
           if os.path.exists(os.path.join(golden, "tmp", d, "qsetdb.dbtype"))]
    base = os.path.join(golden, "tmp", sub[0])
    files = sorted(glob.glob(os.path.join(examples_dir, "*.fas")))
    records, sources = parse_spacers(files)
    db = build_setdb_from_spacers(records, sources)
    ref_aa = MMseqsDB(os.path.join(base, "qsetdb"))
    ref_sizes = MMseqsDB(os.path.join(base, "qsetdb_set_size"))
    assert db.n_orfs == len(ref_aa)
    for k in range(db.n_orfs):
        assert ref_aa.seq(k) == db.orf_aa(k).tobytes(), f"orf {k}"
    for s in range(db.n_sets):
        assert int(ref_sizes.text(s).strip()) == int(db.set_size[s])


def test_orf_nucl_lazy_reconstruction(examples_dir, tmp_path):
    """orf_nucl_data is not persisted; a loaded SetDB reconstructs every
    reading-direction nucleotide sequence (incl. the codon-reversed
    control transform) byte-identically from contig bytes + coords."""
    for reverse in (False, True):
        db = build_setdb_from_fasta(_target_files(examples_dir),
                                    reverse_fragments=reverse)
        p = str(tmp_path / f"db_rev{int(reverse)}")
        db.save(p)
        assert not os.path.exists(
            os.path.join(p, "arrays", "orf_nucl_data.npy"))
        db2 = SetDB.load(p)
        assert db2.orf_nucl_data is None
        step = max(1, db.n_orfs // 97)
        for k in list(range(0, db.n_orfs, step)) + [db.n_orfs - 1]:
            assert np.array_equal(db.orf_nucl(k), db2.orf_nucl(k)), k
