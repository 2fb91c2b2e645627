"""Parity tests: ORF extraction + translation vs. reference-produced DBs."""
import os

import numpy as np
import pytest

from spacepharer_tpu.io.fasta import iter_fasta
from spacepharer_tpu.io.mmseqs_compat import MMseqsDB
from spacepharer_tpu.ops.orf import ANY_TO_STOP, START_TO_STOP, find_orfs, orf_nucl_sequence
from spacepharer_tpu.ops.translate import codon_tables, translate
from spacepharer_tpu.ops.revcodon import reverse_by_codon


def _collect_ref_orfs(golden, db_prefix):
    """Read reference ORF DB: list of (key, contig_key, from, to, complete, seq)."""
    hdr = MMseqsDB(os.path.join(golden, db_prefix + "_h"))
    seq = MMseqsDB(os.path.join(golden, db_prefix))
    out = []
    for key in hdr.keys:
        fields = hdr.text(int(key)).strip().split("\t")
        contig_key = int(fields[0])
        pos = fields[1]
        sign = "+" if "+" in pos else "-"
        frm, ln = pos.split(sign)
        frm, ln = int(frm), int(ln)
        to = frm + ln if sign == "+" else frm - ln
        complete = int(fields[2]) if len(fields) > 2 else 0
        out.append((int(key), contig_key, frm, to, complete, seq.seq(int(key))))
    return out


def _my_orfs_for_db(golden, nucl_db_name, **kw):
    contigs = MMseqsDB(os.path.join(golden, nucl_db_name))
    rows = []
    for ck in contigs.keys:
        ck = int(ck)
        contig = np.frombuffer(contigs.seq(ck), dtype=np.uint8).copy()
        orfs = find_orfs(contig, **kw)
        for i in range(len(orfs.strand)):
            nucl = orf_nucl_sequence(contig, int(orfs.frame_from[i]),
                                     int(orfs.frame_to[i]), int(orfs.strand[i]))
            complete = int(orfs.incomplete_start[i]) | (int(orfs.incomplete_end[i]) << 1)
            rows.append((ck, int(orfs.contig_from[i]), int(orfs.contig_to[i]),
                         complete, nucl.tobytes()))
    return rows


def test_genome_orfs_match_reference(golden):
    ref = _collect_ref_orfs(golden, "targets_nucl_orf")
    mine = _my_orfs_for_db(golden, "targets_nucl",
                           min_length=30, max_length=32734,
                           start_mode=START_TO_STOP)
    assert len(mine) == len(ref), (len(mine), len(ref))
    for (key, ck, frm, to, complete, seq), (mck, mfrm, mto, mcomplete, mseq) in zip(ref, mine):
        assert (ck, frm, to) == (mck, mfrm, mto), f"orf {key} coords differ"
        assert complete == mcomplete, f"orf {key} completeness differs"
        assert seq.upper() == mseq.upper(), f"orf {key} sequence differs"


def test_spacer_orfs_match_reference(golden):
    qdir = os.path.join(golden, "tmp")
    # locate the easy-predict tmp dir that holds qsetdb
    sub = [d for d in os.listdir(qdir)
           if os.path.exists(os.path.join(qdir, d, "qsetdb.dbtype"))]
    assert sub, "qsetdb not found in golden tmp"
    base = os.path.join(qdir, sub[0])
    ref = _collect_ref_orfs(base, "qsetdb_nucl_orf")
    mine = _my_orfs_for_db(base, "qsetdb_nucl",
                           min_length=9, max_length=32734,
                           start_mode=ANY_TO_STOP)
    assert len(mine) == len(ref), (len(mine), len(ref))
    for (key, ck, frm, to, complete, seq), (mck, mfrm, mto, mcomplete, mseq) in zip(ref, mine):
        assert (ck, frm, to, complete) == (mck, mfrm, mto, mcomplete), f"orf {key}"
        assert seq.upper() == mseq.upper(), f"orf {key} sequence differs"


def test_translation_matches_reference(golden):
    """translatenucs output (targets AA DB) vs our translate over ref ORFs."""
    aa_db = MMseqsDB(os.path.join(golden, "targets"))
    orf_db = MMseqsDB(os.path.join(golden, "targets_nucl_orf"))
    n_checked = 0
    for key in aa_db.keys:
        key = int(key)
        nucl = np.frombuffer(orf_db.seq(key), dtype=np.uint8)
        aa_ref = aa_db.seq(key)
        aa_mine = translate(nucl).tobytes()
        assert aa_mine == aa_ref, f"orf {key}: {aa_mine} != {aa_ref}"
        n_checked += 1
    assert n_checked > 100


def test_reverse_by_codon_matches_reference(golden):
    """targets_rev_nucl_orf = codon-reversed targets_nucl_orf."""
    fwd = MMseqsDB(os.path.join(golden, "targets_nucl_orf"))
    rev = MMseqsDB(os.path.join(golden, "targets_rev_nucl_orf"))
    for key in fwd.keys[:500]:
        key = int(key)
        mine = reverse_by_codon(np.frombuffer(fwd.seq(key), dtype=np.uint8))
        assert mine.tobytes() == rev.seq(key), f"orf {key}"


def test_stop_start_codons():
    _, stops, starts = codon_tables(1)
    assert set(stops) == {"TAA", "TAG", "TGA"}
    assert set(starts) == {"ATG", "CTG", "TTG"}


def test_translate_ambiguity():
    assert translate(np.frombuffer(b"ATGTAYCAN", dtype=np.uint8)).tobytes() == b"MYX"
    # RAY = (A/G)A(C/T): AAC=N AAT=N GAC=D GAT=D -> B
    assert translate(np.frombuffer(b"RAY", dtype=np.uint8)).tobytes() == b"B"
    assert translate(np.frombuffer(b"TAR", dtype=np.uint8)).tobytes() == b"*"
    assert translate(np.frombuffer(b"atg", dtype=np.uint8)).tobytes() == b"m"


def test_fasta_reader(examples_dir):
    entries = list(iter_fasta(os.path.join(examples_dir, "CP003088.fas")))
    assert len(entries) == 15
    assert all(e.name.startswith("CP003088") for e in entries)
    gz = list(iter_fasta(os.path.join(
        examples_dir, "GCA_000836905.1_ViralProj14035_genomic.fna.gz")))
    assert len(gz) == 1 and len(gz[0].seq) > 10000
