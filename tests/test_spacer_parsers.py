"""Parity tests: spacer-format parsers vs. the reference parsespacer DBs."""
import glob
import os

import pytest

from spacepharer_tpu.io.mmseqs_compat import MMseqsDB
from spacepharer_tpu.io.spacer_formats import (
    collect_input_files, parse_spacer_file, parse_spacers)


def test_tool_formats_match_reference(golden, examples_dir):
    files = sorted(glob.glob(os.path.join(examples_dir, "*_test")))
    records, sources = parse_spacers(files)
    assert len(records) == 127  # regression invariant (util/run_regression.sh:25-26)

    ref_seq = MMseqsDB(os.path.join(golden, "query"))
    ref_hdr = MMseqsDB(os.path.join(golden, "query_h"))
    assert len(ref_seq) == len(records)
    for key, rec in enumerate(records):
        assert ref_seq.seq(key) == rec.seq, f"spacer {key} sequence"
        assert ref_hdr.text(key).rstrip("\n") == rec.header, f"spacer {key} header"
    # lookup parity: key -> (header, fileNum)
    for (k, acc, fnum), rec in zip(ref_seq.lookup(), records):
        assert acc == rec.accession
        assert fnum == rec.file_idx


def test_fasta_spacers_match_reference(golden, examples_dir):
    sub = [d for d in os.listdir(os.path.join(golden, "tmp"))
           if os.path.exists(os.path.join(golden, "tmp", d, "qdb.dbtype"))]
    base = os.path.join(golden, "tmp", sub[0])
    files = sorted(glob.glob(os.path.join(examples_dir, "*.fas")))
    records, _ = parse_spacers(files)
    ref_seq = MMseqsDB(os.path.join(base, "qdb"))
    ref_hdr = MMseqsDB(os.path.join(base, "qdb_h"))
    assert len(ref_seq) == len(records)
    for key, rec in enumerate(records):
        assert ref_seq.seq(key) == rec.seq
        assert ref_hdr.text(key).rstrip("\n") == rec.header


def test_format_detection(examples_dir):
    cases = {
        "crt_test": "CRT", "minced_test": "MINCED",
        "pilercr_test": "PILERCR", "crisprdetect_test": "CRISPRDETECT",
        "fasta_test": "FASTA",
    }
    for fname, fmt in cases.items():
        _, detected = parse_spacer_file(os.path.join(examples_dir, fname), 0)
        assert detected == fmt, fname
    _, detected = parse_spacer_file(os.path.join(examples_dir, "empty_test"), 0)
    assert detected == "EMPTY"


def test_collect_input_files(tmp_path):
    (tmp_path / "a.txt").write_text("x")
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "b.txt").write_text("y")
    files = collect_input_files([str(tmp_path)])
    assert {os.path.basename(f) for f in files} == {"a.txt", "b.txt"}
    files = collect_input_files([str(tmp_path)], file_exclude="^a")
    assert {os.path.basename(f) for f in files} == {"b.txt"}
    tsv = tmp_path / "list.tsv"
    tsv.write_text(f"{tmp_path}/a.txt\n")
    assert collect_input_files([str(tsv)]) == [f"{tmp_path}/a.txt"]
    with pytest.raises(ValueError):
        collect_input_files([str(tmp_path), "other"])


def test_parseable_file_with_zero_spacers_is_not_an_error(tmp_path):
    """Reference parity: hasResult is set once a non-empty file's type is
    detected (ParseSpacer.cpp:186-190); zero surviving spacers from a
    parseable file is not an error."""
    import pytest
    from spacepharer_tpu.io.spacer_formats import parse_spacers
    # a PILER-CR header without any spacer rows
    p = tmp_path / "pilercr_empty"
    p.write_text("pilercr v1.06\nRun as: pilercr -in x\n\n\nDETAIL REPORT\n")
    recs, sources = parse_spacers([str(p)])
    assert recs == [] and sources == ["pilercr_empty"]
    # a truly empty file alone still errors
    e = tmp_path / "empty"
    e.write_text("")
    with pytest.raises(ValueError):
        parse_spacers([str(e)])


def test_parsespacer_emits_reference_db_layout(tmp_path):
    """cmd_parsespacer also writes the MMseqs DB layout (sequence DB +
    _h header DB + .lookup/.source) byte-identical to the reference's
    own parsespacer output — the reference regression script's
    `query.index` check (util/run_regression.sh:25-26) passes
    unmodified against our CLI."""
    import glob
    import subprocess
    import sys
    import tarfile
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    golden = tmp_path / "golden"
    with tarfile.open(os.path.join(repo, "tests", "golden_run.tar.gz")) as tf:
        tf.extractall(golden)
    inputs = sorted(glob.glob("/root/reference/examples/*_test"))
    out = str(tmp_path / "query")
    r = subprocess.run(
        [sys.executable, "-m", "spacepharer_tpu", "parsespacer"]
        + inputs + [out],
        capture_output=True, text=True, cwd=repo,
        env=dict(os.environ, PYTHONPATH=repo))
    assert r.returncode == 0, r.stderr
    for suffix in ("", ".index", ".dbtype", "_h", "_h.index",
                   "_h.dbtype", ".lookup", ".source"):
        got = open(out + suffix, "rb").read()
        want = open(str(golden / "run" / ("query" + suffix)),
                    "rb").read()
        assert got == want, f"query{suffix} differs"
