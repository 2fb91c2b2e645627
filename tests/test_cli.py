"""CLI smoke tests: the command surface end-to-end via subprocess."""
import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run([sys.executable, "-m", "spacepharer_tpu"] + args,
                          capture_output=True, text=True, cwd=cwd, env=env)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory, examples_dir):
    d = tmp_path_factory.mktemp("cli")
    genomes = sorted(
        os.path.join(examples_dir, f) for f in os.listdir(examples_dir)
        if f.startswith("GCA_"))
    r = run_cli(["createsetdb"] + genomes + ["targets", "tmp"], d)
    assert r.returncode == 0, r.stderr
    r = run_cli(["createsetdb"] + genomes
                + ["targets_rev", "tmp", "--reverse-fragments", "1"], d)
    assert r.returncode == 0, r.stderr
    return d


def test_cli_easy_predict_and_resume(workdir, examples_dir):
    spacers = [os.path.join(examples_dir, "CP003088.fas"),
               os.path.join(examples_dir, "JNGQ01000029.fas")]
    r = run_cli(["easy-predict"] + spacers
                + ["targets", "out.tsv", "tmp", "-v", "2"], workdir)
    assert r.returncode == 0, r.stderr
    text = (workdir / "out.tsv").read_text()
    hits = [l for l in text.split("\n") if l.startswith(">")]
    assert sum(1 for l in hits if float(l.split("\t")[2]) < 1e-3) == 6
    # resume run must be fast and produce identical output
    r2 = run_cli(["easy-predict"] + spacers
                 + ["targets", "out2.tsv", "tmp", "-v", "3"], workdir)
    assert r2.returncode == 0
    assert "[resume]" in r2.stdout
    assert (workdir / "out2.tsv").read_text() == text


def test_cli_predictmatch_fmt0(workdir, examples_dir):
    spacers = [os.path.join(examples_dir, "CP003088.fas")]
    r = run_cli(["parsespacer"] + spacers + ["qdb"], workdir)
    assert r.returncode == 0, r.stderr
    r = run_cli(["createsetdb", "qdb", "qsetdb", "tmp"], workdir)
    assert r.returncode == 0, r.stderr
    r = run_cli(["predictmatch", "qsetdb", "targets", "targets_rev",
                 "out0.tsv", "tmp", "--fmt", "0"], workdir)
    assert r.returncode == 0, r.stderr
    lines = (workdir / "out0.tsv").read_text().strip().split("\n")
    assert lines and all(l.startswith("#") for l in lines if l)


def test_cli_unknown_command():
    r = run_cli(["bogus"], "/tmp")
    assert r.returncode == 1
    assert "Unknown command" in r.stderr


def test_cli_multihit_chain(workdir, examples_dir):
    genomes = sorted(
        os.path.join(examples_dir, f) for f in os.listdir(examples_dir)
        if f.startswith("GCA_"))[:2]
    r = run_cli(["multihitdb"] + genomes + ["mhdb", "mhtmp"], workdir)
    assert r.returncode == 0, r.stderr
    r = run_cli(["multihitsearch", "mhdb", "mhdb", "mh.tsv", "mhtmp2",
                 "--threads", "1"], workdir)
    assert r.returncode == 0, r.stderr
    r = run_cli(["combinepvalperset", "mh.tsv", "mhdb", "mhdb",
                 "mhpval.tsv", "--aggregation-mode", "0"], workdir)
    assert r.returncode == 0, r.stderr
    rows = [line.split("\t") for line in
            open(os.path.join(workdir, "mhpval.tsv"))]
    # self-search: each set's own-set combined P-value is the strongest
    own = {r[0]: r for r in rows if r[0] == r[1]}
    assert len(own) == 2
    for qset, row in own.items():
        assert float(row[2]) <= min(float(r[2]) for r in rows
                                    if r[0] == qset)


def test_cli_createindex_speeds_search(workdir, examples_dir):
    r = run_cli(["createindex", "targets", "tmpidx"], workdir)
    assert r.returncode == 0, r.stderr
    assert "postings" in r.stdout
    # easy-predict must produce identical output with the persisted index
    spacers = sorted(os.path.join(examples_dir, f)
                     for f in os.listdir(examples_dir) if f.endswith(".fas"))
    r = run_cli(["easy-predict"] + spacers
                + ["targets", "out_idx.tsv", "tmp_idx"], workdir)
    assert r.returncode == 0, r.stderr
    a = open(os.path.join(workdir, "out_idx.tsv")).read()
    b = open(os.path.join(workdir, "out.tsv")).read()
    assert a == b


def test_flag_value_validation(workdir, examples_dir):
    """Out-of-range flag values fail with 'Invalid argument' + nonzero
    exit (the reference's per-parameter regex rejection,
    Parameters.h/Parameters.cpp)."""
    spacers = [os.path.join(examples_dir, "CP003088.fas")]
    bad = [["--fdr", "1.5"], ["-s", "0.5"], ["-s", "12"],
           ["-k", "3"], ["--max-seqs", "0"], ["--threads", "-2"],
           ["--gap-open", "aa:x"], ["--sens-steps", "0"],
           ["-e", "-1"]]
    for flags in bad:
        r = run_cli(["easy-predict"] + spacers
                    + ["targets", "bad.tsv", "tmp"] + flags, workdir)
        assert r.returncode != 0, flags
        assert "Invalid argument" in r.stderr, (flags, r.stderr[-300:])


def test_createsetdb_progress_lines(tmp_path, examples_dir):
    """createsetdb reports Debug::Progress-style feedback on stderr at
    the default verbosity and is silent at -v 0."""
    genomes = sorted(glob.glob(os.path.join(examples_dir, "GCA_*.fna.gz")))
    r = run_cli(["createsetdb"] + genomes + ["t1", "tmp"], tmp_path)
    assert r.returncode == 0
    assert "items" in r.stderr
    r = run_cli(["createsetdb"] + genomes + ["t2", "tmp", "-v", "0"],
                tmp_path)
    assert r.returncode == 0
    assert "items" not in r.stderr
