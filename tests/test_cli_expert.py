"""Expert subcommands: each stage re-run from dumped entry TSVs must
reproduce the pipeline's own table byte-for-byte."""
import glob
import os

import pytest

from spacepharer_tpu.cli import main
from spacepharer_tpu.io.setdb import (build_setdb_from_fasta,
                                      build_setdb_from_spacers)
from spacepharer_tpu.io.spacer_formats import parse_spacers
from spacepharer_tpu.pipeline.predictmatch import predict_match


@pytest.fixture(scope="module")
def stage_env(tmp_path_factory, examples_dir):
    d = tmp_path_factory.mktemp("expert")
    genomes = sorted(glob.glob(os.path.join(examples_dir, "GCA_*.fna.gz")))
    tdb = build_setdb_from_fasta(genomes)
    cdb = build_setdb_from_fasta(genomes, reverse_fragments=True)
    recs, sources = parse_spacers(
        sorted(glob.glob(os.path.join(examples_dir, "*.fas"))))
    qdb = build_setdb_from_spacers(recs, sources)
    qdb.save(str(d / "qdb"))
    tdb.save(str(d / "tdb"))
    stages = str(d / "stages")
    res = predict_match(qdb, tdb, cdb, dump_stages=stages)
    (d / "final.tsv").write_text(res.text)
    return d


def _stage(env, name):
    return str(env / "stages" / (name + ".tsv"))


def _same(path_a, path_b):
    with open(path_a) as a, open(path_b) as b:
        return a.read() == b.read()


def test_besthitperset_cli(stage_env):
    out = str(stage_env / "bh.tsv")
    assert main(["besthitperset", _stage(stage_env, "result"),
                 str(stage_env / "tdb"), out]) == 0
    assert _same(out, _stage(stage_env, "aggregate"))


def test_mergeresultsbyset_cli(stage_env):
    out = str(stage_env / "merged2.tsv")
    assert main(["mergeresultsbyset", _stage(stage_env, "aggregate"),
                 str(stage_env / "qdb"), out]) == 0
    assert _same(out, _stage(stage_env, "merged"))


def test_combinescore_cli(stage_env):
    out = str(stage_env / "cscore2.tsv")
    assert main(["combinescore", _stage(stage_env, "merged"),
                 str(stage_env / "qdb"), str(stage_env / "tdb"), out]) == 0
    assert _same(out, _stage(stage_env, "cscore"))


def test_filtermatchbyfdr_cli(stage_env):
    out = str(stage_env / "match2.tsv")
    assert main(["filtermatchbyfdr", _stage(stage_env, "cscore"),
                 _stage(stage_env, "cscore_rev"), out, "--fdr", "0.05"]) == 0
    assert _same(out, _stage(stage_env, "match"))


def test_truncatebesthits_cli(stage_env):
    out = str(stage_env / "trunc2.tsv")
    assert main(["truncatebesthits", _stage(stage_env, "aggregate"),
                 str(stage_env / "qdb"), out]) == 0
    assert _same(out, _stage(stage_env, "truncated"))


def test_summarizeresults_cli(stage_env):
    out = str(stage_env / "final2.tsv")
    assert main(["summarizeresults", _stage(stage_env, "match"),
                 _stage(stage_env, "aln"), out]) == 0
    assert _same(out, str(stage_env / "final.tsv"))


def test_reverseseqbycodon_cli(tmp_path):
    fa = tmp_path / "in.fasta"
    fa.write_text(">s1 c\nAAACCCGGGTT\n>s2\nACGTGA\n")
    out = str(tmp_path / "out.fasta")
    assert main(["reverseseqbycodon", str(fa), out]) == 0
    text = open(out).read()
    # 11 % 3 == 2 -> first two bases dropped, codons ACC CGG GTT reversed
    assert text == ">s1 c\nGTTCGGACC\n>s2\nTGAACG\n"


def test_empiricalpval_cli(tmp_path):
    pos = tmp_path / "pos.tsv"
    neg = tmp_path / "neg.tsv"
    pos.write_text("0\t5\t3.0\t0.9\n")
    neg.write_text("0\t6\t1.0\t0.1\n0\t7\t2.0\t0.2\n0\t8\t4.0\t0.3\n")
    out = str(tmp_path / "out.tsv")
    assert main(["empiricalpval", str(pos), str(neg), out]) == 0
    # 3 controls, 1 control >= 3.0 -> p = (3 - 2 + 0.5) / 4
    assert open(out).read() == "0\t5\t3.750E-01\t0.9\n"
