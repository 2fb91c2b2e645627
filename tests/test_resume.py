"""Step-granular checkpoint/resume (SURVEY 5.4, predictmatch.sh
notExists guards): killing a run mid-way and restarting recomputes only
the missing stages; finished artifacts are reused byte-identically."""
import glob
import os
import signal
import subprocess
import sys
import time

import pytest

from spacepharer_tpu.io.setdb import (SetDB, build_setdb_from_fasta,
                                      build_setdb_from_spacers)
from spacepharer_tpu.io.spacer_formats import parse_spacers
from spacepharer_tpu.pipeline.predictmatch import predict_match
from spacepharer_tpu.pipeline.workflow import WorkflowCache

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def dbs(examples_dir):
    genomes = sorted(glob.glob(os.path.join(examples_dir, "GCA_*.fna.gz")))
    tdb = build_setdb_from_fasta(genomes)
    cdb = build_setdb_from_fasta(genomes, reverse_fragments=True)
    recs, sources = parse_spacers(
        sorted(glob.glob(os.path.join(examples_dir, "*.fas"))))
    qdb = build_setdb_from_spacers(recs, sources)
    return qdb, tdb, cdb


def test_stage_artifacts_and_selective_recompute(dbs, tmp_path,
                                                 monkeypatch):
    qdb, tdb, cdb = dbs
    cache = WorkflowCache(str(tmp_path), "predictmatch", "p", [])
    res1 = predict_match(qdb, tdb, cdb, cache=cache)
    for name in ("result", "result_rev", "aggregate", "aggregate_rev",
                 "match", "aln"):
        assert cache.has(name), name

    # full resume: the searches must not run again
    import spacepharer_tpu.pipeline.predictmatch as pm
    calls = []
    orig = pm.search_setdbs
    monkeypatch.setattr(pm, "search_setdbs",
                        lambda *a, **k: calls.append(1) or orig(*a, **k))
    res2 = predict_match(qdb, tdb, cdb, cache=cache)
    assert not calls
    assert res2.text == res1.text

    # delete a late artifact: only it is recomputed, searches stay cached
    os.unlink(cache.path("aln"))
    os.unlink(cache.path("match"))
    res3 = predict_match(qdb, tdb, cdb, cache=cache)
    assert not calls
    assert cache.has("aln") and cache.has("match")
    assert res3.text == res1.text


def test_kill_mid_run_resumes_at_first_missing_stage(examples_dir,
                                                     tmp_path):
    """SIGKILL the pipeline after the first search artifact lands; the
    rerun must reuse it ([resume] result) and produce the same output
    as an uninterrupted run."""
    genomes = sorted(glob.glob(os.path.join(examples_dir, "GCA_*.fna.gz")))
    env = dict(os.environ, PYTHONPATH=REPO)
    d = str(tmp_path)
    r = subprocess.run(
        [sys.executable, "-m", "spacepharer_tpu", "createsetdb"]
        + genomes + ["targets", "tmp"], cwd=d, env=env,
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "spacepharer_tpu", "createsetdb"]
        + genomes + ["targets_rev", "tmp", "--reverse-fragments", "1"],
        cwd=d, env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr

    spacers = [os.path.join(examples_dir, "CP003088.fas"),
               os.path.join(examples_dir, "JNGQ01000029.fas")]
    args = [sys.executable, "-m", "spacepharer_tpu", "easy-predict"] \
        + spacers + ["targets", "out.tsv", "ep_tmp", "-v", "3"]
    # The stage barrier makes the kill window deterministic: the child
    # commits the first search artifact synchronously, then pauses
    # until our SIGKILL — no timing race, no conditional skip.
    kill_env = dict(env, SPACEPHARER_STAGE_BARRIER="result")
    proc = subprocess.Popen(args, cwd=d, env=kill_env,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    deadline = time.time() + 240
    killed = False
    while time.time() < deadline and proc.poll() is None:
        arts = glob.glob(os.path.join(d, "ep_tmp", "*", "result.pkl"))
        if arts:
            proc.send_signal(signal.SIGKILL)
            killed = True
            break
        time.sleep(0.02)
    proc.wait(timeout=240)
    assert killed, "pipeline exited before committing the result artifact"
    assert not os.path.exists(os.path.join(d, "out.tsv"))

    r = subprocess.run(args, cwd=d, env=env, capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr
    assert "[resume] result: reusing cached artifact" in r.stdout
    text = open(os.path.join(d, "out.tsv")).read()
    hits = [ln for ln in text.split("\n") if ln.startswith(">")]
    assert sum(1 for ln in hits if float(ln.split("\t")[2]) < 1e-3) == 6


def test_createsetdb_exists_guard(examples_dir, tmp_path):
    genomes = sorted(glob.glob(os.path.join(examples_dir, "GCA_*.fna.gz")))
    env = dict(os.environ, PYTHONPATH=REPO)
    d = str(tmp_path)
    cmd = [sys.executable, "-m", "spacepharer_tpu", "createsetdb"] \
        + genomes + ["targets", "tmp"]
    r = subprocess.run(cmd, cwd=d, env=env, capture_output=True, text=True)
    assert r.returncode == 0 and "[resume]" not in r.stdout
    r = subprocess.run(cmd, cwd=d, env=env, capture_output=True, text=True)
    assert r.returncode == 0 and "up to date [resume]" in r.stdout
    # changed params -> rebuild
    r = subprocess.run(cmd + ["--min-length", "60"], cwd=d, env=env,
                       capture_output=True, text=True)
    assert r.returncode == 0 and "[resume]" not in r.stdout
    assert SetDB.exists(os.path.join(d, "targets"))
