"""Offline downloaddb coverage (DownloadDb.cpp:111-184 +
data/downloaddb.sh:44-162) via file:// fixtures — the zero-egress
analog of the reference's catalog + URL-list paths."""
import glob
import os
import tarfile

import pytest

from spacepharer_tpu.io.setdb import SetDB
from spacepharer_tpu.pipeline.downloaddb import CATALOGS, download_db


@pytest.fixture()
def local_mirror(tmp_path, examples_dir):
    """A file:// mirror carrying the GenBank_phage_2018_09 artifacts:
    genome tarball (tar2db analog input) + taxonomy TSV."""
    mirror = tmp_path / "mirror"
    mirror.mkdir()
    genomes = sorted(glob.glob(os.path.join(examples_dir, "GCA_*.fna.gz")))
    with tarfile.open(mirror / "GenBank_phage_2018_09.tar.gz", "w:gz") as tf:
        for g in genomes:
            tf.add(g, arcname=os.path.basename(g))
    with open(os.path.join(examples_dir, "genome_taxa.tsv")) as fh:
        (mirror / "GenBank_phage_2018_09.tsv").write_text(fh.read())
    return mirror


def test_catalog_download_build_and_control(local_mirror, tmp_path,
                                            monkeypatch):
    monkeypatch.setenv("SPACEPHARER_DB_MIRROR", local_mirror.as_uri())
    out = str(tmp_path / "phagedb")
    rc = download_db("GenBank_phage_2018_09", out, str(tmp_path / "tmp"))
    assert rc == 0
    db = SetDB.load(out)
    assert db.n_sets == 3 and db.n_orfs > 500
    # taxonomy TSV attached: per-set taxids from genome_taxa.tsv
    assert db.set_taxid is not None
    assert sorted(int(t) for t in db.set_taxid) == [10679, 40521, 244310]
    # the _rev control exists, same shape, codon-reversed ORFs
    rev = SetDB.load(out + "_rev")
    assert rev.n_orfs == db.n_orfs
    assert rev.orf_aa(0).tobytes() != db.orf_aa(0).tobytes()


def test_url_list_download(tmp_path, examples_dir):
    genomes = sorted(glob.glob(os.path.join(examples_dir, "GCA_*.fna.gz")))
    lst = tmp_path / "urls.tsv"
    lst.write_text("".join(
        "file://" + g + "\n" for g in genomes[:2]))
    out = str(tmp_path / "urldb")
    rc = download_db(str(lst), out, str(tmp_path / "tmp2"),
                     reverse_setdb=False)
    assert rc == 0
    db = SetDB.load(out)
    assert db.n_sets == 2


def test_unknown_catalog_errors(tmp_path, capsys):
    rc = download_db("no_such_db", str(tmp_path / "x"),
                     str(tmp_path / "tmp3"))
    assert rc == 1
    assert "Unknown database" in capsys.readouterr().err


def test_catalog_table_is_reference_complete():
    """The four predefined catalogs of DownloadDb.cpp:32-57."""
    assert set(CATALOGS) == {
        "GenBank_phage_2018_09", "GenBank_eukvir_2018_09",
        "spacers_shmakov_et_al_2017", "spacers_dion_et_al_2021"}


def test_bin_taxonomy_cache(tmp_path):
    """createbintaxonomy: binary cache loads identically and goes
    stale when a dmp changes."""
    import shutil
    from spacepharer_tpu.tax.ncbi import (NcbiTaxonomy,
                                          create_bin_taxonomy,
                                          load_taxonomy)
    src = "/root/reference/examples/ncbi_taxdump"
    d = str(tmp_path / "taxdump")
    shutil.copytree(src, d)
    plain = NcbiTaxonomy(d)
    create_bin_taxonomy(d)
    load_taxonomy.cache_clear()
    cached = load_taxonomy(d)
    assert cached.merged == plain.merged
    assert set(cached.nodes) == set(plain.nodes)
    probe = next(iter(plain.nodes))
    assert cached.nodes[probe].name == plain.nodes[probe].name
    assert cached.nodes[probe].parent == plain.nodes[probe].parent
    # stale cache (touched dmp) falls back to the text parse
    os.utime(os.path.join(d, "nodes.dmp"))
    load_taxonomy.cache_clear()
    fresh = load_taxonomy(d)
    assert set(fresh.nodes) == set(plain.nodes)
    load_taxonomy.cache_clear()
