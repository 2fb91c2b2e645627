"""Predefined database catalogs + URL-list downloads.

Parity target: downloaddb (src/workflow/DownloadDb.cpp:32-184 +
data/downloaddb.sh:44-162): four predefined catalogs or a user URL
list; downloads, builds the setDB and the codon-reversed control.
Network access is environment-dependent; the download step degrades
with a clear error when offline.
"""
import os
import sys
import tarfile
import urllib.request

CATALOGS = {
    "GenBank_phage_2018_09": dict(
        url="http://wwwuser.gwdg.de/~compbiol/spacepharer/2020_05/"
            "GenBank_phage_2018_09.tar.gz",
        tax="http://wwwuser.gwdg.de/~compbiol/spacepharer/2020_05/"
            "GenBank_phage_2018_09.tsv",
        desc="~8000 phage genomes (GenBank Sep 2018)"),
    "GenBank_eukvir_2018_09": dict(
        url="http://wwwuser.gwdg.de/~compbiol/spacepharer/2020_05/"
            "GenBank_eukvir_2018_09.tar.gz",
        tax=None, desc="eukaryotic viruses (GenBank Sep 2018)"),
    "spacers_shmakov_et_al_2017": dict(
        url="http://wwwuser.gwdg.de/~compbiol/spacepharer/2020_05/"
            "spacers_shmakov_et_al_2017.tar.gz",
        tax=None, desc=">30k spacer sets (Shmakov et al 2017)"),
    "spacers_dion_et_al_2021": dict(
        url="http://wwwuser.gwdg.de/~compbiol/spacepharer/2021_04/"
            "spacers_dion_et_al_2021.tar.gz",
        tax=None, desc=">490k spacer sets (Dion et al 2021)"),
}


def _resolve(url: str) -> str:
    """SPACEPHARER_DB_MIRROR rebases catalog URLs onto a mirror (any
    scheme urllib accepts, incl. file:// for offline use/tests)."""
    mirror = os.environ.get("SPACEPHARER_DB_MIRROR")
    if mirror:
        return mirror.rstrip("/") + "/" + url.rsplit("/", 1)[1]
    return url


def download_db(name: str, out_db: str, tmp_dir: str,
                reverse_setdb: bool = True) -> int:
    os.makedirs(tmp_dir, exist_ok=True)
    from ..io.setdb import build_setdb_from_fasta

    if name in CATALOGS:
        info = CATALOGS[name]
        tarball = os.path.join(tmp_dir, name + ".tar.gz")
        if not os.path.exists(tarball):
            print(f"Downloading {_resolve(info['url'])} ...")
            try:
                urllib.request.urlretrieve(_resolve(info["url"]), tarball)
            except Exception as e:  # noqa: BLE001
                print(f"Download failed ({e}). This environment may have no "
                      "network access; fetch the tarball manually into "
                      f"{tarball} and re-run.", file=sys.stderr)
                return 1
        extract_dir = os.path.join(tmp_dir, name)
        os.makedirs(extract_dir, exist_ok=True)
        with tarfile.open(tarball) as tf:
            tf.extractall(extract_dir)
        files = sorted(
            os.path.join(extract_dir, f) for f in os.listdir(extract_dir)
            if not f.endswith((".tsv", ".txt")))
        tax_file = None
        if info.get("tax"):
            tax_file = os.path.join(tmp_dir, name + ".tsv")
            if not os.path.exists(tax_file):
                try:
                    urllib.request.urlretrieve(_resolve(info["tax"]),
                                               tax_file)
                except Exception:  # noqa: BLE001
                    tax_file = None
    elif name.endswith(".tsv"):
        files = []
        with open(name) as fh:
            for line in fh:
                url = line.strip().split("\t")[0]
                if not url:
                    continue
                dest = os.path.join(tmp_dir, os.path.basename(url))
                if not os.path.exists(dest):
                    try:
                        urllib.request.urlretrieve(url, dest)
                    except Exception as e:  # noqa: BLE001
                        print(f"Download of {url} failed ({e})",
                              file=sys.stderr)
                        return 1
                files.append(dest)
        tax_file = None
    else:
        print(f"Unknown database {name!r}. Available: "
              f"{', '.join(CATALOGS)}", file=sys.stderr)
        return 1

    db = build_setdb_from_fasta(files, tax_mapping_file=tax_file)
    db.save(out_db)
    print(f"downloaddb: built {out_db} ({db.n_sets} sets, {db.n_orfs} ORFs)")
    if reverse_setdb:
        rev = build_setdb_from_fasta(files, reverse_fragments=True)
        rev.save(out_db + "_rev")
        print(f"downloaddb: built control {out_db}_rev")
    return 0
