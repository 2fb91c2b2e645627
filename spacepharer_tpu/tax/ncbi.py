"""NCBI taxonomy: taxdump loading, LCA, weighted-majority LCA, ranks.

Parity target: NcbiTaxonomy (lib/mmseqs/src/taxonomy/NcbiTaxonomy.{h,cpp}):
nodes/names/merged dmp parsing, LCA over node paths, the
weighted-majority LCA candidate scan with its min-rank tie rule,
AtRanks ("uc_" / "unknown" filling), and lineage strings.
"""
import os
from dataclasses import dataclass
from functools import lru_cache
from typing import Optional

NCBI_RANKS = {
    "forma": 1, "varietas": 2, "subspecies": 3, "species": 4,
    "species subgroup": 5, "species group": 6, "subgenus": 7, "genus": 8,
    "subtribe": 9, "tribe": 10, "subfamily": 11, "family": 12,
    "superfamily": 13, "parvorder": 14, "infraorder": 15, "suborder": 16,
    "order": 17, "superorder": 18, "infraclass": 19, "subclass": 20,
    "class": 21, "superclass": 22, "subphylum": 23, "phylum": 24,
    "superphylum": 25, "subkingdom": 26, "kingdom": 27, "superkingdom": 28,
}
SHORT_RANKS = {"species": "s", "genus": "g", "family": "f", "order": "o",
               "class": "c", "phylum": "p", "kingdom": "k",
               "superkingdom": "d"}
ROOT_TAXID = 1
ROOT_RANK = 1 << 31  # INT_MAX-ish sentinel (NcbiTaxonomy.h ROOT_RANK)
DEFAULT_BLACKLIST = "12908:unclassified sequences,28384:other sequences"
DEFAULT_RANKS = "superkingdom,phylum,class,order,family,genus,species"


@dataclass
class TaxonNode:
    tax_id: int
    parent: int
    rank: str
    name: str


@dataclass
class WeightedTaxResult:
    taxon: int
    assigned: int
    unassigned: int
    agree: int
    percent: float


def find_rank_index(rank: str) -> int:
    return NCBI_RANKS.get(rank, -1)


class NcbiTaxonomy:
    def __init__(self, taxdump_dir: str):
        self.nodes = {}
        self.merged = {}
        with open(os.path.join(taxdump_dir, "nodes.dmp")) as fh:
            for line in fh:
                parts = [p.strip() for p in line.rstrip("\t|\n").split("\t|\t")]
                tid, parent, rank = int(parts[0]), int(parts[1]), parts[2]
                self.nodes[tid] = TaxonNode(tid, parent, rank, "")
        with open(os.path.join(taxdump_dir, "names.dmp")) as fh:
            for line in fh:
                parts = [p.strip() for p in line.rstrip("\t|\n").split("\t|\t")]
                if len(parts) >= 4 and parts[3] == "scientific name":
                    tid = int(parts[0])
                    if tid in self.nodes:
                        self.nodes[tid].name = parts[1]
        merged_path = os.path.join(taxdump_dir, "merged.dmp")
        if os.path.exists(merged_path):
            with open(merged_path) as fh:
                for line in fh:
                    parts = [p.strip() for p in line.rstrip("\t|\n").split("\t|\t")]
                    if len(parts) >= 2:
                        self.merged[int(parts[0])] = int(parts[1])

    # ------------------------------------------------------------- basics
    def node_exists(self, tax_id: int) -> bool:
        return tax_id in self.nodes or tax_id in self.merged

    def taxon_node(self, tax_id: int) -> Optional[TaxonNode]:
        if tax_id == 0:
            return None
        if tax_id in self.merged:
            tax_id = self.merged[tax_id]
        return self.nodes.get(tax_id)

    def _path_to_root(self, tax_id: int):
        path = []
        node = self.taxon_node(tax_id)
        while node is not None:
            path.append(node)
            if node.parent == node.tax_id:
                break
            node = self.taxon_node(node.parent)
        return path

    def is_ancestor(self, ancestor: int, child: int) -> bool:
        if not self.node_exists(ancestor) or not self.node_exists(child):
            return False
        return any(n.tax_id == ancestor for n in self._path_to_root(child))

    # ---------------------------------------------------------------- LCA
    def lca_pair(self, a: int, b: int) -> Optional[TaxonNode]:
        pa = {n.tax_id for n in self._path_to_root(a)}
        for n in self._path_to_root(b):
            if n.tax_id in pa:
                return n
        return None

    def lca(self, taxa) -> Optional[TaxonNode]:
        node = None
        for t in taxa:
            if not self.node_exists(t):
                continue
            if node is None:
                node = self.taxon_node(t)
            else:
                node = self.lca_pair(node.tax_id, t)
        return node

    # ----------------------------------------------------- majority LCA
    def weighted_majority_lca(self, weighted_taxa, majority_cutoff: float
                              ) -> WeightedTaxResult:
        """weighted_taxa: [(taxon, weight)], per
        NcbiTaxonomy::weightedMajorityLCA."""
        counts = {}  # taxid -> [weight, is_candidate]
        assigned = 0
        unassigned = 0
        total_weight = 0.0
        for taxon, weight in weighted_taxa:
            if taxon == 0:
                unassigned += 1
                continue
            node = self.taxon_node(taxon)
            if node is None:
                raise ValueError(f"taxid {taxon} not in taxonomy")
            total_weight += weight
            assigned += 1
            cur = counts.setdefault(taxon, [0.0, False])
            cur[0] += weight
            cur[1] = True
            tid = taxon
            while node.parent != tid:
                parent = counts.setdefault(node.parent, [0.0, False])
                parent[0] += weight
                tid = node.parent
                node = self.taxon_node(tid)

        if total_weight == 0:
            return WeightedTaxResult(0, assigned, unassigned, 0, 0.0)

        selected = 0
        min_rank = 1 << 31
        selected_percent = 0.0
        for taxid in sorted(counts.keys()):
            weight, is_candidate = counts[taxid]
            if not is_candidate:
                continue
            percent = weight / total_weight
            if percent < majority_cutoff:
                continue
            # min informative rank of the candidate's lineage
            node = self.taxon_node(taxid)
            cur_min = ROOT_RANK
            tid = taxid
            while node.parent != tid:
                idx = find_rank_index(node.rank)
                if idx > 0 and idx < cur_min:
                    cur_min = idx
                    break
                tid = node.parent
                node = self.taxon_node(tid)
            if cur_min < min_rank or (cur_min == min_rank
                                      and percent > selected_percent):
                selected = taxid
                min_rank = cur_min
                selected_percent = percent

        if selected == ROOT_TAXID:
            return WeightedTaxResult(selected, assigned, unassigned,
                                     assigned, selected_percent)
        if selected == 0:
            return WeightedTaxResult(selected, assigned, unassigned, 0,
                                     selected_percent)
        agree = 0
        for taxon, _ in weighted_taxa:
            if taxon == 0:
                continue
            if any(n.tax_id == selected for n in self._path_to_root(taxon)):
                agree += 1
        return WeightedTaxResult(selected, assigned, unassigned, agree,
                                 selected_percent)

    # -------------------------------------------------------- formatting
    def all_ranks(self, node: TaxonNode):
        result = {}
        while True:
            if node.tax_id == 1:
                result.setdefault(node.rank, node.name)
                return result
            if node.rank not in ("no_rank", "no rank"):
                result.setdefault(node.rank, node.name)
            node = self.taxon_node(node.parent)

    def at_ranks(self, node: TaxonNode, levels):
        all_r = self.all_ranks(node)
        base_idx = find_rank_index(node.rank)
        base = "uc_" + node.name
        out = []
        for level in levels:
            if level in all_r:
                out.append(all_r[level])
            elif NCBI_RANKS[level] < base_idx:
                out.append(base)
            else:
                out.append("unknown")
        return out

    def lineage_string(self, node: TaxonNode, info_as_name: bool) -> str:
        path = []
        n = node
        while True:
            path.append(n)
            parent = self.taxon_node(n.parent)
            if parent is None or parent.parent == parent.tax_id:
                break
            n = parent
        parts = []
        for n in reversed(path):
            if info_as_name:
                parts.append(SHORT_RANKS.get(n.rank, "-") + "_" + n.name)
            else:
                parts.append(str(n.tax_id))
        return ";".join(parts)

    def parse_blacklist(self, blacklist: str = DEFAULT_BLACKLIST):
        out = []
        for item in blacklist.split(","):
            if not item:
                continue
            tid_s = item.split(":")[0]
            tid = int(tid_s)
            if tid == 0 or not self.node_exists(tid):
                continue
            if ":" in item:
                node = self.taxon_node(tid)
                if node is None or node.name != item.split(":", 1)[1]:
                    continue
            out.append(tid)
        return out


def _dmp_fingerprint(taxdump_dir: str):
    fp = []
    for name in ("nodes.dmp", "names.dmp", "merged.dmp"):
        p = os.path.join(taxdump_dir, name)
        try:
            st = os.stat(p)
            fp.append((name, st.st_size, st.st_mtime_ns))
        except OSError:
            fp.append((name, -1, -1))
    return fp


def create_bin_taxonomy(taxdump_dir: str) -> str:
    """Persist the parsed taxdump as a binary cache in the dump dir —
    the createbintaxonomy analog (lib/mmseqs/src/taxonomy/
    createbintaxonomy.cpp): later loads skip the dmp text parse.
    Returns the cache path."""
    import pickle
    tax = NcbiTaxonomy(taxdump_dir)
    path = os.path.join(taxdump_dir, "taxonomy_cache.pkl")
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        pickle.dump({"fingerprint": _dmp_fingerprint(taxdump_dir),
                     "nodes": tax.nodes, "merged": tax.merged}, fh,
                    protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    return path


@lru_cache(maxsize=4)
def load_taxonomy(taxdump_dir: str) -> NcbiTaxonomy:
    """Load a taxdump, via the binary cache when a fresh one exists
    (stale caches — any dmp changed — fall back to the text parse)."""
    import pickle
    cache = os.path.join(taxdump_dir, "taxonomy_cache.pkl")
    if os.path.exists(cache):
        try:
            with open(cache, "rb") as fh:
                blob = pickle.load(fh)
            if blob.get("fingerprint") == _dmp_fingerprint(taxdump_dir):
                tax = NcbiTaxonomy.__new__(NcbiTaxonomy)
                tax.nodes = blob["nodes"]
                tax.merged = blob["merged"]
                return tax
        except Exception:  # noqa: BLE001 - corrupt cache -> reparse
            pass
    return NcbiTaxonomy(taxdump_dir)
