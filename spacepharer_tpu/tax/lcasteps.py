"""Taxonomy pipeline steps for predictmatch.

Parity targets:
  lca (lib/mmseqs/src/taxonomy/lca.cpp:18-229): per query ORF, LCA of
    the target ORFs' taxa (blacklist-filtered).
  aggregatetax (lib/mmseqs/src/taxonomy/aggregatetax.cpp): uniform-vote
    majority aggregation of ORF-level assignments per spacer, emitting
    taxid/rank/name + (total, assigned, agree, percent) + ranks.
  majoritylca --vote-mode 2 (lca.cpp dolca(majority=true)): per target
    set, score-weighted majority over matched query sets' taxa.
  restrictranks (src/util/RestrictRanks.cpp): clamp the predicted taxon
    to the rank allowed by the average nucleotide sequence identity.
"""
import math

from .ncbi import (DEFAULT_RANKS, NcbiTaxonomy, WeightedTaxResult,
                   find_rank_index)

NO_TAX = ["0", "no rank", "unclassified"]


def _format_tax_row(taxonomy, node, ranks):
    row = [str(node.tax_id), node.rank, node.name]
    if ranks:
        row.append(";".join(taxonomy.at_ranks(node, ranks)))
    return row


def _no_tax_row(ranks):
    return list(NO_TAX) + ([""] if ranks else [])


def per_orf_lca(entries: dict, orf_taxid, taxonomy: NcbiTaxonomy,
                ranks, blacklist) -> dict:
    """{query_orf: rows with col0 = target orf key} -> {query_orf: tax row}."""
    out = {}
    for qkey, rows in entries.items():
        if not rows:
            out[qkey] = _no_tax_row(ranks)
            continue
        taxa = []
        for row in rows:
            t = int(orf_taxid[int(row[0])])
            if any(taxonomy.is_ancestor(b, t) for b in blacklist):
                continue
            taxa.append(t)
        node = taxonomy.lca(taxa)
        if node is None:
            out[qkey] = _no_tax_row(ranks)
        else:
            out[qkey] = _format_tax_row(taxonomy, node, ranks)
    return out


def _fmt_percent(p: float) -> str:
    import numpy as np
    return f"{np.round(np.float32(p) * np.float32(100)) / np.float32(100):.3f}"


def aggregate_tax(orf_lca: dict, members_by_group: dict,
                  taxonomy: NcbiTaxonomy, ranks) -> dict:
    """Uniform-vote aggregation {group: member orfs} -> {group: tax row}."""
    out = {}
    for gkey, members in sorted(members_by_group.items()):
        weighted = [(int(orf_lca[m][0]) if m in orf_lca else 0, 1.0)
                    for m in members]
        res = taxonomy.weighted_majority_lca(weighted, 0.5)
        node = taxonomy.taxon_node(res.taxon)
        total = res.assigned + res.unassigned
        counts = [str(total), str(res.assigned), str(res.agree),
                  _fmt_percent(res.percent)]
        if res.taxon == 0 or node is None:
            row = list(NO_TAX) + counts + ([""] if ranks else [])
        else:
            row = [str(node.tax_id), node.rank, node.name] + counts
            if ranks:
                row.append(";".join(taxonomy.at_ranks(node, ranks)))
        out[gkey] = row
    return out


def majority_lca_per_target(match_swapped: dict, set_taxid,
                            taxonomy: NcbiTaxonomy, ranks, blacklist,
                            vote_mode: int = 2,
                            majority_thr: float = 0.5) -> dict:
    """{target_set: [[qset, score, seqid], ...]} -> {target_set: tax row}."""
    out = {}
    for tset, rows in match_swapped.items():
        if not rows:
            out[tset] = _no_tax_row(ranks)
            continue
        weighted = []
        for row in rows:
            taxon = int(set_taxid[int(row[0])])
            if any(taxonomy.is_ancestor(b, taxon) for b in blacklist):
                continue
            weight = float(row[1]) if vote_mode == 2 else 1.0
            weighted.append((taxon, weight))
        res = taxonomy.weighted_majority_lca(weighted, majority_thr)
        node = taxonomy.taxon_node(res.taxon)
        if node is None:
            out[tset] = _no_tax_row(ranks)
        else:
            out[tset] = _format_tax_row(taxonomy, node, ranks)
    return out


def restrict_ranks(tax_entries: dict, match_swapped: dict,
                   taxonomy: NcbiTaxonomy, ranks,
                   thresholds=(0.86, 0.84, 0.82, 0.80, 0.78, 0.76, 0.74, 0.72)
                   ) -> dict:
    """Clamp each target set's taxon by avg seqId (RestrictRanks.cpp)."""
    rank_names = ("species", "genus", "family", "order", "class", "phylum",
                  "kingdom", "superkingdom")
    out = {}
    for tset, row in tax_entries.items():
        rows = match_swapped.get(tset, [])
        seq_id = 0.0
        count = 0
        for r in rows:
            s = float(r[2])
            if s > 0.0:
                seq_id += s
                count += 1
        seq_id = seq_id / count if count else float("nan")

        taxon = int(row[0])
        best_rank = None
        for thr, name in zip(thresholds, rank_names):
            if seq_id > thr:
                best_rank = name
                break
        if best_rank is None:
            out[tset] = _no_tax_row(ranks)
            continue
        node = taxonomy.taxon_node(taxon)
        if node is None:
            out[tset] = _no_tax_row(ranks)
            continue
        best_level = find_rank_index(best_rank)
        if find_rank_index(node.rank) >= best_level:
            out[tset] = _format_tax_row(taxonomy, node, ranks)
            continue
        while node.parent != node.tax_id:
            node = taxonomy.taxon_node(node.parent)
            if node.rank != "no rank" and find_rank_index(node.rank) >= best_level:
                break
        out[tset] = _format_tax_row(taxonomy, node, ranks)
    return out
