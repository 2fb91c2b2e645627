"""Final report assembly (summarizeresults equivalent).

Parity target: src/util/SummarizeResults.cpp:13-197 — for each query
set, for each surviving match (target set, S_comb), join with the
merged per-set alignment rows (col0 == target set), emit
``#<qset> <target> <S_comb> [fdr] <n_hits> [tax columns]`` followed by
``><spacer> <target> <p_bh> <qstart> <qend> <tstart> <tend> [PAM, PAM_rc]``
hit lines (fmt >= 1) and gapped alignment lines (fmt 2).
"""
FMT_SHORT = 0
FMT_LONG = 1
FMT_ALN = 2


def summarize_results(match_entries: dict, aln_entries: dict,
                      fmt: int = FMT_LONG, report_fdr: bool = False,
                      taxonomy=None, lca_ranks=None, tax_lineage: int = 0) -> str:
    """Returns the final TSV text (keys ascending)."""
    out = []
    for qset in sorted(match_entries.keys()):
        aln_rows = aln_entries.get(qset)
        if aln_rows is None:
            continue
        for match_row in match_entries[qset]:
            tset = match_row[0]
            cscore = match_row[1]
            fdr = match_row[3] if report_fdr and len(match_row) > 3 else None
            line_count = 0
            header = None
            tax_id = 0
            hit_lines = []
            for arow in aln_rows:
                if arow[0] != tset:
                    continue
                if line_count == 0:
                    header = [f"#{arow[2]}", arow[3], cscore]
                    if report_fdr and fdr is not None:
                        header.append(fdr)
                    if taxonomy is not None:
                        tax_id = int(arow[12]) if len(arow) > 12 and arow[12] not in ("", "-") else 0
                line_count += 1
                if fmt in (FMT_LONG, FMT_ALN):
                    hit = [f">{arow[1]}", arow[3], arow[4], arow[5], arow[6],
                           arow[8], arow[9]]
                    if len(arow) >= 15:
                        hit.extend([arow[13], arow[14]])
                    hit_lines.append("\t".join(hit))
                    if fmt == FMT_ALN:
                        hit_lines.append(arow[10])
                        hit_lines.append(arow[11])
            if line_count > 0:
                parts = list(header)
                parts.append(str(line_count))
                if taxonomy is not None:
                    node = taxonomy.taxon_node(tax_id)
                    if node is not None:
                        parts.extend([str(node.tax_id), node.rank, node.name])
                        if lca_ranks:
                            parts.append(";".join(
                                taxonomy.at_ranks(node, lca_ranks)))
                        if tax_lineage == 1:
                            parts.append(taxonomy.lineage_string(node, True))
                        elif tax_lineage == 2:
                            parts.append(taxonomy.lineage_string(node, False))
                out.append("\t".join(parts))
                out.extend(hit_lines)
    return "\n".join(out) + ("\n" if out else "")
