"""Expert subcommands (the reference's COMMAND_EXPERT registry,
src/spacepharer.cpp:61-135).

Each command is a thin file-level wrapper over the library stage it
names; tables travel as entry TSVs (io.entries_tsv) — the flat-file
equivalent of the reference's result DBs — and sequence databases as
SetDB directories. This lets a user re-run any tail of the pipeline
(e.g. a different --fdr, a different rank restriction) from the
intermediates that ``predictmatch --dump-stages`` writes, exactly like
chaining the reference's expert modules over the tmp-dir DBs.
"""
import argparse

from .io.entries_tsv import read_entries, single_row_entries, write_entries
from .io.setdb import SetDB


def cmd_reverseseqbycodon(argv):
    """reverseseqbycodon <in.fasta> <out.fasta> — codon-order-reversed
    null-model sequences (src/util/ReverseSeqByCodon.cpp)."""
    p = argparse.ArgumentParser(prog="spacepharer reverseseqbycodon")
    p.add_argument("input")
    p.add_argument("output")
    args = p.parse_args(argv)
    from .io.fasta import iter_fasta
    from .ops.revcodon import reverse_by_codon
    n = 0
    with open(args.output, "w") as out:
        for entry in iter_fasta(args.input):
            rev = reverse_by_codon(entry.seq)
            out.write(f">{entry.header}\n{rev.tobytes().decode('ascii')}\n")
            n += 1
    print(f"reverseseqbycodon: {n} sequences -> {args.output}")
    return 0


def cmd_empiricalpval(argv):
    """empiricalpval <pos.tsv> <neg.tsv> <out.tsv> — empirical P-values
    of scores against the control score list (src/util/EmpiricalPval.cpp)."""
    p = argparse.ArgumentParser(prog="spacepharer empiricalpval")
    p.add_argument("posTSV")
    p.add_argument("negTSV")
    p.add_argument("output")
    args = p.parse_args(argv)
    from .stats.fdr import empirical_pval
    out = empirical_pval(read_entries(args.posTSV), read_entries(args.negTSV))
    write_entries(out, args.output)
    return 0


def cmd_combinescore(argv):
    """combinescore <mergedBestHit.tsv> <querySetDB> <targetSetDB>
    <out.tsv> — S_comb per (query set, target set)
    (src/util/CombineScore.cpp)."""
    p = argparse.ArgumentParser(prog="spacepharer combinescore")
    p.add_argument("mergedTSV", help="best-hit rows merged by query set "
                                     "(keys = query set)")
    p.add_argument("querySetDB")
    p.add_argument("targetSetDB")
    p.add_argument("output")
    args = p.parse_args(argv)
    from .stats.aggregation import combine_score
    qdb = SetDB.load(args.querySetDB)
    tdb = SetDB.load(args.targetSetDB)
    merged = read_entries(args.mergedTSV)
    out = {qset: combine_score(rows, int(qdb.set_size[qset]), tdb.orf_to_set)
           for qset, rows in merged.items()}
    write_entries(out, args.output)
    return 0


def cmd_besthitperset(argv):
    """besthitperset <result.tsv> <targetSetDB> <out.tsv> — best hit per
    target set with log-corrected P
    (lib/mmseqs/src/multihit/besthitperset.cpp)."""
    p = argparse.ArgumentParser(prog="spacepharer besthitperset")
    p.add_argument("resultTSV", help="alignment rows keyed by query ORF")
    p.add_argument("targetSetDB")
    p.add_argument("output")
    p.add_argument("--simple-best-hit", type=int, default=1, choices=(0, 1))
    args = p.parse_args(argv)
    from .stats.aggregation import best_hit_per_set
    tdb = SetDB.load(args.targetSetDB)
    result = read_entries(args.resultTSV)
    out = {k: best_hit_per_set(rows, tdb.orf_to_set, tdb.set_size,
                               bool(args.simple_best_hit))
           for k, rows in result.items()}
    write_entries(out, args.output)
    return 0


def cmd_mergeresultsbyset(argv):
    """mergeresultsbyset <aggregate.tsv> <querySetDB> <out.tsv> —
    concatenate per-ORF rows into per-set entries
    (lib/mmseqs/src/util/mergeresultsbyset.cpp)."""
    p = argparse.ArgumentParser(prog="spacepharer mergeresultsbyset")
    p.add_argument("aggregateTSV", help="rows keyed by query ORF")
    p.add_argument("querySetDB")
    p.add_argument("output")
    args = p.parse_args(argv)
    from .stats.aggregation import merge_results_by_set
    qdb = SetDB.load(args.querySetDB)
    set_to_members = {}
    for okey in range(qdb.n_orfs):
        set_to_members.setdefault(int(qdb.orf_to_set[okey]), []).append(okey)
    out = merge_results_by_set(read_entries(args.aggregateTSV),
                               dict(sorted(set_to_members.items())))
    write_entries(out, args.output)
    return 0


def cmd_filtermatchbyfdr(argv):
    """filtermatchbyfdr <cscore.tsv> <cscore_rev.tsv> <out.tsv> — FDR
    calibration against the null scores (src/util/FilterMatchbyFdr.cpp)."""
    p = argparse.ArgumentParser(prog="spacepharer filtermatchbyfdr")
    p.add_argument("posTSV")
    p.add_argument("negTSV")
    p.add_argument("output")
    p.add_argument("--fdr", type=float, default=0.05)
    p.add_argument("--fdr-pval", dest="report_fdr", type=int, default=0,
                   choices=(0, 1))
    args = p.parse_args(argv)
    from .stats.fdr import filter_match_by_fdr
    out, messages = filter_match_by_fdr(
        read_entries(args.posTSV), read_entries(args.negTSV), args.fdr,
        bool(args.report_fdr))
    write_entries(out, args.output)
    for msg in messages:
        print(msg)
    return 0


def cmd_truncatebesthits(argv):
    """truncatebesthits <aggregate.tsv> <querySetDB> <out.tsv> — column
    rearrangement for the report path (src/util/TruncateBestHits.cpp)."""
    p = argparse.ArgumentParser(prog="spacepharer truncatebesthits")
    p.add_argument("aggregateTSV", help="best-hit rows keyed by query ORF")
    p.add_argument("querySetDB")
    p.add_argument("output")
    args = p.parse_args(argv)
    from .report.offsets import truncate_best_hits
    qdb = SetDB.load(args.querySetDB)
    q_set_size_of = {okey: int(qdb.set_size[qdb.orf_to_set[okey]])
                     for okey in range(qdb.n_orfs)}
    out = truncate_best_hits(read_entries(args.aggregateTSV), q_set_size_of)
    write_entries(out, args.output)
    return 0


def cmd_proteinaln2nucl(argv):
    """proteinaln2nucl <prot.tsv> <querySetDB> <targetSetDB> <out.tsv> —
    re-score protein alignments on the ORF nucleotides
    (lib/mmseqs/src/util/proteinaln2nucl.cpp)."""
    p = argparse.ArgumentParser(prog="spacepharer proteinaln2nucl")
    p.add_argument("protTSV", help="alignment rows keyed by query ORF")
    p.add_argument("querySetDB")
    p.add_argument("targetSetDB")
    p.add_argument("output")
    p.add_argument("--gap-open", type=int, default=10)
    p.add_argument("--gap-extend", type=int, default=2)
    args = p.parse_args(argv)
    import numpy as np
    from .ops.evalue import EvalueComputer, gumbel_params
    from .report.nuclaln import protein_aln_to_nucl
    qdb = SetDB.load(args.querySetDB)
    tdb = SetDB.load(args.targetSetDB)
    prot = read_entries(args.protTSV)
    q_nucl = {k: qdb.orf_nucl(k) for k in prot.keys()}
    t_nucl = {int(r[0]): None for rows in prot.values() for r in rows}
    for tkey in t_nucl:
        t_nucl[tkey] = tdb.orf_nucl(tkey)
    evaluer = EvalueComputer(
        gumbel_params("nucleotide.out", args.gap_open, args.gap_extend),
        int(np.diff(tdb.orf_nucl_offsets).sum()))
    out = protein_aln_to_nucl(prot, q_nucl, t_nucl, evaluer,
                              args.gap_open, args.gap_extend)
    write_entries(out, args.output)
    return 0


def cmd_combineprotnuclaln(argv):
    """combineprotnuclaln <prot.tsv> <nucl.tsv> <out.tsv> — merge the
    protein and nucleotide scores (src/util/CombineProtNuclAln.cpp)."""
    p = argparse.ArgumentParser(prog="spacepharer combineprotnuclaln")
    p.add_argument("protTSV")
    p.add_argument("nuclTSV")
    p.add_argument("output")
    args = p.parse_args(argv)
    from .report.nuclaln import combine_prot_nucl
    out = combine_prot_nucl(read_entries(args.protTSV),
                            read_entries(args.nuclTSV))
    write_entries(out, args.output)
    return 0


def cmd_findpam(argv):
    """findpam <aln.tsv> <targetSetDB> <out.tsv> — scan flanking
    regions for PAM motifs (src/util/FindPam.cpp)."""
    p = argparse.ArgumentParser(prog="spacepharer findpam")
    p.add_argument("alnTSV", help="offset alignment rows keyed by query set")
    p.add_argument("targetSetDB")
    p.add_argument("output")
    args = p.parse_args(argv)
    from .report.pam import find_pam
    tdb = SetDB.load(args.targetSetDB)
    out = find_pam(read_entries(args.alnTSV), tdb)
    write_entries(out, args.output)
    return 0


def cmd_summarizeresults(argv):
    """summarizeresults <match.tsv> <aln.tsv> <output> — final report
    assembly (src/util/SummarizeResults.cpp)."""
    p = argparse.ArgumentParser(prog="spacepharer summarizeresults")
    p.add_argument("matchTSV")
    p.add_argument("alnTSV")
    p.add_argument("output")
    p.add_argument("--format-output", dest="fmt", type=int, default=1,
                   choices=(0, 1, 2))
    p.add_argument("--fdr-pval", dest="report_fdr", type=int, default=0,
                   choices=(0, 1))
    args = p.parse_args(argv)
    from .report.summarize import summarize_results
    text = summarize_results(read_entries(args.matchTSV),
                             read_entries(args.alnTSV),
                             args.fmt, bool(args.report_fdr))
    with open(args.output, "w") as fh:
        fh.write(text)
    return 0


def cmd_restrictranks(argv):
    """restrictranks <tax.tsv> <match_swapped.tsv> <out.tsv> — clamp
    per-target LCA by average sequence identity (src/util/RestrictRanks.cpp)."""
    p = argparse.ArgumentParser(prog="spacepharer restrictranks")
    p.add_argument("taxTSV", help="per-target tax rows (one per key)")
    p.add_argument("matchTSV", help="[qset, score, seqId] rows per target set")
    p.add_argument("output")
    p.add_argument("--ncbi-tax-dump", required=True)
    p.add_argument("--rank-min-seq-ids", type=str,
                   default="0.86,0.84,0.82,0.80,0.78,0.76,0.74,0.72")
    args = p.parse_args(argv)
    from .tax.lcasteps import restrict_ranks
    from .tax.ncbi import DEFAULT_RANKS, load_taxonomy
    taxonomy = load_taxonomy(args.ncbi_tax_dump)
    thresholds = tuple(float(x) for x in args.rank_min_seq_ids.split(","))
    out = restrict_ranks(single_row_entries(read_entries(args.taxTSV)),
                         read_entries(args.matchTSV), taxonomy,
                         DEFAULT_RANKS.split(","), thresholds)
    write_entries({k: [v] for k, v in out.items()}, args.output)
    return 0


def cmd_combinepvalperset(argv):
    """combinepvalperset <mergedBestHit.tsv> <querySetDB> <targetSetDB>
    <out.tsv> — MMseqs2's generic set-P-value aggregator
    (lib/mmseqs/src/multihit/combinepvalperset.cpp)."""
    p = argparse.ArgumentParser(prog="spacepharer combinepvalperset")
    p.add_argument("mergedTSV", help="best-hit rows merged by query set")
    p.add_argument("querySetDB")
    p.add_argument("targetSetDB")
    p.add_argument("output")
    p.add_argument("--aggregation-mode", type=int, default=0,
                   choices=(0, 1, 2, 3))
    p.add_argument("--alpha", type=float, default=1.0)
    args = p.parse_args(argv)
    from .stats.aggregation import combine_pval_per_set
    qdb = SetDB.load(args.querySetDB)
    tdb = SetDB.load(args.targetSetDB)
    merged = read_entries(args.mergedTSV)
    out = {qset: combine_pval_per_set(rows, int(qdb.set_size[qset]),
                                      tdb.n_sets, tdb.orf_to_set,
                                      args.alpha, args.aggregation_mode)
           for qset, rows in merged.items()}
    write_entries(out, args.output)
    return 0


EXPERT_COMMANDS = {
    "reverseseqbycodon": cmd_reverseseqbycodon,
    "combinepvalperset": cmd_combinepvalperset,
    "empiricalpval": cmd_empiricalpval,
    "besthitperset": cmd_besthitperset,
    "mergeresultsbyset": cmd_mergeresultsbyset,
    "combinescore": cmd_combinescore,
    "filtermatchbyfdr": cmd_filtermatchbyfdr,
    "truncatebesthits": cmd_truncatebesthits,
    "proteinaln2nucl": cmd_proteinaln2nucl,
    "combineprotnuclaln": cmd_combineprotnuclaln,
    "findpam": cmd_findpam,
    "summarizeresults": cmd_summarizeresults,
    "restrictranks": cmd_restrictranks,
}
