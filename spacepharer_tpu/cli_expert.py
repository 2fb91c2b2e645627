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


def cmd_prefilter(argv):
    """prefilter <querySetDB> <targetSetDB> <out.tsv> — k-mer prefilter
    rows [target, score, diagonal] per query ORF
    (lib/mmseqs/src/prefiltering, byte-parity engine)."""
    p = argparse.ArgumentParser(prog="spacepharer prefilter")
    p.add_argument("querySetDB")
    p.add_argument("targetSetDB")
    p.add_argument("output")
    p.add_argument("-s", "--sensitivity", type=float, default=5.7)
    p.add_argument("-k", "--kmer-size", type=int, default=6)
    p.add_argument("--spaced-kmer-pattern", type=str, default="11011101")
    p.add_argument("--max-seqs", type=int, default=300)
    p.add_argument("--mask", type=int, default=1, choices=(0, 1))
    p.add_argument("--comp-bias-corr", type=int, default=1, choices=(0, 1))
    args = p.parse_args(argv)
    import numpy as np
    from .ops.bias import local_aa_bias_batch
    from .ops.matrices import load_matrix
    from .ops.prefilter import (PrefilterParams, SimilarKmerEnumerator,
                                build_target_index, prefilter_query)
    qdb = SetDB.load(args.querySetDB)
    tdb = SetDB.load(args.targetSetDB)
    pp = PrefilterParams(
        kmer_size=args.kmer_size, spaced_pattern=args.spaced_kmer_pattern,
        sensitivity=args.sensitivity, max_seqs=args.max_seqs,
        mask=bool(args.mask), comp_bias_corr=bool(args.comp_bias_corr))
    t_flat, t_off = tdb.orf_aa_encoded()
    t_aa = [t_flat[t_off[i]:t_off[i + 1]] for i in range(tdb.n_orfs)]
    index = build_target_index(t_aa, pp, packed=(t_flat, t_off))
    seed_m = load_matrix(pp.seed_matrix, 8.0)
    enumerator = SimilarKmerEnumerator(seed_m.scores)
    q_flat, q_off = qdb.orf_aa_encoded()
    q_all = [q_flat[q_off[k]:q_off[k + 1]] for k in range(qdb.n_orfs)]
    if pp.comp_bias_corr:
        biases = local_aa_bias_batch(q_all, seed_m)
    else:
        biases = [np.zeros(len(q)) for q in q_all]
    out = {}
    for qk, q in enumerate(q_all):
        hits = prefilter_query(q, index, pp, enumerator=enumerator,
                               bias80=biases[qk])
        out[qk] = [[str(h.target), str(h.score), str(h.diagonal)]
                   for h in hits]
    write_entries(out, args.output)
    n = sum(len(v) for v in out.values())
    print(f"prefilter: {n} hits over {len(out)} queries -> {args.output}")
    return 0


def cmd_rescorediagonal(argv):
    """rescorediagonal <pref.tsv> <querySetDB> <targetSetDB> <out.tsv> —
    ungapped rescoring along the prefilter diagonal
    (lib/mmseqs/src/alignment/rescorediagonal.cpp; modes 0 hamming,
    1 substitution, 2 local alignment, 3 global alignment)."""
    p = argparse.ArgumentParser(prog="spacepharer rescorediagonal")
    p.add_argument("prefTSV", help="prefilter rows keyed by query ORF")
    p.add_argument("querySetDB")
    p.add_argument("targetSetDB")
    p.add_argument("output")
    p.add_argument("--rescore-mode", type=int, default=0,
                   choices=(0, 1, 2, 3))
    p.add_argument("-e", "--evalue", type=float, default=0.001)
    p.add_argument("--min-seq-id", type=float, default=0.0)
    p.add_argument("-c", "--cov", type=float, default=0.0)
    p.add_argument("--min-aln-len", type=int, default=0)
    p.add_argument("--seq-id-mode", type=int, default=0, choices=(0, 1, 2))
    p.add_argument("-a", "--add-backtrace", action="store_true")
    p.add_argument("--sub-mat", type=str, default="VTML40.out")
    args = p.parse_args(argv)
    import numpy as np
    from .ops.matrices import load_matrix
    from .ops.rescore import ascii_submat, rescore_rows
    qdb = SetDB.load(args.querySetDB)
    tdb = SetDB.load(args.targetSetDB)
    m = load_matrix(args.sub_mat, 2.0)
    amat = ascii_submat(m)
    db_res = int(tdb.orf_aa_offsets[-1])
    pref = read_entries(args.prefTSV)
    out = {}
    for qk, rows in pref.items():
        out[qk] = rescore_rows(
            rows, qdb.orf_aa(qk), tdb.orf_aa, args.sub_mat, m, db_res,
            rescore_mode=args.rescore_mode, e_thr=args.evalue,
            seq_id_thr=args.min_seq_id, cov_thr=args.cov,
            aln_len_thr=args.min_aln_len, seq_id_mode=args.seq_id_mode,
            add_backtrace=args.add_backtrace, amat=amat)
    write_entries(out, args.output)
    n = sum(len(v) for v in out.values())
    print(f"rescorediagonal: {n} rows -> {args.output}")
    return 0


def cmd_searchnucl(argv):
    """searchnucl <queryFasta> <targetFasta> <out.m8> — blastn-mode
    nucleotide search: exact k-mer candidates + banded ksw2-parity
    gapped alignment (mmseqs search --search-type 3,
    Search.cpp:32-175; kernel parity in tests/test_banded_nucl.py)."""
    p = argparse.ArgumentParser(prog="spacepharer searchnucl")
    p.add_argument("queryFasta")
    p.add_argument("targetFasta")
    p.add_argument("output")
    p.add_argument("-e", "--evalue", type=float, default=1e-3)
    p.add_argument("-k", "--kmer-size", type=int, default=15)
    p.add_argument("--max-seqs", type=int, default=300)
    p.add_argument("--gap-open", type=int, default=5)
    p.add_argument("--gap-extend", type=int, default=2)
    p.add_argument("--zdrop", type=int, default=40)
    p.add_argument("--strand", type=int, default=2, choices=(0, 1, 2),
                   help="0: minus, 1: plus, 2: both")
    args = p.parse_args(argv)
    from .ops.evalue import gumbel_params
    try:
        gumbel_params("nucleotide.out", args.gap_open, args.gap_extend)
    except ValueError:
        p.error(f"Invalid argument: no embedded Gumbel parameters for "
                f"nucleotide gap costs {args.gap_open}/{args.gap_extend} "
                "(embedded: 5/2, 10/2, 16/2); extract them via ALP and "
                "add to spacepharer_tpu.ops.evalue._PARAMS")
    from .io.fasta import iter_fasta
    from .pipeline.searchnucl import search_nucl
    q_entries = [(e.name, e.seq) for e in iter_fasta(args.queryFasta)]
    t_entries = [(e.name, e.seq) for e in iter_fasta(args.targetFasta)]
    res = search_nucl(q_entries, t_entries, k=args.kmer_size,
                      evalue=args.evalue, gap_open=args.gap_open,
                      gap_extend=args.gap_extend, zdrop=args.zdrop,
                      max_seqs=args.max_seqs, strand=args.strand)
    n = 0
    with open(args.output, "w") as fh:
        for qname, _ in q_entries:
            for h in res.get(qname, []):
                fh.write(h.m8_row() + "\n")
                n += 1
    print(f"searchnucl: {n} hits over {len(q_entries)} queries "
          f"-> {args.output}")
    return 0


def cmd_createbintaxonomy(argv):
    """createbintaxonomy <taxdumpDir> — persist the parsed NCBI
    taxdump as a binary cache (lib/mmseqs/src/taxonomy/
    createbintaxonomy.cpp analog); later taxonomy loads skip the
    dmp text parse."""
    p = argparse.ArgumentParser(prog="spacepharer createbintaxonomy")
    p.add_argument("taxdumpDir")
    args = p.parse_args(argv)
    from .tax.ncbi import create_bin_taxonomy
    path = create_bin_taxonomy(args.taxdumpDir)
    print(f"createbintaxonomy: wrote {path}")
    return 0


def cmd_convertsetdb(argv):
    """convertsetdb <refSetDBprefix> <outSetDB> — import a
    reference-built createsetdb bundle (data/createsetdb.sh:39-170
    layout: OUTDB + _nucl + _nucl_orf + maps + _set_size [+ tax
    mappings]) into a packed SetDB directory. predictmatch and
    easy-predict also read the reference layout directly (SetDB.load
    falls back to this importer); converting persists the packed form
    so later loads skip the text-DB parse."""
    p = argparse.ArgumentParser(prog="spacepharer convertsetdb")
    p.add_argument("refSetDB")
    p.add_argument("outSetDB")
    p.add_argument("--tax-dump-dir", default=None,
                   help="NCBI taxdump dir for downstream LCA output")
    args = p.parse_args(argv)
    db = SetDB.from_mmseqs(args.refSetDB, taxdump_dir=args.tax_dump_dir)
    db.save(args.outSetDB)
    print(f"convertsetdb: {db.n_sets} sets, {db.n_contigs} contigs, "
          f"{db.n_orfs} ORFs -> {args.outSetDB}"
          + (" (control DB)" if db.is_control else ""))
    return 0


EXPERT_COMMANDS = {
    "convertsetdb": cmd_convertsetdb,
    "createbintaxonomy": cmd_createbintaxonomy,
    "reverseseqbycodon": cmd_reverseseqbycodon,
    "combinepvalperset": cmd_combinepvalperset,
    "prefilter": cmd_prefilter,
    "rescorediagonal": cmd_rescorediagonal,
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
    "searchnucl": cmd_searchnucl,
}
