"""Set-level hit aggregation: best-hit P-values and combined scores.

Parity targets:
  Aggregation::run/buildMap (lib/mmseqs/src/multihit/Aggregation.cpp:24-91):
    group an entry's rows by target set (ascending set key, std::map) and
    aggregate per (query entry, target set).
  besthitperset (lib/mmseqs/src/multihit/besthitperset.cpp:29-115):
    keep the row with the lowest E-value; replace column 1 with
    log-corrected P: log(DBL_MIN) for E=0, log(E) for E<1e-3, else
    log(1-exp(-E)), formatted %.3E.
  combinescore (src/util/CombineScore.cpp:41-113): truncated-sum S_comb
    with the reference's order-dependent fallback (minLogPval tracks the
    *last* row with logP < previous state).
  mergeresultsbyset (lib/mmseqs/src/util/mergeresultsbyset.cpp):
    concatenate member rows in ascending member order.

Rows are lists of string fields; keys are integers. This mirrors the
reference's text-record dataflow so number formatting round-trips
exactly.
"""
import math
import sys

DBL_MIN = sys.float_info.min


def fmt_e3(x: float) -> str:
    """C sprintf %.3E (SSTR(double), lib/mmseqs/src/commons/Util.cpp:714-718)."""
    return f"{x:.3E}"


def group_by_target_set(rows, member_to_set):
    """rows -> {target_set_key: [row,...]} in encounter order per set;
    iteration over the dict must be by ascending set key (std::map)."""
    groups = {}
    for row in rows:
        tkey = int(row[0])
        skey = int(member_to_set[tkey])
        groups.setdefault(skey, []).append(row)
    return dict(sorted(groups.items()))


def best_hit_per_set(entry_rows, target_member_to_set, target_set_size,
                     simple_best_hit: bool = True):
    """One query entry's rows -> aggregated rows (one per target set)."""
    out = []
    for tset, rows in group_by_target_set(entry_rows, target_member_to_set).items():
        best_eval = float("inf")
        best_score = -float("inf")
        second_best = -float("inf")
        best_row = None
        n_genes = int(target_set_size[tset])
        simple = simple_best_hit or len(rows) < 2
        for row in rows:
            ev = float(row[3])
            if simple:
                if best_eval > ev:
                    best_eval = ev
                    best_row = row
            else:
                pval = ev / n_genes
                if pval == 0:
                    pval = DBL_MIN
                score = -math.log(pval)
                if score >= best_score:
                    second_best = best_score
                    best_score = score
                    best_row = row
                elif score > second_best:
                    second_best = score
        if simple:
            if best_eval == 0:
                log_corr = math.log(DBL_MIN)
            elif 0 < best_eval < 10e-4:
                log_corr = math.log(best_eval)
            else:
                log_corr = math.log(1 - math.exp(-best_eval))
        else:
            log_corr = second_best - best_score
        if best_row is None:
            continue
        new_row = list(best_row)
        new_row[1] = fmt_e3(log_corr)
        out.append(new_row)
    return out


def merge_results_by_set(entries: dict, set_to_members: dict) -> dict:
    """{member_key: rows} -> {set_key: concatenated rows}."""
    out = {}
    for skey, members in set_to_members.items():
        rows = []
        for m in members:
            rows.extend(entries.get(m, []))
        out[skey] = rows
    return out


def combine_score(entry_rows, query_set_size_of_entry: int,
                  target_member_to_set):
    """One query set's merged rows -> [[tset, S_comb, avgSeqId], ...].

    S_comb per CombineScore.cpp:41-98: threshold log(1/(orfCount+1));
    sum of exceedances minus the threshold, else the order-dependent
    fallback -logP of the last qualifying row.
    """
    orf_count = query_set_size_of_entry
    log_thr = math.log(1.0 / (orf_count + 1))
    out = []
    for tset, rows in group_by_target_set(entry_rows, target_member_to_set).items():
        min_log_pval = 0.0
        min_seq_id = 0.0
        sum_log_pval = 0.0
        sum_seq_id = 0.0
        k = 0
        for row in rows:
            log_pval = float(row[1])
            seq_id = float(row[2])
            if log_pval < min_log_pval:
                # reference quirk: stores -logP, making the comparison
                # true for every subsequent negative logP — the fallback
                # effectively tracks the last such row
                if log_pval == 0:
                    min_log_pval = log_pval
                    min_seq_id = seq_id
                else:
                    min_log_pval = -log_pval
                    min_seq_id = seq_id
            if log_pval < log_thr:
                sum_log_pval -= log_pval - log_thr
                sum_seq_id += seq_id
                k += 1
        if k == 0:
            out.append([str(tset), fmt_e3(min_log_pval), fmt_e3(min_seq_id)])
        else:
            out.append([str(tset), fmt_e3(sum_log_pval - log_thr),
                        fmt_e3(sum_seq_id / k)])
    return out
