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
    if simple_best_hit and len(entry_rows) > 8:
        # vectorized fast path of the simple mode: parse keys/E-values
        # in C, group by ascending set, first-min per group (the same
        # strict-improvement rule as the loop below); the log
        # correction stays scalar math per group for bit-parity
        import numpy as np
        tkeys = np.asarray([r[0] for r in entry_rows], dtype=np.int64)
        evs = np.asarray([r[3] for r in entry_rows], dtype=np.float64)
        sets = np.asarray(target_member_to_set)[tkeys]
        order = np.argsort(sets, kind="stable")
        so = sets[order]
        eo = evs[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], so[1:] != so[:-1])))
        bounds = np.append(bounds, len(so))
        out = []
        for gi in range(len(bounds) - 1):
            lo, hi = int(bounds[gi]), int(bounds[gi + 1])
            rel = int(np.argmin(eo[lo:hi]))      # first min wins
            best_eval = float(eo[lo + rel])
            best_row = entry_rows[int(order[lo + rel])]
            if best_eval == 0:
                log_corr = math.log(DBL_MIN)
            elif 0 < best_eval < 10e-4:
                log_corr = math.log(best_eval)
            else:
                log_corr = math.log(1 - math.exp(-best_eval))
            new_row = list(best_row)
            new_row[1] = fmt_e3(log_corr)
            out.append(new_row)
        return out
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


def _precompute_log_b(orf_count: int, pval_threshold: float):
    """precomputeLogB (combinepvalperset.cpp:17-26), same loop order."""
    log_thr = math.log(pval_threshold)
    log_1m_thr = math.log(1 - pval_threshold)
    # C lgamma(0) = +inf (Python's raises); index 0 is never a binomial
    # argument but the reference table holds inf there
    lgam = [math.inf] + [math.lgamma(i) for i in range(1, orf_count + 2)]
    log_b = [0.0] * orf_count
    log_b[orf_count - 1] = orf_count * log_thr
    for i in range(orf_count - 2, -1, -1):
        k = i + 1
        log_new = (lgam[orf_count + 1] - lgam[orf_count - k + 1]
                   - lgam[k + 1]) + k * log_thr + (orf_count - k) * log_1m_thr
        log_b[i] = log_b[i + 1] + math.log(1 + math.exp(log_new - log_b[i + 1]))
    return log_b


AGGREGATION_MODE_MULTIHIT = 0
AGGREGATION_MODE_MIN_PVAL = 1
AGGREGATION_MODE_PRODUCT = 2
AGGREGATION_MODE_TRUNCATED_PRODUCT = 3


def combine_pval_per_set(entry_rows, query_orf_count: int,
                         n_target_sets: int, target_member_to_set,
                         alpha: float, mode: int):
    """MMseqs2's generic set-P-value aggregator
    (lib/mmseqs/src/multihit/combinepvalperset.cpp:88-223), the design
    template SpacePHARER's combinescore was derived from. One query
    set's merged best-hit rows -> [[tset, value], ...] with the modes:
    0 multihit (truncated Fisher), 1 min-P, 2 product, 3 (modified)
    truncated product. Values formatted like SSTR (%.3E doubles,
    integer counts verbatim)."""
    orf_count = query_orf_count
    out = []
    log_b = None
    for tset, rows in group_by_target_set(entry_rows, target_member_to_set).items():
        if mode == AGGREGATION_MODE_MULTIHIT:
            thr = alpha / (orf_count + 1)
            if thr == 0.0:
                out.append([str(tset), str(n_target_sets)])
                continue
            log_thr = math.log(thr)
            k = 0
            r = 0.0
            for row in rows:
                log_pval = float(row[1])
                if log_pval < log_thr:
                    k += 1
                    r -= log_pval - log_thr
            if r == 0:
                out.append([str(tset), str(n_target_sets)])
                continue
            if math.isinf(r):
                out.append([str(tset), "0"])
                continue
            exp_minus_r = math.exp(-r)
            if thr == 1.0:
                out.append([str(tset), fmt_e3(exp_minus_r * n_target_sets)])
                continue
            if log_b is None:
                log_b = _precompute_log_b(orf_count, thr)
            log_r = math.log(r)
            fisher = 0.0
            for i in range(orf_count):
                fisher += math.exp(i * log_r - math.lgamma(i + 1) + log_b[i])
            pval = exp_minus_r * fisher
        elif mode == AGGREGATION_MODE_MIN_PVAL:
            min_log = 0.0
            for row in rows:
                lp = float(row[1])
                if lp < min_log:
                    min_log = lp
            pval = 1 - math.exp(-math.exp(min_log) * orf_count)
        elif mode == AGGREGATION_MODE_PRODUCT:
            pval = math.exp(sum(float(row[1]) for row in rows))
        elif mode == AGGREGATION_MODE_TRUNCATED_PRODUCT:
            log_thr = math.log(alpha / (orf_count + 1))
            for row in rows:
                seq_id = float(row[2])
                q_start, q_end, q_len = int(row[4]), int(row[5]), int(row[6])
                q_cov = 1.0 * (q_end - q_start + 1) / q_len
                if seq_id == 1.0 and q_cov == 1.0:
                    lp = float(row[1])
                    log_thr = log_thr if lp < log_thr else lp
            min_log = 0.0
            sum_log = 0.0
            k = 0
            for row in rows:
                lp = float(row[1])
                if lp < min_log:
                    # same -0.0 / sign quirk as combinescore's fallback
                    min_log = lp if lp == 0 else -lp
                if lp < log_thr:
                    sum_log -= lp - log_thr
                    k += 1
            if k == 0:
                out.append([str(tset), fmt_e3(min_log)])
            else:
                out.append([str(tset), fmt_e3(sum_log - log_thr)])
            continue
        else:
            raise ValueError(f"invalid aggregation mode {mode}")
        out.append([str(tset), fmt_e3(pval * n_target_sets)])
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
    if len(entry_rows) > 8:
        # vectorized parse + grouping; the order-dependent fallback
        # accumulation below stays a scalar walk over the floats
        import numpy as np
        tkeys = np.asarray([r[0] for r in entry_rows], dtype=np.int64)
        lps = np.asarray([r[1] for r in entry_rows], dtype=np.float64)
        sids = np.asarray([r[2] for r in entry_rows], dtype=np.float64)
        sets = np.asarray(target_member_to_set)[tkeys]
        order = np.argsort(sets, kind="stable")
        so = sets[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], so[1:] != so[:-1])))
        bounds = np.append(bounds, len(so))
        lpo = lps[order].tolist()
        sio = sids[order].tolist()
        groups = [(int(so[int(bounds[g])]),
                   list(zip(lpo[int(bounds[g]):int(bounds[g + 1])],
                            sio[int(bounds[g]):int(bounds[g + 1])])))
                  for g in range(len(bounds) - 1)]
    else:
        groups = [(tset, [(float(r[1]), float(r[2])) for r in rows])
                  for tset, rows in group_by_target_set(
                      entry_rows, target_member_to_set).items()]
    for tset, vals in groups:
        min_log_pval = 0.0
        min_seq_id = 0.0
        sum_log_pval = 0.0
        sum_seq_id = 0.0
        k = 0
        for log_pval, seq_id in vals:
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
