"""Nucleotide-level re-scoring of protein alignments.

Parity targets:
  proteinaln2nucl (lib/mmseqs/src/util/proteinaln2nucl.cpp:60-203):
    walk the protein backtrace at 3x against the ORF nucleotide
    sequences, score with the nucleotide matrix and nucl gap costs,
    recompute E-value/bit-score/seqId, coordinates x3.
  combineprotnuclaln (src/util/CombineProtNuclAln.cpp:13-107):
    E <- exp(mean of logs) if smaller than the nucleotide E, else the
    nucleotide E; seqId column replaced by the nucleotide seqId.
"""
import math

import numpy as np

from ..alphabet import encode_nucl
from ..ops.align import format_seq_id
from ..ops.evalue import EvalueComputer
from ..ops.matrices import load_nucleotide_matrix
from ..stats.aggregation import fmt_e3


def protein_aln_to_nucl(entries: dict, q_nucl_seqs, t_nucl_seqs,
                        evaluer: EvalueComputer,
                        gap_open: int = 10, gap_extend: int = 2) -> dict:
    """{query_orf: [11-col rows]} -> nucleotide-rescored rows.

    q_nucl_seqs/t_nucl_seqs: callables or lists giving the ORF
    nucleotide sequences (uint8 ASCII) by key.
    """
    nucl_m = load_nucleotide_matrix()
    t_cache = {}

    def _t(tkey):
        hit = t_cache.get(tkey)
        if hit is None:
            t_nucl = np.asarray(t_nucl_seqs[tkey])
            hit = (t_nucl, encode_nucl(t_nucl))
            t_cache[tkey] = hit
        return hit

    # pass 1: score every row (integer arithmetic, M runs vectorized
    # over slices), collecting scores for one vectorized E-value call
    staged = []            # (qkey, row, q_start.., score, id_cnt, aln_len)
    scores = []
    qlens = []
    for qkey, rows in entries.items():
        if not rows:
            continue
        q_nucl = np.asarray(q_nucl_seqs[qkey])
        q_num = encode_nucl(q_nucl)
        for row in rows:
            tkey = int(row[0])
            t_nucl, t_num = _t(tkey)
            q_start = int(row[4]) * 3
            t_start = int(row[7]) * 3

            score = 0
            id_cnt = 0
            aln_len = 0
            qp, tp = q_start, t_start
            new_bt_parts = []
            # run-length walk of the compressed form, counts x3
            cnt = 0
            for c in row[10]:
                if c.isdigit():
                    cnt = cnt * 10 + int(c)
                    continue
                n = cnt if cnt else 1
                if c == "M":
                    n3 = n * 3
                    id_cnt += int(np.count_nonzero(
                        q_nucl[qp:qp + n3] == t_nucl[tp:tp + n3]))
                    score += int(nucl_m.scores[q_num[qp:qp + n3],
                                               t_num[tp:tp + n3]].sum())
                    qp += n3
                    tp += n3
                elif c == "D":
                    tp += n * 3
                    score -= gap_open + ((n - 1) * 3) * gap_extend
                elif c == "I":
                    qp += n * 3
                    score -= gap_open + ((n - 1) * 3) * gap_extend
                aln_len += n * 3
                new_bt_parts.append(f"{n * 3}{c}")
                cnt = 0
            staged.append((qkey, row, q_start, t_start, len(q_nucl),
                           len(t_nucl), id_cnt, aln_len,
                           "".join(new_bt_parts)))
            scores.append(score)
            qlens.append(len(q_nucl))

    out = {qkey: [] for qkey in entries}
    if staged:
        sc = np.asarray(scores, dtype=np.int64)
        bit_scores = evaluer.bit_score(sc)
        evalues = evaluer.evalue(sc, np.asarray(qlens, dtype=np.int64))
        for i, (qkey, row, q_start, t_start, lq, lt, id_cnt, aln_len,
                new_bt) in enumerate(staged):
            bit_score = int(bit_scores[i])  # C truncation
            evalue = float(evalues[i])
            seq_id = (np.float32(id_cnt / aln_len) if aln_len
                      else np.float32(0))
            out[qkey].append([
                row[0], str(bit_score), format_seq_id(float(seq_id)),
                f"{evalue:.3E}", str(q_start), str(int(row[5]) * 3 + 2),
                str(lq), str(t_start), str(int(row[8]) * 3 + 2), str(lt),
                new_bt])
    return out


def combine_prot_nucl(prot_entries: dict, nucl_entries: dict) -> dict:
    """Merge protein and nucleotide alignments per CombineProtNuclAln.cpp."""
    out = {}
    FLT_MAX = 3.4028234663852886e38
    for qkey, prot_rows in prot_entries.items():
        nucl_rows = nucl_entries.get(qkey)
        if nucl_rows is None:
            continue
        # last nucl row per target wins, like the reference's full scan
        nucl_by_t = {nrow[0]: nrow for nrow in nucl_rows}
        merged = []
        for prow in prot_rows:
            tkey = prow[0]
            prot_eval = float(prow[3])
            updated_eval = FLT_MAX
            nucl_seq_id = 0.0
            nrow = nucl_by_t.get(tkey)
            if nrow is not None:
                nucl_seq_id = float(nrow[2])
                nucl_eval = float(nrow[3])
                log_p = math.log(prot_eval) if prot_eval > 0 else -math.inf
                log_n = math.log(nucl_eval) if nucl_eval > 0 else -math.inf
                mean_log = log_p * 0.5 + log_n * 0.5
                updated_eval = (math.exp(mean_log)
                                if mean_log < log_n else nucl_eval)
            merged.append([prow[0], prow[1], fmt_e3(nucl_seq_id),
                           fmt_e3(updated_eval)] + list(prow[4:]))
        out[qkey] = merged
    return out
