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
    from ..native import get_lib
    lib = get_lib()
    if lib is not None:
        return _rescore_native(lib, entries, q_nucl_seqs, t_nucl_seqs,
                               nucl_m, evaluer, gap_open, gap_extend)
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
            for c in (row[10] if len(row) > 10 else ""):
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


def _rescore_native(lib, entries, q_nucl_seqs, t_nucl_seqs, nucl_m,
                    evaluer, gap_open, gap_extend):
    """nucl_rescore_batch path of protein_aln_to_nucl: one C walk over
    every row's compressed backtrace, then ONE vectorized E-value /
    bit-score call. Row-identical to the Python path."""
    from ..alphabet import encode_nucl as _enc

    # one pass over the rows collects pool indices and the string
    # fields; ints parse in BULK via numpy (the per-row
    # int()/fromiter staging was ~half the nucl-merge wall at
    # catalog scale)
    q_pool_idx = {}
    t_pool_idx = {}
    pool_parts = []
    staged = []     # (qkey, row)
    qp_l, tp_l = [], []
    qs_l, ts_l = [], []
    bt_parts = []
    for qkey, rows in entries.items():
        if not rows:
            continue
        qp = q_pool_idx.get(qkey)
        if qp is None:
            qp = len(pool_parts)
            pool_parts.append(np.asarray(q_nucl_seqs[qkey],
                                         dtype=np.uint8))
            q_pool_idx[qkey] = qp
        for row in rows:
            tkey = row[0]            # string key: parse once per target
            tp = t_pool_idx.get(tkey)
            if tp is None:
                tp = len(pool_parts)
                pool_parts.append(np.asarray(t_nucl_seqs[int(tkey)],
                                             dtype=np.uint8))
                t_pool_idx[tkey] = tp
            staged.append((qkey, row))
            qp_l.append(qp)
            tp_l.append(tp)
            qs_l.append(row[4])
            ts_l.append(row[7])
            bt_parts.append(row[10].encode("ascii")
                            if len(row) > 10 else b"")

    out = {qkey: [] for qkey in entries}
    n = len(staged)
    if n == 0:
        return out
    pool_off = np.zeros(len(pool_parts) + 1, dtype=np.int64)
    np.cumsum([len(p) for p in pool_parts], out=pool_off[1:])
    pool = (np.concatenate(pool_parts) if pool_off[-1]
            else np.zeros(1, np.uint8))
    row_qpool = np.asarray(qp_l, dtype=np.int32)
    row_tpool = np.asarray(tp_l, dtype=np.int32)
    row_qstart = np.asarray(qs_l).astype(np.int32) * 3
    row_tstart = np.asarray(ts_l).astype(np.int32) * 3
    bt_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum([len(b) for b in bt_parts], out=bt_off[1:])
    bt_flat = np.frombuffer(b"".join(bt_parts), dtype=np.uint8)
    new_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(2 * np.diff(bt_off) + 4, out=new_off[1:])
    new_bt = np.empty(int(new_off[-1]) + 1, dtype=np.uint8)
    enc_lut = np.ascontiguousarray(
        _enc(np.arange(256, dtype=np.uint8)), dtype=np.uint8)
    mat = np.ascontiguousarray(nucl_m.scores, dtype=np.int32)
    o_score = np.empty(n, dtype=np.int64)
    o_ids = np.empty(n, dtype=np.int32)
    o_alnlen = np.empty(n, dtype=np.int32)
    o_btlen = np.empty(n, dtype=np.int32)
    lib.nucl_rescore_batch(
        pool.ctypes.data, pool_off.ctypes.data,
        row_qpool.ctypes.data, row_tpool.ctypes.data, n,
        row_qstart.ctypes.data, row_tstart.ctypes.data,
        bt_flat.ctypes.data, bt_off.ctypes.data,
        enc_lut.ctypes.data, mat.ctypes.data, mat.shape[1],
        gap_open, gap_extend,
        o_score.ctypes.data, o_ids.ctypes.data, o_alnlen.ctypes.data,
        new_bt.ctypes.data, new_off.ctypes.data, o_btlen.ctypes.data)

    qlens = (pool_off[row_qpool + 1] - pool_off[row_qpool]).astype(np.int64)
    tlens = (pool_off[row_tpool + 1] - pool_off[row_tpool]).astype(np.int64)
    bit_scores = evaluer.bit_score(o_score)
    evalues = evaluer.evalue(o_score, qlens)
    bits_i = np.trunc(bit_scores).astype(np.int64)   # C truncation
    with np.errstate(invalid="ignore"):
        fs = (o_ids / np.maximum(o_alnlen, 1)).astype(np.float32)
    fs = np.where(o_alnlen > 0, fs, np.float32(0.0))
    # vectorized fastSeqIdToBuffer pieces (format_seq_id semantics)
    mill = (fs * np.float32(1000)).astype(np.int64)
    is_one = fs == np.float32(1.0)
    lt10 = fs < np.float32(0.10)
    lt01 = fs < np.float32(0.01)
    ev_l = evalues.tolist()
    qs_l = row_qstart.tolist()
    ts_l = row_tstart.tolist()
    ql_l = qlens.tolist()
    tl_l = tlens.tolist()
    bits_l = bits_i.tolist()
    nb = new_bt.tobytes()
    for i, (qkey, row) in enumerate(staged):
        if is_one[i]:
            sid = "1.00"
        else:
            sid = ("0.00" if lt01[i] else "0.0" if lt10[i] else "0.") \
                + str(int(mill[i]))
        out[qkey].append([
            row[0], str(bits_l[i]), sid,
            f"{ev_l[i]:.3E}",
            str(qs_l[i]), str(int(row[5]) * 3 + 2), str(ql_l[i]),
            str(ts_l[i]), str(int(row[8]) * 3 + 2), str(tl_l[i]),
            nb[new_off[i]:new_off[i] + o_btlen[i]].decode("ascii")])
    return out


def combine_prot_nucl(prot_entries: dict, nucl_entries: dict) -> dict:
    """Merge protein and nucleotide alignments per CombineProtNuclAln.cpp."""
    out = {}
    FLT_MAX = 3.4028234663852886e38
    # pass 1: collect every (prot, nucl) pair's string floats, parse
    # them in one C-level np.asarray call, compute the combined
    # E-values vectorized (same float ops elementwise)
    staged = []                   # (qkey, prow, pair_idx or -1)
    pe_s, ne_s, nsid_s = [], [], []
    for qkey, prot_rows in prot_entries.items():
        nucl_rows = nucl_entries.get(qkey)
        if nucl_rows is None:
            continue
        # last nucl row per target wins, like the reference's full scan
        nucl_by_t = {nrow[0]: nrow for nrow in nucl_rows}
        for prow in prot_rows:
            nrow = nucl_by_t.get(prow[0])
            if nrow is None:
                staged.append((qkey, prow, -1))
            else:
                staged.append((qkey, prow, len(pe_s)))
                pe_s.append(prow[3])
                ne_s.append(nrow[3])
                nsid_s.append(nrow[2])
        out[qkey] = []
    if pe_s:
        pe = np.asarray(pe_s, dtype=np.float64)
        ne = np.asarray(ne_s, dtype=np.float64)
        with np.errstate(divide="ignore"):
            log_p = np.where(pe > 0, np.log(pe), -np.inf)
            log_n = np.where(ne > 0, np.log(ne), -np.inf)
        mean_log = log_p * 0.5 + log_n * 0.5
        with np.errstate(over="ignore", invalid="ignore"):
            upd = np.where(mean_log < log_n, np.exp(mean_log), ne)
        upd_l = upd.tolist()
    for qkey, prow, pi in staged:
        if pi < 0:
            out[qkey].append([prow[0], prow[1], fmt_e3(0.0),
                              fmt_e3(FLT_MAX)] + list(prow[4:]))
        else:
            out[qkey].append([prow[0], prow[1], fmt_e3(float(nsid_s[pi])),
                              fmt_e3(upd_l[pi])] + list(prow[4:]))
    return out
