"""Gapped Smith-Waterman alignment with reference-exact conventions.

Parity targets:
  SmithWaterman::ssw_align / sw_sse2_byte|word
    (lib/mmseqs/src/alignment/StripedSmithWaterman.cpp:134-278, 301-520):
    affine gaps (first gap residue costs gap_open, further gap_extend),
    end cell = first target column attaining a strictly greater running
    max, min query row within that column; start cell via the reverse
    pass with the same rule.
  SmithWaterman::banded_sw (:781-980): growing-band DP with the exact
    direction-code tie-breaking for the backtrace.
  Matcher::getSWResult (lib/mmseqs/src/alignment/Matcher.cpp:61-187):
    seqId = identities / backtrace length, bit score, E-value.
  Alignment::run / checkCriteria (Alignment.cpp:255-, 555-574):
    acceptance and (eval, score, dbLen, dbKey) result ordering.
"""
from dataclasses import dataclass
from typing import Optional

import numpy as np

from .bias import local_aa_bias
from .evalue import EvalueComputer, gumbel_params
from .matrices import ScoringMatrix, load_matrix

INT_MAX = 2 ** 31 - 1


@dataclass
class AlnParams:
    matrix: str = "VTML40.out"
    gap_open: int = 16
    gap_extend: int = 2
    evalue: float = 200.0
    comp_bias_corr: bool = True
    cov_thr: float = 0.0
    cov_mode: int = 0
    seq_id_thr: float = 0.0
    aln_len_thr: int = 0
    max_accept: int = INT_MAX
    max_rejected: int = INT_MAX
    add_backtrace: bool = True


@dataclass
class AlnResult:
    target: int
    raw_score: int
    bit_score: int
    seq_id: float
    evalue: float
    q_start: int
    q_end: int
    q_len: int
    t_start: int
    t_end: int
    t_len: int
    backtrace: str
    q_cov: float = 0.0
    t_cov: float = 0.0

    def row_fields(self):
        """Text record like Matcher::resultToBuffer (Matcher.cpp:323-369),
        including fastSeqIdToBuffer's formatting (Util.cpp:278-307) and
        its '1.00' quirk (the trailing '0' of '1.000' is overwritten by
        the following tab)."""
        return [str(self.target), str(self.bit_score),
                format_seq_id(self.seq_id), f"{self.evalue:.3E}",
                str(self.q_start), str(self.q_end), str(self.q_len),
                str(self.t_start), str(self.t_end), str(self.t_len),
                compress_backtrace(self.backtrace)]


def format_seq_id(seq_id: float) -> str:
    """fastSeqIdToBuffer: single-precision seqId*1000 truncated."""
    f = np.float32(seq_id)
    if f == np.float32(1.0):
        return "1.00"
    out = "0."
    if f < np.float32(0.10):
        out += "0"
    if f < np.float32(0.01):
        out += "0"
    return out + str(int(f * np.float32(1000)))


def compress_backtrace(bt: str) -> str:
    """Matcher::compressAlignment run-length encoding (Matcher.cpp:214-233)."""
    out = []
    state = "M"  # reference starts in state 'M' with count 0
    count = 0
    for c in bt:
        if c != state:
            out.append(f"{count}{state}")
            state = c
            count = 1
        else:
            count += 1
    out.append(f"{count}{state}")
    return "".join(out)


def decompress_backtrace(cbt: str) -> str:
    out = []
    count = 0
    for c in cbt:
        if c.isdigit():
            count = count * 10 + int(c)
        else:
            out.append(c * (count if count else 1))
            count = 0
    return "".join(out)


def sw_bias_i8(q_num: np.ndarray, matrix: ScoringMatrix) -> np.ndarray:
    """ssw_init's int8 composition bias (StripedSmithWaterman.cpp:700-706)."""
    b = local_aa_bias(q_num, matrix)
    return np.where(b < 0.0, np.ceil(b - 0.5), np.floor(b + 0.5)).astype(np.int64)


def _forward_pass(sub: np.ndarray, gap_open: int, gap_extend: int):
    """Core SW over the substitution-score matrix sub[Lt, Lq].

    Farrar semantics (sw_sse2_byte): H = max(0, diag+S, E, F);
    E(i+1,j) = max(H_pre_lazyF(i,j) - gapO, E(i,j) - gapE) — the E
    update reads H *before* the lazy-F correction, which disallows a
    target-gap directly after a query-gap; all values saturate at 0.
    Returns (score, t_end, q_end) with the reference's tie rules:
    first target column attaining a strictly greater max, min query row
    within that column.
    """
    lt, lq = sub.shape
    H = np.zeros(lq, dtype=np.int64)
    E = np.zeros(lq, dtype=np.int64)
    best = 0
    t_end = -1
    q_end = lq - 1
    jpos = np.arange(lq, dtype=np.int64)
    ge_j1 = gap_extend * (jpos + 1)
    ge_j = gap_extend * jpos
    NEG = -(1 << 40)
    for i in range(lt):
        h_pre = np.concatenate(([0], H[:-1])) + sub[i]
        np.maximum(h_pre, E, out=h_pre)
        np.maximum(h_pre, 0, out=h_pre)
        # E for the next column from the pre-F values
        E = np.maximum(np.maximum(h_pre - gap_open, E - gap_extend), 0)
        # lazy-F via cumulative max: F[j] = max_{k<j} h[k] - gapO - (j-k-1)gapE
        # (F-through-F chains are dominated since gapO >= gapE)
        g = h_pre - gap_open + ge_j1
        cm = np.maximum.accumulate(g)
        F = np.concatenate(([NEG], cm[:-1])) - ge_j
        h = np.maximum(h_pre, F)
        colmax = int(h.max()) if lq else 0
        if colmax > best:
            best = colmax
            t_end = i
            q_end = int(np.argmax(h == colmax))
        H = h
    return best, t_end, q_end


def _native_lib():
    from ..native import get_lib
    return get_lib()


def sw_align(q_num: np.ndarray, t_num: np.ndarray, matrix: ScoringMatrix,
             params: AlnParams, evaluer: EvalueComputer,
             bias: Optional[np.ndarray] = None) -> Optional[AlnResult]:
    """Full alignment of one pair; returns None when nothing aligns."""
    lq, lt = len(q_num), len(t_num)
    if bias is None:
        bias = np.zeros(lq, dtype=np.int64)
    # per-position query profile scores: P[j][a] = S[q_j][a] + bias[j]
    prof = matrix.scores[q_num].astype(np.int64) + bias[:, None]

    lib = _native_lib()
    if lib is not None:
        prof_t = np.ascontiguousarray(prof.T, dtype=np.int32)
        t8 = np.ascontiguousarray(t_num, dtype=np.uint8)
        out = np.zeros(3, dtype=np.int64)
        lib.sw_forward(prof_t.ctypes.data, lq, lq, t8.ctypes.data, lt,
                       params.gap_open, params.gap_extend, 0,
                       out.ctypes.data)
        score, t_end, q_end = int(out[0]), int(out[1]), int(out[2])
        if t_end < 0:
            return None
        lib.sw_forward(prof_t.ctypes.data, lq, q_end + 1, t8.ctypes.data,
                       t_end + 1, params.gap_open, params.gap_extend, 1,
                       out.ctypes.data)
        rscore, rt_end, rq_end = int(out[0]), int(out[1]), int(out[2])
    else:
        sub_full = prof[:, t_num].T.copy()        # [Lt, Lq]
        score, t_end, q_end = _forward_pass(
            sub_full, params.gap_open, params.gap_extend)
        if t_end < 0:
            return None
        sub_rev = sub_full[:t_end + 1, :q_end + 1][::-1, ::-1]
        rscore, rt_end, rq_end = _forward_pass(
            sub_rev, params.gap_open, params.gap_extend)

    evalue = float(evaluer.evalue(score, lq))
    assert rscore == score, (rscore, score)
    t_start = t_end - rt_end
    q_start = q_end - rq_end

    q_cov = (q_end + 1 - q_start) / lq
    t_cov = (t_end + 1 - t_start) / lt

    sub_rect = prof[q_start:q_end + 1][:, t_num[t_start:t_end + 1]].T.copy()
    backtrace, aa_ids = _banded_backtrace(
        sub_rect, score,
        params.gap_open, params.gap_extend,
        q_num[q_start:q_end + 1], t_num[t_start:t_end + 1])

    aln_len = len(backtrace)
    seq_id = aa_ids / aln_len if aln_len else 0.0
    bit_score = int(evaluer.bit_score(score) + 0.5)
    return AlnResult(
        target=-1, raw_score=score, bit_score=bit_score,
        seq_id=float(np.float32(seq_id)), evalue=evalue,
        q_start=q_start, q_end=q_end, q_len=lq,
        t_start=t_start, t_end=t_end, t_len=lt,
        backtrace=backtrace, q_cov=q_cov, t_cov=t_cov)


def _banded_backtrace(sub: np.ndarray, score: int, gap_open: int,
                      gap_extend: int, q_sub: np.ndarray, t_sub: np.ndarray):
    """banded_sw replica (StripedSmithWaterman.cpp:781-980).

    sub: substitution+bias scores for the [start..end] rectangle,
    indexed [target, query]. Returns (backtrace 'M/I/D' string, aaIds).
    In the reference, i indexes the query and j the target.
    """
    db_len, query_length = sub.shape[0], sub.shape[1]
    band_width = abs(db_len - query_length) + 1
    NEG = -(1 << 30)

    direction = None
    while True:
        width = band_width * 2 + 3
        width_d = band_width * 2 + 1
        h_b = [0] * (width + 2)
        e_b = [0] * (width + 2)
        h_c = [0] * (width + 2)
        direction = [[0] * (width_d * 3) for _ in range(query_length)]
        maxv = 0

        def set_u(w, i, j):
            x = i - w
            x = x if x > 0 else 0
            return j - x + 1

        def set_d(w, i, j, p):
            x = i - w
            x = x if x > 0 else 0
            return (j - x) * 3 + p

        for j in range(1, width - 1):
            h_b[j] = 0
        for i in range(query_length):
            beg = max(0, i - band_width)
            end = min(db_len - 1, i + band_width)
            edge = min(end + 1, width - 1)
            f = h_b[0] = e_b[0] = h_b[edge] = e_b[edge] = h_c[0] = 0
            dline = direction[i]
            u = 0
            for j in range(beg, end + 1):
                u = set_u(band_width, i, j)
                e_idx = set_u(band_width, i - 1, j)
                b_idx = set_u(band_width, i, j - 1)
                d_idx = set_u(band_width, i - 1, j - 1)
                de = set_d(band_width, i, j, 0)
                df = set_d(band_width, i, j, 1)
                dh = set_d(band_width, i, j, 2)

                temp1 = -gap_open if i == 0 else h_b[e_idx] - gap_open
                temp2 = -gap_extend if i == 0 else e_b[e_idx] - gap_extend
                e_b[u] = temp1 if temp1 > temp2 else temp2
                dline[de] = 3 if temp1 > temp2 else 2

                temp1 = h_c[b_idx] - gap_open
                temp2 = f - gap_extend
                f = temp1 if temp1 > temp2 else temp2
                dline[df] = 5 if temp1 > temp2 else 4

                e1 = e_b[u] if e_b[u] > 0 else 0
                f1 = f if f > 0 else 0
                temp1 = e1 if e1 > f1 else f1
                temp2 = h_b[d_idx] + int(sub[j, i])
                h_c[u] = temp1 if temp1 > temp2 else temp2
                if h_c[u] > maxv:
                    maxv = h_c[u]
                if temp1 <= temp2:
                    dline[dh] = 1
                else:
                    dline[dh] = dline[de] if e1 > f1 else dline[df]
            for j in range(1, u + 1):
                h_b[j] = h_c[j]
        if maxv >= score:
            break
        band_width *= 2

    # traceback
    i = query_length - 1
    j = db_len - 1
    state = 2  # h
    ops = []
    while i > 0 or j > 0:
        idx = ((j - max(0, i - band_width)) * 3) + state
        d = direction[i][idx]
        if d == 1:
            i -= 1; j -= 1; state = 2; ops.append("M")
        elif d == 2:
            i -= 1; state = 0; ops.append("I")
        elif d == 3:
            i -= 1; state = 2; ops.append("I")
        elif d == 4:
            j -= 1; state = 1; ops.append("D")
        elif d == 5:
            j -= 1; state = 2; ops.append("D")
        else:
            raise RuntimeError("traceback error")
    # final cell handling (banded_sw: last op forced to M)
    if ops and ops[-1] == "M":
        ops.append("M")
    else:
        ops.append("M")
    bt = "".join(reversed(ops))
    # count identities along the backtrace
    qp = tp = 0
    aa_ids = 0
    for op in bt:
        if op == "M":
            if qp < len(q_sub) and tp < len(t_sub) and q_sub[qp] == t_sub[tp]:
                aa_ids += 1
            qp += 1
            tp += 1
        elif op == "I":
            qp += 1
        else:
            tp += 1
    return bt, aa_ids


def check_criteria(res: AlnResult, params: AlnParams) -> bool:
    """Alignment::checkCriteria with cov mode 0 (bidirectional)."""
    if res.evalue > params.evalue:
        return False
    if res.seq_id < params.seq_id_thr:
        return False
    if params.cov_thr > 0:
        if res.q_cov < params.cov_thr or res.t_cov < params.cov_thr:
            return False
    if params.aln_len_thr > 0 and len(res.backtrace) < params.aln_len_thr:
        return False
    return True


def batch_forward_scores(q_num: np.ndarray, targets: list,
                         matrix: ScoringMatrix, gap_open: int,
                         gap_extend: int,
                         bias: Optional[np.ndarray] = None) -> np.ndarray:
    """SW scores of one query vs many targets, batched over the pair
    dimension (cell-exact with _forward_pass; scores only)."""
    B = len(targets)
    if B == 0:
        return np.zeros(0, dtype=np.int64)
    lq = len(q_num)
    lt = max(len(t) for t in targets)
    prof = matrix.scores[q_num].astype(np.int64)
    if bias is not None:
        prof = prof + bias[:, None]

    lib = _native_lib()
    if lib is not None:
        prof_t = np.ascontiguousarray(prof.T, dtype=np.int32)
        t_off = np.zeros(B + 1, dtype=np.int64)
        np.cumsum([len(t) for t in targets], out=t_off[1:])
        tcat = np.concatenate(
            [np.asarray(t, dtype=np.uint8) for t in targets])
        scores = np.zeros(B, dtype=np.int32)
        lib.sw_forward_batch(prof_t.ctypes.data, lq, lq,
                             tcat.ctypes.data, t_off.ctypes.data, B,
                             gap_open, gap_extend, scores.ctypes.data)
        return scores.astype(np.int64)
    # sub[b, j] per column i: gather prof[:, t_b[i]]; pad targets with X
    t_mat = np.full((B, lt), X_COL, dtype=np.int64)
    t_len = np.zeros(B, dtype=np.int64)
    for b, t in enumerate(targets):
        t_mat[b, :len(t)] = t
        t_len[b] = len(t)

    H = np.zeros((B, lq), dtype=np.int64)
    E = np.zeros((B, lq), dtype=np.int64)
    best = np.zeros(B, dtype=np.int64)
    jpos = np.arange(lq, dtype=np.int64)
    ge_j1 = gap_extend * (jpos + 1)
    ge_j = gap_extend * jpos
    NEG = -(1 << 40)
    for i in range(lt):
        sub_col = prof[:, t_mat[:, i]].T            # [B, lq]
        h_pre = np.concatenate(
            (np.zeros((B, 1), dtype=np.int64), H[:, :-1]), axis=1) + sub_col
        np.maximum(h_pre, E, out=h_pre)
        np.maximum(h_pre, 0, out=h_pre)
        E2 = np.maximum(np.maximum(h_pre - gap_open, E - gap_extend), 0)
        g = h_pre - gap_open + ge_j1[None, :]
        cm = np.maximum.accumulate(g, axis=1)
        F = np.concatenate(
            (np.full((B, 1), NEG, dtype=np.int64), cm[:, :-1]), axis=1) \
            - ge_j[None, :]
        h = np.maximum(h_pre, F)
        valid = i < t_len
        np.maximum(best, np.where(valid, h.max(axis=1), 0), out=best)
        H = np.where(valid[:, None], h, H)
        E = np.where(valid[:, None], E2, E)
    return best


X_COL = 20  # X column index used for target padding (masked by t_len)


def align_query_batch(q_list: list, cand_lists: list, t_flat: np.ndarray,
                      t_starts: np.ndarray, matrix: ScoringMatrix,
                      params: AlnParams, evaluer: EvalueComputer,
                      packed=None, cand_arrays=None,
                      as_rows: bool = False) -> list:
    """Align MANY queries against their candidate lists in two native
    calls; returns a list of accepted-``AlnResult`` lists parallel to
    ``q_list``, each bit-identical to ``align_query``.

    Batched analog of Alignment::run's OpenMP query loop
    (lib/mmseqs/src/alignment/Alignment.cpp:255-): one C pass computes
    every candidate's forward SW score (ssw_align semantics), the
    E-value screen runs vectorized in NumPy (exact same float path as
    the per-query driver), and a second C pass runs the reverse pass +
    banded backtrace (banded_sw, StripedSmithWaterman.cpp:781-980) on
    survivors only. Falls back per query for non-default acceptance
    parameters (cov/seq-id/accept caps) or without the native lib.

    ``cand_arrays=(cand_t, cand_off)`` takes the candidate pairs as raw
    arrays (prefilter_query_batch's as_arrays contract) instead of
    ``cand_lists``."""
    lib = _native_lib()
    batched_ok = (params.max_accept == INT_MAX
                  and params.max_rejected == INT_MAX
                  and params.cov_thr == 0 and params.seq_id_thr == 0
                  and params.aln_len_thr == 0)
    if lib is None or not batched_ok:
        if cand_lists is None:
            ct, co = cand_arrays
            cand_lists = [ct[co[i]:co[i + 1]].tolist()
                          for i in range(len(q_list))]
        t_starts = np.asarray(t_starts)
        t_seqs = [t_flat[t_starts[i]:t_starts[i + 1]]
                  for i in range(len(t_starts) - 1)]
        out = [align_query(q, cands, t_seqs, matrix, params, evaluer)
               for q, cands in zip(q_list, cand_lists)]
        if as_rows:
            return [[r.row_fields() for r in res] for res in out]
        return out

    from .bias import expected_score_tab
    nq = len(q_list)
    if packed is not None:
        qflat0, qoff0 = packed
        base = int(qoff0[0])
        qflat = qflat0[base:int(qoff0[-1])]
        qstarts = np.ascontiguousarray(
            np.asarray(qoff0, dtype=np.int64) - base)
    else:
        qstarts = np.zeros(nq + 1, dtype=np.int64)
        np.cumsum([len(q) for q in q_list], out=qstarts[1:])
        qflat = (np.ascontiguousarray(np.concatenate(q_list),
                                      dtype=np.uint8)
                 if nq and qstarts[-1] else np.zeros(1, np.uint8))
    sub32 = np.ascontiguousarray(matrix.scores, dtype=np.int32)
    etab = np.ascontiguousarray(expected_score_tab(matrix))
    t_flat = np.ascontiguousarray(t_flat, dtype=np.uint8)
    t_starts = np.ascontiguousarray(t_starts, dtype=np.int64)
    if cand_arrays is not None:
        cand_t, cand_off = cand_arrays
        cand_t = np.ascontiguousarray(cand_t, dtype=np.int32)
        cand_off = np.ascontiguousarray(cand_off, dtype=np.int64)
        n_pairs = int(cand_off[-1])
        if n_pairs == 0:
            return [[] for _ in q_list]
    else:
        cand_off = np.zeros(nq + 1, dtype=np.int64)
        np.cumsum([len(c) for c in cand_lists], out=cand_off[1:])
        n_pairs = int(cand_off[-1])
        if n_pairs == 0:
            return [[] for _ in q_list]
        cand_t = np.ascontiguousarray(
            np.concatenate([np.asarray(c, dtype=np.int32)
                            for c in cand_lists if len(c)]),
            dtype=np.int32)

    score = np.empty(n_pairs, dtype=np.int32)
    tend = np.empty(n_pairs, dtype=np.int32)
    qend = np.empty(n_pairs, dtype=np.int32)
    lib.align_forward_batch(
        qflat.ctypes.data, qstarts.ctypes.data, nq,
        sub32.ctypes.data, sub32.shape[1], etab.ctypes.data,
        int(params.comp_bias_corr),
        t_flat.ctypes.data, t_starts.ctypes.data,
        cand_t.ctypes.data, cand_off.ctypes.data,
        params.gap_open, params.gap_extend,
        score.ctypes.data, tend.ctypes.data, qend.ctypes.data)

    # E-value screen, vectorized over all pairs (same float path as the
    # per-query survivors computation in align_query)
    qlens = np.diff(qstarts)
    pair_q = np.repeat(np.arange(nq, dtype=np.int32),
                       np.diff(cand_off).astype(np.int64))
    evals = evaluer.evalue(score, qlens[pair_q])
    surv = np.flatnonzero((evals <= params.evalue) & (tend >= 0))
    results = [[] for _ in q_list]
    if len(surv) == 0:
        return results

    s_q = np.ascontiguousarray(pair_q[surv], dtype=np.int32)
    s_t = np.ascontiguousarray(cand_t[surv], dtype=np.int32)
    s_score = np.ascontiguousarray(score[surv], dtype=np.int32)
    s_tend = np.ascontiguousarray(tend[surv], dtype=np.int32)
    s_qend = np.ascontiguousarray(qend[surv], dtype=np.int32)
    n_s = len(surv)
    bt_off = np.zeros(n_s + 1, dtype=np.int64)
    np.cumsum(s_qend.astype(np.int64) + s_tend + 4, out=bt_off[1:])
    bt_buf = np.empty(int(bt_off[-1]), dtype=np.uint8)
    rle_off = np.zeros(n_s + 1, dtype=np.int64)
    np.cumsum(2 * (s_qend.astype(np.int64) + s_tend + 4) + 4,
              out=rle_off[1:])
    rle_buf = np.empty(int(rle_off[-1]), dtype=np.uint8)
    o_qstart = np.empty(n_s, dtype=np.int32)
    o_tstart = np.empty(n_s, dtype=np.int32)
    o_rscore = np.empty(n_s, dtype=np.int32)
    o_aaids = np.empty(n_s, dtype=np.int32)
    o_btlen = np.empty(n_s, dtype=np.int32)
    o_rlelen = np.empty(n_s, dtype=np.int32)
    lib.align_traceback_batch(
        qflat.ctypes.data, qstarts.ctypes.data,
        sub32.ctypes.data, sub32.shape[1], etab.ctypes.data,
        int(params.comp_bias_corr),
        t_flat.ctypes.data, t_starts.ctypes.data,
        s_q.ctypes.data, s_t.ctypes.data, n_s,
        s_score.ctypes.data, s_tend.ctypes.data, s_qend.ctypes.data,
        params.gap_open, params.gap_extend,
        o_qstart.ctypes.data, o_tstart.ctypes.data, o_rscore.ctypes.data,
        o_aaids.ctypes.data, o_btlen.ctypes.data,
        bt_buf.ctypes.data, bt_off.ctypes.data,
        rle_buf.ctypes.data, rle_off.ctypes.data, o_rlelen.ctypes.data)

    surv_eval = evals[surv]
    bits = evaluer.bit_score(s_score)
    t_lens = np.diff(t_starts)
    if as_rows:
        return _format_rows(q_list, params, matrix, evaluer, qlens,
                            t_lens, t_flat, t_starts, s_q, s_t, s_score,
                            s_qend, s_tend, o_qstart, o_tstart, o_rscore,
                            o_aaids, o_btlen, o_rlelen, rle_buf, rle_off,
                            surv_eval, bits)
    for i in range(n_s):
        qi = int(s_q[i])
        lq = int(qlens[qi])
        sc = int(s_score[i])
        if o_btlen[i] < 0:
            # traceback error: per-pair fallback (raises like the
            # per-query driver would)
            bias = (sw_bias_i8(q_list[qi], matrix)
                    if params.comp_bias_corr else None)
            res = sw_align(q_list[qi], t_flat[t_starts[s_t[i]]:
                                              t_starts[s_t[i] + 1]],
                           matrix, params, evaluer, bias)
            if res is None:
                continue
            res.target = int(s_t[i])
            results[qi].append(res)
            continue
        assert int(o_rscore[i]) == sc, (int(o_rscore[i]), sc)
        q_start = int(o_qstart[i])
        q_end = int(s_qend[i])
        t_start = int(o_tstart[i])
        t_end = int(s_tend[i])
        t_len = int(t_lens[s_t[i]])
        btlen = int(o_btlen[i])
        bt = bytes(bt_buf[bt_off[i]:bt_off[i] + btlen]).decode("ascii")
        seq_id = o_aaids[i] / btlen if btlen else 0.0
        results[qi].append(AlnResult(
            target=int(s_t[i]), raw_score=sc,
            bit_score=int(bits[i] + 0.5),
            seq_id=float(np.float32(seq_id)),
            evalue=float(surv_eval[i]),
            q_start=q_start, q_end=q_end, q_len=lq,
            t_start=t_start, t_end=t_end, t_len=t_len,
            backtrace=bt,
            q_cov=(q_end + 1 - q_start) / lq,
            t_cov=(t_end + 1 - t_start) / t_len))
    for rows in results:
        rows.sort(key=lambda r: (r.evalue, -r.raw_score, r.t_len, r.target))
    return results


def _format_rows(q_list, params, matrix, evaluer, qlens, t_lens,
                 t_flat, t_starts, s_q, s_t, s_score, s_qend, s_tend,
                 o_qstart, o_tstart, o_rscore, o_aaids, o_btlen, o_rlelen,
                 rle_buf, rle_off, surv_eval, bits):
    """as_rows tail of align_query_batch: 11-field text rows per query,
    identical to [r.row_fields() for r in ...] on the AlnResult path
    (backtrace run-length encoding came from the C pass)."""
    n_s = len(s_q)
    # vectorized fastSeqIdToBuffer pieces (format_seq_id semantics)
    with np.errstate(invalid="ignore"):
        fs = (o_aaids / np.maximum(o_btlen, 1)).astype(np.float32)
    fs = np.where(o_btlen > 0, fs, np.float32(0.0))
    mill = (fs * np.float32(1000)).astype(np.int64)
    is_one = fs == np.float32(1.0)
    lt10 = fs < np.float32(0.10)
    lt01 = fs < np.float32(0.01)
    # int(x + 0.5) truncation for bit scores
    bits_i = np.trunc(bits + 0.5).astype(np.int64)

    per_q = {}
    ev_l = surv_eval.tolist()
    sc_l = s_score.tolist()
    tl_l = t_lens[s_t].tolist()
    tt_l = s_t.tolist()
    for i in range(n_s):
        per_q.setdefault(int(s_q[i]), []).append(i)

    results = [[] for _ in q_list]
    rle_b = rle_buf.tobytes()
    for qi, idxs in per_q.items():
        idxs.sort(key=lambda i: (ev_l[i], -sc_l[i], tl_l[i], tt_l[i]))
        lq_s = str(int(qlens[qi]))
        rows = results[qi]
        for i in idxs:
            if o_btlen[i] < 0:
                # traceback error: per-pair fallback (raises like the
                # per-query driver would)
                bias = (sw_bias_i8(q_list[qi], matrix)
                        if params.comp_bias_corr else None)
                res = sw_align(q_list[qi],
                               t_flat[t_starts[s_t[i]]:
                                      t_starts[s_t[i] + 1]],
                               matrix, params, evaluer, bias)
                if res is None:
                    continue
                res.target = int(s_t[i])
                rows.append(res.row_fields())
                continue
            assert int(o_rscore[i]) == sc_l[i], (int(o_rscore[i]),
                                                 sc_l[i])
            if is_one[i]:
                sid = "1.00"
            else:
                sid = ("0.00" if lt01[i] else "0.0" if lt10[i] else "0.") \
                    + str(int(mill[i]))
            rows.append([
                str(tt_l[i]), str(int(bits_i[i])), sid,
                f"{ev_l[i]:.3E}",
                str(int(o_qstart[i])), str(int(s_qend[i])), lq_s,
                str(int(o_tstart[i])), str(int(s_tend[i])),
                str(tl_l[i]),
                rle_b[rle_off[i]:rle_off[i] + o_rlelen[i]]
                .decode("ascii")])
    return results


def align_query(q_num: np.ndarray, pref_targets: list, target_seqs: list,
                matrix: ScoringMatrix, params: AlnParams,
                evaluer: EvalueComputer, bias=None) -> list:
    """Align one query against its prefilter candidates, in order.

    Fast path: batch-score all candidates, E-value-screen, and run the
    exact per-pair alignment (positions + backtrace) only on survivors —
    output-identical because acceptance depends only on the score
    (cov/seqId thresholds are 0 in the product configuration).
    Returns accepted AlnResults sorted by (eval, -score, t_len, target)
    like Matcher::compareHits.
    """
    if not pref_targets:
        return []
    if bias is None:
        bias = sw_bias_i8(q_num, matrix) if params.comp_bias_corr else None
    out = []
    batched_ok = (params.max_accept == INT_MAX
                  and params.max_rejected == INT_MAX
                  and params.cov_thr == 0 and params.seq_id_thr == 0
                  and params.aln_len_thr == 0)
    if batched_ok and len(pref_targets) > 1:
        scores = batch_forward_scores(
            q_num, [target_seqs[t] for t in pref_targets], matrix,
            params.gap_open, params.gap_extend, bias)
        evals = evaluer.evalue(scores, len(q_num))
        survivors = [t for t, e in zip(pref_targets, evals)
                     if e <= params.evalue]
    else:
        survivors = None

    accepted = 0
    rejected = 0
    for tid in (survivors if survivors is not None else pref_targets):
        if accepted >= params.max_accept or rejected >= params.max_rejected:
            break
        res = sw_align(q_num, target_seqs[tid], matrix, params, evaluer, bias)
        if res is None:
            rejected += 1
            continue
        res.target = tid
        if check_criteria(res, params):
            out.append(res)
            accepted += 1
            rejected = 0
        else:
            rejected += 1
    out.sort(key=lambda r: (r.evalue, -r.raw_score, r.t_len, r.target))
    return out
