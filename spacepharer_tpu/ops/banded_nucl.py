"""Banded nucleotide aligner: the ksw2-extz engine + its mmseqs wrapper.

Parity targets:
  * ksw_extz2_sse (lib/mmseqs/lib/ksw2/ksw2_extz2_sse.cpp) — the
    Suzuki-Kasahara difference-DP extension aligner: anti-diagonal
    sweeps over a (wl, wr) band, affine gaps (open q + extend e per
    gap position), per-row exact max tracking, Z-drop termination
    (ksw2.h:188-206 ksw_apply_zdrop) and the direction-byte backtrack
    state machine (ksw2.h:141-180 ksw_backtrack).
  * BandedNucleotideAligner (lib/mmseqs/src/alignment/
    BandedNucleotideAligner.cpp:73-255) — the blastn-mode gapped
    aligner of the reference: ungapped re-anchor on the prefilter
    diagonal (DistanceCalculator.h:179-201), all-M shortcut when the
    ungapped hit spans query and target, reverse extz extension to
    find the start, forward extz for score/cigar, and the
    reverse-cigar fallback branch.

This is a behavioral re-implementation in vectorized NumPy (one array
op per anti-diagonal), not a translation of the SSE code; the few
non-obvious quirks that affect byte output are reproduced explicitly:

  * the 16-aligned band edges ([st, en] rounded outward) are computed
    AND STORED like the SIMD version: direction bytes exist for the
    whole aligned block and persistent state at block edges carries
    stale values across rows exactly as the reference's persistent
    vectors do;
  * the per-row argmax replicates the 4-lane SSE reduction's
    tie-breaking (lane-ordered, then strictly-greater scan), not a
    plain first-occurrence argmax;
  * mte_q is recorded against the ALIGNED row end (`r - en`,
    ksw2_extz2_sse.cpp:249), a reference quirk kept as-is.

Verified cell-exact against a C++ probe driving the reference's own
BandedNucleotideAligner (tests/test_banded_nucl.py,
tests/banded_nucl_ref.tsv fixture).
"""
import os
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

KSW_NEG_INF = -0x40000000


@dataclass
class ExtzResult:
    max: int = 0
    max_q: int = -1
    max_t: int = -1
    mqe: int = KSW_NEG_INF
    mqe_t: int = -1
    mte: int = KSW_NEG_INF
    mte_q: int = -1
    score: int = KSW_NEG_INF
    zdropped: bool = False
    cigar: list = field(default_factory=list)  # [(op, len)], op in "MID"


def _apply_zdrop(ez: ExtzResult, H: int, r: int, t: int,
                 zdrop: int, e: int) -> bool:
    """ksw_apply_zdrop (ksw2.h:188-206), is_rot variant."""
    if H > ez.max:
        ez.max, ez.max_t, ez.max_q = H, t, r - t
    elif t >= ez.max_t and r - t >= ez.max_q:
        tl = t - ez.max_t
        ql = (r - t) - ez.max_q
        l = abs(tl - ql)
        if zdrop >= 0 and ez.max - H > zdrop + l * e:
            ez.zdropped = True
            return True
    return False


def _row_max(H, st0, en0):
    """Exact per-row (max_H, max_t) with the reference's SSE reduction
    order: seed with the special-cased H[en0], 4 strided lanes over
    [st0, en1) each keeping its first strictly-greater maximum, lanes
    combined in lane order, then a scalar tail — all strictly-greater
    updates (ksw2_extz2_sse.cpp:214-247)."""
    max_H, max_t = int(H[en0]), en0
    en1 = st0 + (en0 - st0) // 4 * 4
    lane_best = []
    for lane in range(4):
        pos = np.arange(st0 + lane, en1, 4)
        if len(pos) == 0:
            continue
        vals = H[pos]
        i = int(np.argmax(vals))
        lane_best.append((int(vals[i]), int(pos[i])))
    for hv, tv in lane_best:
        if max_H < hv:
            max_H, max_t = hv, tv
    for t in range(en1, en0):
        if H[t] > max_H:
            max_H, max_t = int(H[t]), t
    return max_H, max_t


def ksw_extz2(query: np.ndarray, target: np.ndarray, mat: np.ndarray,
              q: int, e: int, w: int, zdrop: int,
              score_only: bool = False) -> ExtzResult:
    """NW-like banded extension alignment (ksw_extz2_sse semantics,
    left-aligned gaps). query/target are numeric arrays in [0, m);
    mat is the m x m integer substitution matrix whose last symbol is
    the wildcard (non-GENERIC_SC fast path: match = mat[0,0],
    mismatch = mat[0,1], any wildcard scores 0)."""
    ez = ExtzResult()
    qlen, tlen = len(query), len(target)
    m = mat.shape[0]
    if qlen <= 0 or tlen <= 0:
        return ez
    qe = q + e
    qe2 = 2 * qe
    sc_mch = int(mat[0, 0])
    sc_mis = int(mat[0, 1])
    max_sc = sc_mch + qe2
    min_sc = int(mat.min())
    if -min_sc > 2 * qe:
        return ez
    if w < 0:
        w = max(tlen, qlen)
    wl = wr = w

    tpad = (tlen + 15) // 16 * 16
    # persistent difference-state rows (offset-encoded, all >= 0)
    u = np.zeros(tpad, dtype=np.int32)
    v = np.zeros(tpad, dtype=np.int32)
    x = np.zeros(tpad, dtype=np.int32)
    y = np.zeros(tpad, dtype=np.int32)
    s = np.zeros(tpad, dtype=np.int32)
    H = np.full(tpad, KSW_NEG_INF, dtype=np.int64)
    query = np.asarray(query, dtype=np.int64)
    target = np.asarray(target, dtype=np.int64)

    drows = [] if not score_only else None  # (st, dvec) per row
    offs = []
    last_st = last_en = -1
    n_rows = qlen + tlen - 1
    r_done = n_rows
    for r in range(n_rows):
        st, en = 0, tlen - 1
        if st < r - qlen + 1:
            st = r - qlen + 1
        if en > r:
            en = r
        if st < (r - wr + 1) >> 1:
            st = (r - wr + 1) >> 1
        if en > (r + wl) >> 1:
            en = (r + wl) >> 1
        if st > en:
            ez.zdropped = True
            r_done = r
            break
        st0, en0 = st, en
        st = st // 16 * 16
        en = (en + 16) // 16 * 16 - 1
        # boundary conditions
        if st > 0:
            if last_st <= st - 1 <= last_en:
                x1, v1 = int(x[st - 1]), int(v[st - 1])
            else:
                x1 = v1 = 0
        else:
            x1, v1 = 0, (q if r else 0)
        if en >= r:
            y[r] = 0
            u[r] = q if r else 0
        # substitution scores for the in-band positions only (the
        # aligned block edges keep stale persistent s, like the SIMD
        # buffers)
        tpos = np.arange(st0, en0 + 1)
        qpos = r - tpos
        sq = target[tpos]
        sth = query[qpos]
        sc = np.where(sq == sth, sc_mch, sc_mis)
        sc = np.where((sq == m - 1) | (sth == m - 1), 0, sc)
        s[st0:en0 + 1] = sc

        en_c = min(en, tpad - 1)
        blk = slice(st, en_c + 1)
        x_sh = np.concatenate(([x1], x[st:en_c]))
        v_sh = np.concatenate(([v1], v[st:en_c]))
        a = x_sh + v_sh
        b = y[blk] + u[blk]
        z = s[blk] + qe2
        if drows is not None:
            d = (a > z).astype(np.int32)
        z = np.maximum(z, a)
        if drows is not None:
            d = np.where(b > z, 2, d)
        z = np.maximum(z, b)
        z = np.minimum(z, max_sc)
        u_new = z - v_sh
        v_new = z - u[blk]
        zq = z - q
        a2 = a - zq
        b2 = b - zq
        x[blk] = np.maximum(a2, 0)
        y[blk] = np.maximum(b2, 0)
        if drows is not None:
            d |= np.where(a2 > 0, 8, 0)
            d |= np.where(b2 > 0, 16, 0)
            drows.append(d)
        offs.append((st, en))
        u[blk] = u_new
        v[blk] = v_new

        # exact H and per-row max
        if r > 0:
            if en0 > 0:
                H[en0] = H[en0 - 1] + int(u[en0]) - qe
            else:
                H[en0] = H[en0] + int(v[en0]) - qe
            if en0 > st0:
                H[st0:en0] += v[st0:en0] - qe
            max_H, max_t = _row_max(H, st0, en0)
        else:
            H[0] = int(v[0]) - qe - qe
            max_H, max_t = int(H[0]), 0
        if en0 == tlen - 1 and H[en0] > ez.mte:
            ez.mte, ez.mte_q = int(H[en0]), r - en
        if r - st0 == qlen - 1 and H[st0] > ez.mqe:
            ez.mqe, ez.mqe_t = int(H[st0]), st0
        if _apply_zdrop(ez, max_H, r, max_t, zdrop, e):
            r_done = r
            break
        if r == n_rows - 1 and en0 == tlen - 1:
            ez.score = int(H[tlen - 1])
        last_st, last_en = st, en

    if drows is not None and ez.max_t >= 0 and ez.max_q >= 0:
        ez.cigar = _backtrack(drows, offs, ez.max_t, ez.max_q)
    return ez


def _backtrack(drows, offs, i0: int, j0: int) -> list:
    """ksw_backtrack (ksw2.h:141-180), is_rot=1, left-aligned gaps.
    Returns [(op, len)] with op in 'MID' (query-consuming = I)."""
    cigar = []

    def push(op, ln):
        if cigar and cigar[-1][0] == op:
            cigar[-1][1] += ln
        else:
            cigar.append([op, ln])

    i, j, state = i0, j0, 0
    while i >= 0 and j >= 0:
        r = i + j
        st, en = offs[r]
        force_state = -1
        if i < st:
            force_state = 2
        if i > en:
            force_state = 1
        tmp = int(drows[r][i - st]) if force_state < 0 else 0
        if state == 0:
            state = tmp & 7
        elif not (tmp >> (state + 2)) & 1:
            state = 0
        if state == 0:
            state = tmp & 7
        if force_state >= 0:
            state = force_state
        if state == 0:
            push("M", 1)
            i -= 1
            j -= 1
        elif state == 1 or state == 3:
            push("D", 1)
            i -= 1
        else:
            push("I", 1)
            j -= 1
    if i >= 0:
        push("D", i + 1)
    if j >= 0:
        push("I", j + 1)
    cigar.reverse()
    return [(op, ln) for op, ln in cigar]


# ---------------------------------------------------------------------------
# the mmseqs wrapper: ungapped re-anchor + two-sided extension
# ---------------------------------------------------------------------------

def ungapped_startend(seq1: np.ndarray, seq2: np.ndarray,
                      mat: np.ndarray) -> tuple:
    """computeSubstitutionStartEndDistance (DistanceCalculator.h:
    179-201): best non-negative running-sum segment along the paired
    positions; returns (start, end, score) with the reference's exact
    update rules (ties keep the earlier end)."""
    sc = mat[seq1, seq2].astype(np.int64)
    if len(sc) == 0:
        return 0, 0, 0
    # vectorized Kadane with the reference's exact tie rules: the
    # running sum resets at <= 0; a new maximum is recorded only on a
    # STRICT increase (first position attaining the global best wins)
    c = np.cumsum(sc)
    low = np.minimum.accumulate(np.concatenate(([0], c)))[:-1]
    run = c - low
    reset = run <= 0
    run = np.where(reset, 0, run)
    best = int(run.max(initial=0))
    if best <= 0:
        return 0, 0, 0
    b_end = int(np.flatnonzero(np.maximum.accumulate(run) == best)[0])
    resets = np.flatnonzero(reset[:b_end + 1])
    b_start = int(resets[-1]) + 1 if len(resets) else 0
    return b_start, b_end, best


def compute_ungapped_alignment(query: np.ndarray, target: np.ndarray,
                               diagonal: int, mat: np.ndarray):
    """DistanceCalculator::computeUngappedAlignment (DistanceCalculator
    .h:94-113): scans the +-65536 wraps of the u16 diagonal and keeps
    the best RESCORE_MODE_ALIGNMENT segment.
    Returns (start, end, score, diagonal, dist_to_diagonal)."""
    qlen, tlen = len(query), len(target)
    best = (-1, -1, 0, 0, 0)
    for divisions in range(1, 2 + tlen // 32768):
        d = -divisions * 65536 + diagonal
        best = _max_diag(best, query, target, d, mat)
    for divisions in range(0, 1 + qlen // 65536):
        d = divisions * 65536 + diagonal
        best = _max_diag(best, query, target, d, mat)
    return best


def _max_diag(best, query, target, diagonal, mat):
    qlen, tlen = len(query), len(target)
    dist = abs(diagonal)
    if diagonal >= 0 and dist < qlen:
        n = min(tlen, qlen - dist)
        st, en, sc = ungapped_startend(query[dist:dist + n], target[:n], mat)
    elif diagonal < 0 and dist < tlen:
        n = min(tlen - dist, qlen)
        st, en, sc = ungapped_startend(query[:n], target[dist:dist + n], mat)
    else:
        return best
    if sc > best[2]:
        return (st, en, sc, diagonal, dist)
    return best


@dataclass
class BandedAlnResult:
    score: int
    q_start: int
    q_end: int
    t_start: int
    t_end: int
    backtrace: str
    aa_ids: int
    q_cov: float
    t_cov: float
    evalue: float = 0.0


def _compute_cov(start, end, length):
    return float(end - start + 1) / length


def banded_align_batch(q_list, t_list, pairs, mat: np.ndarray,
                       gapo: int, gape: int, zdrop: int,
                       n_threads: int = 0):
    """Batched BandedNucleotideAligner over candidate ``pairs``
    [(q_idx, t_idx, diagonal)]: ONE native call over flat-packed
    sequences (pthread pool), returning per-pair arrays
    (score, q_start, q_end, t_start, t_end, aa_ids, bt_len) — the
    fields the m8 writer consumes. Bit-identical to
    banded_nucleotide_align per pair (tests/test_banded_batch.py);
    returns None when the native library is unavailable (callers fall
    back to the per-pair engine)."""
    from ..native import get_lib
    lib = get_lib()
    n = len(pairs)
    if lib is None:
        return None
    qoff = np.zeros(len(q_list) + 1, dtype=np.int64)
    np.cumsum([len(q) for q in q_list], out=qoff[1:])
    toff = np.zeros(len(t_list) + 1, dtype=np.int64)
    np.cumsum([len(t) for t in t_list], out=toff[1:])
    qflat = (np.concatenate([np.asarray(q, dtype=np.uint8)
                             for q in q_list])
             if qoff[-1] else np.zeros(1, np.uint8))
    tflat = (np.concatenate([np.asarray(t, dtype=np.uint8)
                             for t in t_list])
             if toff[-1] else np.zeros(1, np.uint8))
    pair_q = np.ascontiguousarray([p[0] for p in pairs], dtype=np.int32)
    pair_t = np.ascontiguousarray([p[1] for p in pairs], dtype=np.int32)
    pair_d = np.ascontiguousarray([p[2] for p in pairs], dtype=np.int32)
    m32 = np.ascontiguousarray(mat, dtype=np.int32)
    outs = [np.empty(max(n, 1), dtype=np.int32) for _ in range(7)]
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 16)
    rc = lib.banded_align_batch(
        qflat.ctypes.data, qoff.ctypes.data,
        tflat.ctypes.data, toff.ctypes.data,
        pair_q.ctypes.data, pair_t.ctypes.data, pair_d.ctypes.data, n,
        m32.ctypes.data, m32.shape[0],
        int(gapo), int(gape), int(zdrop), int(n_threads),
        *[o.ctypes.data for o in outs])
    if rc != 0:
        return None
    return tuple(outs)


def banded_nucleotide_align(query: np.ndarray, target: np.ndarray,
                            diagonal: int, mat: np.ndarray,
                            gapo: int, gape: int,
                            zdrop: int,
                            evaluer=None) -> Optional[BandedAlnResult]:
    """BandedNucleotideAligner::align (BandedNucleotideAligner.cpp:
    73-255). query/target numeric (alphabet m=5, wildcard 4 = N);
    `diagonal` is the prefilter's u16 diagonal. The reverse flag of the
    reference is handled by the CALLER passing the rev-comp query —
    identity counting works on the numeric codes directly, so no
    orientation flag is needed here."""
    qlen, tlen = len(query), len(target)
    st, en, score, diag, dist = compute_ungapped_alignment(
        query, target, diagonal, mat)
    if diag >= 0:
        q_u_start, q_u_end = st + dist, en + dist
        t_u_start, t_u_end = st, en
    else:
        q_u_start, q_u_end = st, en
        t_u_start, t_u_end = st + dist, en + dist
    if (q_u_end - q_u_start == qlen - 1 and t_u_start == 0
            and t_u_end == tlen - 1):
        aa_ids = int(np.sum(
            query[q_u_start:q_u_end + 1] == target[t_u_start:t_u_end + 1]))
        ev = evaluer.evalue(score, qlen) if evaluer is not None else 0.0
        return BandedAlnResult(
            score=score, q_start=q_u_start, q_end=q_u_end,
            t_start=t_u_start, t_end=t_u_end, backtrace="M" * qlen,
            aa_ids=aa_ids, q_cov=_compute_cov(q_u_start, q_u_end, qlen),
            t_cov=_compute_cov(t_u_start, t_u_end, tlen), evalue=float(ev))

    # Backward extension anchored ONE PAST the ungapped end: the
    # reference builds its reversed buffers with seq_reverse(rev, seq,
    # L) whose inclusive `end` is L, so rev[i] = seq[L - i] — shifted
    # by one. The extension therefore force-pairs (q_end+1, t_end+1)
    # first and never sees position 0 (BandedNucleotideAligner.cpp:
    # 61-93 + StripedSmithWaterman.h:185-194). When the anchor touches
    # the sequence end, rev[0] is seq[L] — a byte Sequence never
    # writes (malloc garbage in the reference); we define it as the
    # wildcard (scores 0), the one documented divergence (the parity
    # fixture pins the same byte in the probe).
    m = mat.shape[0]
    wild = m - 1

    def _shifted_rev(seq, end):
        first = seq[end + 1] if end + 1 < len(seq) else wild
        return np.concatenate(([first], seq[1:end + 1][::-1]))

    q_start_rev = qlen - q_u_end - 1
    t_start_rev = tlen - t_u_end - 1
    back_q = _shifted_rev(query, q_u_end)
    back_t = _shifted_rev(target, t_u_end)
    ez = ksw_extz2(back_q, back_t, mat, gapo, gape, 64, zdrop,
                   score_only=True)
    q_start = qlen - (q_start_rev + ez.max_q) - 1
    t_start = tlen - (t_start_rev + ez.max_t) - 1
    ez_a = ksw_extz2(query[q_start:], target[t_start:], mat,
                     gapo, gape, 64, zdrop, score_only=False)
    if ez.max_q > ez_a.max_q and ez.max_t > ez_a.max_t:
        # re-align the reverse extension with cigar; cigar reversed
        ez_a = ksw_extz2(back_q, back_t, mat,
                         gapo, gape, 64, zdrop, score_only=False)
        cigar = list(reversed(ez_a.cigar))
    else:
        cigar = ez_a.cigar

    backtrace = []
    aa_ids = 0
    qp, tp = q_start, t_start
    for op, ln in cigar:
        if op == "M":
            aa_ids += int(np.sum(query[qp:qp + ln] == target[tp:tp + ln]))
            qp += ln
            tp += ln
        elif op == "I":
            qp += ln
        else:
            tp += ln
        backtrace.append(op * ln)
    ev = (evaluer.evalue(ez_a.max, qlen) if evaluer is not None else 0.0)
    return BandedAlnResult(
        score=int(ez_a.max), q_start=q_start, q_end=q_start + ez_a.max_q,
        t_start=t_start, t_end=t_start + ez_a.max_t,
        backtrace="".join(backtrace), aa_ids=aa_ids,
        q_cov=_compute_cov(q_start, q_start + ez_a.max_q, qlen),
        t_cov=_compute_cov(t_start, t_start + ez_a.max_t, tlen),
        evalue=float(ev))
