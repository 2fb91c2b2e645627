"""Ungapped diagonal rescoring — the rescorediagonal / ungappedprefilter
surface (--alignment-mode 4 family).

Parity targets:
  DistanceCalculator::computeUngappedAlignment / ungappedAlignmentByDiagonal
    (lib/mmseqs/src/alignment/DistanceCalculator.h:94-176): unwrap the
    u16 diagonal over all divisions, per-diagonal overlap scoring.
  computeInverseHammingDistance (:105-125): raw byte equality count.
  computeSubstitutionDistance (:16-38): running local max, no positions.
  computeSubstitutionStartEndDistance (:180-201): local max with the
    exact start/end tie rules (end moves only on strictly-new max).
  computeGlobalSubstitutionStartEndDistance (:204-220): full-overlap sum
    with leading/trailing '*' trimming, clamped at 0.
  doRescorediagonal emission (rescorediagonal.cpp:230-340): E-value and
    bit score from the UNGAPPED Gumbel parameters, seqId over the local
    segment with &~0x20 uppercasing, coverage via SmithWaterman::
    computeCov, acceptance by alnLen/cov/seqId/evalue.
"""
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..alphabet import encode_aa_array
from .evalue import EvalueComputer, gumbel_params
from .matrices import ScoringMatrix

RESCORE_MODE_HAMMING = 0
RESCORE_MODE_SUBSTITUTION = 1
RESCORE_MODE_ALIGNMENT = 2
RESCORE_MODE_GLOBAL_ALIGNMENT = 3

SEQ_ID_ALN_LEN = 0
SEQ_ID_SHORT = 1
SEQ_ID_LONG = 2


@dataclass
class LocalAln:
    start: int = -1
    end: int = -1
    score: int = 0
    diagonal_len: int = 0
    dist_to_diagonal: int = 0
    diagonal: int = 0


def ascii_submat(matrix: ScoringMatrix) -> np.ndarray:
    """SubstitutionMatrix::createAsciiSubMat — scores indexed by raw
    ASCII bytes through the aa2num mapping."""
    lut = encode_aa_array(np.arange(256, dtype=np.uint8))
    return matrix.scores[lut[:, None], lut[None, :]].astype(np.int64)


def _local_max(scores: np.ndarray) -> int:
    best = 0
    s = 0
    for v in scores:
        s += int(v)
        if s < 0:
            s = 0
        if s > best:
            best = s
    return best


def _local_max_start_end(scores: np.ndarray):
    """computeSubstitutionStartEndDistance tie rules."""
    best = 0
    best_end = 0
    best_start = 0
    min_pos = -1
    s = 0
    for pos, v in enumerate(scores):
        s += int(v)
        if s <= 0:
            s = 0
            min_pos = pos
        elif s > best:
            best = s
            best_end = pos
            best_start = min_pos + 1
    return best_start, best_end, best


def _aln_by_diagonal(q: np.ndarray, t: np.ndarray, diagonal: int,
                     mode: int, amat: np.ndarray) -> LocalAln:
    """ungappedAlignmentByDiagonal on raw ASCII arrays."""
    res = LocalAln(dist_to_diagonal=abs(diagonal), diagonal=diagonal)
    d = abs(diagonal)
    lq, lt = len(q), len(t)
    if diagonal >= 0 and d < lq:
        qs, ts = q[d:], t
        n = min(lt, lq - d)
    elif diagonal < 0 and d < lt:
        qs, ts = q, t[d:]
        n = min(lt - d, lq)
    else:
        return res
    qs, ts = qs[:n], ts[:n]
    res.diagonal_len = n
    if mode == RESCORE_MODE_HAMMING:
        res.score = int((qs == ts).sum())
    elif mode == RESCORE_MODE_SUBSTITUTION:
        res.score = _local_max(amat[qs, ts])
    elif mode == RESCORE_MODE_ALIGNMENT:
        res.start, res.end, res.score = _local_max_start_end(amat[qs, ts])
    elif mode == RESCORE_MODE_GLOBAL_ALIGNMENT:
        first = 1 if (qs[0] == ord("*") or ts[0] == ord("*")) else 0
        last = n - 1
        if last > 0 and (qs[last] == ord("*") or ts[last] == ord("*")):
            last -= 1
        res.score = max(int(amat[qs[first:last + 1],
                                 ts[first:last + 1]].sum()), 0)
        res.start, res.end = first, last
    else:
        raise ValueError(f"bad rescore mode {mode}")
    return res


def compute_ungapped_alignment(q: np.ndarray, t: np.ndarray, diag_u16: int,
                               mode: int, amat: np.ndarray) -> LocalAln:
    """computeUngappedAlignment: resolve the u16-wrapped diagonal by
    trying every division, keep the best score."""
    best = LocalAln()
    lq, lt = len(q), len(t)
    for div in range(1, 2 + lt // 32768):
        tmp = _aln_by_diagonal(q, t, -div * 65536 + diag_u16, mode, amat)
        if tmp.score > best.score:
            best = tmp
    for div in range(0, 1 + lq // 65536):
        tmp = _aln_by_diagonal(q, t, div * 65536 + diag_u16, mode, amat)
        if tmp.score > best.score:
            best = tmp
    return best


def _compute_seq_id(mode: int, ids: int, qlen: int, tlen: int,
                    alnlen: int) -> float:
    if mode == SEQ_ID_SHORT:
        return ids / min(qlen, tlen)
    if mode == SEQ_ID_LONG:
        return ids / max(qlen, tlen)
    return ids / alnlen if alnlen else 0.0


def _compute_cov(start: int, end: int, length: int) -> float:
    return (min(length, max(start, end)) - min(start, end) + 1) / length


def rescore_rows(rows, q_ascii: np.ndarray, target_ascii, matrix_name: str,
                 matrix: ScoringMatrix, db_residues: int,
                 rescore_mode: int = RESCORE_MODE_HAMMING,
                 e_thr: float = 0.001, seq_id_thr: float = 0.0,
                 cov_thr: float = 0.0, aln_len_thr: int = 0,
                 seq_id_mode: int = SEQ_ID_ALN_LEN,
                 add_backtrace: bool = False,
                 amat: Optional[np.ndarray] = None,
                 evaluer: Optional[EvalueComputer] = None):
    """doRescorediagonal for one query entry.

    rows: prefilter rows [targetKey, prefScore, diagonal]; target_ascii:
    key -> ASCII uint8 array. Returns text rows — prefilter-format for
    modes 0/1, alignment-format for modes 2/3."""
    if amat is None:
        amat = ascii_submat(matrix)
    if evaluer is None:
        evaluer = EvalueComputer(
            gumbel_params(matrix_name, 0, 0, gapped=False), db_residues)
    q_len = len(q_ascii)
    out = []
    for row in rows:
        tkey = int(row[0])
        diag_u16 = int(row[2]) & 0xFFFF
        t_ascii = target_ascii(tkey)
        t_len = len(t_ascii)
        aln = compute_ungapped_alignment(q_ascii, t_ascii, diag_u16,
                                         rescore_mode, amat)
        if aln.diagonal_len == 0:
            continue
        distance = aln.score
        q_cov = aln.diagonal_len / q_len
        t_cov = aln.diagonal_len / t_len
        seq_id = 0.0
        evalue = 0.0
        bit_score = 0
        aln_len = 0
        result_row = None
        if rescore_mode == RESCORE_MODE_HAMMING:
            seq_id = _compute_seq_id(seq_id_mode, distance, q_len, t_len,
                                     aln.diagonal_len)
            aln_len = aln.diagonal_len
        else:
            evalue = float(evaluer.evalue(distance, q_len))
            bit_score = int(evaluer.bit_score(distance) + 0.5)
            if rescore_mode in (RESCORE_MODE_ALIGNMENT,
                                RESCORE_MODE_GLOBAL_ALIGNMENT):
                aln_len = aln.end - aln.start + 1
                if aln.diagonal >= 0:
                    q_s = aln.start + aln.dist_to_diagonal
                    q_e = aln.end + aln.dist_to_diagonal
                    t_s, t_e = aln.start, aln.end
                else:
                    q_s, q_e = aln.start, aln.end
                    t_s = aln.start + aln.dist_to_diagonal
                    t_e = aln.end + aln.dist_to_diagonal
                if evalue <= e_thr:
                    qa = q_ascii[q_s:q_e + 1] & np.uint8(0xDF)
                    ta = t_ascii[t_s:t_e + 1] & np.uint8(0xDF)
                    seq_id = _compute_seq_id(seq_id_mode, int((qa == ta).sum()),
                                             q_len, t_len, aln_len)
                q_cov = _compute_cov(q_s, q_e, q_len)
                t_cov = _compute_cov(t_s, t_e, t_len)
                from .align import format_seq_id
                fields = [str(tkey), str(bit_score),
                          format_seq_id(np.float32(seq_id)),
                          f"{evalue:.3E}", str(q_s), str(q_e), str(q_len),
                          str(t_s), str(t_e), str(t_len)]
                if add_backtrace:
                    fields.append(f"{aln_len}M")
                result_row = fields
        has_cov = (cov_thr == 0.0
                   or (q_cov >= cov_thr - 1e-6 and t_cov >= cov_thr - 1e-6))
        has_seq_id = seq_id >= (seq_id_thr - np.finfo(np.float32).eps)
        has_eval = evalue <= e_thr
        has_aln_len = aln_len >= aln_len_thr
        if has_aln_len and has_cov and has_seq_id and has_eval:
            if rescore_mode in (RESCORE_MODE_ALIGNMENT,
                                RESCORE_MODE_GLOBAL_ALIGNMENT):
                out.append(result_row)
            elif rescore_mode == RESCORE_MODE_SUBSTITUTION:
                out.append([str(tkey), str(bit_score), str(aln.diagonal)])
            else:
                out.append([str(tkey), str(int(100 * seq_id)),
                            str(aln.diagonal)])
    return out
