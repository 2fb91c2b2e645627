"""blastn-mode nucleotide search (mmseqs `search --search-type 3`).

The reference's nucleotide search surface (Search.cpp:32-175 mode
matrix) runs: nucleotide k-mer candidate discovery -> per-(target,
diagonal) rescore -> BandedNucleotideAligner gapped alignment. This
module provides the same surface for the TPU framework:

  * exact k-mer candidate discovery (default k=15, the reference's
    nucleotide prefilter operating point, Parameters.cpp kmerSize
    nucleotide default) via a sorted-code postings array — vectorized
    NumPy, no per-k-mer Python loop;
  * per target, the most-supported u16 diagonal seeds the gapped
    alignment;
  * gapped alignment + E-values via ops/banded_nucl.py — the engine
    that is probe-parity-tested against the reference's own
    BandedNucleotideAligner (gap 5/2, zdrop 40, band 64) — and the
    ALP Gumbel parameters extracted from the reference's evaluer;
  * both strands (minus-strand hits align the rev-comp query and are
    reported with reversed target coordinates, the BLAST m8
    convention).

Output: BLAST tab (m8) rows
  query target pident alnlen mismatch gapopen qstart qend tstart tend
  evalue bits        (1-based inclusive coordinates)
"""
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..alphabet import NUCL_X, encode_nucl, revcomp_ascii
from ..ops.banded_nucl import banded_nucleotide_align
from ..ops.evalue import EvalueComputer, gumbel_params
from ..ops.matrices import load_matrix


def _kmer_codes(num: np.ndarray, k: int):
    """(codes int64 [n-k+1], valid bool): 2-bit-packed k-mers; windows
    containing an ambiguous base are invalid."""
    n = len(num) - k + 1
    if n <= 0:
        return np.zeros(0, np.int64), np.zeros(0, bool)
    num = np.asarray(num, dtype=np.int64)
    ok = num < 4
    codes = np.zeros(n, dtype=np.int64)
    valid = np.ones(n, dtype=bool)
    for off in range(k):
        codes = codes * 4 + np.where(ok[off:off + n], num[off:off + n], 0)
        valid &= ok[off:off + n]
    return codes, valid


@dataclass
class NuclIndex:
    codes: np.ndarray       # int64 sorted
    tid: np.ndarray         # int32, parallel to codes
    tpos: np.ndarray        # int64, parallel to codes
    k: int
    total_res: int


def build_nucl_index(t_nums, k: int = 15) -> NuclIndex:
    parts_c, parts_t, parts_p = [], [], []
    total = 0
    for ti, t in enumerate(t_nums):
        total += len(t)
        codes, valid = _kmer_codes(t, k)
        pos = np.flatnonzero(valid)
        parts_c.append(codes[pos])
        parts_t.append(np.full(len(pos), ti, dtype=np.int32))
        parts_p.append(pos.astype(np.int64))
    if parts_c:
        codes = np.concatenate(parts_c)
        tid = np.concatenate(parts_t)
        tpos = np.concatenate(parts_p)
        order = np.argsort(codes, kind="stable")
        codes, tid, tpos = codes[order], tid[order], tpos[order]
    else:
        codes = np.zeros(0, np.int64)
        tid = np.zeros(0, np.int32)
        tpos = np.zeros(0, np.int64)
    return NuclIndex(codes=codes, tid=tid, tpos=tpos, k=k, total_res=total)


def _candidates(q_num, index: NuclIndex, max_seqs: int):
    """[(tid, u16 diagonal, support)] ranked by k-mer support."""
    codes, valid = _kmer_codes(q_num, index.k)
    qpos = np.flatnonzero(valid)
    if len(qpos) == 0 or len(index.codes) == 0:
        return []
    codes = codes[qpos]
    lo = np.searchsorted(index.codes, codes, side="left")
    hi = np.searchsorted(index.codes, codes, side="right")
    counts = hi - lo
    if counts.sum() == 0:
        return []
    rep_q = np.repeat(qpos, counts)
    idx = np.concatenate([np.arange(l, h) for l, h in zip(lo, hi) if h > l])
    m_tid = index.tid[idx].astype(np.int64)
    m_diag = (rep_q - index.tpos[idx]) & 0xFFFF
    key = m_tid * 65536 + m_diag
    uniq, cnt = np.unique(key, return_counts=True)
    u_tid = uniq // 65536
    u_diag = uniq % 65536
    # per target: the most-supported diagonal (ties -> lower diagonal,
    # since np.unique sorts keys ascending and argmax takes the first)
    out = {}
    for t, d, c in zip(u_tid, u_diag, cnt):
        cur = out.get(int(t))
        if cur is None or c > cur[1]:
            out[int(t)] = (int(d), int(c))
    ranked = sorted(out.items(), key=lambda kv: (-kv[1][1], kv[0]))
    return [(t, d, c) for t, (d, c) in ranked[:max_seqs]]


@dataclass
class NuclHit:
    query: str
    target: str
    pident: float
    alnlen: int
    mismatch: int
    gapopen: int
    q_start: int     # 1-based inclusive, forward-strand coords
    q_end: int
    t_start: int     # t_start > t_end on minus-strand hits
    t_end: int
    evalue: float
    bits: float
    raw_score: int = 0

    def m8_row(self) -> str:
        ev = f"{self.evalue:.3E}"
        return (f"{self.query}\t{self.target}\t{self.pident:.3f}\t"
                f"{self.alnlen}\t{self.mismatch}\t{self.gapopen}\t"
                f"{self.q_start}\t{self.q_end}\t{self.t_start}\t"
                f"{self.t_end}\t{ev}\t{int(round(self.bits))}")


def search_nucl(q_entries, t_entries, k: int = 15, evalue: float = 1e-3,
                gap_open: int = 5, gap_extend: int = 2, zdrop: int = 40,
                max_seqs: int = 300, strand: int = 2,
                index: Optional[NuclIndex] = None):
    """q_entries/t_entries: [(name, ascii uint8 array)].
    strand: 0 = minus only, 1 = plus only, 2 = both.
    Returns {query_name: [NuclHit] sorted by (evalue, -bits)}."""
    mat = load_matrix("nucleotide.out", 1.0).scores
    t_nums = [encode_nucl(seq) for _, seq in t_entries]
    if index is None:
        index = build_nucl_index(t_nums, k)
    evaluer = EvalueComputer(
        gumbel_params("nucleotide.out", gap_open, gap_extend),
        index.total_res)
    out = {}
    for qname, q_ascii in q_entries:
        hits = []
        strands = {0: ("-",), 1: ("+",), 2: ("+", "-")}[strand]
        for sgn in strands:
            if sgn == "+":
                q_num = encode_nucl(q_ascii)
            else:
                q_num = encode_nucl(revcomp_ascii(
                    np.asarray(q_ascii, dtype=np.uint8)))
            qlen = len(q_num)
            for ti, diag, _cnt in _candidates(q_num, index, max_seqs):
                res = banded_nucleotide_align(
                    q_num, t_nums[ti], diag, mat, gap_open, gap_extend,
                    zdrop, evaluer=evaluer)
                if res is None or res.evalue > evalue:
                    continue
                alnlen = len(res.backtrace)
                n_m = res.backtrace.count("M")
                gapopen = 0
                prev = "M"
                for c in res.backtrace:
                    if c != prev and c in "ID":
                        gapopen += 1
                    prev = c
                if sgn == "+":
                    qs, qe = res.q_start + 1, res.q_end + 1
                    ts, te = res.t_start + 1, res.t_end + 1
                else:
                    qs = qlen - res.q_end
                    qe = qlen - res.q_start
                    ts, te = res.t_end + 1, res.t_start + 1
                hits.append(NuclHit(
                    query=qname, target=t_entries[ti][0],
                    pident=res.aa_ids / max(alnlen, 1), alnlen=alnlen,
                    mismatch=n_m - res.aa_ids, gapopen=gapopen,
                    q_start=qs, q_end=qe, t_start=ts, t_end=te,
                    evalue=res.evalue,
                    bits=evaluer.bit_score(res.score),
                    raw_score=res.score))
        hits.sort(key=lambda h: (h.evalue, -h.bits, h.target))
        out[qname] = hits
    return out
