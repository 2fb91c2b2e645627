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


MAX_SEQ_LEN = 10000      # blastn.sh splitsequence operating point


def _split_chunks(length: int, max_len: int = MAX_SEQ_LEN):
    """splitsequence (mode 1, overlap 0): [(start, len)] chunks."""
    import math
    n = max(1, math.ceil(length / max_len))
    return [(s * max_len, min(max_len, length - s * max_len))
            for s in range(n)]


def search_nucl(q_entries, t_entries, k: int = 15, evalue: float = 1e-3,
                gap_open: int = 5, gap_extend: int = 2, zdrop: int = 40,
                max_seqs: int = 300, strand: int = 2,
                min_ungapped_score: int = 15, index=None):
    """q_entries/t_entries: [(name, ascii uint8 array)].
    strand: 0 = minus only, 1 = plus only, 2 = both.
    Returns {query_name: [NuclHit] in the reference's merged order}.

    Full blastn.sh pipeline parity (mmseqs `search --search-type 3`):
    splitsequence on both sides (10 kb hard chunks) -> extractframes on
    queries (fwd + revcomp) -> nucleotide prefilter (exact spaced
    15-mers, tantan-masked targets, diagonal rescore,
    min-ungapped-score gate, max-seqs histogram;
    ops/nucl_prefilter.py) -> BandedNucleotideAligner gapped alignment
    (probe-parity engine, ops/banded_nucl.py) -> offsetalignment
    coordinate mapping + merge-query + Matcher::compareHits sort ->
    convertalis m8 fields. m8 rows are byte-identical to the reference
    binary's output on pinned fixtures (tests/test_searchnucl_parity.py)
    up to createdb's key shuffle on duplicate targets."""
    from ..ops.align import format_seq_id
    from ..ops.nucl_prefilter import (SPACED_SEED_15, build_nucl_ref_index,
                                      mask_nucl_targets,
                                      nucl_prefilter_query)

    matrix = load_matrix("nucleotide.out", 1.0)
    mat = matrix.scores
    if k == 15:
        pattern = SPACED_SEED_15
    else:
        pattern = np.ones(k, dtype=np.int64)

    # --- splitsequence on targets: chunks keep their parent key ---
    t_chunks = []          # (parent_ti, from0, num)
    for ti, (_, seq) in enumerate(t_entries):
        num = encode_nucl(np.asarray(seq, dtype=np.uint8))
        for start, ln in _split_chunks(len(num)):
            t_chunks.append((ti, start, num[start:start + ln]))
    t_masked = mask_nucl_targets([c[2] for c in t_chunks], matrix)
    idx = build_nucl_ref_index(t_masked, pattern)
    t_res = int(sum(len(c[2]) for c in t_chunks))
    evaluer = EvalueComputer(
        gumbel_params("nucleotide.out", gap_open, gap_extend), t_res)
    t_lens = [len(seq) for _, seq in t_entries]

    out = {}
    strands = {0: ("-",), 1: ("+",), 2: ("+", "-")}[strand]
    for qname, q_ascii in q_entries:
        q_ascii = np.asarray(q_ascii, dtype=np.uint8)
        L = len(q_ascii)
        rows = []
        for sgn in strands:
            # extractframes: '-' = revcomp with origin at L-1
            frame = (encode_nucl(q_ascii) if sgn == "+"
                     else encode_nucl(revcomp_ascii(q_ascii)))
            for start, ln in _split_chunks(len(frame)):
                chunk = frame[start:start + ln]
                # chunk origin on the ORIGINAL strand (splitsequence
                # header rewrite, splitsequence.cpp:97-116)
                c_from = start if sgn == "+" else (L - 1) - start
                for t, _sc, diag in nucl_prefilter_query(
                        chunk, idx, matrix, pattern, max_seqs,
                        min_ungapped_score):
                    r = banded_nucleotide_align(
                        chunk, t_chunks[t][2], diag & 0xFFFF, mat,
                        gap_open, gap_extend, zdrop, evaluer=evaluer)
                    if r is None or r.evalue > evalue:
                        continue
                    bit = int(evaluer.bit_score(r.score) + 0.5)
                    seq_id = (r.aa_ids / len(r.backtrace)
                              if len(r.backtrace) else 0.0)
                    # round-trip through the alignment row text, like
                    # offsetalignment's readAlignmentResults
                    sid = float(format_seq_id(float(np.float32(seq_id))))
                    ev = float(f"{r.evalue:.3E}")
                    # updateOffset (offsetalignment.cpp:90-160)
                    if sgn == "+":
                        qs, qe = c_from + r.q_start, c_from + r.q_end
                    else:
                        qs, qe = c_from - r.q_start, c_from - r.q_end
                    t_parent, t_from, _ = t_chunks[t]
                    ts_, te_ = t_from + r.t_start, t_from + r.t_end
                    alnlen = max(abs(qe - qs), abs(te_ - ts_)) + 1
                    bme = np.float32(min(abs(qe - qs), abs(te_ - ts_)))
                    mism = int(bme * (np.float32(1.0) - np.float32(sid))
                               + np.float32(0.5))
                    rows.append((ev, -bit, t_lens[t_parent], t_parent,
                                 sid, alnlen, mism, qs, qe, ts_, te_,
                                 bit))
        # merge-query: stable sort by Matcher::compareHits
        rows.sort(key=lambda x: x[:4])
        hits = []
        for (ev, nbit, tlen, tp, sid, alnlen, mism, qs, qe, ts_, te_,
             bit) in rows:
            hits.append(NuclHit(
                query=qname, target=t_entries[tp][0],
                pident=sid, alnlen=alnlen, mismatch=mism, gapopen=0,
                q_start=qs + 1, q_end=qe + 1, t_start=ts_ + 1,
                t_end=te_ + 1, evalue=ev, bits=bit))
        out[qname] = hits
    return out
