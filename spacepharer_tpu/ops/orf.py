"""Six-frame ORF extraction, vectorized.

Behavioral parity target: Orf::findForward
(lib/mmseqs/src/commons/Orf.cpp:228-348) with start modes
START_TO_STOP(0) / ANY_TO_STOP(1) / LAST_START_TO_STOP(2), and
extractorfs's coordinate conventions
(lib/mmseqs/src/util/extractorfs.cpp:80-125):

* Stops are the exact unambiguous codons of the genetic code table; the
  stop codon is never part of the ORF.
* An ORF that runs into the end of the sequence ends at the last
  complete codon (included) and is flagged incomplete-end.
* The first fragment of each frame starts "inside" (incomplete-start);
  in ANY_TO_STOP mode later fragments start right after a stop and are
  (per reference behavior) flagged as having a start codon.
* Lengths are counted in codons excluding the stop; ORFs with more than
  max_gaps codons containing N/non-IUPAC bases are dropped.
* Emission order = ascending end position within a strand, forward
  strand first, then reverse-complement frames — this matches the
  reference's single-pass position loop and fixes ORF key numbering.
* Reported coordinates are on the input contig: for minus-strand ORFs
  from > to (both inclusive, 0-based).
"""
from dataclasses import dataclass

import numpy as np

from ..alphabet import revcomp_ascii
from .translate import codon_tables

START_TO_STOP = 0
ANY_TO_STOP = 1
LAST_START_TO_STOP = 2

# non-IUPAC detection: complement table maps valid IUPAC to a letter, others '.'
from ..alphabet import _REVCOMP_LUT  # noqa: E402

_IS_GAPPY = np.zeros(256, dtype=bool)
for _b in range(256):
    _IS_GAPPY[_b] = (_b in (ord("N"), ord("n"))) or _REVCOMP_LUT[_b] == ord(".")
# reference isGapOrN checks the *uppercased* codon bytes ('N' or complement=='.')
# but lowercase 'n' maps to 'n' complement which is valid, and uppercasing
# happens before the check, so lowercase behaves like uppercase.


@dataclass
class OrfSet:
    """ORFs of one contig. All arrays share length n_orfs."""

    frame_from: np.ndarray  # int64, start pos in strand coordinates
    frame_to: np.ndarray    # int64, end pos in strand coordinates (inclusive)
    contig_from: np.ndarray  # int64, contig coords (minus strand: from > to)
    contig_to: np.ndarray
    incomplete_start: np.ndarray  # bool
    incomplete_end: np.ndarray    # bool
    strand: np.ndarray  # int8, +1 / -1
    length_codons: np.ndarray  # int64


def _find_frames_one_strand(seq: np.ndarray, stops_set, starts_set,
                            min_len, max_len, max_gaps, start_mode):
    """Run the 3 forward frames of one strand. seq is uint8 ASCII.

    Returns list of (emit_pos, from, to, inc_start, inc_end, length).
    """
    L = len(seq)
    upper = seq & np.uint8(0xDF)  # reference uppercases via &~0x20
    results = []
    for f in range(3):
        n = (L - f) // 3
        if n <= 0:
            continue
        cod = upper[f:f + 3 * n].reshape(n, 3)
        c3 = cod[:, 0].astype(np.int64) * 65536 + cod[:, 1].astype(np.int64) * 256 + cod[:, 2]
        stop = np.isin(c3, stops_set)
        gappy = _IS_GAPPY[cod].any(axis=1)
        gap_cum = np.concatenate(([0], np.cumsum(gappy)))

        stop_idx = np.flatnonzero(stop)
        # segment boundaries in codon units: fragments between stops, plus trailing
        seg_starts = np.concatenate(([0], stop_idx + 1))
        seg_stops = np.concatenate((stop_idx, [n]))  # exclusive-of-stop end codon idx
        ends_with_stop = np.ones(len(seg_starts), dtype=bool)
        ends_with_stop[-1] = False
        if len(stop_idx) and stop_idx[-1] == n - 1:
            # last stop is the final codon: trailing segment is empty
            seg_starts = seg_starts[:-1]
            seg_stops = seg_stops[:-1]
            ends_with_stop = ends_with_stop[:-1]

        if start_mode == ANY_TO_STOP:
            frag_starts = seg_starts
            valid = np.ones(len(seg_starts), dtype=bool)
            # reference: fragments started after a stop get hasStartCodon=true
            inc_start = np.zeros(len(seg_starts), dtype=bool)
            inc_start[seg_starts == 0] = True
        elif start_mode == START_TO_STOP:
            is_start = np.isin(c3, starts_set)
            frag_starts = np.zeros(len(seg_starts), dtype=np.int64)
            valid = np.zeros(len(seg_starts), dtype=bool)
            inc_start = np.zeros(len(seg_starts), dtype=bool)
            start_pos = np.flatnonzero(is_start)
            for si in range(len(seg_starts)):
                if si == 0:
                    # initial inside-state fragment: starts at codon 0
                    frag_starts[si] = 0
                    valid[si] = True
                    inc_start[si] = True
                    continue
                lo, hi = seg_starts[si], seg_stops[si]
                j = np.searchsorted(start_pos, lo)
                if j < len(start_pos) and start_pos[j] < hi:
                    frag_starts[si] = start_pos[j]
                    valid[si] = True
        elif start_mode == LAST_START_TO_STOP:
            is_start = np.isin(c3, starts_set)
            frag_starts = np.zeros(len(seg_starts), dtype=np.int64)
            valid = np.zeros(len(seg_starts), dtype=bool)
            inc_start = np.zeros(len(seg_starts), dtype=bool)
            start_pos = np.flatnonzero(is_start)
            for si in range(len(seg_starts)):
                lo = seg_starts[si] if si > 0 else 0
                hi = seg_stops[si]
                j = np.searchsorted(start_pos, hi) - 1
                if j >= 0 and start_pos[j] >= lo:
                    frag_starts[si] = start_pos[j]
                    valid[si] = True
                elif si == 0:
                    frag_starts[si] = 0
                    valid[si] = True
                    inc_start[si] = True
        else:
            raise ValueError(f"bad start_mode {start_mode}")

        lengths = seg_stops - frag_starts
        gaps = gap_cum[seg_stops] - gap_cum[frag_starts]
        keep = (
            valid
            & (lengths >= max(min_len, 1))
            & (lengths <= max_len)
            & (gaps <= max_gaps)
        )
        # reference skips len==0 stop-only fragments implicitly via countLength
        for si in np.flatnonzero(keep):
            c_from = frag_starts[si]
            if ends_with_stop[si]:
                p_from = f + 3 * c_from
                p_stop = f + 3 * seg_stops[si]
                results.append((p_stop, p_from, p_stop - 1, bool(inc_start[si]), False,
                                int(lengths[si])))
            else:
                p_from = f + 3 * c_from
                p_last = f + 3 * (seg_stops[si] - 1)
                results.append((p_last, p_from, p_last + 2, bool(inc_start[si]), True,
                                int(lengths[si])))
    results.sort(key=lambda r: r[0])
    return results


def find_orfs(contig_ascii: np.ndarray,
              min_length: int = 1,
              max_length: int = 2 ** 62,
              max_gaps: int = 2 ** 62,
              forward_frames: bool = True,
              reverse_frames: bool = True,
              start_mode: int = START_TO_STOP,
              table_id: int = 1,
              use_all_table_starts: bool = False) -> OrfSet:
    """Find ORFs on both strands of one contig (uint8 ASCII, no newline).

    ``use_all_table_starts=False`` restricts start codons to ATG, the
    reference default (Orf::Orf, Orf.cpp:73-78).
    """
    aa_lut, stop_list, start_list = codon_tables(table_id)
    if not use_all_table_starts:
        start_list = ["ATG"]

    def _codes(lst):
        return np.array(
            [ord(c[0]) * 65536 + ord(c[1]) * 256 + ord(c[2]) for c in lst],
            dtype=np.int64,
        )

    stops_set = _codes(stop_list)
    starts_set = _codes(start_list)

    L = len(contig_ascii)
    rows = []
    if L >= 3:
        # reference replaces U/u with T/t before scanning (Orf.cpp:141-144)
        seq = contig_ascii.copy()
        seq[seq == ord("U")] = ord("T")
        seq[seq == ord("u")] = ord("t")
        if forward_frames:
            for r in _find_frames_one_strand(seq, stops_set, starts_set,
                                             min_length, max_length, max_gaps,
                                             start_mode):
                rows.append(r + (1,))
        if reverse_frames:
            rc = revcomp_ascii(seq)
            for r in _find_frames_one_strand(rc, stops_set, starts_set,
                                             min_length, max_length, max_gaps,
                                             start_mode):
                rows.append(r + (-1,))

    n = len(rows)
    out = OrfSet(
        frame_from=np.empty(n, dtype=np.int64),
        frame_to=np.empty(n, dtype=np.int64),
        contig_from=np.empty(n, dtype=np.int64),
        contig_to=np.empty(n, dtype=np.int64),
        incomplete_start=np.empty(n, dtype=bool),
        incomplete_end=np.empty(n, dtype=bool),
        strand=np.empty(n, dtype=np.int8),
        length_codons=np.empty(n, dtype=np.int64),
    )
    for i, (_, frm, to, inc_s, inc_e, ln, strand) in enumerate(rows):
        out.frame_from[i] = frm
        out.frame_to[i] = to
        out.incomplete_start[i] = inc_s
        out.incomplete_end[i] = inc_e
        out.strand[i] = strand
        out.length_codons[i] = ln
        if strand > 0:
            out.contig_from[i] = frm
            out.contig_to[i] = to
        else:
            out.contig_from[i] = (L - 1) - frm
            out.contig_to[i] = (L - 1) - to
    return out


def orf_nucl_sequence(contig_ascii: np.ndarray, frame_from: int, frame_to: int,
                      strand: int) -> np.ndarray:
    """Extract the ORF nucleotide sequence in reading direction.

    Mirrors Orf::getSequence: coordinates are in strand space (i.e. on the
    reverse complement for minus-strand ORFs), inclusive.
    """
    seq = contig_ascii.copy()
    seq[seq == ord("U")] = ord("T")
    seq[seq == ord("u")] = ord("t")
    if strand > 0:
        return seq[frame_from:frame_to + 1]
    rc = revcomp_ascii(seq)
    return rc[frame_from:frame_to + 1]
