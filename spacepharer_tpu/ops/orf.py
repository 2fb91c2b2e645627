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

# byte -> TCAG class (4 = other); stop/start codons are unambiguous, so
# membership tests reduce to a 125-entry LUT over base-5 codon classes
_TCAG_CLASS = np.full(256, 4, dtype=np.uint8)
for _i, _ch in enumerate("TCAG"):
    _TCAG_CLASS[ord(_ch)] = _i


def _codon_class_lut(codon_strs):
    lut = np.zeros(125, dtype=bool)
    for c in codon_strs:
        i0, i1, i2 = (_TCAG_CLASS[ord(x)] for x in c)
        if i0 < 4 and i1 < 4 and i2 < 4:
            lut[i0 * 25 + i1 * 5 + i2] = True
    return lut
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


_EMPTY_FRAMES = (np.zeros(0, np.int64), np.zeros(0, np.int64),
                 np.zeros(0, np.int64), np.zeros(0, bool), np.zeros(0, bool),
                 np.zeros(0, np.int64))

_IS_GAPPY_U8 = _IS_GAPPY.astype(np.uint8)


def _find_frames_native(lib, seq, stops_set, starts_set, min_len, max_len,
                        max_gaps, start_mode):
    """C scan (native.sw_native.find_orfs_strand); same tuple contract
    as _find_frames_one_strand."""
    L = len(seq)
    cap = max(L, 1)
    emit = np.empty(cap, dtype=np.int64)
    frm = np.empty(cap, dtype=np.int64)
    to = np.empty(cap, dtype=np.int64)
    inc_s = np.empty(cap, dtype=np.uint8)
    inc_e = np.empty(cap, dtype=np.uint8)
    ln = np.empty(cap, dtype=np.int64)
    seq_c = np.ascontiguousarray(seq, dtype=np.uint8)
    stops_u8 = stops_set.astype(np.uint8)
    starts_u8 = starts_set.astype(np.uint8)
    n = lib.find_orfs_strand(
        seq_c.ctypes.data, L,
        _TCAG_CLASS.ctypes.data, stops_u8.ctypes.data,
        starts_u8.ctypes.data, _IS_GAPPY_U8.ctypes.data,
        min(min_len, 1 << 62), min(max_len, 1 << 62),
        min(max_gaps, 1 << 62), start_mode,
        emit.ctypes.data, frm.ctypes.data, to.ctypes.data,
        inc_s.ctypes.data, inc_e.ctypes.data, ln.ctypes.data)
    return (emit[:n].copy(), frm[:n].copy(), to[:n].copy(),
            inc_s[:n].astype(bool), inc_e[:n].astype(bool), ln[:n].copy())


def _find_frames_one_strand(seq: np.ndarray, stops_set, starts_set,
                            min_len, max_len, max_gaps, start_mode):
    """Run the 3 forward frames of one strand. seq is uint8 ASCII.

    Returns arrays (emit_pos, from, to, inc_start, inc_end, length),
    sorted by emit_pos (stable across frames, like the reference's
    single position loop).
    """
    L = len(seq)
    upper = seq & np.uint8(0xDF)  # reference uppercases via &~0x20
    parts = []
    for f in range(3):
        n = (L - f) // 3
        if n <= 0:
            continue
        cod = upper[f:f + 3 * n].reshape(n, 3)
        cls = _TCAG_CLASS[cod]
        c125 = cls[:, 0] * np.uint8(25) + cls[:, 1] * np.uint8(5) + cls[:, 2]
        stop = stops_set[c125]
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
        nseg = len(seg_starts)
        if nseg == 0:
            continue

        if start_mode == ANY_TO_STOP:
            frag_starts = seg_starts
            valid = np.ones(nseg, dtype=bool)
            # reference: fragments started after a stop get hasStartCodon=true
            inc_start = np.zeros(nseg, dtype=bool)
            inc_start[seg_starts == 0] = True
        elif start_mode == START_TO_STOP:
            start_pos = np.flatnonzero(starts_set[c125])
            inc_start = np.zeros(nseg, dtype=bool)
            if len(start_pos):
                # first start codon within [seg_start, seg_stop)
                j = np.minimum(np.searchsorted(start_pos, seg_starts),
                               len(start_pos) - 1)
                first = start_pos[j]
                valid = (first >= seg_starts) & (first < seg_stops)
                frag_starts = np.where(valid, first, 0)
            else:
                valid = np.zeros(nseg, dtype=bool)
                frag_starts = np.zeros(nseg, dtype=np.int64)
            # initial inside-state fragment: starts at codon 0
            frag_starts[0] = 0
            valid[0] = True
            inc_start[0] = True
        elif start_mode == LAST_START_TO_STOP:
            start_pos = np.flatnonzero(starts_set[c125])
            inc_start = np.zeros(nseg, dtype=bool)
            if len(start_pos):
                # last start codon within [seg_start, seg_stop)
                j = np.searchsorted(start_pos, seg_stops) - 1
                last = start_pos[np.maximum(j, 0)]
                valid = (j >= 0) & (last >= seg_starts)
                frag_starts = np.where(valid, last, 0)
            else:
                valid = np.zeros(nseg, dtype=bool)
                frag_starts = np.zeros(nseg, dtype=np.int64)
            if not valid[0]:
                frag_starts[0] = 0
                valid[0] = True
                inc_start[0] = True
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
        ki = np.flatnonzero(keep)
        if not len(ki):
            continue
        ews = ends_with_stop[ki]
        p_from = f + 3 * frag_starts[ki]
        p_stop = f + 3 * seg_stops[ki]         # ends-with-stop emit pos
        p_last = p_stop - 3                    # incomplete-end emit pos
        emit = np.where(ews, p_stop, p_last)
        to = np.where(ews, p_stop - 1, p_last + 2)
        parts.append((emit, p_from, to, inc_start[ki], ~ews, lengths[ki]))

    if not parts:
        return _EMPTY_FRAMES
    cols = [np.concatenate([p[c] for p in parts]) for c in range(6)]
    order = np.argsort(cols[0], kind="stable")
    return tuple(col[order] for col in cols)


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

    stops_set = _codon_class_lut(stop_list)
    starts_set = _codon_class_lut(start_list)

    L = len(contig_ascii)
    per_strand = []
    if L >= 3:
        from ..native import get_lib
        lib = get_lib()
        if lib is not None and start_mode in (START_TO_STOP, ANY_TO_STOP,
                                              LAST_START_TO_STOP):
            def scan(s):
                return _find_frames_native(lib, s, stops_set, starts_set,
                                           min_length, max_length, max_gaps,
                                           start_mode)
        else:
            def scan(s):
                return _find_frames_one_strand(s, stops_set, starts_set,
                                               min_length, max_length,
                                               max_gaps, start_mode)
        # reference replaces U/u with T/t before scanning (Orf.cpp:141-144)
        seq = contig_ascii.copy()
        seq[seq == ord("U")] = ord("T")
        seq[seq == ord("u")] = ord("t")
        if forward_frames:
            per_strand.append((1, scan(seq)))
        if reverse_frames:
            per_strand.append((-1, scan(revcomp_ascii(seq))))

    frm = np.concatenate([r[1] for _, r in per_strand]) \
        if per_strand else np.zeros(0, np.int64)
    to = np.concatenate([r[2] for _, r in per_strand]) \
        if per_strand else np.zeros(0, np.int64)
    inc_s = np.concatenate([r[3] for _, r in per_strand]) \
        if per_strand else np.zeros(0, bool)
    inc_e = np.concatenate([r[4] for _, r in per_strand]) \
        if per_strand else np.zeros(0, bool)
    ln = np.concatenate([r[5] for _, r in per_strand]) \
        if per_strand else np.zeros(0, np.int64)
    strand = np.concatenate(
        [np.full(len(r[0]), s, dtype=np.int8) for s, r in per_strand]) \
        if per_strand else np.zeros(0, np.int8)
    minus = strand < 0
    return OrfSet(
        frame_from=frm, frame_to=to,
        contig_from=np.where(minus, (L - 1) - frm, frm),
        contig_to=np.where(minus, (L - 1) - to, to),
        incomplete_start=inc_s, incomplete_end=inc_e,
        strand=strand, length_codons=ln,
    )


def find_orfs_batch(cflat: np.ndarray, coff: np.ndarray,
                    min_length: int = 1,
                    max_length: int = 2 ** 62,
                    max_gaps: int = 2 ** 62,
                    start_mode: int = START_TO_STOP,
                    table_id: int = 1,
                    use_all_table_starts: bool = False):
    """Both-strand ORF scan over MANY contigs in one native call.

    Returns (orf_contig i32, contig_from i64, contig_to i64,
    complete u8 = inc_start | inc_end << 1, nucl_off i64 [n+1],
    nucl_data u8) with the reading-direction nucleotide bytes gathered
    (U->T applied), in find_orfs emission order per contig. Returns
    None when the native library is unavailable (callers fall back to
    the per-contig path)."""
    from ..native import get_lib
    lib = get_lib()
    if lib is None or start_mode not in (START_TO_STOP, ANY_TO_STOP,
                                         LAST_START_TO_STOP):
        return None
    aa_lut, stop_list, start_list = codon_tables(table_id)
    if not use_all_table_starts:
        start_list = ["ATG"]
    stops_u8 = _codon_class_lut(stop_list).astype(np.uint8)
    starts_u8 = _codon_class_lut(start_list).astype(np.uint8)
    rc_lut = _REVCOMP_LUT.copy()
    rc_lut[rc_lut == ord(".")] = ord("N")
    cflat = np.ascontiguousarray(cflat, dtype=np.uint8)
    coff = np.ascontiguousarray(coff, dtype=np.int64)
    nc = len(coff) - 1
    total_nucl = np.zeros(1, dtype=np.int64)
    n = lib.scan_contigs_batch(
        cflat.ctypes.data, coff.ctypes.data, nc,
        _TCAG_CLASS.ctypes.data, stops_u8.ctypes.data,
        starts_u8.ctypes.data, _IS_GAPPY_U8.ctypes.data,
        rc_lut.ctypes.data,
        min(min_length, 1 << 62), min(max_length, 1 << 62),
        min(max_gaps, 1 << 62), start_mode,
        total_nucl.ctypes.data)
    if n < 0:
        lib.scan_contigs_free()
        return None
    orf_contig = np.empty(n + 1, dtype=np.int32)
    c_from = np.empty(n + 1, dtype=np.int64)
    c_to = np.empty(n + 1, dtype=np.int64)
    complete = np.empty(n + 1, dtype=np.uint8)
    nucl_off = np.empty(n + 2, dtype=np.int64)
    nucl_data = np.empty(int(total_nucl[0]) + 1, dtype=np.uint8)
    lib.scan_contigs_fetch(orf_contig.ctypes.data, c_from.ctypes.data,
                           c_to.ctypes.data, complete.ctypes.data,
                           nucl_off.ctypes.data, nucl_data.ctypes.data)
    return (orf_contig[:n], c_from[:n], c_to[:n], complete[:n],
            nucl_off[:n + 1], nucl_data[:int(total_nucl[0])])


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
