"""Codon-order reversal: the null-model sequence transform.

Parity target: reverseseqbycodon (src/util/ReverseSeqByCodon.cpp:41-49):
walk the sequence from the back, group bytes into triples, and reverse
each triple — i.e. codon order is reversed while each codon keeps its
internal base order and the reading frame is preserved. A trailing
partial codon (len % 3 != 0) is dropped, like the reference's leftover
`codon` buffer that never reaches size 3.
"""
import numpy as np


def reverse_by_codon(seq: np.ndarray) -> np.ndarray:
    """uint8 ASCII nucleotide array -> codon-reversed array."""
    n = (len(seq) // 3) * 3
    # reference iterates from the back; with len % 3 != 0 the *first*
    # (len % 3) bytes of the reversed stream form the dropped partial
    # codon, which corresponds to the first bytes of the input.
    rem = len(seq) - n
    tri = seq[rem:].reshape(-1, 3)
    return tri[::-1].reshape(-1).copy()


def reverse_by_codon_flat(flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Codon-reverse each piece of a concatenated buffer.

    All piece lengths must be multiples of 3 (in-frame ORFs)."""
    if len(flat) == 0:
        return flat.copy()
    from ..native import get_lib
    lib = get_lib()
    if lib is not None:
        flat_c = np.ascontiguousarray(flat, dtype=np.uint8)
        offs_c = np.ascontiguousarray(offsets, dtype=np.int64)
        out = np.empty(len(flat), dtype=np.uint8)
        lib.reverse_codons_ranges(flat_c.ctypes.data, offs_c.ctypes.data,
                                  len(offsets) - 1, out.ctypes.data)
        return out
    lens = np.diff(offsets)
    starts_rep = np.repeat(offsets[:-1], lens)
    lens_rep = np.repeat(lens, lens)
    local = np.arange(len(flat), dtype=np.int64) - starts_rep
    src_local = lens_rep - 3 - 3 * (local // 3) + local % 3
    return flat[starts_rep + src_local]
