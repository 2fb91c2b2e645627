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
