"""Genetic-code translation as a vectorized 16x16x16 codon LUT.

Behavioral parity target: TranslateNucl
(lib/mmseqs/src/commons/TranslateNucl.h:380-500):

* IUPAC ambiguity codes are expanded; if all expansions agree the codon
  translates to that residue, partial agreement yields B (D/N), Z (E/Q),
  J (I/L), otherwise X. Codons containing gaps/unknowns yield X.
* Stop codons translate to '*'.
* Start/stop codon *sets* (used by the ORF finder) contain only the
  unambiguous codons from the code table.

Only translation tables actually reachable through the product CLI are
embedded (canonical id=1 is the SpacePHARER default; others can be added
by extending _NCBIEAA). Tables are NCBI gc.prt strings in TCAG order.
"""
from functools import lru_cache

import numpy as np

from ..alphabet import encode_iupac4

# (ncbieaa, sncbieaa) per NCBI translation-table id, TCAG order.
_NCBIEAA = {
    1: (
        "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
        "---M------**--*----M---------------M----------------------------",
    ),
    4: (
        "FFLLSSSSYY**CCWWLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
        "--MM------**-------M------------MMMM---------------M------------",
    ),
    11: (
        "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
        "---M------**--*----M---------------M---------------M------------",
    ),
}

# IUPAC 4-bit code: bit 0 = A, bit 1 = C, bit 2 = G, bit 3 = T
# (matches '-ACMGRSVTWYHKDBN' index semantics).
_BITS_A, _BITS_C, _BITS_G, _BITS_T = 1, 2, 4, 8
# T=0 C=1 A=2 G=3 index into the 64-char code string, per expansion base.
_CODE_IDX = {_BITS_T: 0, _BITS_C: 1, _BITS_A: 2, _BITS_G: 3}
_BASE_CHAR = {_BITS_A: "A", _BITS_C: "C", _BITS_G: "G", _BITS_T: "T"}


@lru_cache(maxsize=None)
def codon_tables(table_id: int = 1):
    """Build (aa_lut[16,16,16] uint8-ASCII, stop_codons, start_codons).

    aa_lut is indexed by the IUPAC 4-bit codes of the three codon bases.
    stop/start codon lists are 3-letter ACGT strings (unambiguous only),
    sorted by TCAG codon index like TranslateNucl::getCodons.
    """
    try:
        ncbieaa, sncbieaa = _NCBIEAA[table_id]
    except KeyError:
        raise ValueError(
            f"translation table {table_id} not embedded; add it to _NCBIEAA"
        ) from None

    aa_lut = np.full((16, 16, 16), ord("X"), dtype=np.uint8)
    stops: set[int] = set()
    starts: set[int] = set()

    expansions = (_BITS_A, _BITS_C, _BITS_G, _BITS_T)
    for i in range(16):
        for j in range(16):
            for k in range(16):
                aa = None
                for x in expansions:
                    if not (x & i):
                        continue
                    for y in expansions:
                        if not (y & j):
                            continue
                        for z in expansions:
                            if not (z & k):
                                continue
                            cd = 16 * _CODE_IDX[x] + 4 * _CODE_IDX[y] + _CODE_IDX[z]
                            ch = ncbieaa[cd]
                            if aa is None:
                                aa = ch
                                if ch == "*":
                                    stops.add(cd)
                            elif aa != ch:
                                if aa in "BDN" and ch in "DN":
                                    aa = "B"
                                elif aa in "ZEQ" and ch in "EQ":
                                    aa = "Z"
                                elif aa in "JIL" and ch in "IL":
                                    aa = "J"
                                else:
                                    aa = "X"
                            if sncbieaa[cd] == "M":
                                starts.add(cd)
                if aa is not None:
                    aa_lut[i, j, k] = ord(aa)

    def _codon_str(cd: int) -> str:
        # TCAG positional decode, mirrors TranslateNucl::getCodons.
        chars = "TCAG"
        return chars[cd // 16] + chars[(cd % 16) // 4] + chars[cd % 4]

    stop_list = [_codon_str(c) for c in sorted(stops)]
    start_list = [_codon_str(c) for c in sorted(starts)]
    return aa_lut, stop_list, start_list


def translate(nucl_ascii: np.ndarray, table_id: int = 1) -> np.ndarray:
    """Translate a uint8 ASCII nucleotide array -> uint8 ASCII amino acids.

    Length is truncated to a multiple of 3 (caller is expected to pass
    in-frame sequences). Lower-case codons yield lower-case residues,
    matching TranslateNucl::translate's case propagation.
    """
    aa_lut, _, _ = codon_tables(table_id)
    n = (len(nucl_ascii) // 3) * 3
    if n == 0:
        return np.zeros(0, dtype=np.uint8)
    tri = nucl_ascii[:n].reshape(-1, 3)
    codes = encode_iupac4(tri)
    aa = aa_lut[codes[:, 0], codes[:, 1], codes[:, 2]]
    lower = np.any((tri >= ord("a")) & (tri <= ord("z")), axis=1)
    aa = np.where(lower & (aa >= ord("A")) & (aa <= ord("Z")), aa + 32, aa)
    return aa.astype(np.uint8)


def translate_batch(flat_nucl: np.ndarray, offsets: np.ndarray, table_id: int = 1):
    """Translate many concatenated in-frame sequences at once.

    flat_nucl: uint8 ASCII concatenation; offsets: int64 [N+1] boundaries
    with every (offsets[i+1]-offsets[i]) % 3 == 0.
    Returns (flat_aa, aa_offsets).
    """
    aa_lut, _, _ = codon_tables(table_id)
    from ..native import get_lib
    lib = get_lib()
    if lib is not None:
        from ..alphabet import _IUPAC_LUT
        flat_c = np.ascontiguousarray(flat_nucl, dtype=np.uint8)
        lut4096 = np.ascontiguousarray(aa_lut.reshape(-1), dtype=np.uint8)
        out = np.empty(len(flat_c) // 3, dtype=np.uint8)
        lib.translate_flat(flat_c.ctypes.data, len(flat_c),
                           _IUPAC_LUT.ctypes.data, lut4096.ctypes.data,
                           out.ctypes.data)
        return out, offsets // 3
    codes = encode_iupac4(flat_nucl)
    tri = codes.reshape(-1, 3)
    idx = tri[:, 0].astype(np.uint16) << np.uint16(8)
    idx |= tri[:, 1].astype(np.uint16) << np.uint16(4)
    idx |= tri[:, 2]
    aa = aa_lut.reshape(-1)[idx]
    if len(flat_nucl) and int(flat_nucl.max()) >= ord("a"):
        tri_ascii = flat_nucl.reshape(-1, 3)
        lower = np.any((tri_ascii >= ord("a")) & (tri_ascii <= ord("z")),
                       axis=1)
        aa = np.where(lower & (aa >= ord("A")) & (aa <= ord("Z")),
                      aa + 32, aa).astype(np.uint8)
    return aa, offsets // 3
