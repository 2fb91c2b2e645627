"""Sequence alphabets and vectorized encodings.

Conventions (kept framework-wide):

* Raw sequences are stored as uint8 ASCII arrays (IUPAC codes preserved,
  case preserved) so that edge-format fidelity is retained.
* Amino-acid compute encoding: indices into the substitution-matrix row
  order ``A C D E F G H I K L M N P Q R S T V W Y X`` (X = 20), matching
  the reference's matrix-file order (lib/mmseqs/data/VTML40.out).
* Nucleotide compute encoding: indices into ``A C T G X`` (X = 4),
  matching lib/mmseqs/data/nucleotide.out row order.
* IUPAC 4-bit encoding for translation: A=1, C=2, G=4, T/U=8, with
  ambiguity codes as bit-unions (mirrors TranslateNucl's EBaseCode,
  lib/mmseqs/src/commons/TranslateNucl.h:240-273).
"""
import numpy as np

AA_ALPHABET = "ACDEFGHIKLMNPQRSTVWYX"
AA_X = 20
NUCL_ALPHABET = "ACTGX"
NUCL_X = 4

# ---------------------------------------------------------------------------
# ASCII -> amino-acid index (unknown -> X). Lower case maps like upper case.
# ---------------------------------------------------------------------------
_AA_LUT = np.full(256, AA_X, dtype=np.uint8)
for _i, _c in enumerate(AA_ALPHABET):
    _AA_LUT[ord(_c)] = _i
    _AA_LUT[ord(_c.lower())] = _i
# mmseqs maps non-standard residues onto standard ones before scoring
# (SubstitutionMatrix::setupLetterMapping): B->D, J->L, O->X, U->X, Z->E.
for _src, _dst in (("B", "D"), ("J", "L"), ("Z", "E"), ("O", "X"), ("U", "X")):
    _AA_LUT[ord(_src)] = AA_ALPHABET.index(_dst)
    _AA_LUT[ord(_src.lower())] = AA_ALPHABET.index(_dst)

# ---------------------------------------------------------------------------
# ASCII -> nucleotide index in "ACTG X" order, with mmseqs's ambiguity
# collapse (NucleotideMatrix::setupLetterMapping, NucleotideMatrix.cpp:17-60):
# U/W -> T, K/B/D/V/R/S -> G, M/Y/H -> C, everything else -> X.
# ---------------------------------------------------------------------------
_NUCL_LUT = np.full(256, NUCL_X, dtype=np.uint8)
for _i, _c in enumerate("ACTG"):
    _NUCL_LUT[ord(_c)] = _i
    _NUCL_LUT[ord(_c.lower())] = _i
for _c, _dst in (("U", 2), ("W", 2), ("K", 3), ("B", 3), ("D", 3), ("V", 3),
                 ("R", 3), ("S", 3), ("M", 1), ("Y", 1), ("H", 1)):
    _NUCL_LUT[ord(_c)] = _dst
    _NUCL_LUT[ord(_c.lower())] = _dst

# ---------------------------------------------------------------------------
# ASCII -> IUPAC 4-bit code (gap/unknown -> 0). '-ACMGRSVTWYHKDBN' order,
# value = index in that string (A=1, C=2, M=3, G=4, ... N=15).
# ---------------------------------------------------------------------------
_IUPAC16 = "-ACMGRSVTWYHKDBN"
_IUPAC_LUT = np.zeros(256, dtype=np.uint8)
for _i, _c in enumerate(_IUPAC16):
    _IUPAC_LUT[ord(_c)] = _i
    _IUPAC_LUT[ord(_c.lower())] = _i
_IUPAC_LUT[ord("U")] = _IUPAC16.index("T")
_IUPAC_LUT[ord("u")] = _IUPAC16.index("T")
_IUPAC_LUT[ord("X")] = _IUPAC16.index("N")
_IUPAC_LUT[ord("x")] = _IUPAC16.index("N")

# ---------------------------------------------------------------------------
# IUPAC reverse complement over raw ASCII. Mirrors Orf::iupacReverseComplementTable
# (lib/mmseqs/src/commons/Orf.cpp:48-52): unknown -> '.', U->A, T->A is NOT
# done here (the table maps T->A? no: ".TVGH..CD..M.KN...YSAABW.R" at 'A'..'Z'
# positions gives A->T, B->V, C->G, D->H, G->C, H->D, K->M, M->K, N->N,
# S->S, T->A, U->A, V->B, W->W, R->Y, Y->R). '.' is the sentinel for
# non-IUPAC bytes; Orf::setSequence converts it to 'N'.
# ---------------------------------------------------------------------------
_REVCOMP_LUT = np.full(256, ord("."), dtype=np.uint8)
_ref_tab = (
    "................................................................"
    ".TVGH..CD..M.KN...YSAABW.R.......tvgh..cd..m.kn...ysaabw.r......"
    "................................................................"
    "................................................................"
)
for _i, _c in enumerate(_ref_tab):
    _REVCOMP_LUT[_i] = ord(_c)


def encode_aa(seq):
    """ASCII bytes/str -> uint8 indices in AA_ALPHABET order."""
    return _AA_LUT[np.frombuffer(_as_bytes(seq), dtype=np.uint8)]


def encode_aa_array(arr: np.ndarray) -> np.ndarray:
    """ASCII uint8 array -> uint8 indices, vectorized (no copy round-trip)."""
    return _AA_LUT[arr]


def encode_nucl(seq):
    """ASCII bytes/str -> uint8 indices in NUCL_ALPHABET ('ACTGX') order."""
    return _NUCL_LUT[np.frombuffer(_as_bytes(seq), dtype=np.uint8)]


def encode_iupac4(arr_or_seq):
    """ASCII -> IUPAC 4-bit codes (0=gap/unknown, 15=N)."""
    if isinstance(arr_or_seq, np.ndarray):
        return _IUPAC_LUT[arr_or_seq]
    return _IUPAC_LUT[np.frombuffer(_as_bytes(arr_or_seq), dtype=np.uint8)]


def revcomp_ascii(arr: np.ndarray, dot_to_n: bool = True) -> np.ndarray:
    """Reverse-complement a uint8 ASCII nucleotide array (IUPAC-aware).

    With ``dot_to_n`` the '.' sentinel for non-IUPAC bytes becomes 'N',
    matching Orf::setSequence (Orf.cpp:146-151).
    """
    out = _REVCOMP_LUT[arr[::-1]]
    if dot_to_n:
        out[out == ord(".")] = ord("N")
    return out


def complement_ascii(arr: np.ndarray) -> np.ndarray:
    """Elementwise IUPAC complement (no reversal, '.' kept as-is)."""
    return _REVCOMP_LUT[arr]


def to_ascii(arr: np.ndarray) -> str:
    return arr.tobytes().decode("ascii")


def _as_bytes(seq):
    if isinstance(seq, bytes):
        return seq
    if isinstance(seq, str):
        return seq.encode("ascii")
    if isinstance(seq, np.ndarray):
        return seq.tobytes()
    raise TypeError(f"unsupported sequence type {type(seq)}")
