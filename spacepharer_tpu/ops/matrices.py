"""Substitution matrices: parsing, probability reconstruction, rescaling.

Parity target: SubstitutionMatrix / BaseMatrix
(lib/mmseqs/src/commons/SubstitutionMatrix.cpp:327-408,
BaseMatrix.cpp:109-156). The .out files carry integer scores in half-bit
units plus precomputed lambda/background in comments; mmseqs converts
scores -> probabilities (P_ab = exp(lambda * S_ab) * p_a * p_b, with the
background rescaled by (1 - p_X) when X scores are non-positive) and
back to integers at a chosen ``bit_factor``:
    S'_ab = round(bit_factor * log2(P_ab / (p'_a p'_b)) + bias)
where p' is the row-sum background of the reconstructed P.

Shipped matrices (spacepharer_tpu/data): VTML40.out, VTML80.out
(Mueller & Vingron VTML series), nucleotide.out — the same public
matrix data the reference embeds.
"""
import os
from dataclasses import dataclass
from functools import lru_cache

import numpy as np

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "data")
ANY_BACK = 1e-5  # BaseMatrix ANY_BACK for X background


@dataclass
class ScoringMatrix:
    name: str
    alphabet: str            # row/col order, e.g. "ACDEFGHIKLMNPQRSTVWYX"
    scores: np.ndarray       # int32 [A, A] rescaled integer scores
    p_back: np.ndarray       # float64 [A] the matrix's background distribution
                             # (file values scaled by (1-p_X); the reference's
                             # member pBack, SubstitutionMatrix.cpp:393-399)
    prob: np.ndarray         # float64 [A, A] joint probabilities
    lambda_file: float       # lambda from the matrix file (for file-score units)
    bit_factor: float
    sub_scores_float: np.ndarray  # float64 [A, A] unrounded bit_factor-scaled


def _parse_out_file(path: str):
    alphabet = None
    rows = {}
    lam = None
    p_back = None
    with open(path) as fh:
        for line in fh:
            if line.startswith("#"):
                if line.startswith("# Background (precomputed optional):"):
                    p_back = np.array([float(x) for x in line.split(":")[1].split()])
                elif line.startswith("# Lambda     (precomputed optional):"):
                    lam = float(line.split(":")[1].split()[0])
                continue
            parts = line.split()
            if len(parts) < 2:
                continue
            if alphabet is None:
                alphabet = "".join(p[0].upper() for p in parts)
                continue
            rows[parts[0].upper()] = [float(x) for x in parts[1:]]
    a = len(alphabet)
    s = np.zeros((a, a), dtype=np.float64)
    for i, c in enumerate(alphabet):
        s[i] = rows[c]
    return alphabet, s, lam, p_back


@lru_cache(maxsize=None)
def load_matrix(name: str, bit_factor: float = 2.0,
                score_bias: float = 0.0) -> ScoringMatrix:
    """Load a shipped (or absolute-path) .out matrix at a bit factor."""
    path = name if os.path.isabs(name) else os.path.join(DATA_DIR, name)
    alphabet, s_file, lam, p_back = _parse_out_file(path)
    a = len(alphabet)
    if lam is None or p_back is None:
        raise ValueError(
            f"{name}: matrices without precomputed lambda/background need "
            "the lambda estimation path (not yet implemented)")
    x = alphabet.index("X")
    x_positive = bool((s_file[x, :] > 0).any() or (s_file[:, x] > 0).any())
    p = p_back.copy()
    if not x_positive:
        mask = np.arange(a) != x
        p[mask] *= 1.0 - p[x]
    prob = np.exp(lam * s_file) * p[:, None] * p[None, :]
    # integer rescale uses the *row-sum* background with X pinned to
    # ANY_BACK (generateSubMatrix -> computeBackground, BaseMatrix.cpp:96-130);
    # everything else (bias correction, tantan ratios, ALP) uses the
    # member background p.
    p2 = prob.sum(axis=1)
    p2[a - 1] = ANY_BACK
    with np.errstate(divide="ignore"):
        sub_float = bit_factor * np.log2(prob / (p2[:, None] * p2[None, :])) + score_bias
    scores = np.where(sub_float < 0.0, sub_float - 0.5, sub_float + 0.5).astype(np.int32)
    return ScoringMatrix(os.path.basename(path), alphabet, scores, p, prob,
                         lam, bit_factor, sub_float)


@lru_cache(maxsize=None)
def load_nucleotide_matrix(name: str = "nucleotide.out", bit_factor: float = 1.0,
                           score_bias: float = 0.0) -> ScoringMatrix:
    """NucleotideMatrix parity: same pipeline, ACTG X alphabet."""
    return load_matrix(name, bit_factor, score_bias)


def expected_score(m: ScoringMatrix) -> float:
    return float((m.p_back[:, None] * m.p_back[None, :] * m.scores).sum())
