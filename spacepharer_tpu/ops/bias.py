"""Local amino-acid composition bias correction.

Parity target: SubstitutionMatrix::calcLocalAaBiasCorrection
(lib/mmseqs/src/commons/SubstitutionMatrix.cpp:85-114): window of 40
centered at each position (minPos = max(0, i-20), maxPos = min(N, i+20)),
  bias[i] = -(sum_{j in win, j != i} S[q_i][q_j]) / winLen
            + sum_a pBack[a] * S[q_i][a]
Computed banded (offsets -20..19) so it scales to long ORFs.
"""
import numpy as np

from .matrices import ScoringMatrix

_EXPECTED_TAB = {}


def expected_score_tab(matrix: ScoringMatrix) -> np.ndarray:
    """Per-letter expected score sum_a pBack[a] * S[x][a], float64 [A].

    Canonical table for the bias correction: the dgemv result of
    ``rows @ p_back`` varies in the last ulp with the row count (BLAS
    kernel selection), so every engine (per-seq, batch, native C)
    gathers from this one fixed table instead — bit-identical bias
    across engines by construction."""
    key = id(matrix.scores)
    tab = _EXPECTED_TAB.get(key)
    if tab is None:
        tab = matrix.scores.astype(np.float64) @ matrix.p_back
        _EXPECTED_TAB[key] = tab
    return tab


def local_aa_bias(seq_num: np.ndarray, matrix: ScoringMatrix) -> np.ndarray:
    """float64 bias per position. The reference accumulates int scores and
    divides in float; differences are below the later int-rounding."""
    n = len(seq_num)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    s = matrix.scores.astype(np.float64)
    seq_num = np.asarray(seq_num, dtype=np.int64)
    rows = s[seq_num]                       # [n, A] = S[q_i][:]
    win_sum = np.zeros(n, dtype=np.float64)
    i = np.arange(n)
    # window j in [max(0,i-20), min(n,i+20)) — offsets -20..19 inclusive
    for d in range(-20, 20):
        j = i + d
        ok = (j >= 0) & (j < n)
        win_sum[ok] += rows[i[ok], seq_num[j[ok]]]
    win_len = (np.minimum(n, i + 20) - np.maximum(0, i - 20)).astype(np.float64)
    win_sum -= rows[i, seq_num]             # remove own amino acid
    expected = expected_score_tab(matrix)[seq_num]
    return -win_sum / win_len + expected


def local_aa_bias_batch(seqs: list, matrix: ScoringMatrix) -> list:
    """local_aa_bias over a batch of sequences (padded, masked windows).

    Same arithmetic as the per-sequence version; the window never
    crosses sequence boundaries because the offset contributions are
    masked per sequence length.
    """
    B = len(seqs)
    if B == 0:
        return []
    lens = np.array([len(s) for s in seqs], dtype=np.int64)
    L = int(lens.max()) if B else 0
    if L == 0:
        return [np.zeros(0) for _ in seqs]
    mat = np.zeros((B, L), dtype=np.int64)
    for b, s in enumerate(seqs):
        mat[b, :len(s)] = s
    s_tab = matrix.scores.astype(np.float64)
    rows = s_tab[mat]                          # [B, L, A]
    win_sum = np.zeros((B, L), dtype=np.float64)
    i = np.arange(L)
    valid_pos = i[None, :] < lens[:, None]
    for d in range(-20, 20):
        j = i + d
        ok = (j >= 0) & (j < L)
        jc = np.clip(j, 0, L - 1)
        contrib = np.take_along_axis(
            rows, mat[:, jc][:, :, None], axis=2)[:, :, 0]
        ok_b = ok[None, :] & (jc[None, :] < lens[:, None])
        win_sum += np.where(ok_b, contrib, 0.0)
    win_len = (np.minimum(lens[:, None], i[None, :] + 20)
               - np.maximum(0, i[None, :] - 20)).astype(np.float64)
    diag = np.take_along_axis(rows, mat[:, :, None], axis=2)[:, :, 0]
    win_sum -= diag
    expected = expected_score_tab(matrix)[mat]
    with np.errstate(divide="ignore", invalid="ignore"):
        bias = -win_sum / win_len + expected
    return [bias[b, :lens[b]] for b in range(B)]


def round_half_away(x):
    """C-style (int)(x < 0 ? x - 0.5 : x + 0.5) rounding."""
    x = np.asarray(x, dtype=np.float64)
    return np.where(x < 0, np.ceil(x - 0.5), np.floor(x + 0.5)).astype(np.int64)
