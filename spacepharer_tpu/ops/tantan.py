"""tantan low-complexity masking (Frith 2011), no-gap configuration.

Parity target: tantan::maskSequences as invoked by the index builder
(lib/mmseqs/src/prefiltering/IndexBuilder.cpp:139-149, algorithm in
lib/mmseqs/src/commons/tantan.cpp) with maxCycleLength=50,
repeatProb=0.005, repeatEndProb=0.05, repeatOffsetProbDecay=0.9,
no gaps, minMaskProb=0.9.

The model is a background/foreground HMM over repeat offsets 1..50.
Likelihood ratios come from the k-mer substitution matrix:
ratio[a][b] = P_ab / (p_a p_b) (ProbabilityMatrix, BaseMatrix.h:80-103).
Forward pass records the (rescaled) background probability per position;
backward pass converts it into P(repeat); positions with
P(repeat) >= minMaskProb are masked to X.

Numerical details preserved: rescaling by 1/background every 16
positions, float32 rounding of the per-position probability before the
final comparison, forward/backward update order.
"""
import numpy as np

from .matrices import ScoringMatrix

MAX_CYCLE = 50
REPEAT_PROB = 0.005
REPEAT_END_PROB = 0.05
DECAY = 0.9
MIN_MASK_PROB = 0.9
SCALE_STEP = 16


def likelihood_ratios(matrix: ScoringMatrix) -> np.ndarray:
    """ratio[a][b] = P_ab / (p_a p_b) over the matrix alphabet."""
    return matrix.prob / (matrix.p_back[:, None] * matrix.p_back[None, :])


def repeat_probabilities(seq_num: np.ndarray, ratios: np.ndarray,
                         max_offset: int = MAX_CYCLE,
                         repeat_prob: float = REPEAT_PROB,
                         repeat_end_prob: float = REPEAT_END_PROB,
                         decay: float = DECAY) -> np.ndarray:
    """Per-position repeat probability (float32), tantan no-gap model.

    seq_num: numeric sequence (indices into the ratio matrix alphabet).
    """
    n = len(seq_num)
    if n == 0:
        return np.zeros(0, dtype=np.float32)

    b2b = 1.0 - repeat_prob
    f2b = repeat_end_prob
    f2f0 = 1.0 - repeat_end_prob
    # firstRepeatOffsetProb(decay, maxOffset)
    b2f_first = repeat_prob * (1 - decay) / (1 - decay ** max_offset)
    b2f = b2f_first * decay ** np.arange(max_offset)

    # per-position emission rows: ratio[seq[t]][seq[t-i-1]] for offsets i
    seq_num = np.asarray(seq_num, dtype=np.int64)

    fg = np.zeros(max_offset, dtype=np.float64)
    bg = 1.0
    letter_probs = np.zeros(n, dtype=np.float32)
    scale_factors = np.zeros(n // SCALE_STEP, dtype=np.float64)

    for t in range(n):
        m = min(t, max_offset)
        if m > 0:
            em = ratios[seq_num[t], seq_num[t - 1 - np.arange(m)]]
            from_fg = fg[:m].sum()
            fg[:m] = (bg * b2f[:m] + fg[:m] * f2f0) * em
        else:
            from_fg = 0.0
        bg = bg * b2b + from_fg * f2b
        if t % SCALE_STEP == SCALE_STEP - 1:
            scale = 1.0 / bg
            scale_factors[t // SCALE_STEP] = scale
            bg *= scale
            fg *= scale
        letter_probs[t] = np.float32(bg)

    z = bg * b2b + fg.sum() * f2b

    # backward
    bg = b2b
    fg = np.full(max_offset, f2b, dtype=np.float64)
    one = np.float32(1.0)
    for t in range(n - 1, -1, -1):
        non_repeat = np.float64(letter_probs[t]) * bg / z
        letter_probs[t] = one - np.float32(non_repeat)
        if t % SCALE_STEP == SCALE_STEP - 1:
            scale = scale_factors[t // SCALE_STEP]
            bg *= scale
            fg *= scale
        m = min(t, max_offset)
        to_bg = f2b * bg
        if m > 0:
            em = ratios[seq_num[t], seq_num[t - 1 - np.arange(m)]]
            femit = fg[:m] * em
            to_fg = (b2f[:m] * femit).sum()
            fg[:m] = to_bg + f2f0 * femit
        else:
            to_fg = 0.0
        bg = b2b * bg + to_fg

    return letter_probs


def mask_sequence(seq_num: np.ndarray, ratios: np.ndarray, x_index: int,
                  min_mask_prob: float = MIN_MASK_PROB) -> np.ndarray:
    """Return seq_num with repeat positions set to x_index."""
    probs = repeat_probabilities(seq_num, ratios)
    out = np.asarray(seq_num).copy()
    out[probs >= np.float32(min_mask_prob)] = x_index
    return out
