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


def repeat_probabilities_batch(seqs: list, ratios: np.ndarray,
                               max_offset: int = MAX_CYCLE,
                               repeat_prob: float = REPEAT_PROB,
                               repeat_end_prob: float = REPEAT_END_PROB,
                               decay: float = DECAY) -> list:
    """Vectorized tantan over a batch of sequences at once.

    Identical arithmetic (and therefore bit-identical float64 results)
    to repeat_probabilities, with the batch on the leading axis; per-
    position state updates are masked for sequences already past their
    end, so a bucket can mix lengths.
    """
    B = len(seqs)
    if B == 0:
        return []
    lens = np.array([len(s) for s in seqs], dtype=np.int64)
    L = int(lens.max())
    if L == 0:
        return [np.zeros(0, dtype=np.float32) for _ in seqs]
    seq_mat = np.zeros((B, L), dtype=np.int64)
    for i, s in enumerate(seqs):
        seq_mat[i, :len(s)] = s

    b2b = 1.0 - repeat_prob
    f2b = repeat_end_prob
    f2f0 = 1.0 - repeat_end_prob
    b2f_first = repeat_prob * (1 - decay) / (1 - decay ** max_offset)
    b2f = b2f_first * decay ** np.arange(max_offset)

    fg = np.zeros((B, max_offset), dtype=np.float64)
    bg = np.ones(B, dtype=np.float64)
    letter_probs = np.zeros((B, L), dtype=np.float32)
    scale_factors = np.zeros((B, max(L // SCALE_STEP, 1)), dtype=np.float64)
    offs = np.arange(max_offset)

    for t in range(L):
        active = t < lens
        m = min(t, max_offset)
        if m > 0:
            src = seq_mat[:, t - 1 - offs[:m]]           # [B, m]
            em = ratios[seq_mat[:, t][:, None], src]
            from_fg = fg[:, :m].sum(axis=1)
            new_fg = (bg[:, None] * b2f[:m][None, :] + fg[:, :m] * f2f0) * em
            fg[:, :m] = np.where(active[:, None], new_fg, fg[:, :m])
        else:
            from_fg = np.zeros(B)
        bg = np.where(active, bg * b2b + from_fg * f2b, bg)
        if t % SCALE_STEP == SCALE_STEP - 1:
            scale = np.where(active, 1.0 / bg, 1.0)
            scale_factors[:, t // SCALE_STEP] = np.where(
                active, scale, scale_factors[:, t // SCALE_STEP])
            bg = bg * scale
            fg = fg * np.where(active, scale, 1.0)[:, None]
        letter_probs[:, t] = np.where(active, bg.astype(np.float32),
                                      letter_probs[:, t])

    z = bg * b2b + fg.sum(axis=1) * f2b

    bg = np.full(B, b2b, dtype=np.float64)
    fg = np.full((B, max_offset), f2b, dtype=np.float64)
    one = np.float32(1.0)
    for t in range(L - 1, -1, -1):
        active = t < lens
        non_repeat = letter_probs[:, t].astype(np.float64) * bg / z
        letter_probs[:, t] = np.where(
            active, one - non_repeat.astype(np.float32), letter_probs[:, t])
        if t % SCALE_STEP == SCALE_STEP - 1:
            scale = np.where(active, scale_factors[:, t // SCALE_STEP], 1.0)
            bg = bg * scale
            fg = fg * scale[:, None]
        m = min(t, max_offset)
        to_bg = f2b * bg
        if m > 0:
            src = seq_mat[:, t - 1 - offs[:m]]
            em = ratios[seq_mat[:, t][:, None], src]
            femit = fg[:, :m] * em
            to_fg = (b2f[:m][None, :] * femit).sum(axis=1)
            fg[:, :m] = np.where(active[:, None], to_bg[:, None] + f2f0 * femit,
                                 fg[:, :m])
        else:
            to_fg = np.zeros(B)
        bg = np.where(active, b2b * bg + to_fg, bg)

    return [letter_probs[i, :lens[i]] for i in range(B)]


def mask_sequences_batch(seqs: list, ratios: np.ndarray, x_index: int,
                         min_mask_prob: float = MIN_MASK_PROB,
                         bucket_size: int = 512) -> list:
    """Batched masking; native C when available, else NumPy buckets."""
    from ..native import get_lib
    lib = get_lib()
    if lib is not None:
        return _mask_native(lib, seqs, ratios, x_index, min_mask_prob)
    order = sorted(range(len(seqs)), key=lambda i: len(seqs[i]))
    out = [None] * len(seqs)
    thr = np.float32(min_mask_prob)
    for start in range(0, len(order), bucket_size):
        idxs = order[start:start + bucket_size]
        probs = repeat_probabilities_batch([seqs[i] for i in idxs], ratios)
        for i, p in zip(idxs, probs):
            s = np.asarray(seqs[i]).copy()
            s[p >= thr] = x_index
            out[i] = s
    return out


def _mask_native(lib, seqs, ratios, x_index, min_mask_prob):
    import ctypes
    n = len(seqs)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum([len(s) for s in seqs], out=offsets[1:])
    flat = np.concatenate([np.asarray(s, dtype=np.uint8) for s in seqs]) \
        if n else np.zeros(0, dtype=np.uint8)
    ratios_c = np.ascontiguousarray(ratios, dtype=np.float64)
    mask = np.zeros(len(flat), dtype=np.uint8)
    lib.tantan_mask_batch(
        flat.ctypes.data_as(ctypes.c_void_p),
        offsets.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(n),
        ratios_c.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(ratios_c.shape[1]),
        ctypes.c_int(MAX_CYCLE), ctypes.c_double(REPEAT_PROB),
        ctypes.c_double(REPEAT_END_PROB), ctypes.c_double(DECAY),
        ctypes.c_double(min_mask_prob),
        mask.ctypes.data_as(ctypes.c_void_p))
    out = []
    for i in range(n):
        s = np.asarray(seqs[i]).copy()
        s[mask[offsets[i]:offsets[i + 1]].astype(bool)] = x_index
        out.append(s)
    return out
