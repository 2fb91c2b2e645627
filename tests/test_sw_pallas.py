"""Pallas SW kernel correctness (interpreter mode on CPU)."""
import numpy as np

from spacepharer_tpu.ops.align import _forward_pass
from spacepharer_tpu.ops.matrices import load_matrix
from spacepharer_tpu.ops.sw_pallas import (pack_for_pallas,
                                           sw_scores_one_query_pallas)


def test_pallas_kernel_matches_host():
    rng = np.random.default_rng(4)
    m = load_matrix("VTML40.out", 2.0)
    q = rng.integers(0, 20, 14)
    targets = [rng.integers(0, 20, rng.integers(20, 120)) for _ in range(12)]
    prof, qlen, t_seqs, t_len, T = pack_for_pallas(
        q, m.scores, targets, lt_pad=128, t_tile=256)
    scores = np.asarray(sw_scores_one_query_pallas(
        prof, qlen, t_seqs, t_len, interpret=True))[:T]
    for i, t in enumerate(targets):
        ref, _, _ = _forward_pass(m.scores[q].astype(np.int64)[:, t].T, 16, 2)
        assert scores[i] == ref, i
