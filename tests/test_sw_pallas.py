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


def test_pallas_batch_matches_host(monkeypatch):
    from spacepharer_tpu.ops.sw_pallas import sw_scores_pallas_batch
    m = load_matrix("VTML40.out", 2.0)
    rng = np.random.default_rng(4)
    qs = [rng.integers(0, 20, rng.integers(5, 30)) for _ in range(16)]
    ts = [rng.integers(0, 20, rng.integers(10, 100)) for _ in range(512)]
    LQ, A, LT = 32, 32, 128
    prof = np.full((16, LQ, A), -(10 ** 6), np.int32)
    qlen = np.zeros((16, 1, 1), np.int32)
    for i, q in enumerate(qs):
        prof[i, :len(q), :21] = m.scores[q]
        qlen[i, 0, 0] = len(q)
    tseqs = np.full((LT, 512), 20, np.int32)
    tlen = np.zeros((1, 512), np.int32)
    for i, t in enumerate(ts):
        tt = t[:LT]
        tseqs[:len(tt), i] = tt
        tlen[0, i] = len(tt)
    scores = np.asarray(sw_scores_pallas_batch(
        prof, qlen, tseqs, tlen, q_tile=8, t_tile=256, interpret=True))
    rng2 = np.random.default_rng(0)
    for _ in range(60):
        qi = int(rng2.integers(0, 16))
        ti = int(rng2.integers(0, 512))
        sub = m.scores[qs[qi]].astype(np.int64)[:, ts[ti][:LT]].T
        ref, _, _ = _forward_pass(sub, 16, 2)
        assert scores[qi, ti] == ref, (qi, ti)
