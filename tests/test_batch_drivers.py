"""Batched native search drivers vs the per-query oracles.

prefilter_query_batch / align_query_batch (native/search_native.c) must
be bit-identical to prefilter_query / align_query on every query —
including hit order, scores, diagonals, backtraces, and formatted rows.
Randomized corpora cover empty queries, X runs, short queries below the
k-mer span, and collect_all (split-mode) semantics.
"""
import numpy as np
import pytest

from spacepharer_tpu.native import get_lib
from spacepharer_tpu.ops.align import (AlnParams, align_query,
                                       align_query_batch)
from spacepharer_tpu.ops.bias import local_aa_bias_batch
from spacepharer_tpu.ops.evalue import EvalueComputer, gumbel_params
from spacepharer_tpu.ops.matrices import load_matrix
from spacepharer_tpu.ops.prefilter import (PrefilterParams,
                                           SimilarKmerEnumerator,
                                           build_target_index,
                                           prefilter_query,
                                           prefilter_query_batch)

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="no native library")


def _random_corpus(seed, n_q=60, n_t=40):
    rng = np.random.default_rng(seed)
    # biased letter distribution so k-mer matches actually occur
    probs = rng.dirichlet(np.ones(20) * 0.5)
    t_seqs = []
    for _ in range(n_t):
        L = int(rng.integers(20, 300))
        t_seqs.append(rng.choice(20, size=L, p=probs).astype(np.uint8))
    q_seqs = []
    for i in range(n_q):
        if i % 13 == 0:
            q_seqs.append(np.zeros(0, dtype=np.uint8))     # empty
            continue
        if i % 7 == 0:
            L = int(rng.integers(1, 8))                    # below span
        else:
            L = int(rng.integers(8, 80))
        if rng.random() < 0.5 and len(t_seqs):
            # plant a homologous fragment for real hits
            t = t_seqs[int(rng.integers(0, n_t))]
            if len(t) >= L:
                s = int(rng.integers(0, len(t) - L + 1))
                q = t[s:s + L].copy()
                nmut = int(rng.integers(0, max(1, L // 5)))
                for _ in range(nmut):
                    q[int(rng.integers(0, L))] = rng.integers(0, 20)
                q_seqs.append(q.astype(np.uint8))
                continue
        q = rng.choice(20, size=L, p=probs).astype(np.uint8)
        if rng.random() < 0.3 and L > 10:                  # X run
            s = int(rng.integers(0, L - 5))
            q[s:s + 5] = 20
        q_seqs.append(q)
    return q_seqs, t_seqs


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("collect_all", [False, True])
def test_prefilter_batch_matches_oracle(seed, collect_all):
    q_seqs, t_seqs = _random_corpus(seed)
    pp = PrefilterParams()
    index = build_target_index(t_seqs, pp)
    seed_m = load_matrix(pp.seed_matrix, 8.0)
    ung_m = load_matrix(pp.ungapped_matrix, 2.0)
    enum = SimilarKmerEnumerator(seed_m.scores)
    bias = local_aa_bias_batch(q_seqs, seed_m)

    got = prefilter_query_batch(q_seqs, index, pp, seed_m, ung_m,
                                collect_all=collect_all)
    n_hits = 0
    for i, q in enumerate(q_seqs):
        ref = prefilter_query(q, index, pp, enumerator=enum,
                              bias80=bias[i], collect_all=collect_all)
        assert ([(h.target, h.score, h.diagonal) for h in ref]
                == [(h.target, h.score, h.diagonal) for h in got[i]]), i
        n_hits += len(ref)
    assert n_hits > 0      # the corpus must actually exercise hits


@pytest.mark.parametrize("seed", [4, 5])
def test_align_batch_matches_oracle(seed):
    q_seqs, t_seqs = _random_corpus(seed)
    pp = PrefilterParams()
    ap = AlnParams()
    index = build_target_index(t_seqs, pp)
    seed_m = load_matrix(pp.seed_matrix, 8.0)
    ung_m = load_matrix(pp.ungapped_matrix, 2.0)
    m40 = load_matrix(ap.matrix, 2.0)
    t_off = np.zeros(len(t_seqs) + 1, dtype=np.int64)
    np.cumsum([len(t) for t in t_seqs], out=t_off[1:])
    t_flat = np.concatenate(t_seqs).astype(np.uint8)
    evaluer = EvalueComputer(
        gumbel_params(ap.matrix, ap.gap_open, ap.gap_extend),
        int(t_off[-1]))

    hits = prefilter_query_batch(q_seqs, index, pp, seed_m, ung_m)
    cand = [[h.target for h in hl] for hl in hits]
    got = align_query_batch(q_seqs, cand, t_flat, t_off, m40, ap, evaluer)
    n_rows = 0
    for i, q in enumerate(q_seqs):
        ref = align_query(q, cand[i], t_seqs, m40, ap, evaluer)
        assert ([r.row_fields() for r in ref]
                == [r.row_fields() for r in got[i]]), i
        n_rows += len(ref)
    assert n_rows > 0
