"""sharded_search_step on a multi-device mesh vs the host engine.

Runs on the 8 virtual CPU devices set up in conftest.py — the same
mechanism the driver uses to validate the multi-chip path
(__graft_entry__.dryrun_multichip).
"""
import jax
import numpy as np
import pytest

from spacepharer_tpu.ops.align import _forward_pass
from spacepharer_tpu.ops.matrices import load_matrix
from spacepharer_tpu.parallel.distributed import shard_indices
from spacepharer_tpu.parallel.sharding import (make_mesh, pack_queries,
                                               pack_targets,
                                               sharded_search_step)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def _workload(rng, n_q=8, n_t=16):
    m = load_matrix("VTML40.out", 2.0)
    qs = [rng.integers(0, 20, rng.integers(6, 16)) for _ in range(n_q)]
    ts = [rng.integers(0, 20, rng.integers(20, 60)) for _ in range(n_t)]
    q_prof, q_len = pack_queries(qs, m.scores, 16)
    t_seqs, t_len = pack_targets(ts, 64, x_index=20)
    full = np.zeros((n_q, n_t), dtype=np.int64)
    for qi in range(n_q):
        for ti in range(n_t):
            sub = m.scores[qs[qi]].astype(np.int64)[:, ts[ti]].T
            full[qi, ti], _, _ = _forward_pass(sub, 16, 2)
    return q_prof, q_len, t_seqs, t_len, full


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (4, 2)])
def test_sharded_search_step_topk_matches_host(mesh_shape):
    rng = np.random.default_rng(17)
    q_prof, q_len, t_seqs, t_len, full = _workload(rng)
    mesh = make_mesh(*mesh_shape)
    step = sharded_search_step(mesh, top_k=5)
    scores, idx = step(q_prof, q_len, t_seqs, t_len)
    scores = np.asarray(scores)
    idx = np.asarray(idx)
    want = -np.sort(-full, axis=1)[:, :5]
    assert np.array_equal(scores, want)
    # returned indices must point at targets attaining those scores
    for qi in range(full.shape[0]):
        for k in range(5):
            assert full[qi, idx[qi, k]] == scores[qi, k]


def test_shard_indices_partition():
    for n, s in [(691, 8), (10, 3), (8, 8), (5, 7)]:
        got = np.concatenate([shard_indices(n, s, i) for i in range(s)])
        assert np.array_equal(got, np.arange(n))
