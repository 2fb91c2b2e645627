"""Parity of the packed Pallas SW kernel with the verified all-pairs scan."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")


def _reference_scores(qs, ts, matrix, biases, go, ge):
    from spacepharer_tpu.parallel.sharding import (pack_queries,
                                                   pack_targets,
                                                   sw_score_allpairs)
    lq = max(len(q) for q in qs)
    lt = max(len(t) for t in ts)
    q_prof, q_len = pack_queries(qs, matrix, lq, bias_list=biases)
    t_seqs, t_len = pack_targets(ts, lt, x_index=20)
    return np.asarray(sw_score_allpairs(q_prof, q_len, t_seqs, t_len,
                                        go, ge))


def _packed_scores(qs, ts, matrix, biases, go, ge, t_tile=128,
                   sq_block=2048, seg_len=32, depth_cap=4096):
    from spacepharer_tpu.ops.sw_packed import (allpairs_scores,
                                               pack_query_rows,
                                               pack_targets_segmented)
    pack = pack_query_rows(qs, matrix, bias_list=biases,
                           gap_open=go, gap_extend=ge, sq_block=sq_block)
    tpack = pack_targets_segmented(ts, seg_len=seg_len, t_tile=t_tile,
                                   depth_cap=depth_cap)
    return np.asarray(allpairs_scores(
        pack, tpack, gap_open=go, gap_extend=ge, interpret=True))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_packed_matches_allpairs_scan(seed):
    from spacepharer_tpu.ops.matrices import load_matrix
    rng = np.random.default_rng(seed)
    m = load_matrix("VTML40.out", 2.0)
    qs = [rng.integers(0, 20, int(rng.integers(3, 25))) for _ in range(9)]
    ts = [rng.integers(0, 20, int(rng.integers(5, 90))) for _ in range(23)]
    biases = [rng.integers(-3, 4, len(q)) for q in qs]
    ref = _reference_scores(qs, ts, m.scores, biases, 16, 2)
    got = _packed_scores(qs, ts, m.scores, biases, 16, 2)
    np.testing.assert_array_equal(got, ref)


def test_packed_multiblock_grid():
    """Small sq_block / depth_cap force multi-block, multi-tile grids
    and multi-segment targets that straddle keep-mask boundaries."""
    from spacepharer_tpu.ops.matrices import load_matrix
    rng = np.random.default_rng(11)
    m = load_matrix("VTML40.out", 2.0)
    qs = [rng.integers(0, 20, int(rng.integers(3, 20))) for _ in range(14)]
    ts = [rng.integers(0, 20, int(rng.integers(5, 70))) for _ in range(9)]
    ref = _reference_scores(qs, ts, m.scores, None, 16, 2)
    got = _packed_scores(qs, ts, m.scores, None, 16, 2, t_tile=8,
                         sq_block=64, seg_len=8, depth_cap=64)
    np.testing.assert_array_equal(got, ref)


def test_oversized_query_routes_to_fallback():
    """A query whose max-score bound reaches BIG=4096 would silently
    corrupt its packed neighbour; pack_query_rows must refuse it and
    device_allpairs_scores must still return exact scores by routing it
    to the bucketed scan (ADVICE r2: VTML40 max entry 12 -> ~342+
    residue strong-match queries are reachable via multihitsearch)."""
    from spacepharer_tpu.ops.matrices import load_matrix
    from spacepharer_tpu.ops.sw_packed import (BIG, device_allpairs_scores,
                                               pack_query_rows,
                                               query_score_bound)
    rng = np.random.default_rng(3)
    m = load_matrix("VTML40.out", 2.0)
    # 400 copies of the highest-self-score letter push the bound past BIG
    self_max_letter = int(np.argmax(np.diag(m.scores[:20, :20])))
    big_q = np.full(400, self_max_letter, dtype=np.int64)
    assert query_score_bound(big_q, m.scores) >= BIG
    small_qs = [rng.integers(0, 20, int(rng.integers(5, 20)))
                for _ in range(4)]
    qs = small_qs[:2] + [big_q] + small_qs[2:]
    ts = [rng.integers(0, 20, int(rng.integers(10, 80)))
          for _ in range(7)] + [big_q[:300].copy()]
    with pytest.raises(ValueError, match="BIG"):
        pack_query_rows(qs, m.scores)
    got = device_allpairs_scores(qs, ts, m.scores, interpret=True)
    ref = _reference_scores(qs, ts, m.scores, None, 16, 2)
    np.testing.assert_array_equal(got, ref)


def test_packed_with_x_residues_and_gap_params():
    from spacepharer_tpu.ops.matrices import load_matrix
    rng = np.random.default_rng(7)
    m = load_matrix("VTML40.out", 2.0)
    qs = [rng.integers(0, 21, int(rng.integers(4, 20))) for _ in range(5)]
    ts = [rng.integers(0, 21, int(rng.integers(8, 60))) for _ in range(17)]
    ref = _reference_scores(qs, ts, m.scores, None, 10, 1)
    got = _packed_scores(qs, ts, m.scores, None, 10, 1)
    np.testing.assert_array_equal(got, ref)
