"""Native batched banded aligner parity: banded_align_batch (one C
call over flat-packed candidates, native/banded_native.c) must be
bit-identical to the per-pair Python engine banded_nucleotide_align
(itself 460-case probe-parity vs the reference binary's
BandedNucleotideAligner, tests/test_banded_nucl.py)."""
import numpy as np
import pytest

from spacepharer_tpu.native import get_lib
from spacepharer_tpu.ops.banded_nucl import (banded_align_batch,
                                             banded_nucleotide_align)
from spacepharer_tpu.ops.matrices import load_nucleotide_matrix

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="no C compiler for native lib")


def _mutate(rng, seq, sub=0.05, indel=0.02):
    out = []
    for b in seq:
        r = rng.random()
        if r < indel / 2:
            continue
        if r < indel:
            out.append(int(rng.integers(0, 4)))
        out.append(int(rng.integers(0, 4)) if rng.random() < sub else int(b))
    return np.array(out or [0], dtype=np.uint8)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batch_matches_per_pair_engine(seed):
    rng = np.random.default_rng(seed)
    mat = load_nucleotide_matrix().scores
    qs, ts, pairs = [], [], []
    for i in range(40):
        t = rng.integers(0, 4, int(rng.integers(60, 2500))).astype(np.uint8)
        # plant N runs like real contigs
        if rng.random() < 0.3:
            p = int(rng.integers(0, len(t) - 5))
            t[p:p + 5] = 4
        ts.append(t)
        # query = mutated window of the target (so real alignments
        # exist), sometimes pure random (so zdrop/negative paths run)
        if rng.random() < 0.2:
            q = rng.integers(0, 4, int(rng.integers(40, 400))).astype(np.uint8)
            diag = int(rng.integers(0, 1 << 16))
        else:
            lo = int(rng.integers(0, max(len(t) - 50, 1)))
            hi = min(len(t), lo + int(rng.integers(40, 600)))
            q = _mutate(rng, t[lo:hi])
            diag = (0 - lo) & 0xFFFF  # approximate hit diagonal (u16)
        qs.append(q)
        pairs.append((i, i, diag))
        # a few cross pairs exercise unrelated-sequence paths
        if i >= 1 and rng.random() < 0.3:
            pairs.append((i - 1, i, int(rng.integers(0, 1 << 16))))

    res = banded_align_batch(qs, ts, pairs, mat, 5, 2, 40)
    assert res is not None
    score, qsr, qer, tsr, ter, ids, btlen = res
    for k, (qi, ti, diag) in enumerate(pairs):
        r = banded_nucleotide_align(qs[qi], ts[ti], diag, mat, 5, 2, 40)
        assert score[k] == r.score, (k, score[k], r.score)
        assert (qsr[k], qer[k], tsr[k], ter[k]) == \
            (r.q_start, r.q_end, r.t_start, r.t_end), k
        assert ids[k] == r.aa_ids, k
        assert btlen[k] == len(r.backtrace), k


def test_batch_all_m_shortcut_and_edges():
    mat = load_nucleotide_matrix().scores
    t = np.tile(np.arange(4, dtype=np.uint8), 30)
    q = t[20:60].copy()          # exact substring -> all-M shortcut
    res = banded_align_batch([q, np.zeros(1, np.uint8)], [t],
                             [(0, 0, (0 - 20) & 0xFFFF), (1, 0, 0)],
                             mat, 5, 2, 40)
    assert res is not None
    score, qs, qe, ts, te, ids, btlen = res
    r = banded_nucleotide_align(q, t, (0 - 20) & 0xFFFF, mat, 5, 2, 40)
    assert (score[0], ids[0], btlen[0]) == (r.score, r.aa_ids,
                                            len(r.backtrace))
    assert (qs[0], qe[0], ts[0], te[0]) == (r.q_start, r.q_end,
                                            r.t_start, r.t_end)
    r1 = banded_nucleotide_align(np.zeros(1, np.uint8), t, 0, mat, 5, 2, 40)
    assert (score[1], btlen[1]) == (r1.score, len(r1.backtrace))
