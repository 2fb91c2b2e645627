"""Native C kernels (sw_native.c) vs the NumPy reference implementations.

The NumPy paths are themselves byte-parity-tested against the reference
binary (tests/test_alignment.py, test_prefilter.py); these tests pin the
native kernels to the NumPy semantics cell for cell so either path can
serve any query.
"""
import numpy as np
import pytest

from spacepharer_tpu.native import get_lib
from spacepharer_tpu.ops import prefilter as pf
from spacepharer_tpu.ops.align import _forward_pass, batch_forward_scores
from spacepharer_tpu.ops.matrices import load_matrix

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="no C compiler available")


def _rand_seq(rng, n, hi=20):
    return rng.integers(0, hi, size=n).astype(np.int64)


def test_sw_forward_matches_numpy_forward_pass():
    lib = get_lib()
    m = load_matrix("VTML40.out", 2.0)
    rng = np.random.default_rng(7)
    for trial in range(200):
        lq = int(rng.integers(1, 40))
        lt = int(rng.integers(1, 120))
        q = _rand_seq(rng, lq)
        t = _rand_seq(rng, lt)
        bias = rng.integers(-3, 4, size=lq)
        prof = m.scores[q].astype(np.int64) + bias[:, None]
        sub = prof[:, t].T.copy()
        ref = _forward_pass(sub, 16, 2)

        prof_t = np.ascontiguousarray(prof.T, dtype=np.int32)
        t8 = t.astype(np.uint8)
        out = np.zeros(3, dtype=np.int64)
        lib.sw_forward(prof_t.ctypes.data, lq, lq, t8.ctypes.data, lt,
                       16, 2, 0, out.ctypes.data)
        assert tuple(out) == ref, trial

        # reverse pass on the prefix rectangle
        score, t_end, q_end = ref
        if t_end >= 0:
            sub_rev = sub[:t_end + 1, :q_end + 1][::-1, ::-1]
            rref = _forward_pass(sub_rev, 16, 2)
            lib.sw_forward(prof_t.ctypes.data, lq, q_end + 1,
                           t8.ctypes.data, t_end + 1, 16, 2, 1,
                           out.ctypes.data)
            assert tuple(out) == rref, trial


def test_batch_forward_scores_native_vs_numpy(monkeypatch):
    m = load_matrix("VTML40.out", 2.0)
    rng = np.random.default_rng(11)
    q = _rand_seq(rng, 22)
    targets = [_rand_seq(rng, int(rng.integers(5, 200))) for _ in range(50)]
    bias = rng.integers(-2, 3, size=len(q))

    native = batch_forward_scores(q, targets, m, 16, 2, bias)
    import spacepharer_tpu.ops.align as align_mod
    monkeypatch.setattr(align_mod, "_native_lib", lambda: None)
    ref = batch_forward_scores(q, targets, m, 16, 2, bias)
    assert np.array_equal(native, ref)


def test_build_postings_native_vs_numpy(monkeypatch):
    rng = np.random.default_rng(3)
    # sequences with X runs (simulating tantan masks) and short tails
    seqs = []
    for _ in range(40):
        s = _rand_seq(rng, int(rng.integers(3, 400)), hi=20)
        if len(s) > 30:
            a = int(rng.integers(0, len(s) - 10))
            s[a:a + int(rng.integers(1, 9))] = pf.X_IDX
        seqs.append(s)
    params = pf.PrefilterParams(mask=False)

    idx_native = pf.build_target_index(seqs, params)
    import spacepharer_tpu.native as nat
    monkeypatch.setattr(nat, "get_lib", lambda: None)
    idx_numpy = pf.build_target_index(seqs, params)

    for f in ["post_seq", "post_pos", "uniq_codes", "uniq_start",
              "uniq_letters"]:
        assert np.array_equal(getattr(idx_native, f), getattr(idx_numpy, f)), f


def test_find_orfs_native_vs_numpy(monkeypatch):
    import spacepharer_tpu.ops.orf as orf_mod
    rng = np.random.default_rng(5)
    alphabet = np.frombuffer(b"ACGTacgtNnUuRYKM", dtype=np.uint8)
    for mode in (orf_mod.START_TO_STOP, orf_mod.ANY_TO_STOP,
                 orf_mod.LAST_START_TO_STOP):
        for trial in range(20):
            L = int(rng.integers(1, 4000))
            seq = alphabet[rng.integers(0, len(alphabet), L)]
            kw = dict(min_length=int(rng.integers(1, 12)),
                      max_length=int(rng.integers(50, 500)),
                      max_gaps=int(rng.integers(0, 5)),
                      start_mode=mode)
            a = orf_mod.find_orfs(seq, **kw)
            import spacepharer_tpu.native as nat
            monkeypatch.setattr(nat, "get_lib", lambda: None)
            b = orf_mod.find_orfs(seq, **kw)
            monkeypatch.undo()
            for f in ("frame_from", "frame_to", "contig_from", "contig_to",
                      "incomplete_start", "incomplete_end", "strand",
                      "length_codons"):
                assert np.array_equal(getattr(a, f), getattr(b, f)), \
                    (mode, trial, f)


def test_translate_batch_native_vs_numpy(monkeypatch):
    from spacepharer_tpu.ops import translate as tr
    rng = np.random.default_rng(9)
    alphabet = np.frombuffer(b"ACGTacgtNnRYKMWSBDHV", dtype=np.uint8)
    lens = [3 * int(rng.integers(1, 80)) for _ in range(200)]
    flat = alphabet[rng.integers(0, len(alphabet), sum(lens))]
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    a, ao = tr.translate_batch(flat, offs)
    import spacepharer_tpu.native as nat
    monkeypatch.setattr(nat, "get_lib", lambda: None)
    b, bo = tr.translate_batch(flat, offs)
    assert np.array_equal(a, b) and np.array_equal(ao, bo)


def test_prefilter_finalize_matches_python():
    """prefilter_finalize (dup filter + diag rescore + histogram) vs the
    Python _finalize_py, over randomized match streams engineered to
    exercise the bin-state-leak quirk, the u8 cap escape, and the
    max_seqs truncation."""
    lib = get_lib()
    m40 = load_matrix("VTML40.out", 2.0)
    rng = np.random.default_rng(11)
    for trial in range(60):
        n_targets = int(rng.integers(1, 600))
        lq = int(rng.integers(6, 30))
        q = _rand_seq(rng, lq)
        bias = rng.integers(-2, 3, size=lq)
        profile = m40.scores[q].astype(np.int64) + bias[:, None]
        tl = rng.integers(8, 120, size=n_targets)
        starts = np.zeros(n_targets + 1, dtype=np.int64)
        np.cumsum(tl, out=starts[1:])
        flat = rng.integers(0, 21, size=int(starts[-1])).astype(np.uint8)
        seqs = [flat[starts[i]:starts[i + 1]].astype(np.int64)
                for i in range(n_targets)]
        index = pf.TargetIndex(
            seqs_masked=seqs, seq_lengths=tl.astype(np.int64),
            post_seq=np.zeros(0, np.int32),
            post_pos=np.zeros(0, np.uint16), uniq_codes=np.zeros(0, np.int64),
            uniq_start=np.zeros(1, np.int64),
            uniq_letters=np.zeros((0, 6), np.int8),
            db_residues=int(starts[-1]))
        n_matches = int(rng.integers(1, 4000))
        m_t = rng.integers(0, n_targets, size=n_matches).astype(np.int64)
        # biased diagonals so duplicates and u8 collisions actually occur
        m_d = (rng.integers(-4, 5, size=n_matches)
               + rng.choice([0, 3, 256, -256], size=n_matches)) & 0xFFFF
        params = pf.PrefilterParams(
            max_seqs=int(rng.integers(1, 40)),
            min_diag_score=int(rng.integers(0, 20)))
        cap = int(rng.integers(20, 256))
        py = pf._finalize_py(m_t, m_d, index, profile, cap, params, q)
        nat = pf._finalize_native(lib, m_t, m_d, index, profile, cap,
                                  params, q)
        assert [(h.target, h.score, h.diagonal) for h in nat] \
            == [(h.target, h.score, h.diagonal) for h in py], trial


def test_sw_forward_i16_matches_scalar():
    """The AVX2 i16 forward kernel (prefix-max F formulation) is
    bit-identical to the scalar sw_forward — scores AND endpoint
    semantics (first strictly-greater column, min row), forward and
    reversed frames, including sub-length reverse rectangles
    (stride > lq)."""
    import ctypes
    lib = get_lib()
    lib.sw_forward_i16.restype = None
    lib.sw_forward_i16.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p]
    lib.sw_simd_supported.restype = ctypes.c_int
    if not lib.sw_simd_supported():
        import pytest
        pytest.skip("no AVX2 on this host")
    rng = np.random.default_rng(3)
    for trial in range(600):
        lq_full = int(rng.integers(1, 257))
        lq = (lq_full if trial % 2
              else int(rng.integers(1, lq_full + 1)))
        lt = int(rng.integers(1, 240))
        A = 21
        prof = np.ascontiguousarray(
            rng.integers(-17, 16, size=(A, lq_full)).astype(np.int32))
        tseq = rng.integers(0, A, size=lt).astype(np.uint8)
        go = int(rng.integers(1, 20))
        ge = int(rng.integers(1, 4))
        rev = int(rng.integers(0, 2))
        o1 = np.zeros(3, np.int64)
        o2 = np.zeros(3, np.int64)
        lib.sw_forward(prof.ctypes.data, lq_full, lq, tseq.ctypes.data,
                       lt, go, ge, rev, o1.ctypes.data)
        lib.sw_forward_i16(prof.ctypes.data, lq_full, lq, A,
                           tseq.ctypes.data, lt, go, ge, rev,
                           o2.ctypes.data)
        assert np.array_equal(o1, o2), (trial, lq_full, lq, lt, go, ge,
                                        rev, o1, o2)
