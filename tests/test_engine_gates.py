"""Engine-routing gate regressions.

The gate constants in pipeline/predictmatch.py encode hard-won
measurements (a >32k-k-mer dense-prefilter compile once stalled the
relay ~30 min; the device scoring threshold came from the scale-corpus
benches). These tests pin the DECISIONS for representative workload
shapes so a gate regression fails a test, not a production run.
"""
from spacepharer_tpu.pipeline.predictmatch import (
    _DEVICE_CELLS_THRESHOLD, dense_prefilter_viable,
    device_scoring_engages)


class TestDensePrefilterGate:
    def test_small_queries_vs_big_fresh_target_uses_device(self):
        # a few spacer sets (2k k-mers) against a fresh half-gigabase
        # target: only there does the dense engine's relay overhead
        # beat the (round-4, batched) host postings build + walk
        assert dense_prefilter_viable(nk_total=2_000, t_res=500_000_000,
                                      has_idx=False)

    def test_moderate_fresh_target_stays_on_host(self):
        # x500-corpus shape (37M residues): the batched host walk does
        # this in seconds; the device path measured minutes through the
        # relay (round-4 regression that motivated the cost model)
        assert not dense_prefilter_viable(nk_total=2_000,
                                          t_res=50_000_000,
                                          has_idx=False)

    def test_catalog_query_side_stays_on_host(self):
        # Shmakov-shaped: 370k query ORFs = ~870k k-mers; the dense
        # product would dwarf the output-sensitive host walk AND its
        # Mosaic grid compile grows with the k-mer rows
        assert not dense_prefilter_viable(nk_total=870_000,
                                          t_res=7_400_000, has_idx=False)

    def test_nk_cap_is_hard(self):
        # just above the 32k row cap: off even when the cell product
        # looks attractive
        assert not dense_prefilter_viable(nk_total=(1 << 15) + 1,
                                          t_res=3 * 10 ** 8,
                                          has_idx=False)
        assert dense_prefilter_viable(nk_total=(1 << 15),
                                      t_res=3 * 10 ** 8, has_idx=False)

    def test_persisted_index_keeps_host(self):
        # with a persisted postings index the host walk is nearly free;
        # the dense engine can never amortize its relay overhead
        nk, t_res = 2_000, 500_000_000
        assert dense_prefilter_viable(nk, t_res, has_idx=False)
        assert not dense_prefilter_viable(nk, t_res, has_idx=True)

    def test_device_seconds_cap(self):
        # huge dense products are cut off by estimated device seconds
        assert not dense_prefilter_viable(nk_total=30_000,
                                          t_res=10 ** 12, has_idx=False)


class TestScoringEngineGate:
    def test_sparse_candidates_never_probe_the_accelerator(self):
        # catalog-scale: few candidate cells -> host, WITHOUT touching
        # the accelerator probe (PJRT init costs ~10 s on relay hosts)
        def boom():
            raise AssertionError("accelerator probe must not run")
        assert device_scoring_engages(None, None, 1e8,
                                      accel_present=boom) is False

    def test_cells_above_threshold_engage_when_device_present(self):
        cells = _DEVICE_CELLS_THRESHOLD * 2
        assert device_scoring_engages(None, None, cells,
                                      accel_present=lambda: True)
        assert not device_scoring_engages(None, None, cells,
                                          accel_present=lambda: False)

    def test_explicit_flags_win(self):
        def boom():
            raise AssertionError("accelerator probe must not run")
        assert device_scoring_engages(True, None, 0, accel_present=boom)
        assert device_scoring_engages(None, (2, 4), 0, accel_present=boom)
        assert not device_scoring_engages(False, None, 1e30,
                                          accel_present=boom)
        # use_tpu=False beats an explicit mesh (the mesh path is gated
        # on use_tpu is not False upstream)
        assert not device_scoring_engages(False, (2, 4), 1e30,
                                          accel_present=boom)
