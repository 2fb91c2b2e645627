"""RAM-bounded target splits (setupSplit / mergeTargetSplits analog)."""
import glob
import os

import numpy as np
import pytest

from spacepharer_tpu.io.setdb import (build_setdb_from_fasta,
                                      build_setdb_from_spacers)
from spacepharer_tpu.io.spacer_formats import parse_spacers
from spacepharer_tpu.pipeline.predictmatch import (PredictParams,
                                                   search_setdbs)
from spacepharer_tpu.ops.prefilter import (PrefilterParams,
                                           build_target_index,
                                           merge_split_hits,
                                           prefilter_query,
                                           ungapped_profile_cap)
from spacepharer_tpu.ops.matrices import load_matrix


def test_collect_all_plus_merge_equals_monolithic():
    """Per-split collect_all hits merged with merge_split_hits must
    reproduce the monolithic hit list on a synthetic corpus (fixed
    seed: the dup filter's cross-bin leak is split-sensitive only on
    rare ties, like the reference's own split mode)."""
    rng = np.random.default_rng(5)
    params = PrefilterParams(max_seqs=20)
    targets = [rng.integers(0, 20, int(rng.integers(40, 200)))
               for _ in range(48)]
    # plant homologies so real hits exist
    queries = [np.concatenate([targets[i][7:18]]) for i in (3, 11, 30, 44)]
    ungapped_m = load_matrix(params.ungapped_matrix, 2.0)

    mono = build_target_index(targets, params)
    for q in queries:
        want = prefilter_query(q, mono, params)
        got = []
        for lo in range(0, 48, 12):
            chunk = targets[lo:lo + 12]
            idx = build_target_index(chunk, params)
            hits = prefilter_query(q, idx, params, collect_all=True)
            for h in hits:
                h.target += lo
            got.extend(hits)
        bias = np.zeros(len(q)) if not params.comp_bias_corr else None
        from spacepharer_tpu.ops.bias import local_aa_bias
        seed_m = load_matrix(params.seed_matrix, 8.0)
        bias80 = local_aa_bias(np.asarray(q, dtype=np.int64), seed_m)
        _, cap = ungapped_profile_cap(np.asarray(q, dtype=np.int64),
                                      bias80, ungapped_m)
        merged = merge_split_hits(got, cap, params)
        assert ([(h.target, h.score, h.diagonal) for h in merged]
                == [(h.target, h.score, h.diagonal) for h in want])


@pytest.fixture(scope="module")
def example_dbs(examples_dir):
    genomes = sorted(glob.glob(os.path.join(examples_dir, "GCA_*.fna.gz")))
    tdb = build_setdb_from_fasta(genomes)
    recs, sources = parse_spacers(
        sorted(glob.glob(os.path.join(examples_dir, "*.fas"))))
    qdb = build_setdb_from_spacers(recs, sources)
    return qdb, tdb


def test_split_search_end_to_end_parity(example_dbs):
    """search_setdbs under a split-memory limit small enough to force
    several shards returns the same alignment rows as the monolithic
    run on the examples corpus."""
    qdb, tdb = example_dbs
    base = PredictParams(perform_nucl_aln=False, threads=1, use_tpu=False)
    mono = search_setdbs(qdb, tdb, base)
    split = PredictParams(perform_nucl_aln=False, threads=1, use_tpu=False)
    # examples corpus is ~75k target residues * 16 B/res estimate
    # = ~1.2 MB; a 1 MB limit forces multiple shards (chunk floor 256k
    # residues -> ~2 shards)
    split.prefilter.split_memory_limit = 1
    got = search_setdbs(qdb, tdb, split)
    assert got == mono
