"""The predictmatch pipeline: search -> aggregate -> calibrate -> report.

In-memory re-design of data/predictmatch.sh:27-294 — one orchestrator
instead of a tree of processes; arrays instead of text DB files. Each
stage mirrors its reference module (citations in the stage modules).
"""
import os

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..io.setdb import SetDB
from ..ops.align import INT_MAX, AlnParams, align_query
from ..ops.evalue import EvalueComputer, gumbel_params
from ..ops.matrices import load_matrix
from ..ops.prefilter import PrefilterParams, build_target_index, prefilter_query
from ..report.convert import convert_alignments, merge_entries_by_set
from ..report.nuclaln import combine_prot_nucl, protein_aln_to_nucl
from ..report.offsets import offset_alignments, truncate_best_hits
from ..report.pam import find_pam
from ..report.summarize import summarize_results
from ..logging import log
from ..stats.aggregation import best_hit_per_set, combine_score, merge_results_by_set
from ..stats.fdr import filter_match_by_fdr


@dataclass
class PredictParams:
    prefilter: PrefilterParams = field(default_factory=PrefilterParams)
    align: AlnParams = field(default_factory=AlnParams)
    fdr: float = 0.05
    tax_fdr: float = 0.02
    fmt: int = 1
    report_fdr: bool = False
    report_pam: bool = True
    perform_nucl_aln: bool = True
    nucl_gap_open: int = 10
    nucl_gap_extend: int = 2
    restrict_ranks_mode: bool = True
    rank_min_seq_ids: tuple = (0.86, 0.84, 0.82, 0.80, 0.78, 0.76, 0.74, 0.72)
    threads: int = 0  # 0 = all cores; 1 = sequential
    # None = auto: the accelerator is the default scoring engine when
    # one is attached and the workload amortizes transfer + compile
    use_tpu: Optional[bool] = None
    # (q_shards, t_shards) device mesh for the scoring step; None =
    # single device. Any shape yields byte-identical output.
    mesh: Optional[tuple] = None
    # jax.profiler trace output dir (SURVEY 5.1: the TPU-side
    # observability analog of the reference's prefilter statistics);
    # None = off. View with tensorboard or xprof.
    trace_dir: Optional[str] = None


_worker_fn = None


# Fixed device-path overhead through the relay: PJRT client init plus
# the chunked dispatch latency of a dense-prefilter run (measured round
# 4: a x500-corpus dense run cost minutes of relay wait while the host
# batch walk did the same work in seconds — BASELINE.md round-4 notes).
_DENSE_RELAY_OVERHEAD_S = 60.0

# Host batch-walk cost model (native prefilter_batch, measured):
# fresh postings build ~0.35 s per 1e6 target residues (first-touch
# dominated), plus ~20 us per query k-mer for the walk itself.
_HOST_POSTINGS_S_PER_RES = 0.35e-6
_HOST_WALK_S_PER_KMER = 20e-6


def dense_prefilter_viable(nk_total: int, t_res: int, has_idx: bool) -> bool:
    """Auto gate of the dense MXU prefilter (no accelerator probe).

    The dense engine is O(query k-mers x target residues) on the MXU
    (~256 bf16 flops per cell pair) while the host postings walk is
    output-sensitive. Since round 4's batched native walk, the host
    side costs seconds even on x500 corpora, so the device must beat
    estimated-host INCLUDING its fixed relay overhead — in practice
    that needs a fresh multi-gigabase target side. Hard caps stay: the
    k-mer row count (the Mosaic counts-kernel grid scales with it —
    past ~32k rows a single compile once stalled the relay ~30 min)
    and the flops-based device-seconds bound."""
    dense_cells = nk_total * t_res
    dense_seconds = dense_cells * 256 / 2e14 + _DENSE_RELAY_OVERHEAD_S
    host_seconds = (0.0 if has_idx else t_res * _HOST_POSTINGS_S_PER_RES) \
        + nk_total * _HOST_WALK_S_PER_KMER
    return (dense_cells > (1e12 if has_idx else 1e10)
            and dense_seconds < 15.0 + _DENSE_RELAY_OVERHEAD_S
            and dense_seconds < host_seconds
            and nk_total <= (1 << 15))


def device_scoring_engages(use_tpu, mesh, cells,
                           accel_present=None) -> bool:
    """Scoring-engine choice for a known candidate-cell count. The
    accelerator probe initializes the PJRT client (~10 s on relay
    hosts), so it runs only AFTER the cell threshold passes —
    catalog-scale searches (sparse candidates) never pay it."""
    if use_tpu is False:
        return False
    if use_tpu or mesh is not None:
        return True
    if cells <= _DEVICE_CELLS_THRESHOLD:
        return False
    if accel_present is None:
        accel_present = _accelerator_present
    return bool(accel_present())


def _run_chunk(chunk):
    return [_worker_fn(qkey) for qkey in chunk]


def search_setdbs(query_db: SetDB, target_db: SetDB,
                  params: PredictParams, keys=None) -> dict:
    """Translated search: prefilter + SW on AA ORFs; optional nucleotide
    re-alignment merge. Returns {query_orf_key: 11-col text rows}.

    sens_steps > 1 runs the iterative sensitivity loop of the generic
    search workflow (blastp.sh:24-99): each step searches the remaining
    queries at the next sensitivity (start_sens -> sensitivity), rows
    concatenate per query (mergedbs semantics), and queries reaching
    >= 2 alignments stop early. SpacePHARER's own operating point is
    STEPS=1, which keeps the byte-parity path untouched."""
    from dataclasses import replace
    from ..ops.prefilter import SimilarKmerEnumerator

    if params.prefilter.sens_steps > 1 and keys is None:
        senses = np.linspace(params.prefilter.start_sens,
                             params.prefilter.sensitivity,
                             params.prefilter.sens_steps)
        active = list(range(query_db.n_orfs))
        merged = {k: [] for k in active}
        for si, sens in enumerate(senses):
            p1 = replace(params,
                         prefilter=replace(params.prefilter,
                                           sensitivity=float(sens),
                                           sens_steps=1),
                         perform_nucl_aln=False)
            log(2, f"sensitivity step {si + 1}/{len(senses)}: "
                   f"-s {sens:.2f}, {len(active)} queries")
            rows = search_setdbs(query_db, target_db, p1, keys=active)
            for k in active:
                merged[k].extend(rows[k])
            active = [k for k in active if len(rows[k]) < 2]
            if not active:
                break
        return _nucl_merge(merged, query_db, target_db, params)

    t_flat, t_off = target_db.orf_aa_encoded()
    t_aa = [t_flat[t_off[i]:t_off[i + 1]] for i in range(target_db.n_orfs)]
    t_res = int(t_off[-1])
    limit_b = params.prefilter.split_memory_limit << 20
    split_mode = bool(limit_b) and t_res * 16 > limit_b

    m40 = load_matrix(params.align.matrix, 2.0)
    seed_m = load_matrix(params.prefilter.seed_matrix, 8.0)
    ungapped_m = load_matrix(params.prefilter.ungapped_matrix, 2.0)
    enumerator = SimilarKmerEnumerator(seed_m.scores)
    evaluer = EvalueComputer(
        gumbel_params(params.align.matrix, params.align.gap_open,
                      params.align.gap_extend),
        t_res)

    from ..ops.bias import local_aa_bias_batch

    q_flat, q_off = query_db.orf_aa_encoded()
    q_all = [q_flat[q_off[k]:q_off[k + 1]] for k in range(query_db.n_orfs)]

    # Query bias is only materialized in Python for the engines that
    # need it host-side (dense device prefilter, per-query fallbacks);
    # the native batch drivers recompute it bit-identically in C from
    # the shared expected-score table (ops/bias.py).
    _bias_cache = []

    def _get_bias80():
        if not _bias_cache:
            if params.prefilter.comp_bias_corr:
                _bias_cache.append(local_aa_bias_batch(q_all, seed_m))
            else:
                _bias_cache.append([np.zeros(len(q)) for q in q_all])
        return _bias_cache[0]

    if keys is None:
        keys = list(range(query_db.n_orfs))

    from ..native import get_lib as _get_lib
    use_batch = (_get_lib() is not None
                 and params.prefilter.kmer_size == 6)

    # prefilter engine choice (SURVEY 7.2 step 3). The dense device
    # engine (ops/prefilter_dense.py) needs no postings index — only the
    # tantan-masked flat target — so a fresh-index search skips the
    # postings build (the dominant host cost at scale). Output is
    # byte-identical either way; this is purely a performance routing.
    span = params.prefilter.pattern_span
    nk_total = sum(max(len(q_all[k]) - span + 1, 0) for k in keys)
    pf_engine = params.prefilter.engine
    use_dev_pf = False
    if not split_mode:
        if pf_engine == "device":
            use_dev_pf = True
        elif pf_engine == "auto" and params.use_tpu is False:
            # --use-tpu 0 disables EVERY device engine, including the
            # dense prefilter (and keeps forked control searches off
            # the PJRT relay — two clients contend on one chip)
            use_dev_pf = False
        elif pf_engine == "auto":
            from ..ops.prefilter import persisted_index_exists
            has_idx = bool(target_db.path) and persisted_index_exists(
                target_db.path, params.prefilter)
            # shape gates first; the PJRT-initializing accelerator
            # probe only runs when they pass (dense_prefilter_viable)
            use_dev_pf = (dense_prefilter_viable(nk_total, t_res, has_idx)
                          and _accelerator_present())

    index = None
    save_thread = None
    masked = None
    if use_dev_pf:
        from ..ops.prefilter import (build_masked_flat, load_masked_flat,
                                     save_masked_flat)
        if target_db.path:
            masked = load_masked_flat(target_db.path, params.prefilter)
            if masked is not None:
                log(2, f"using persisted masked target in {target_db.path}")
        if masked is None:
            masked = build_masked_flat(t_aa, params.prefilter,
                                       packed=(t_flat, t_off))
            if target_db.path and os.access(target_db.path, os.W_OK):
                import threading
                mflat, mstarts = masked

                def _save_mask():
                    try:
                        save_masked_flat(mflat, mstarts, target_db.path,
                                         params.prefilter)
                        log(2, f"persisted masked target into "
                               f"{target_db.path}")
                    except OSError:
                        pass
                save_thread = threading.Thread(target=_save_mask,
                                               daemon=False)
                save_thread.start()
    elif not split_mode:
        if target_db.path:
            from ..ops.prefilter import load_target_index
            index = load_target_index(target_db.path, params.prefilter)
            if index is not None:
                log(2, f"using persisted index in {target_db.path}")
        if index is None:
            index = build_target_index(t_aa, params.prefilter,
                                       packed=(t_flat, t_off))
            if target_db.path and os.access(target_db.path, os.W_OK):
                # auto-createindex: persist the freshly built index so
                # every later search of this SetDB mmap-loads it (the
                # reference pays IndexBuilder per prefilter run unless
                # the user runs createindex, Prefiltering.cpp:734; here
                # first use = once). The ~200 MB of .npy writes ride a
                # background thread (joined before return).
                import threading
                from ..ops.prefilter import save_target_index

                def _save():
                    try:
                        save_target_index(index, target_db.path,
                                          params.prefilter)
                        log(2, f"persisted index into {target_db.path}")
                    except OSError:
                        pass
                save_thread = threading.Thread(target=_save, daemon=False)
                save_thread.start()

    def _one_query(qkey):
        q = q_all[qkey]
        hits = prefilter_query(q, index, params.prefilter,
                               enumerator=enumerator,
                               bias80=_get_bias80()[qkey])
        results = align_query(q, [h.target for h in hits], t_aa, m40,
                              params.align, evaluer)
        return [r.row_fields() for r in results]

    def _prefilter_one(qkey):
        hits = prefilter_query(q_all[qkey], index, params.prefilter,
                               enumerator=enumerator,
                               bias80=_get_bias80()[qkey])
        return [h.target for h in hits]

    def _chunk_packed(chunk):
        """(flat, offsets) view when the chunk is a contiguous key
        range (the common case: keys = range(n_orfs)) — skips the
        per-chunk concatenation in the batch wrappers."""
        k0, k1 = chunk[0], chunk[-1]
        if k1 - k0 + 1 != len(chunk) or list(chunk) != list(
                range(k0, k1 + 1)):
            return None
        return (q_flat, q_off[k0:k1 + 2])

    def _prefilter_batch_keys():
        """Native batch prefilter over all keys (chunked for progress
        feedback); candidate pairs stay raw arrays per chunk:
        [(chunk_keys, cand_t, cand_off), ...]."""
        from ..ops.prefilter import prefilter_query_batch
        from ..logging import Progress
        prog = Progress(total=len(keys), label="prefilter ")
        out = []
        for lo in range(0, len(keys), _BATCH_CHUNK):
            chunk = keys[lo:lo + _BATCH_CHUNK]
            ct, _, _, co = prefilter_query_batch(
                [q_all[k] for k in chunk], index, params.prefilter,
                seed_m, ungapped_m, packed=_chunk_packed(chunk),
                as_arrays=True)
            out.append((chunk, ct, co))
            prog.update(len(chunk))
        prog.done()
        return out

    def _align_batch_chunks(cand_chunks):
        from ..ops.align import align_query_batch
        from ..logging import Progress
        prog = Progress(total=len(keys), label="align ")
        prot = {}
        for chunk, ct, co in cand_chunks:
            res = align_query_batch(
                [q_all[k] for k in chunk], None,
                t_flat, t_off, m40, params.align, evaluer,
                packed=_chunk_packed(chunk), cand_arrays=(ct, co),
                as_rows=True)
            for k, rows in zip(chunk, res):
                prot[k] = rows
            prog.update(len(chunk))
        prog.done()
        return prot

    n_threads = params.threads if params.threads > 0 else (os.cpu_count() or 1)
    prot = {}
    if split_mode:
        log(2, "RAM-bounded target splits "
               f"(limit {params.prefilter.split_memory_limit} MB)")
        prot = _search_split(t_aa, (t_flat, t_off), params, m40,
                             enumerator, evaluer, _get_bias80(), q_all, keys)
        return _nucl_merge(prot, query_db, target_db, params)

    # Scoring engine choice. The accelerator pays a fixed in-process
    # cost (runtime init + compiled-kernel load, seconds) plus
    # per-dispatch packing; the host C aligner runs ~4e9 DP cells/s/
    # core. The real alignment workload is set by the PREFILTER OUTPUT,
    # not by |queries| x |DB| (the reference's own design premise: the
    # prefilter exists to make alignment output-sensitive,
    # Prefiltering.cpp:709-897). So: a cheap a-priori ceiling
    # (every query hitting max_seqs average-length candidates) gates a
    # two-phase path — prefilter first, then decide with exact
    # candidate cells — while small workloads keep the fused
    # prefilter+align path with no second fork.
    q_res_total = int(sum(len(q_all[k]) for k in keys))
    avg_t = t_res / max(len(t_aa), 1)
    cells_ceiling = (q_res_total
                     * min(params.prefilter.max_seqs, len(t_aa)) * avg_t)
    use_tpu = params.use_tpu

    def _device_engage(cells):
        return device_scoring_engages(use_tpu, params.mesh, cells)

    if use_batch:
        two_phase = True       # batch route is always prefilter-first
    else:
        two_phase = use_dev_pf or (use_tpu is not False and (
            use_tpu or params.mesh is not None
            or (cells_ceiling > _DEVICE_CELLS_THRESHOLD
                and _accelerator_present())))

    batched_aln_ok = (params.align.max_accept == INT_MAX
                      and params.align.max_rejected == INT_MAX
                      and params.align.cov_thr == 0
                      and params.align.seq_id_thr == 0
                      and params.align.aln_len_thr == 0)
    if two_phase or use_batch:
        if use_dev_pf:
            from ..ops.prefilter_dense import device_prefilter
            backend = "pallas" if _accelerator_present() else "xla"
            log(2, f"dense device prefilter ({backend}): "
                   f"{nk_total} k-mers x {t_res} target residues")
            hits_all = device_prefilter(
                q_all, keys, _get_bias80(), masked[0], masked[1],
                params.prefilter, enumerator, seed_m, ungapped_m,
                backend=backend)
            cand = {k: [h.target for h in hits_all[k]] for k in keys}
        elif use_batch:
            cand_chunks = _prefilter_batch_keys()
            # exact candidate DP cells, vectorized over the pair arrays
            q_lens = np.diff(q_off)
            t_lens = np.diff(t_off)
            cells = 0
            for chunk, ct, co in cand_chunks:
                if len(ct) == 0:
                    continue
                qlen_pair = np.repeat(q_lens[np.asarray(chunk)],
                                      np.diff(co))
                cells += int(np.dot(qlen_pair, t_lens[ct]))
            cand = None
        else:
            cand = _run_keyed(_prefilter_one, keys, n_threads,
                              len(keys) * t_res > 2e10,
                              label="prefilter ")
        if cand is not None:
            cells = sum(
                len(q_all[k]) * sum(len(t_aa[t]) for t in cand[k])
                for k in keys)
        engage = _device_engage(cells)
        log(2, f"candidate cells {cells:.3g} -> "
               f"{'device' if engage else 'host'} scoring engine")
        if cand is None and (engage or not batched_aln_ok):
            # these consumers want per-key target lists
            cand = {}
            for chunk, ct, co in cand_chunks:
                for i, k in enumerate(chunk):
                    cand[k] = ct[co[i]:co[i + 1]].tolist()
        if engage:
            prot = _search_tpu(keys, t_aa, cand, q_all, m40,
                               evaluer, params)
        elif cand is None:
            prot = _align_batch_chunks(cand_chunks)
        else:
            def _align_one(qkey):
                results = align_query(q_all[qkey], cand[qkey], t_aa, m40,
                                      params.align, evaluer)
                return [r.row_fields() for r in results]
            prot = _run_keyed(_align_one, keys, n_threads, cells > 2e10,
                              label="align ")
    else:
        prot = _run_keyed(_one_query, keys, n_threads,
                          len(keys) * t_res > 2e10, label="search ")

    if save_thread is not None:
        save_thread.join()
    return _nucl_merge(prot, query_db, target_db, params)


# Exact-candidate DP cells above which the accelerator beats the host
# aligner including its fixed init/pack overhead (host ~4e9 cells/s/core
# vs device ~6e10 sustained + seconds of overhead; measured on the
# scale corpora, see BASELINE.md).
_DEVICE_CELLS_THRESHOLD = 3e10

# Queries per native batch-driver dispatch: bounds the transient hit
# lists and gives the Progress bar tick granularity.
_BATCH_CHUNK = 16384

# Cell budget of one [key-block, union] candidate score matrix in
# _search_tpu (~200 MB of int32 at the default). Catalog-scale searches
# stream key blocks through the engine instead of materializing an
# all-keys matrix.
_MAX_MATRIX_CELLS = 5e7


def _run_keyed(fn, keys, n_threads, big: bool, label=None) -> dict:
    """Run fn(key) for every key, fork-pooled when `big` (workers share
    the index read-only via COW, like the reference's OpenMP threads
    over a shared mmap'd index, Prefiltering.cpp:776-800). A label
    attaches Debug::Progress-style feedback for long stages."""
    from ..logging import Progress
    prog = Progress(total=len(keys), label=label) if label else None
    if big and n_threads > 1 and len(keys) > 16:
        import multiprocessing as mp
        global _worker_fn
        _worker_fn = fn
        ctx = mp.get_context("fork")
        # many small chunks streamed with imap: load-balances uneven
        # queries and lets the parent tick progress as results land
        csize = max(1, min(256, len(keys) // (n_threads * 8)))
        chunks = [keys[i:i + csize] for i in range(0, len(keys), csize)]
        out = {}
        with ctx.Pool(n_threads) as pool:
            for chunk, rows_list in zip(chunks,
                                        pool.imap(_run_chunk, chunks)):
                for qkey, rows in zip(chunk, rows_list):
                    out[qkey] = rows
                if prog:
                    prog.update(len(chunk))
        if prog:
            prog.done()
        return {k: out[k] for k in keys}
    out = {}
    for k in keys:
        out[k] = fn(k)
        if prog:
            prog.update()
    if prog:
        prog.done()
    return out


def _nucl_merge(prot: dict, query_db: SetDB, target_db: SetDB,
                params: PredictParams) -> dict:
    """Optional nucleotide re-alignment merge (proteinaln2nucl +
    combineprotnuclaln, data/predictmatch.sh:37-45)."""
    if not params.perform_nucl_aln:
        return prot

    # nucl sequences only for queries that HAVE rows (at catalog scale
    # almost all queries have none; gathering all 10^5+ is pure waste)
    q_nucl = query_db.orf_nucl_batch(
        [k for k, rows in prot.items() if rows])
    t_nucl = target_db.orf_nucl_batch(
        {int(r[0]) for rows in prot.values() for r in rows})
    nucl_ev = EvalueComputer(
        gumbel_params("nucleotide.out", params.nucl_gap_open,
                      params.nucl_gap_extend),
        int(np.diff(target_db.orf_nucl_offsets).sum()))
    nucl = protein_aln_to_nucl(prot, q_nucl, t_nucl, nucl_ev,
                               params.nucl_gap_open, params.nucl_gap_extend)
    return combine_prot_nucl(prot, nucl)


def _search_split(t_aa, packed, params, m40, enumerator, evaluer,
                  bias80_all, q_all, keys):
    """RAM-bounded target-split search: the target DB streams through
    index shards sized to the split-memory limit; per-query collect_all
    hit lists merge into the global list before alignment. The
    setupSplit / mergeTargetSplits analog (Prefiltering.cpp:258,
    Prefiltering.h:49)."""
    from ..ops.prefilter import (PrefilterHit, merge_split_hits,
                                 prefilter_query_batch,
                                 ungapped_profile_cap)

    t_flat, t_off = packed
    limit_b = params.prefilter.split_memory_limit << 20
    chunk_res = max(limit_b // 16, 1 << 18)
    bounds = [0]
    acc = 0
    for i, t in enumerate(t_aa):
        acc += len(t)
        if acc >= chunk_res:
            bounds.append(i + 1)
            acc = 0
    if bounds[-1] != len(t_aa):
        bounds.append(len(t_aa))
    log(2, f"target split mode: {len(bounds) - 1} shards")

    seed_m = load_matrix(params.prefilter.seed_matrix, 8.0)
    ungapped_m = load_matrix(params.prefilter.ungapped_matrix, 2.0)
    all_hits = {k: [] for k in keys}
    for ci in range(len(bounds) - 1):
        lo, hi = bounds[ci], bounds[ci + 1]
        sub_starts = np.ascontiguousarray(t_off[lo:hi + 1] - t_off[lo],
                                          dtype=np.int64)
        sub_flat = t_flat[t_off[lo]:t_off[hi]]
        index = build_target_index(t_aa[lo:hi], params.prefilter,
                                   packed=(sub_flat, sub_starts))
        for blo in range(0, len(keys), _BATCH_CHUNK):
            chunk = keys[blo:blo + _BATCH_CHUNK]
            hls = prefilter_query_batch(
                [q_all[k] for k in chunk], index, params.prefilter,
                seed_m, ungapped_m, enumerator=enumerator,
                bias80_all=[bias80_all[k] for k in chunk],
                collect_all=True)
            for k, hl in zip(chunk, hls):
                all_hits[k].extend(
                    PrefilterHit(h.target + lo, h.score, h.diagonal)
                    for h in hl)
        del index
    from ..ops.prefilter import release_postings_scratch
    release_postings_scratch()  # per-shard indexes are done; RAM back

    merged_cand = {}
    for k in keys:
        _, cap = ungapped_profile_cap(q_all[k], bias80_all[k], ungapped_m)
        merged = merge_split_hits(all_hits[k], cap, params.prefilter)
        merged_cand[k] = [h.target for h in merged]
    from ..ops.align import align_query_batch
    prot = {}
    for blo in range(0, len(keys), _BATCH_CHUNK):
        chunk = keys[blo:blo + _BATCH_CHUNK]
        res = align_query_batch(
            [q_all[k] for k in chunk], [merged_cand[k] for k in chunk],
            t_flat, t_off, m40, params.align, evaluer, as_rows=True)
        for k, rows in zip(chunk, res):
            prot[k] = rows
    return prot


def _accelerator_present() -> bool:
    try:
        import jax
        return jax.default_backend() not in ("cpu",)
    except Exception:  # noqa: BLE001 - no jax / no device = host engine
        return False


def _search_tpu(keys, t_aa, cand, q_all, m40, evaluer, params):
    """Device scoring engine: candidates come from the host prefilter
    (order-dependent integer heuristics, QueryMatcher.cpp:84-323); the
    device bulk-scores every (query x candidate-target) cell in packed
    dispatches, and the exact host alignment runs only on E-value
    survivors — output-identical to the host path (the device scores
    are cell-exact, tests/test_sw_packed.py). Survivor re-alignment is
    fork-pooled like the host path (the reference realigns accepted
    pairs omp-parallel, Alignment.cpp:255-)."""
    from ..ops.align import sw_bias_i8, sw_align, check_criteria

    biases = {}
    for qkey in keys:
        q = q_all[qkey]
        biases[qkey] = (sw_bias_i8(q, m40) if params.align.comp_bias_corr
                        else np.zeros(len(q), dtype=np.int64))

    # Candidate scores per key, computed in key BLOCKS so the dense
    # [block, union] matrix never exceeds a fixed cell budget — at
    # catalog scale (30k+ query sets, README.md:107-110) a single
    # all-keys union matrix is the memory wall (round-2 weak #3). Each
    # block's union only spans the targets ITS queries hit, so sparse
    # workloads stay small; per-key results compact to exactly
    # len(cand[k]) scores.
    cand_scores = {}
    blocks = []
    cur, cur_union = [], set()
    for k in keys:
        cur.append(k)
        cur_union.update(cand[k])
        if len(cur) * max(len(cur_union), 1) > _MAX_MATRIX_CELLS:
            blocks.append(cur)
            cur, cur_union = [], set()
    if cur:
        blocks.append(cur)
    mesh = None
    if params.mesh is not None:
        from ..parallel.sharding import make_mesh
        import jax
        nq_sh, nt_sh = params.mesh
        mesh = make_mesh(nq_sh, nt_sh,
                         devices=jax.devices()[:nq_sh * nt_sh])
    for block in blocks:
        union = sorted({t for k in block for t in cand[k]})
        col_of = {t: j for j, t in enumerate(union)}
        if not union:
            for k in block:
                cand_scores[k] = np.zeros(0, dtype=np.int64)
            continue
        if mesh is not None:
            from ..parallel.sharding import sharded_allpairs_scores
            scores = sharded_allpairs_scores(
                mesh, [q_all[k] for k in block],
                [t_aa[t] for t in union],
                m40.scores, bias_list=[biases[k] for k in block],
                gap_open=params.align.gap_open,
                gap_extend=params.align.gap_extend)
        elif _accelerator_present():
            from ..ops.sw_packed import device_allpairs_scores
            scores = device_allpairs_scores(
                [q_all[k] for k in block], [t_aa[t] for t in union],
                m40.scores, bias_list=[biases[k] for k in block],
                gap_open=params.align.gap_open,
                gap_extend=params.align.gap_extend)
        else:
            # no device: bucketed XLA-scan scorer (same exact scores)
            from ..ops.sw_tpu import score_pairs_bucketed
            pairs = [(k, t) for k in block for t in cand[k]]
            flat = score_pairs_bucketed(
                pairs, q_all, t_aa, m40.scores, biases,
                params.align.gap_open, params.align.gap_extend)
            qrow = {k: i for i, k in enumerate(block)}
            scores = np.zeros((len(block), len(union)), dtype=np.int64)
            for (k, t), sc in zip(pairs, flat):
                scores[qrow[k], col_of[t]] = sc
        for qi, k in enumerate(block):
            cols = np.fromiter((col_of[t] for t in cand[k]),
                               dtype=np.int64, count=len(cand[k]))
            cand_scores[k] = np.asarray(scores)[qi, cols].astype(np.int64)

    def _realign_one(qkey):
        out = []
        for ci, t in enumerate(cand[qkey]):
            sc = int(cand_scores[qkey][ci])
            if float(evaluer.evalue(sc, len(q_all[qkey]))) \
                    > params.align.evalue:
                continue
            res = sw_align(q_all[qkey], t_aa[t], m40, params.align, evaluer,
                           biases[qkey])
            if res is None:
                continue
            res.target = t
            if check_criteria(res, params.align):
                out.append(res)
        out.sort(key=lambda r: (r.evalue, -r.raw_score, r.t_len, r.target))
        return [r.row_fields() for r in out]

    n_threads = params.threads if params.threads > 0 else (os.cpu_count() or 1)
    surv_cells = sum(len(q_all[k]) * sum(len(t_aa[t]) for t in cand[k])
                     for k in keys)
    return _run_keyed(_realign_one, keys, n_threads, surv_cells > 2e9,
                      label="align ")


def _jax_client_initialized() -> bool:
    import sys as _sys
    xb = _sys.modules.get("jax._src.xla_bridge")
    return bool(xb is not None and getattr(xb, "_backends", None))


def _fork_reverse_search(cache, query_db, control_db, params):
    """Fork a child computing the reverse-control search + aggregation
    into the cache; returns the child pid or None (sequential).

    Skipped when: the cache is in-memory (nothing to hand over), the
    artifacts already exist (resume), an explicit device request is on
    (two processes sharing one PJRT client is undefined), or a jax
    client is already initialized in this process (fork-after-PJRT is
    unsafe). The child forces host engines for the same reason —
    engine choice never changes output bytes."""
    if not hasattr(cache, "has") or os.name != "posix":
        return None
    if cache.has("result_rev") and cache.has("aggregate_rev"):
        return None
    if params.use_tpu or params.mesh is not None or params.trace_dir:
        return None
    if _jax_client_initialized():
        return None
    cache.flush()     # no writer threads may cross the fork
    pid = os.fork()
    if pid != 0:
        return pid
    status = 1
    try:
        # die with the parent: an orphaned control search must not keep
        # writing artifacts after a kill (it would race the resumed run)
        try:
            import ctypes
            import signal
            ctypes.CDLL(None).prctl(1, signal.SIGKILL)  # PR_SET_PDEATHSIG
            if os.getppid() == 1:
                os._exit(1)       # parent already gone
        except Exception:  # noqa: BLE001 - best-effort on non-Linux
            pass
        from dataclasses import replace
        from ..logging import set_verbosity
        set_verbosity(0)          # the parent owns the terminal
        p_host = replace(params, use_tpu=False, mesh=None, trace_dir=None,
                         prefilter=replace(params.prefilter,
                                           engine="host"))
        rev = search_setdbs(query_db, control_db, p_host)
        cache.save("result_rev", rev)
        cache.save("aggregate_rev",
                   _aggregate_chain(rev, query_db, control_db))
        status = 0
    except BaseException:       # noqa: BLE001 - parent recomputes
        pass
    finally:
        os._exit(status)


def _aggregate_chain(result: dict, query_db: SetDB, target_db: SetDB):
    """besthitperset -> mergeresultsbyset -> combinescore."""
    t_m2s = target_db.orf_to_set
    t_sizes = target_db.set_size
    aggregate = {k: (best_hit_per_set(rows, t_m2s, t_sizes) if rows
                     else [])
                 for k, rows in result.items()}
    q_m2s = query_db.orf_to_set
    set_to_members = {}
    for okey in range(query_db.n_orfs):
        set_to_members.setdefault(int(q_m2s[okey]), []).append(okey)
    merged = merge_results_by_set(aggregate, dict(sorted(set_to_members.items())))
    cscore = {qset: combine_score(rows, int(query_db.set_size[qset]), t_m2s)
              for qset, rows in merged.items()}
    return aggregate, merged, cscore


@dataclass
class PredictResult:
    text: str
    match: dict
    cscore: dict
    cscore_rev: dict
    aln_merged: dict
    aggregate: dict
    truncated: dict
    messages: list
    lca_tsv: Optional[str] = None
    lca_per_target_tsv: Optional[str] = None


def predict_match(query_db: SetDB, target_db: SetDB, control_db: SetDB,
                  params: Optional[PredictParams] = None,
                  taxonomy=None, cache=None,
                  dump_stages: Optional[str] = None) -> PredictResult:
    from ..logging import stage_timer
    from .workflow import NullCache

    params = params or PredictParams()
    cache = cache or NullCache()

    import contextlib
    profiler_cm = contextlib.nullcontext()
    if params.trace_dir:
        try:
            import jax
            profiler_cm = jax.profiler.trace(params.trace_dir)
        except Exception as e:  # noqa: BLE001 - tracing is best-effort
            log(1, f"jax.profiler trace unavailable: {e}")

    # Step-granular resume (SURVEY 5.4): every stage below the two
    # searches is its own cached artifact, mirroring the reference's
    # per-step notExists guards (data/predictmatch.sh:29-230) — killing
    # a run and restarting recomputes only the first missing stage.
    # The forward and reverse-control searches are independent until
    # the FDR calibration, so the control side runs CONCURRENTLY in a
    # forked child writing its cache artifacts (the reference gets its
    # 2-core utilization from OpenMP inside each stage; here the
    # single-threaded Python stages of the two searches overlap each
    # other instead). Resume-safe: the child writes via the atomic
    # tmp+rename protocol; if it dies, the parent recomputes in-process.
    rev_pid = _fork_reverse_search(cache, query_db, control_db, params)

    with profiler_cm, stage_timer("search"):
        search_result = cache.get_or_compute(
            "result", lambda: search_setdbs(query_db, target_db, params))
    aggregate, merged, cscore = cache.get_or_compute(
        "aggregate", lambda: _aggregate_chain(search_result, query_db,
                                              target_db))

    if rev_pid is not None:
        try:
            os.waitpid(rev_pid, 0)
        except ChildProcessError:
            pass

    # result_rev is only needed by the aggregation (and the optional
    # stage dumps) — when the child already wrote aggregate_rev, the
    # big reverse row table is never deserialized at all
    _rev_memo = []

    def _get_result_rev():
        if not _rev_memo:
            _rev_memo.append(cache.get_or_compute(
                "result_rev",
                lambda: search_setdbs(query_db, control_db, params)))
        return _rev_memo[0]

    with stage_timer("search_rev"):
        cscore_rev = cache.get_or_compute(
            "aggregate_rev",
            lambda: _aggregate_chain(_get_result_rev(), query_db,
                                     control_db))[2]

    match, messages = cache.get_or_compute(
        "match", lambda: filter_match_by_fdr(cscore, cscore_rev, params.fdr,
                                             params.report_fdr))

    def _aln_stage():
        q_sizes = np.asarray(query_db.set_size)[query_db.orf_to_set]
        q_set_size_of = {okey: int(q_sizes[okey])
                         for okey in range(query_db.n_orfs)}
        truncated = truncate_best_hits(aggregate, q_set_size_of)
        offset = offset_alignments(truncated, query_db, target_db)
        with_tax = target_db.contig_taxid is not None
        aln = convert_alignments(offset, query_db, target_db, with_tax)
        set_to_contigs = {}
        for c in range(query_db.n_contigs):
            set_to_contigs.setdefault(
                int(query_db.contig_to_set[c]), []).append(c)
        aln_merged = merge_entries_by_set(aln, set_to_contigs)
        if params.report_pam:
            aln_merged = find_pam(aln_merged, target_db)
        return truncated, aln_merged

    truncated, aln_merged = cache.get_or_compute("aln", _aln_stage)

    text = summarize_results(match, aln_merged, params.fmt, params.report_fdr,
                             taxonomy=None)
    result = PredictResult(text, match, cscore, cscore_rev, aln_merged,
                           aggregate, truncated, messages)

    if dump_stages:
        # entry-TSV snapshots of every stage table, consumable by the
        # expert subcommands (the tmp-DB analog of predictmatch.sh)
        from ..io.entries_tsv import write_entries
        os.makedirs(dump_stages, exist_ok=True)
        stage_tables = {
            "result": search_result, "result_rev": _get_result_rev(),
            "aggregate": aggregate, "merged": merged, "cscore": cscore,
            "cscore_rev": cscore_rev, "match": match, "truncated": truncated,
            "aln": aln_merged,
        }
        for name, table in stage_tables.items():
            write_entries(table, os.path.join(dump_stages, name + ".tsv"))

    # taxonomy reports (data/predictmatch.sh:170-230)
    from ..tax.lcasteps import (aggregate_tax, majority_lca_per_target,
                                per_orf_lca, restrict_ranks)
    from ..tax.ncbi import DEFAULT_RANKS, load_taxonomy

    ranks = DEFAULT_RANKS.split(",")
    if target_db.orf_taxid is not None and target_db.taxdump_path:
        taxonomy = load_taxonomy(target_db.taxdump_path)
        blacklist = taxonomy.parse_blacklist()
        orf_lca = per_orf_lca(truncated, target_db.orf_taxid, taxonomy,
                              ranks, blacklist)
        members_by_spacer = {}
        for okey in range(query_db.n_orfs):
            members_by_spacer.setdefault(
                int(query_db.orf_contig[okey]), []).append(okey)
        spacer_lca = aggregate_tax(orf_lca, members_by_spacer, taxonomy, ranks)
        lines = []
        for ckey in sorted(spacer_lca.keys()):
            lines.append(query_db.contig_accession[ckey] + "\t"
                         + "\t".join(spacer_lca[ckey]))
        result.lca_tsv = "\n".join(lines) + ("\n" if lines else "")

    if query_db.set_taxid is not None and query_db.taxdump_path:
        taxonomy = load_taxonomy(query_db.taxdump_path)
        blacklist = taxonomy.parse_blacklist()
        match_tax, _ = filter_match_by_fdr(cscore, cscore_rev, params.tax_fdr)
        match_swapped = {}
        for qset in sorted(match_tax.keys()):
            for row in match_tax[qset]:
                match_swapped.setdefault(int(row[0]), []).append(
                    [str(qset), row[1], row[2]])
        per_target = majority_lca_per_target(
            match_swapped, query_db.set_taxid, taxonomy, ranks, blacklist)
        if params.restrict_ranks_mode:
            per_target = restrict_ranks(per_target, match_swapped, taxonomy,
                                        ranks, params.rank_min_seq_ids)
        lines = []
        for tset in sorted(per_target.keys()):
            lines.append(target_db.set_names[tset] + "\t"
                         + "\t".join(per_target[tset]))
        result.lca_per_target_tsv = "\n".join(lines) + ("\n" if lines else "")

    cache.flush()   # join background artifact writers (resume-durable)
    return result
