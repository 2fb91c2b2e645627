"""Packed all-pairs Smith-Waterman Pallas kernel (the production TPU scorer).

Round-2 redesign of the all-pairs scan. The round-1 kernels
(ops/sw_pallas.py, parallel/sharding.py) pay for two things the
hardware hates:

  * padding — every query rides a fixed [LQ=32] sublane block and every
    target a fixed [LT=512] column range, so ~90% of the scanned cells
    are pad on the real spacer-vs-ORF workload;
  * per-column masking — q_mask / col_valid selects cost ~5 VPU ops per
    column on top of the ~15-op DP update, and the [Q, LQ, T] XLA-scan
    state (~40 MB) spills to HBM, making the whole scan HBM-bound.

This kernel removes both:

  * **Dense query packing.** All queries are concatenated along the
    sublane axis with NO per-query padding: row r of the packed profile
    is one residue of one query. A query-set of 305 spacer ORFs
    (~3.3k residues) becomes a [3328, 32] profile instead of a
    [305, 32, 32] block — pad fraction drops from ~60% to <1%.
    Queries are packed into fixed [SQ_BLOCK]-row groups (grid axis 0)
    so VMEM state stays bounded no matter how many queries there are.
  * **Mask-free DP.** Query boundaries are enforced algebraically:
      - the diagonal shift is zeroed at each query's first row via one
        precomputed where;
      - the in-column query-gap (F) cumulative max (the affine-gap
        identity, see ops/sw_tpu.py docstring) is segmented by adding
        BIG * query_id to the running term and subtracting it on read —
        a value leaking across a query boundary loses by >= BIG - the
        score range and can never win;
      - pad rows (block tails) and pad columns (beyond a target's true
        length) use a NEG profile value, which makes their cells
        provably unable to raise any best score (E <= best - gap_open
        is an invariant), so no per-column length mask is needed at all.
  * **Segmented target packing.** Targets are packed densely into the
    128 lanes as runs of consecutive SEG-residue segments (a 90-residue
    ORF takes 3 segments of 32; an 1800-residue ORF takes 57 — no lane
    ever idles on a long neighbour's length). A per-(segment, lane)
    keep mask carries the DP state across segment boundaries for
    multi-segment targets and resets it where a new target starts; the
    per-query reduction is harvested at every segment boundary and the
    host reads each target's score from its LAST segment slot. Pad
    fraction on the real corpus drops from ~78% (per-tile bounds) to
    ~10%.
  * **MXU substitution gather.** sub[r, t] = prof[r, letter[t]] is a
    bf16 one-hot matmul [SQ, 32] @ [32, TT] per column (exact: one-hot
    selects a single bf16-representable integer), as in round 1.
  * **In-kernel per-query reduction.** The per-row running best is
    reduced to one score per query before leaving the kernel: a
    BIG*qid-segmented downward cummax followed by a one-hot f32 matmul
    that selects each query's last row (exact — one nonzero per output
    row; f32 holds every score < 2^24). Output shrinks from [SQ, T] to
    [NQ, T] int32, so XLA never pins a multi-MB buffer in VMEM (the
    round-1 failure mode) and the host-side segment_max disappears.
  * **VMEM residency.** Per-program state is [SQ_BLOCK, T_TILE] int32
    (H, E, best ~ 3 MB at 2048x128), fully VMEM-resident across the
    column loop — the HBM round-trip that capped the XLA scan at
    ~5 G cells/s is gone.

Semantics are cell-exact with ops.align._forward_pass /
parallel.sharding.sw_score_allpairs (Farrar E-from-pre-F update,
reference sw_sse2_byte semantics, lib/mmseqs/src/alignment/
StripedSmithWaterman.cpp): verified by tests/test_sw_packed.py against
the host engine.
"""
import heapq

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -2048          # profile pad value; bf16-exact, dominates any score
BIG = 4096           # per-query cummax offset; > max score + gap terms
BIGNEG = -(1 << 20)  # pad-row constants (int32 arithmetic only)


def _kernel(bounds_ref, prof_ref, c1_ref, c2_ref, first_ref, qoff_ref,
            last_ref, t_ref, keep_ref, out_ref, *, sq, nq, t_tile, a_pad,
            max_span, seg_len, n_segs, gap_open, gap_extend,
            state16=False):
    nseg_bound = bounds_ref[pl.program_id(1), 0]
    prof = prof_ref[:]                       # [SQ, A] bf16
    c1 = c1_ref[:]                           # [SQ, 1] int32
    c2 = c2_ref[:]                           # [SQ, 1] int32
    first = first_ref[:] != 0                # [SQ, 1] bool
    qoff = qoff_ref[:]                       # [SQ, 1] int32
    # int16 DP-state experiment (round-3 lever #1): scores are bounded
    # by BIG=4096 so H/E/best fit int16, halving the persistent-state
    # VMEM traffic; the BIG*qid-offset cummax pipeline stays int32.
    sdt = jnp.int16 if state16 else jnp.int32
    go = sdt(gap_open)
    ge = sdt(gap_extend)
    if state16:
        # Mosaic cannot legalize arith.maxsi on int16 vectors for v5e;
        # a compare+select expresses the same max through ops it CAN
        # legalize (round-4 lever, re-run as the round-5 experiment)
        def vmax(a, b):
            return jnp.where(a > b, a, b)
    else:
        vmax = jnp.maximum
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (a_pad, t_tile), 0)
    zrow = jnp.zeros((1, t_tile), sdt)

    # constants of the per-segment harvest
    last = last_ref[:]                       # [NQ, 1] int32, -1 = pad slot
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (nq, sq), 1)
    sel = (iota_r == last).astype(jnp.bfloat16)

    out_ref[:] = jnp.zeros((n_segs * nq, t_tile), jnp.int32)

    def col_step(i, carry):
        H, E, best = carry                   # [SQ, TT] state dtype each
        col = t_ref[pl.ds(i, 1), :]          # [1, TT] int32
        onehot = (iota_a == col).astype(jnp.bfloat16)
        sub = jax.lax.dot_general(
            prof, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(sdt)
        h_diag = jnp.where(
            first, sdt(0), jnp.concatenate([zrow, H[:-1, :]], axis=0))
        h_pre = vmax(h_diag + sub, E)            # E >= 0 supplies the 0 floor
        E2 = vmax(vmax(h_pre - go, E - ge), sdt(0))
        g = h_pre.astype(jnp.int32) + c1         # c1 = ge*(j+1)-go+BIG*qid
        shift = 1
        while shift < max_span:                  # segmented cummax
            g = jnp.maximum(
                g, jnp.concatenate(
                    [jnp.full((shift, t_tile), BIGNEG, jnp.int32),
                     g[:-shift, :]], axis=0))
            shift *= 2
        F = jnp.concatenate([jnp.full((1, t_tile), BIGNEG, jnp.int32),
                             g[:-1, :]], axis=0) - c2   # c2 = ge*j + BIG*qid
        if state16:
            # h_pre >= 0, so clamping F at 0 changes nothing and makes
            # the int16 narrowing exact (F < BIG; BIGNEG would wrap)
            F = jnp.maximum(F, 0).astype(sdt)
        h = vmax(h_pre, F)
        best = vmax(best, h)
        return h, E2, best

    def seg_step(s, carry):
        H, E, best = carry
        k = keep_ref[pl.ds(s, 1), :]             # [1, TT] 0 = new target
        if state16:
            k = k.astype(sdt)
        H, E, best = H * k, E * k, best * k
        H, E, best = jax.lax.fori_loop(
            0, seg_len, lambda i, c: col_step(s * seg_len + i, c),
            (H, E, best))
        # harvest: per-query reduction of the running best (the host
        # reads each target's score at its LAST segment slot)
        g = best.astype(jnp.int32) + qoff
        shift = 1
        while shift < max_span:
            g = jnp.maximum(
                g, jnp.concatenate(
                    [jnp.full((shift, t_tile), BIGNEG, jnp.int32),
                     g[:-shift, :]], axis=0))
            shift *= 2
        # one-hot row selection on the MXU must be value-exact: a real
        # TPU f32 matmul truncates inputs to bf16 at default precision,
        # so the selected value (a score in [0, BIG)) is split into two
        # bf16-exact base-128 halves and recombined after selection
        v = g - qoff                         # selected rows: the score
        hi = (v >> 7).astype(jnp.bfloat16)
        lo = (v & 127).astype(jnp.bfloat16)
        pick = lambda x: jax.lax.dot_general(   # noqa: E731
            sel, x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        picked = pick(hi).astype(jnp.int32) * 128 \
            + pick(lo).astype(jnp.int32)
        out_ref[pl.ds(s * nq, nq), :] = picked
        return H, E, best

    z = jnp.zeros((sq, t_tile), sdt)
    jax.lax.fori_loop(0, nseg_bound, seg_step, (z, z, z))


@partial(jax.jit, static_argnames=("gap_open", "gap_extend", "max_span",
                                   "sq_block", "nq_block", "seg_len",
                                   "interpret", "state16"))
def sw_allpairs_packed(prof, c1, c2, first, qoff, last, t_seqs, keep,
                       bounds, gap_open: int = 16, gap_extend: int = 2,
                       max_span: int = 32, sq_block: int = 2048,
                       nq_block: int = 256, seg_len: int = 32,
                       interpret: bool = False, state16: bool = False):
    """Per-query best scores for packed queries vs segment-packed targets.

    prof:   bf16 [n_qb*SQ, A_pad]  packed per-residue profiles
    c1/c2:  int32 [n_qb*SQ, 1]     cummax constants (see pack_query_rows)
    first:  int32 [n_qb*SQ, 1]     1 at each query's first row
    qoff:   int32 [n_qb*SQ, 1]     BIG*qid_local (BIGNEG on pad rows)
    last:   int32 [n_qb*NQ, 1]     block-local row of each query's last
                                   residue (-1 on pad slots)
    t_seqs: int32 [n_segs*SEG, L]  lane-packed target letters (pad = 31)
    keep:   int32 [n_segs, L]      1 = target continues across boundary
    bounds: int32 [L/TT, 1]        occupied segments per lane tile
    Returns int32 [n_qb * n_segs * NQ, L]: harvested per-query scores,
    one row group per (q-block, segment).
    """
    sq_total, a_pad = prof.shape
    n_qb = sq_total // sq_block
    depth, L = t_seqs.shape
    n_segs = depth // seg_len
    n_t = bounds.shape[0]
    t_tile = L // n_t
    grid = (n_qb, n_t)
    return pl.pallas_call(
        partial(_kernel, sq=sq_block, nq=nq_block, t_tile=t_tile,
                a_pad=a_pad, max_span=max_span, seg_len=seg_len,
                n_segs=n_segs, gap_open=gap_open, gap_extend=gap_extend,
                state16=state16),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((sq_block, a_pad), lambda qb, ti: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sq_block, 1), lambda qb, ti: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sq_block, 1), lambda qb, ti: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sq_block, 1), lambda qb, ti: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sq_block, 1), lambda qb, ti: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq_block, 1), lambda qb, ti: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((depth, t_tile), lambda qb, ti: (0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_segs, t_tile), lambda qb, ti: (0, ti),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_segs * nq_block, t_tile),
                               lambda qb, ti: (qb, ti),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_qb * n_segs * nq_block, L),
                                       jnp.int32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(bounds, prof, c1, c2, first, qoff, last, t_seqs, keep)


def query_score_bound(q, matrix_scores, bias=None) -> int:
    """Upper bound on any SW score of query q: an alignment path takes
    at most one (diagonal) match per query row, and gap steps never add
    score, so sum of per-row positive profile maxima bounds every cell.
    The BIG-segmented cummaxes in the kernel are exact only while every
    score stays below BIG (a leaked cross-query value then loses by
    >= BIG - score-range); callers must route queries whose bound
    reaches BIG to a non-packed scorer."""
    q = np.asarray(q, dtype=np.int64)
    if len(q) == 0:
        return 0
    p = matrix_scores[q].astype(np.int64)
    if bias is not None:
        p = p + np.asarray(bias, dtype=np.int64)[:len(q), None]
    return int(np.maximum(p.max(axis=1), 0).sum())


def pack_query_rows(q_list, matrix_scores, bias_list=None,
                    gap_open: int = 16, gap_extend: int = 2,
                    a_pad: int = 32, sq_block: int = None):
    """Pack queries densely along the row axis into SQ_BLOCK-row groups.

    Queries fill each block greedily in order; a query never straddles
    a block boundary. sq_block=None sizes a single block to the total
    row count (rounded to the 8-sublane tile) when it fits the VMEM
    budget, else falls back to 2048-row groups. Returns dict with prof
    (bf16 [n_qb*SQ, a_pad]), c1/c2/first/qoff (int32 [n_qb*SQ, 1]),
    last (int32 [n_qb*NQ, 1]), qmap (int64 [n_qb*NQ], global query
    index per output row, -1 pad), sq_block, nq_block, max_span,
    n_queries.
    """
    if sq_block is None:
        # canonical pow2 buckets so compiled kernels recycle across
        # workloads (the relay's AOT compile costs minutes; the
        # persistent XLA cache keys on exact shapes)
        total = sum(len(q) for q in q_list)
        sq_block = 512
        while sq_block < min(max(total, 1), 2048):
            sq_block *= 2
    blocks = []          # list of list[(global_qi, seq)]
    cur, cur_rows = [], 0
    for qi, q in enumerate(q_list):
        n = len(q)
        if n == 0:
            continue
        if n > sq_block:
            raise ValueError(f"query {qi} length {n} exceeds sq_block")
        bound = query_score_bound(
            q, matrix_scores,
            bias_list[qi] if bias_list is not None else None)
        if bound >= BIG:
            raise ValueError(
                f"query {qi} max-score bound {bound} reaches the BIG="
                f"{BIG} segmentation offset; score it with a non-packed "
                "engine (device_allpairs_scores routes these "
                "automatically)")
        # the 512-query cap bounds the harvest output block
        # (n_segs * nq_block rows) within VMEM at canonical sizes
        if cur_rows + n > sq_block or len(cur) >= 512:
            blocks.append(cur)
            cur, cur_rows = [], 0
        cur.append((qi, q))
        cur_rows += n
    if cur or not blocks:
        blocks.append(cur)
    n_qb = len(blocks)
    nq_block = 8
    while nq_block < max((len(b) for b in blocks), default=1):
        nq_block *= 2

    prof = np.full((n_qb * sq_block, a_pad), NEG, dtype=np.float32)
    c1 = np.full((n_qb * sq_block, 1), BIGNEG, dtype=np.int32)
    c2 = np.full((n_qb * sq_block, 1), -BIGNEG, dtype=np.int32)
    first = np.zeros((n_qb * sq_block, 1), dtype=np.int32)
    qoff = np.full((n_qb * sq_block, 1), BIGNEG, dtype=np.int32)
    last = np.full((n_qb * nq_block, 1), -1, dtype=np.int32)
    qmap = np.full(n_qb * nq_block, -1, dtype=np.int64)
    max_len = 1
    for bi, block in enumerate(blocks):
        r = 0
        base = bi * sq_block
        for local, (qi, q) in enumerate(block):
            q = np.asarray(q, dtype=np.int64)
            n = len(q)
            max_len = max(max_len, n)
            p = matrix_scores[q].astype(np.float32)
            if bias_list is not None:
                p = p + np.asarray(bias_list[qi],
                                   dtype=np.float32)[:n, None]
            prof[base + r:base + r + n, :p.shape[1]] = p
            prof[base + r:base + r + n, p.shape[1]:] = NEG
            j = np.arange(n, dtype=np.int32)
            c1[base + r:base + r + n, 0] = (gap_extend * (j + 1) - gap_open
                                            + BIG * local)
            c2[base + r:base + r + n, 0] = gap_extend * j + BIG * local
            first[base + r, 0] = 1
            qoff[base + r:base + r + n, 0] = BIG * local
            last[bi * nq_block + local, 0] = r + n - 1
            qmap[bi * nq_block + local] = qi
            r += n
    max_span = 1
    while max_span < max_len:
        max_span *= 2
    return {
        "prof": jnp.asarray(prof, dtype=jnp.bfloat16),
        "c1": c1, "c2": c2, "first": first, "qoff": qoff, "last": last,
        "qmap": qmap, "sq_block": sq_block, "nq_block": nq_block,
        "max_span": max(max_span, 2), "n_queries": len(q_list),
    }


def pack_targets_segmented(t_list, seg_len: int = 16, t_tile: int = 128,
                           a_pad: int = 32, depth_cap: int = 4096):
    # seg_len=16 measured best on production-regime workloads: the
    # kernel's PADDED throughput is seg_len-invariant (~76-81 G
    # cells/s; tools/bench_packed.py sweep, round 4), so the shorter
    # segment wins on pack efficiency (70% -> 76% true cells);
    # seg_len=8 doubles n_segs and overflows the 128 MB VMEM budget.
    """Pack targets densely into lanes as runs of SEG-residue segments.

    Longest-first greedy onto the least-loaded lane. The lane count is
    the smallest multiple of t_tile whose balanced depth stays under
    depth_cap rows. Returns dict with t_seqs (int32 [n_segs*SEG, L]),
    keep (int32 [n_segs, L]), bounds (int32 [L/TT, 1], segments per lane
    tile), t_lane / t_seg (int64 [T]: lane and LAST segment of each
    target), seg_len, n_segs.
    """
    pad_letter = a_pad - 1
    T = len(t_list)
    lens = np.array([len(t) for t in t_list], dtype=np.int64)
    segs_per_t = np.maximum((lens + seg_len - 1) // seg_len, 1)
    total_segs = int(segs_per_t.sum())
    cap_segs = max(depth_cap // seg_len, 1)
    n_lanes = t_tile
    while n_lanes * cap_segs < total_segs:   # pow2 lane buckets
        n_lanes *= 2
    order = np.argsort(-lens, kind="stable")
    heap = [(0, lane) for lane in range(n_lanes)]
    heapq.heapify(heap)
    t_lane = np.zeros(T, dtype=np.int64)
    t_seg0 = np.zeros(T, dtype=np.int64)
    lane_depth = np.zeros(n_lanes, dtype=np.int64)
    for ti in order:
        d, lane = heapq.heappop(heap)
        t_lane[ti] = lane
        t_seg0[ti] = d
        lane_depth[lane] = d + segs_per_t[ti]
        heapq.heappush(heap, (int(lane_depth[lane]), lane))
    n_segs = 8
    while n_segs < int(lane_depth.max(initial=1)):
        n_segs *= 2
    t_seqs = np.full((n_segs * seg_len, n_lanes), pad_letter,
                     dtype=np.int32)
    keep = np.zeros((n_segs, n_lanes), dtype=np.int32)
    for ti in range(T):
        t = np.asarray(t_list[ti], dtype=np.int64)
        r0 = int(t_seg0[ti]) * seg_len
        t_seqs[r0:r0 + len(t), t_lane[ti]] = t
        keep[t_seg0[ti] + 1:t_seg0[ti] + segs_per_t[ti], t_lane[ti]] = 1
    t_seg = t_seg0 + segs_per_t - 1
    n_tiles = n_lanes // t_tile
    bounds = np.zeros((n_tiles, 1), dtype=np.int32)
    for k in range(n_tiles):
        bounds[k, 0] = int(lane_depth[k * t_tile:(k + 1) * t_tile]
                           .max(initial=0))
    return {
        "t_seqs": t_seqs, "keep": keep, "bounds": bounds,
        "t_lane": t_lane, "t_seg": t_seg, "seg_len": seg_len,
        "n_segs": n_segs, "n_lanes": n_lanes,
    }


def device_allpairs_scores(q_list, t_list, matrix_scores, bias_list=None,
                           gap_open: int = 16, gap_extend: int = 2,
                           t_chunk_residues: int = 8_000_000,
                           interpret: bool = False) -> np.ndarray:
    """[n_queries, n_targets] exact SW scores via the packed kernel.

    The production entry for bulk scoring: queries pack once, targets
    stream through the device in residue-bounded chunks (the HBM/
    transfer analog of the reference's RAM-bounded target splits,
    Prefiltering.h:43-49 setupSplit) — an arbitrarily large target side
    never materializes on the device at once.

    Queries whose max-score bound reaches the BIG segmentation offset
    (or whose length exceeds the 2048-row block) cannot ride the packed
    kernel exactly; they are scored by the bucketed XLA scan instead —
    the word-width escalation analog of the reference's sw_sse2_byte ->
    sw_sse2_word fallback (StripedSmithWaterman.h:253-273).
    """
    n_t = len(t_list)
    out = np.zeros((len(q_list), n_t), dtype=np.int32)
    dev_idx, wide_idx = [], []
    for qi, q in enumerate(q_list):
        bound = query_score_bound(
            q, matrix_scores,
            bias_list[qi] if bias_list is not None else None)
        if bound >= BIG or len(q) > 2048:
            wide_idx.append(qi)
        else:
            dev_idx.append(qi)
    if dev_idx:
        pack = pack_query_rows(
            [q_list[i] for i in dev_idx], matrix_scores,
            bias_list=([bias_list[i] for i in dev_idx]
                       if bias_list is not None else None),
            gap_open=gap_open, gap_extend=gap_extend)
        lo = 0
        while lo < n_t:
            hi = lo
            res = 0
            while hi < n_t and (res == 0 or res + len(t_list[hi])
                                <= t_chunk_residues):
                res += len(t_list[hi])
                hi += 1
            tpack = pack_targets_segmented(t_list[lo:hi])
            out[dev_idx, lo:hi] = allpairs_scores(
                pack, tpack, gap_open=gap_open, gap_extend=gap_extend,
                interpret=interpret)
            lo = hi
    if wide_idx:
        from .sw_tpu import score_pairs_bucketed
        pairs = [(qi, ti) for qi in wide_idx for ti in range(n_t)]
        flat = score_pairs_bucketed(
            pairs, q_list, t_list, matrix_scores,
            biases=bias_list, gap_open=gap_open, gap_extend=gap_extend)
        for (qi, ti), sc in zip(pairs, flat):
            out[qi, ti] = sc
    return out


def allpairs_scores(pack, tpack, gap_open=16, gap_extend=2,
                    interpret=False):
    """[n_queries, n_targets] final scores from the packed kernel."""
    raw = sw_allpairs_packed(
        pack["prof"], pack["c1"], pack["c2"], pack["first"],
        pack["qoff"], pack["last"], tpack["t_seqs"], tpack["keep"],
        tpack["bounds"], gap_open=gap_open, gap_extend=gap_extend,
        max_span=pack["max_span"], sq_block=pack["sq_block"],
        nq_block=pack["nq_block"], seg_len=tpack["seg_len"],
        interpret=interpret)
    nq = pack["nq_block"]
    n_segs = tpack["n_segs"]
    raw = np.asarray(raw).reshape(-1, n_segs, nq, tpack["n_lanes"])
    n_targets = len(tpack["t_lane"])
    out = np.zeros((pack["n_queries"], n_targets), dtype=np.int32)
    qmap = pack["qmap"]
    for slot in np.flatnonzero(qmap >= 0):
        qb, local = divmod(int(slot), nq)
        out[qmap[slot]] = raw[qb, tpack["t_seg"], local, tpack["t_lane"]]
    return out
