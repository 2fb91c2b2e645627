#!/usr/bin/env python3
"""Compare packed Pallas SW kernel vs the round-1 XLA scan on the real chip.

Honest chained protocol (see bench.py): data-dependent fori_loop chain,
final fetch, (n_hi - n_lo) subtraction.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_workload  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from spacepharer_tpu.ops.matrices import load_matrix
    from spacepharer_tpu.ops.sw_packed import (pack_query_rows,
                                               pack_targets_segmented,
                                               sw_allpairs_packed)

    seg_len = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    depth_cap = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    sq_block = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    t_tile = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    dup = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    sq_block = sq_block or None
    qs, ts = build_workload()
    ts = ts * dup     # production-scale target regime
    m = load_matrix("VTML40.out", 2.0)
    pack = pack_query_rows(qs, m.scores, sq_block=sq_block)
    tpack = pack_targets_segmented(ts, seg_len=seg_len, t_tile=t_tile,
                                   depth_cap=depth_cap)
    prof = jax.device_put(pack["prof"])
    c1 = jax.device_put(jnp.asarray(pack["c1"]))
    c2 = jax.device_put(jnp.asarray(pack["c2"]))
    first = jax.device_put(jnp.asarray(pack["first"]))
    qoffd = jax.device_put(jnp.asarray(pack["qoff"]))
    lastd = jax.device_put(jnp.asarray(pack["last"]))
    tdev = jax.device_put(jnp.asarray(tpack["t_seqs"]))
    kdev = jax.device_put(jnp.asarray(tpack["keep"]))
    bdev = jax.device_put(jnp.asarray(tpack["bounds"]))
    max_span = pack["max_span"]
    # timing experiments only: forcing a smaller span yields WRONG
    # scores for longer queries but measures the cummax op share
    if os.environ.get("SPAN_OVERRIDE"):
        max_span = int(os.environ["SPAN_OVERRIDE"])
    nq_block = pack["nq_block"]
    sq_block = pack["sq_block"]

    @jax.jit
    def chain(prof, c1, c2, first, qoff, last, t_seqs, keep, bounds, n):
        def body(i, carry):
            acc, c1v = carry
            best = sw_allpairs_packed(prof, c1v, c2, first, qoff, last,
                                      t_seqs, keep, bounds, 16, 2,
                                      max_span, sq_block, nq_block,
                                      seg_len,
                                      state16=bool(os.environ.get(
                                          "STATE16")))
            acc = acc + best.sum()
            return acc, c1 + (acc & 1)
        acc, _ = jax.lax.fori_loop(0, n, body,
                                   (jnp.int64(0) if jax.config.jax_enable_x64
                                    else jnp.int32(0), c1))
        return acc

    args = (prof, c1, c2, first, qoffd, lastd, tdev, kdev, bdev)
    t0 = time.perf_counter()
    np.asarray(chain(*args, 1))
    print(f"compile+warm: {time.perf_counter() - t0:.1f}s", flush=True)
    times = {}
    for n in (2, 12):
        t0 = time.perf_counter()
        np.asarray(chain(*args, n))
        times[n] = time.perf_counter() - t0
    dt = (times[12] - times[2]) / 10
    q_lens = np.array([len(q) for q in qs], dtype=np.int64)
    t_lens = np.array([len(t) for t in ts], dtype=np.int64)
    true_cells = int(q_lens.sum() * t_lens.sum())
    n_qb = pack["prof"].shape[0] // sq_block
    padded = n_qb * sq_block * seg_len * int(
        tpack["bounds"][:, 0].astype(np.int64).sum()) * t_tile
    print(f"seg_len={seg_len} sq_block={sq_block} n_qb={n_qb} "
          f"lanes={tpack['n_lanes']} n_segs={tpack['n_segs']} "
          f"max_span={max_span} nq_block={nq_block}")
    print(f"dt/iter={dt*1e3:.2f}ms true={true_cells/dt/1e9:.2f} Gcells/s "
          f"padded={padded/dt/1e9:.2f} Gcells/s "
          f"(pack eff {true_cells/padded:.2%})")


if __name__ == "__main__":
    main()
