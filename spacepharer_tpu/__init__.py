"""spacepharer_tpu — a TPU-native CRISPR spacer vs. phage genome matching framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
soedinglab/spacepharer (reference: /root/reference). The compute path
(six-frame translation, k-mer prefilter, Smith-Waterman alignment,
score aggregation) runs as batched, fixed-shape tensor programs on TPU;
the surrounding data model is packed NumPy arrays instead of the
reference's text key-value databases.

Layer map (mirrors SURVEY.md §7):
  io/        FASTA + spacer-tool-format parsers, packed SetDB artifact store
  ops/       sequence kernels: translate, ORF finding, substitution matrices,
             k-mer prefilter, Smith-Waterman, E-values (JAX/Pallas)
  stats/     best-hit P-values, S_comb aggregation, FDR calibration
  report/    ORF->contig offsets, nucleotide re-alignment, PAM scan, TSV writers
  tax/       NCBI taxonomy, LCA, rank restriction
  parallel/  device-mesh sharding of the target index + collective hit merge
  pipeline/  workflow orchestration with content-hash artifact resume
"""

__version__ = "0.1.0"


def _tune_allocator():
    """Keep freed large blocks inside the process arena.

    NumPy routes big temporaries through malloc; glibc's default policy
    mmaps and munmaps them, so every pipeline stage re-pays the page
    fault cost of its buffers. Under a hypervisor (Firecracker/axon)
    first-touch faults run ~200x slower than warm memory, which made
    allocation the top cost of the whole host pipeline. Raising
    M_MMAP_THRESHOLD and disabling trim makes the fault cost a one-time
    high-water-mark charge. (Same concern the reference addresses by
    vendoring nedmalloc, lib/mmseqs/lib/nedmalloc.)
    """
    import ctypes
    import sys
    if not sys.platform.startswith("linux"):
        return
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD = -1
        M_MMAP_THRESHOLD = -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, -1)
    except OSError:
        pass


_tune_allocator()


def _default_jax_cache():
    """Persistent XLA compilation cache (opt-out via env).

    TPU compiles through the axon relay cost 20-60s per kernel shape
    and are process-local by default; the persistent cache makes every
    CLI invocation after the first reuse them (verified: recompile of
    a cached kernel drops to ~0.25s)."""
    import os
    import sys
    if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
        d = os.path.join(os.path.expanduser("~"), ".cache",
                         "spacepharer_tpu", "jax")
        try:
            os.makedirs(d, exist_ok=True)
            os.environ["JAX_COMPILATION_CACHE_DIR"] = d
        except OSError:
            return
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    # On relay hosts the site hook imports jax BEFORE this package, so
    # the env vars above are read too late — apply through the live
    # config as well (cheap; does not initialize a backend)
    if "jax" in sys.modules:
        try:
            import jax
            jax.config.update("jax_compilation_cache_dir",
                              os.environ["JAX_COMPILATION_CACHE_DIR"])
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1)
        except Exception:  # noqa: BLE001 - cache is best-effort
            pass


_default_jax_cache()
