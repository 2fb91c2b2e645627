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
