"""LDWeaver-TPU: a TPU-native genome-wide epistasis (GWES) engine.

A from-scratch re-design of the capabilities of LDWeaver
(Sudaraka88/LDWeaver; Mallawaarachchi et al., NAR Genom. Bioinform. 2024)
for TPU hardware: the all-vs-all Hamming-weighted pairwise mutual-information
sweep over SNP pairs is expressed as blocked one-hot contingency matmuls on
the MXU (JAX/XLA with an optional fused Pallas kernel), the pair-block sweep
is sharded data-parallel over a `jax.sharding.Mesh`, and background-model /
top-k statistics are merged with XLA collectives.

Layer map (mirrors reference layers L0-L8, see SURVEY.md section 1):
  io/       - FASTA ingest, GenBank/GFF3 parsing, TSV readers/writers
  core/     - SNP tensor, Hamming weights, CDS diversity, MI engine,
              background model, ARACNE, long-range analyser
  ops/      - Pallas TPU kernels for the hot MI contingency sweep
  parallel/ - mesh sharding of the pair-block sweep + collective merges
  utils/    - R-compatible numerics (type-7 quantile, Nelder-Mead, RNG)
  pipeline  - the LDWeaver() 12-block driver equivalent
"""

__version__ = "0.1.0"

from ldweaver_tpu.config import LDWeaverConfig  # noqa: F401
