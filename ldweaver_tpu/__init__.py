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


# Public API mirroring the reference package's exported functions
# (NAMESPACE equivalents; reference R/ function names in snake_case).
# Heavy imports are deferred: each symbol is a lazy attribute so that
# `import ldweaver_tpu` stays cheap and jax/pandas load only when used.
_API = {
    # L8 driver (R/BacGWES.R:69 LDWeaver)
    "ldweaver": ("ldweaver_tpu.pipeline", "ldweaver"),
    "cleanup": ("ldweaver_tpu.pipeline", "cleanup"),
    # L1 ingest (R/extractSNPs.R:23,168)
    "parse_fasta_alignment": ("ldweaver_tpu.io.fasta", "parse_fasta_alignment"),
    "parse_fasta_snp_alignment": (
        "ldweaver_tpu.io.fasta", "parse_fasta_snp_alignment"),
    # L2 annotation parsing (R/parseGBK.R:27, R/parseGFF.R:19)
    "parse_genbank_file": ("ldweaver_tpu.io.genbank", "parse_genbank_file"),
    "parse_gff_file": ("ldweaver_tpu.io.gff", "parse_gff_file"),
    # L3 statistics prep (R/estimateCDSDiversity.R:27,
    # R/performPopulationStuctureCorrection.R:20)
    "estimate_variation_in_cds": (
        "ldweaver_tpu.core.cds", "estimate_variation_in_cds"),
    "estimate_hamming_distance_weights": (
        "ldweaver_tpu.core.hamming", "estimate_hamming_distance_weights"),
    # L4/L5 MI engine + post-processing (R/computePairwiseMI.R:46,
    # R/io_functions.R:101, R/lr_analyser.R:30)
    "perform_mi_computation": ("ldweaver_tpu.core.sweep", "perform_mi_computation"),
    "run_aracne": ("ldweaver_tpu.core.aracne", "run_aracne"),
    "analyse_long_range_links": (
        "ldweaver_tpu.pipeline", "analyse_long_range_links"),
    # L6 outputs (R/SnpEffAnnotations.R:29, R/createGWESExplorerOutput.R:23,
    # R/io_functions.R:13-83,363-460)
    "perform_annotations": ("ldweaver_tpu.annotate", "perform_annotations"),
    # exact reference NAMESPACE name aliases (perform_snpEff_annotations /
    # write_output_for_gwes_explorer, NAMESPACE:19,25)
    "perform_snpeff_annotations": ("ldweaver_tpu.annotate", "perform_annotations"),
    "write_gwes_explorer_output": (
        "ldweaver_tpu.io.writers", "write_gwes_explorer_output"),
    "write_output_for_gwes_explorer": (
        "ldweaver_tpu.io.writers", "write_gwes_explorer_output"),
    "snpdat_to_fa": ("ldweaver_tpu.io.writers", "snpdat_to_fa"),
    "generate_links_snps_fasta": (
        "ldweaver_tpu.io.writers", "generate_links_snps_fasta"),
    "read_top_hits": ("ldweaver_tpu.io.readers", "read_top_hits"),
    "read_long_range_links": ("ldweaver_tpu.io.readers", "read_long_range_links"),
    "read_short_range_links": (
        "ldweaver_tpu.io.readers", "read_short_range_links"),
    "read_annotated_links": ("ldweaver_tpu.io.readers", "read_annotated_links"),
    # L7 visualisation (R/prepareGWESplots.R:25, R/LDSummaryPlot.R:25,
    # R/createTanglegram.R:26, R/createNetworkPlot.R:28,169, R/preptrees.R:45)
    "make_gwes_plots": ("ldweaver_tpu.plots", "make_gwes_plots"),
    "genomewide_ld_map": ("ldweaver_tpu.plots", "genomewide_ld_map"),
    "create_network": ("ldweaver_tpu.plots", "create_network"),
    "create_network_for_gene": ("ldweaver_tpu.plots", "create_network_for_gene"),
    "create_tanglegram": ("ldweaver_tpu.tanglegram", "create_tanglegram"),
    "view_tree": ("ldweaver_tpu.trees", "view_tree"),
}

__all__ = ["LDWeaverConfig", *_API]


def __getattr__(name):
    if name in _API:
        import importlib

        mod, attr = _API[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'ldweaver_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(_API))
