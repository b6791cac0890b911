"""Large-alignment recipe: streaming + pipelined multi-device sweep.

    python examples/run_large.py <out_dir> <alignment.fa.gz> <ref.gbk>

Shows the three production knobs for big datasets (all output-invariant;
see docs/SCALING.md):
  * device_budget_bytes - HBM cap; auto-detected from the chip's
    bytes_limit when left None, so >HBM code tensors stream through the
    LRU slab cache instead of OOMing,
  * pipeline_depth     - tiles dispatched ahead of host link extraction,
  * n_devices          - round-robin the tile sweep over local chips.
"""

import sys

from ldweaver_tpu import LDWeaverConfig, ldweaver


def main(out, aln, gbk):
    cfg = LDWeaverConfig(
        SnpEff_Annotate=False,     # enable with snpeff_jar_path=...
        max_blk_sz=4096,           # measured optimum on v5e
        lr_retain_links=1_000_000,
        device_budget_bytes=None,  # None = auto (device bytes_limit)
        pipeline_depth=4,
        n_devices=None,            # None = all local devices
        save_additional_outputs=True,  # npz caches enable resume
    )
    sr = ldweaver(dset=out, aln_path=aln, gbk_path=gbk, config=cfg,
                  backend="fast")
    print(f"{len(sr)} short-range links; outputs in {out}/")


if __name__ == "__main__":
    main(*sys.argv[1:4])
