"""Minimal end-to-end example on the bundled toy data.

    python examples/run_toy.py /tmp/toy_out

Uses the SNP-only alignment + positions file from the LDWeaver reference
checkout plus a synthetic GenBank (the upstream sample.gbk is a stripped
LFS blob); swap in your own alignment + annotation for real use.
"""

import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main(out="toy_out"):
    from tests.conftest import TOY_ALN, TOY_POS, _synth_genome, _write_gbk
    from ldweaver_tpu.io.fasta import parse_fasta_snp_alignment
    from ldweaver_tpu.pipeline import ldweaver

    pos = np.loadtxt(TOY_POS, dtype=np.int64)
    sd = parse_fasta_snp_alignment(TOY_ALN, pos)
    gbk = out + "_toy.gbk"
    rng = np.random.default_rng(5)
    cds = []
    p = 120
    while p + 900 < 50000:
        ln = int(rng.integers(200, 300)) * 3
        cds.append((p, p + ln - 1, 1 if rng.random() < 0.7 else -1))
        p += ln + int(rng.integers(20, 220))
    _write_gbk(gbk, "TOYGENOME.1", _synth_genome(sd, 50000), cds)

    sr = ldweaver(
        dset=out,
        aln_path=TOY_ALN,
        aln_has_all_bases=False,
        pos=pos,
        gbk_path=gbk,
        validate_ref_ann_lengths=False,
        backend="fast",
    )
    print(f"\n{len(sr)} short-range links; outputs in {out}/")


if __name__ == "__main__":
    main(*sys.argv[1:])
