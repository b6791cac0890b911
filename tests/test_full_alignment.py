"""Full-alignment ingest path end-to-end (the toy data only covers the
SNP-only path): synthetic 8 kb alignment + matching GenBank."""

import gzip
import os

import numpy as np
import pytest

from tests.conftest import _write_gbk


@pytest.fixture(scope="module")
def full_aln(tmp_path_factory):
    rng = np.random.default_rng(42)
    g = 8000
    nseq = 60
    ref = rng.choice(list("ACGT"), size=g)
    # plant ~150 SNP sites with 20-45% minor allele freq + a few gappy sites
    snp_sites = np.sort(rng.choice(g, size=700, replace=False))
    seqs = np.tile(ref, (nseq, 1))
    # correlated carrier patterns (LD blocks of 3 consecutive SNP sites,
    # with 10% noise) so that genuine links exist
    carriers = None
    for k, s in enumerate(snp_sites):
        if k % 3 == 0 or carriers is None:
            carriers = rng.random(nseq) < rng.uniform(0.2, 0.45)
        noisy = carriers ^ (rng.random(nseq) < 0.1)
        minor = rng.choice([c for c in "ACGT" if c != ref[s]])
        seqs[noisy, s] = minor
    # gap-heavy site (should be filtered out)
    gap_site = snp_sites[0]
    seqs[rng.random(nseq) < 0.5, gap_site] = "-"

    tmp = tmp_path_factory.mktemp("full")
    aln = str(tmp / "full.aln.gz")
    with gzip.open(aln, "wt") as fh:
        for i in range(nseq):
            fh.write(f">iso{i:03d}\n" + "".join(seqs[i]) + "\n")

    cds = []
    p = 60
    while p + 400 < g:
        ln = 120 * 3
        cds.append((p, p + ln - 1, 1 if rng.random() < 0.7 else -1))
        p += ln + 80
    gbk = str(tmp / "full.gbk")
    _write_gbk(gbk, "FULLTOY.1", "".join(ref), cds)
    return aln, gbk, str(tmp)


def test_full_alignment_pipeline(full_aln):
    from ldweaver_tpu.pipeline import ldweaver

    aln, gbk, tmp = full_aln
    dset = os.path.join(tmp, "run")
    sr = ldweaver(
        dset=dset,
        aln_path=aln,
        gbk_path=gbk,
        backend="fast",
        sr_dist=1001,
        num_clusts_CDS=2,
        srp_cutoff=0.5,
    )
    assert len(sr) > 0
    assert os.path.exists(os.path.join(dset, "Tophits/sr_tophits.tsv"))
    # genome length came from the alignment itself
    from ldweaver_tpu.io.fasta import parse_fasta_alignment

    sd = parse_fasta_alignment(aln)
    assert sd.g == 8000
    assert sd.nseq == 60
    assert 500 < sd.nsnp <= 700


def test_length_validation_raises(full_aln, tmp_path):
    from ldweaver_tpu.io.genbank import parse_genbank_file

    aln, gbk, tmp = full_aln
    with pytest.raises(ValueError):
        parse_genbank_file(gbk, g=9999, length_check=True)
