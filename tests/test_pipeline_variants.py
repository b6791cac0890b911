"""Pipeline variant coverage: SR-only mode, GFF3 annotations, SpydrPick
long-range input."""

import os

import numpy as np
import pandas as pd
import pytest

from ldweaver_tpu.io import readers
from ldweaver_tpu.pipeline import analyse_long_range_links, ldweaver
from tests.conftest import TOY_ALN, TOY_POS, _synth_genome


@pytest.fixture(scope="module")
def gff_inputs(toy_snp_data, tmp_path_factory):
    """GFF3 + reference fasta for the toy region."""
    tmp = tmp_path_factory.mktemp("gff")
    seq = _synth_genome(toy_snp_data, 50000)
    ref_path = str(tmp / "ref.fa")
    with open(ref_path, "wt") as fh:
        fh.write(">TOYREF\n")
        for i in range(0, len(seq), 70):
            fh.write(seq[i : i + 70] + "\n")
    gff_path = str(tmp / "ann.gff3")
    rng = np.random.default_rng(9)
    with open(gff_path, "wt") as fh:
        fh.write("##gff-version 3\n")
        p = 150
        k = 0
        while p + 800 < 50000:
            ln = int(rng.integers(180, 280)) * 3
            strand = "+" if rng.random() < 0.7 else "-"
            fh.write(
                f"TOYREF\tsynth\tgene\t{p}\t{p + ln - 1}\t.\t{strand}\t.\t"
                f"ID=gene{k};Name=g{k:03d}\n"
            )
            fh.write(
                f"TOYREF\tsynth\tCDS\t{p}\t{p + ln - 1}\t.\t{strand}\t0\t"
                f"ID=cds{k};Parent=gene{k};locus_tag=TOY_{k:04d}\n"
            )
            p += ln + int(rng.integers(40, 200))
            k += 1
    return gff_path, ref_path


def test_gff3_pipeline(gff_inputs, tmp_path):
    gff_path, ref_path = gff_inputs
    pos = np.loadtxt(TOY_POS, dtype=np.int64)
    dset = str(tmp_path / "gffrun")
    sr = ldweaver(
        dset=dset,
        aln_path=TOY_ALN,
        aln_has_all_bases=False,
        pos=pos,
        gff3_path=gff_path,
        ref_fasta_path=ref_path,
        backend="fast",
    )
    assert len(sr) > 0
    assert os.path.exists(os.path.join(dset, "Tophits/sr_tophits.tsv"))
    th = readers.read_top_hits(os.path.join(dset, "Tophits/sr_tophits.tsv"))
    # annotations carry the GFF locus tags
    assert th["pos1_genreg"].astype(str).str.contains("TOY_|g0|gene").any()


def test_sr_only_pipeline(toy_gbk_path, tmp_path):
    pos = np.loadtxt(TOY_POS, dtype=np.int64)
    dset = str(tmp_path / "sronly")
    sr = ldweaver(
        dset=dset,
        aln_path=TOY_ALN,
        aln_has_all_bases=False,
        pos=pos,
        gbk_path=toy_gbk_path,
        perform_SR_analysis_only=True,
        backend="numpy",
    )
    assert len(sr) > 0
    # no long-range outputs in SR-only mode (R/BacGWES.R:399-408,469)
    assert not os.path.exists(os.path.join(dset, "Temp/lr_links.tsv"))
    assert not os.path.exists(os.path.join(dset, "Tophits/lr_tophits.tsv"))
    assert os.path.exists(os.path.join(dset, "Tophits/sr_tophits.tsv"))


def test_spydrpick_input(tmp_path):
    """SpydrPick-format LR links (space-separated, 4 or 5 columns) feed
    the standalone LR analyser (R/io_functions.R:36-41,
    R/lr_analyser.R:57-58)."""
    rng = np.random.default_rng(3)
    n = 9000
    pos1 = rng.integers(1, 2_000_000, n)
    pos2 = pos1 + rng.integers(25_000, 800_000, n)
    mi = rng.beta(2, 40, n)
    sp_path = str(tmp_path / "spydr.edges")
    with open(sp_path, "wt") as fh:
        for i in range(n):
            fh.write(
                f"{pos1[i]} {pos2[i]} {pos2[i] - pos1[i]} {mi[i]:.6f}\n"
            )
    df = readers.read_long_range_links(
        sp_path, links_from_spydrpick=True, sr_dist=20000
    )
    assert list(df.columns) == ["pos1", "pos2", "len", "MI"]
    assert len(df) == n

    # minimal sr_links file to combine with
    sr_path = str(tmp_path / "sr.tsv")
    with open(sr_path, "wt") as fh:
        for i in range(50):
            fh.write(
                f"1\t{i * 10 + 1}\t{i * 10 + 5}\t1\t1\t4\t0.2\t3.5\t1\n"
            )
    dset = str(tmp_path / "lrd")
    out = analyse_long_range_links(
        dset, sp_path, sr_path, links_from_spydrpick=True
    )
    assert "ARACNE" in out.columns
    assert (out["MI"] > 0).all()
    assert os.path.exists(os.path.join(dset, "lr_gwes.png"))
