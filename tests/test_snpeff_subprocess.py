"""snpEff subprocess path driven end-to-end through a fake `java` shim.

No Java lives in this image, so the shim (a bash script first on PATH)
stands in for snpEff: it logs every command line it receives (so the test
can assert command assembly matches R/SnpEffAnnotations.R:106-215 build
and :237-270 annotate invocations), exits 0 for `build`, and for the
annotate call rewrites the input VCF's INFO column with canned ANN fields
(including a stray quote, which the reference strips via gsub,
R/SnpEffAnnotations.R:277-292).
"""

import os
import stat
from types import SimpleNamespace

import numpy as np
import pandas as pd
import pytest

from ldweaver_tpu.annotate import perform_annotations

_SHIM = r"""#!/usr/bin/env bash
echo "JAVA_ARGS: $*" >> "${FAKE_JAVA_LOG:?}"
for a in "$@"; do if [ "$a" = build ]; then exit 0; fi; done
vcf="${!#}"
awk -F'\t' 'BEGIN{OFS="\t"}
/^#/{print; next}
{
  eff="missense_variant"; gene="geneA"; tag="LT_A"
  if ($2==9)  eff="synonymous_variant";
  if ($2==2)  {eff="upstream_gene_variant"; gene="geneB"; tag="LT_B"}
  ann="ANN="$5"|"eff"|MODERATE|"gene"|"tag"|transcript|TX1|protein_coding|1/1|c.1A>G|p.\"Thr1Ala\"|10/900|10/900|4/300||"
  $8=ann; print
}' "$vcf"
"""


@pytest.fixture
def fake_java(tmp_path, monkeypatch):
    shim_dir = tmp_path / "bin"
    shim_dir.mkdir()
    shim = shim_dir / "java"
    shim.write_text(_SHIM)
    shim.chmod(shim.stat().st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
    log = tmp_path / "java_calls.log"
    log.write_text("")
    monkeypatch.setenv("PATH", f"{shim_dir}{os.pathsep}{os.environ['PATH']}")
    monkeypatch.setenv("FAKE_JAVA_LOG", str(log))
    return log


def test_snpeff_subprocess_end_to_end(tmp_path, fake_java):
    jar = tmp_path / "snpEff.jar"
    jar.write_bytes(b"fake jar")
    gbk = tmp_path / "toy.gbk"
    gbk.write_text("LOCUS TOY 10 bp\n//\n")
    ann_dir = tmp_path / "ann"

    snp_data = SimpleNamespace(pos=np.array([2, 7, 9, 10]), nseq=4)
    cds_var = SimpleNamespace(
        ref=np.array(["A", "G", "T", "T"]),
        alt=np.array(["C", "A", "A", "C"]),
        allele_table=np.ones((5, 4), dtype=np.int64),
    )
    links = pd.DataFrame(
        dict(
            pos1=[2, 7],
            pos2=[9, 10],
            len=[7.0, 3.0],
            MI=[0.5, 0.4],
            srp_max=[5.0, 4.0],
            ARACNE=[1, 1],
        )
    )

    tophits = perform_annotations(
        dset_name="toydset",
        annotation_folder=str(ann_dir),
        snp_data=snp_data,
        cds_var=cds_var,
        links_df=links,
        genome_name="TOYGENOME.1",
        g=1000,
        cds_features=[],
        ref_seq="A" * 1000,
        snpeff_jar=str(jar),
        gbk_path=str(gbk),
        links_type="SR",
    )

    # --- command assembly (R/SnpEffAnnotations.R:131,180,261) ---
    calls = [
        line.removeprefix("JAVA_ARGS: ")
        for line in fake_java.read_text().splitlines()
    ]
    assert len(calls) == 2
    build, annotate = calls
    assert "-jar" in build and str(jar) in build
    assert "build" in build and "-genbank" in build
    assert "snpEff.config" in build and "snpEff_data" in build
    assert build.rstrip().endswith("toydset")
    assert annotate.startswith("-Xmx16G")
    assert "-dataDir" in annotate and "-config" in annotate
    assert "toydset" in annotate and annotate.rstrip().endswith("sr_snps.vcf")

    # --- data dir prep (R/SnpEffAnnotations.R:150-178) ---
    assert (ann_dir / "snpEff_data" / "toydset" / "genes.gbk").exists()
    cfg = (ann_dir / "snpEff.config").read_text()
    assert "toydset.genome : toydset" in cfg
    assert "toydset.TOYGENOME.1.codonTable : Bacterial_and_Plant_Plastid" in cfg

    # --- ANN parsing (convert_vcfann_to_table, :272-311) ---
    ann = pd.read_csv(ann_dir / "sr_annotations.tsv", sep="\t")
    assert ann["pos"].tolist() == [2, 7, 9, 10]
    assert ann["code"].tolist() == ["ig", "ns", "sy", "ns"]
    assert ann["annotation"].tolist() == [
        "upstream_gene_variant",
        "missense_variant",
        "synonymous_variant",
        "missense_variant",
    ]
    # description joins unique ANN subfields 4,5,10,11 with ':' and strips
    # stray quotes (the shim plants one in p."Thr1Ala")
    assert ann["description"].iloc[1] == "geneA:LT_A:c.1A>G:p.Thr1Ala"
    assert '"' not in "".join(ann["description"])
    assert ann["cds"].tolist() == ["LT_B", "LT_A", "LT_A", "LT_A"]
    assert ann["allele_dist"].iloc[0].startswith("A:0.25")

    # --- joined links + tophit filter ---
    la = pd.read_csv(ann_dir / "sr_links_annotated.tsv", sep="\t")
    assert la["links"].tolist() == ["igXsy", "nsXns"]
    # the 7-10 link is same-genreg (LT_A x LT_A) and must be dropped
    assert len(tophits) == 1
    assert tophits["pos1"].iloc[0] == 2 and tophits["pos2"].iloc[0] == 9


def test_snpeff_gff_build_command(tmp_path, fake_java):
    """GFF-based build uses -gff3 -noCheckCds -noCheckProtein
    (R/SnpEffAnnotations.R:180-189)."""
    from ldweaver_tpu.annotate import prep_snpeff

    jar = tmp_path / "snpEff.jar"
    jar.write_bytes(b"fake jar")
    gff = tmp_path / "toy.gff"
    gff.write_text("##gff-version 3\n")
    ref = tmp_path / "ref.fa"
    ref.write_text(">r\nACGT\n")
    work = tmp_path / "w"
    work.mkdir()

    prep_snpeff(
        "gdset", "GEN", str(jar), str(work), gff_path=str(gff), ref_path=str(ref)
    )
    call = fake_java.read_text().splitlines()[-1]
    assert "-gff3" in call and "-noCheckCds" in call and "-noCheckProtein" in call
    assert (work / "snpEff_data" / "gdset" / "genes.gff").exists()
    assert (work / "snpEff_data" / "gdset" / "sequences.fa").exists()
