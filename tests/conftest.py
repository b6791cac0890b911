"""Test configuration: force an 8-device virtual CPU mesh so the sharded
pair-block sweep is exercised without TPU hardware."""

import os

# The image's sitecustomize registers the 'axon' TPU-relay backend at
# interpreter startup and overwrites jax_platforms (host transfers and
# remote compiles through the relay take ~30-90 s each); tests must run on
# a virtual CPU mesh, so force the config AFTER the plugin has loaded.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"
assert len(jax.devices()) >= 8, "expected the 8-device virtual CPU mesh"


TOY_ALN = "/root/reference/inst/extdata/snp_sample.fa.gz"
TOY_POS = "/root/reference/inst/extdata/snp_sample.pos"


@pytest.fixture(scope="session")
def toy_snp_data():
    from ldweaver_tpu.io.fasta import parse_fasta_snp_alignment

    pos = np.loadtxt(TOY_POS, dtype=np.int64)
    sd = parse_fasta_snp_alignment(TOY_ALN, pos)
    sd.g = 50000  # the toy region is 50 kb (README.md quick start)
    return sd


@pytest.fixture(scope="session")
def toy_hdw(toy_snp_data):
    from ldweaver_tpu.core.hamming import hamming_weights_numpy

    return hamming_weights_numpy(toy_snp_data.codes, 0.1)


def _synth_genome(toy_snp_data, g=50000, seed=11):
    """Synthetic 50 kb reference consistent with the toy alignment: the
    majority allele at every SNP position, random bases elsewhere.  (The
    real sample.gbk is a git-LFS blob missing from the mirror,
    /root/reference/.MISSING_LARGE_BLOBS.)"""
    rng = np.random.default_rng(seed)
    seq = rng.choice(list("ACGT"), size=g)
    maj = np.argmax(toy_snp_data.acgtn_table[:4], axis=0)
    for p, a in zip(toy_snp_data.pos, maj):
        seq[p - 1] = "ACGT"[a]
    return "".join(seq)


def _write_gbk(path, name, seq, cds_list):
    """Write a minimal but well-formed GenBank flat file."""
    g = len(seq)
    with open(path, "wt") as fh:
        fh.write(
            f"LOCUS       {name}             {g} bp    DNA     circular"
            " BCT 01-JAN-2024\n"
        )
        fh.write(f"DEFINITION  synthetic toy genome.\n")
        fh.write(f"VERSION     {name}\n")
        fh.write("FEATURES             Location/Qualifiers\n")
        fh.write(f"     source          1..{g}\n")
        for k, (s, e, strand) in enumerate(cds_list):
            loc = f"{s}..{e}" if strand > 0 else f"complement({s}..{e})"
            fh.write(f"     gene            {loc}\n")
            fh.write(f'                     /gene="g{k:03d}"\n')
            fh.write(f"     CDS             {loc}\n")
            fh.write(f'                     /gene="g{k:03d}"\n')
            fh.write(f'                     /locus_tag="TOY_{k:04d}"\n')
            fh.write(f'                     /product="hypothetical protein {k}"\n')
        fh.write("ORIGIN\n")
        for i in range(0, g, 60):
            chunk = seq[i : i + 60]
            groups = " ".join(
                chunk[j : j + 10] for j in range(0, len(chunk), 10)
            )
            fh.write(f"{i + 1:>9} {groups.lower()}\n")
        fh.write("//\n")


@pytest.fixture(scope="session")
def toy_gbk_path(toy_snp_data, tmp_path_factory):
    g = 50000
    seq = _synth_genome(toy_snp_data, g)
    rng = np.random.default_rng(5)
    cds = []
    p = 120
    while p + 900 < g:
        ln = int(rng.integers(200, 300)) * 3  # multiple of 3
        strand = 1 if rng.random() < 0.7 else -1
        cds.append((p, p + ln - 1, strand))
        p += ln + int(rng.integers(20, 220))
    path = str(tmp_path_factory.mktemp("gbk") / "toy.gbk")
    _write_gbk(path, "TOYGENOME.1", seq, cds)
    return path
