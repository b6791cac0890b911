"""Test configuration: force an 8-device virtual CPU mesh so the sharded
pair-block sweep is exercised without TPU hardware."""

import os

# the image pins JAX_PLATFORMS=axon (single real TPU via a relay with very
# slow host transfers); tests must run on a virtual CPU mesh instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


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
