"""Golden regression tests: frozen f64-oracle outputs on the toy data.

These pin the numeric contract of the engine so refactors that silently
change the statistic are caught (the values were produced by the audited
oracle implementation of SURVEY.md section 2.3)."""

import numpy as np

from ldweaver_tpu.core.hamming import hamming_weights_numpy
from ldweaver_tpu.core.mi import mi_tile_numpy


def test_golden_hdw(toy_snp_data):
    w = hamming_weights_numpy(toy_snp_data.codes, 0.1)
    gold = np.load("tests/golden/toy_hdw.npy")
    assert np.array_equal(w, gold)


def test_golden_mi_samples(toy_snp_data):
    sd = toy_snp_data
    w = np.load("tests/golden/toy_hdw.npy")
    neff = float(w.sum())
    idx = np.arange(0, 200)
    codes = np.ascontiguousarray(sd.codes[:, idx].T)
    tile = mi_tile_numpy(
        codes, codes, w, sd.r[idx], sd.r[idx],
        sd.uqe[idx], sd.uqe[idx], neff,
    )
    gold = np.load("tests/golden/toy_mi_samples.npy")
    ii = gold[0].astype(int)
    jj = gold[1].astype(int)
    assert np.allclose(tile[ii, jj], gold[2], rtol=1e-13, atol=1e-15)
