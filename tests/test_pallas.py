"""Pallas fused MI kernel vs the NumPy f64 oracle (interpret mode on CPU;
the same kernel compiles for TPU)."""

import numpy as np
import pytest

from ldweaver_tpu.core.mi import mi_tile_numpy, rxy_term
from ldweaver_tpu.ops.pallas_mi import mi_tile_pallas


def _case(rng, F, T, S):
    codes_f = rng.integers(0, 5, (F, S)).astype(np.uint8)
    codes_t = rng.integers(0, 5, (T, S)).astype(np.uint8)
    w = rng.uniform(0.1, 1.0, S)
    uq_f = np.stack([(codes_f == a).any(1) for a in range(5)], 1).astype(np.uint8)
    uq_t = np.stack([(codes_t == a).any(1) for a in range(5)], 1).astype(np.uint8)
    r_f = uq_f.sum(1).astype(np.int64)
    r_t = uq_t.sum(1).astype(np.int64)
    return codes_f, codes_t, w, r_f, r_t, uq_f, uq_t, float(w.sum())


def test_pallas_matches_oracle_small():
    rng = np.random.default_rng(3)
    args = _case(rng, 24, 16, 120)
    oracle = mi_tile_numpy(*args)
    pal = mi_tile_pallas(*args, tile_f=128, tile_t=128, chunk_s=128)
    assert np.allclose(pal, oracle, rtol=5e-5, atol=5e-6)


def test_pallas_multi_tile_grid():
    """Exercises >1 tile in every grid dimension (incl. the S-reduction
    accumulator reset/epilogue logic)."""
    rng = np.random.default_rng(9)
    args = _case(rng, 150, 140, 300)
    oracle = mi_tile_numpy(*args)
    pal = mi_tile_pallas(*args, tile_f=128, tile_t=128, chunk_s=128)
    assert np.allclose(pal, oracle, rtol=5e-5, atol=5e-6)


def test_pallas_ragged_rxy_compat():
    """Ragged F != T uses the Fortran-aliased RXY (reference quirk)."""
    rng = np.random.default_rng(12)
    args = _case(rng, 60, 33, 64)
    oracle = mi_tile_numpy(*args, rxy_compat=True)
    pal = mi_tile_pallas(*args, rxy_compat=True,
                         tile_f=128, tile_t=128, chunk_s=128)
    assert np.allclose(pal, oracle, rtol=5e-5, atol=5e-6)


@pytest.mark.parametrize("rmax_f,rmax_t", [(2, 2), (3, 2), (3, 3), (2, 4)])
def test_pallas_rank_kernel_matches_oracle(rmax_f, rmax_t):
    from ldweaver_tpu.ops.pallas_rank_mi import mi_tile_rank_pallas

    rng = np.random.default_rng(rmax_f * 7 + rmax_t)
    F, T, S = 150, 140, 300
    w = rng.uniform(0.1, 1.0, S)

    def make(B, rmax):
        codes = np.zeros((B, S), np.uint8)
        r = np.zeros(B, np.int64)
        for i in range(B):
            ri = int(rng.integers(2, rmax + 1))
            r[i] = ri
            codes[i] = rng.integers(0, ri, S)
            codes[i, :ri] = np.arange(ri)
        return codes, r

    codes_f, r_f = make(F, rmax_f)
    codes_t, r_t = make(T, rmax_t)
    uq_f = (np.arange(5)[None, :] < r_f[:, None]).astype(np.uint8)
    uq_t = (np.arange(5)[None, :] < r_t[:, None]).astype(np.uint8)
    neff = float(w.sum())
    oracle = mi_tile_numpy(
        codes_f, codes_t, w, r_f, r_t, uq_f, uq_t, neff, rxy_compat=False
    )
    pal = mi_tile_rank_pallas(
        codes_f, codes_t, w, r_f, r_t, neff,
        tile_f=128, tile_t=128, chunk_s=128,
    )
    assert np.allclose(pal, oracle, rtol=2e-4, atol=2e-5), (
        np.abs(pal - oracle).max()
    )
