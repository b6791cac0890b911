"""Fused Pallas sweep tile (ops/pallas_fused_tile.py) vs the XLA scan-body
computation it replaces: pure-biallelic MI epilogue + LR mask + stage-1
chunked max/argmax."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ldweaver_tpu.ops.pallas_fused_tile import fused_tile_stage1
from ldweaver_tpu.parallel.fast_sweep import _rank_tile_mi, _wparts

G = 2_200_000
SR = 20000


def _xla_stage1(codes_f, codes_t, w32, wparts, r_f, r_t, neff,
                pos_f, pos_t, val_f, val_t, same_block, C=128):
    B_f, B_t = codes_f.shape[0], codes_t.shape[0]
    mi = _rank_tile_mi(codes_f, codes_t, w32, wparts, r_f, r_t, neff,
                       2, 2, 3, pure=True)
    ii = jax.lax.broadcasted_iota(jnp.int32, (B_f, B_t), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (B_f, B_t), 1)
    tri = jnp.where(same_block, ii > jj, True)
    ok = tri & val_f[:, None] & val_t[None, :]
    diff = pos_t[None, :] - pos_f[:, None]
    d = diff + jnp.where(diff < 0, G, 0)
    lens = 0.5 * G - jnp.abs(d.astype(jnp.float32) - 0.5 * G)
    lr_ok = ok & (lens > SR)
    masked = jnp.where(lr_ok, mi, -jnp.inf)
    resh = masked.reshape(B_f, B_t // C, C)
    c_vals = resh.max(axis=-1)
    c_idx = resh.argmax(axis=-1).astype(jnp.int32)
    cols = (
        jax.lax.broadcasted_iota(jnp.int32, (B_f, B_t // C), 1) * C + c_idx
    )
    return np.asarray(c_vals), np.asarray(cols), np.asarray(mi)


@pytest.mark.parametrize("same", [False, True])
def test_fused_tile_vs_xla(same):
    rng = np.random.default_rng(17 + same)
    B, S = 1024, 512
    codes_f = rng.integers(0, 2, (B, S)).astype(np.uint8)
    codes_t = (codes_f if same
               else rng.integers(0, 2, (B, S)).astype(np.uint8))
    # a few invalid (pad) sites on each side
    val_f = np.ones(B, bool)
    val_t = np.ones(B, bool)
    val_f[-7:] = False
    val_t[-3:] = False
    w = rng.uniform(0.05, 0.5, S)
    w32, wparts = _wparts(w)
    neff = np.float32(w32.sum())
    pos_f = np.sort(
        rng.choice(np.arange(1, G + 1), B, replace=False)
    ).astype(np.int32)
    pos_t = pos_f if same else np.sort(
        rng.choice(np.arange(1, G + 1), B, replace=False)
    ).astype(np.int32)
    r2 = np.full(B, 2, np.float32)

    px = np.stack([((codes_f == x) * w32).sum(1).astype(np.float32)
                   for x in range(2)])
    py = np.stack([((codes_t == y) * w32).sum(1).astype(np.float32)
                   for y in range(2)])

    xv, xc, mi = _xla_stage1(
        jnp.asarray(codes_f), jnp.asarray(codes_t), jnp.asarray(w32),
        jnp.asarray(wparts), jnp.asarray(r2), jnp.asarray(r2),
        jnp.asarray(neff),
        jnp.asarray(pos_f), jnp.asarray(pos_t),
        jnp.asarray(val_f), jnp.asarray(val_t), same,
    )
    pv, pc = fused_tile_stage1(
        jnp.asarray(codes_f.T), jnp.asarray(codes_t.T),
        jnp.asarray(np.ascontiguousarray(wparts.T)),
        jnp.asarray(px), jnp.asarray(py),
        jnp.asarray(pos_f), jnp.asarray(pos_t),
        jnp.asarray(val_f), jnp.asarray(val_t),
        jnp.asarray(neff), int(same),
        g=G, sr_dist=SR, tile_f=256, chunk_s=512, section=512,
        interpret=jax.devices()[0].platform != "tpu",
    )
    pv = np.asarray(pv)
    pc = np.asarray(pc)
    # candidate values: engine-level agreement (different K-chunking of
    # the contingency dot -> ulp differences)
    both = np.isfinite(xv) & np.isfinite(pv)
    assert (np.isfinite(xv) == np.isfinite(pv)).all()
    assert np.allclose(pv[both], xv[both], rtol=1e-4, atol=1e-5)
    # selected columns: identical except genuine near-ties; verify every
    # divergent pick is a near-tie in the XLA tile's values
    mism = both & (pc != xc)
    if mism.any():
        rows = np.nonzero(mism)[0]
        a = mi[rows, xc[mism]]
        b = mi[rows, pc[mism]]
        assert np.allclose(a, b, rtol=1e-4, atol=1e-5)
    # masked-out (all -inf) chunks agree
    assert ((~both) == (np.isneginf(xv) & np.isneginf(pv))).all()
