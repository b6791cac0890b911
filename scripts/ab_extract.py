"""Extraction-tile cost breakdown — reps INSIDE the jit (ab_ceiling4
methodology: lax.fori_loop + carried scalar, ONE dispatch + ONE tiny pull
per variant).

Motivation (r5): the production SPMD pipeline leg is DEVICE-COMPUTE
bound in the extraction scan, not relay-bound: the per-pull histogram
shows one pull blocking 232 s behind 21 segments of queued scan compute
(528 tiles -> ~0.42 s/tile) while the plain LR sweep does 1.65 ms/tile.
This script finds which piece of `_extract_body` costs that: the MI
tile, the SR `jnp.nonzero` compaction (TPU nonzero lowers to a GLOBAL
16.7M-element sort), or the LR per-row `lax.top_k`.

Run ON TPU, detached:  nohup python scripts/ab_extract.py > /tmp/ab_ex.log 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ldweaver_tpu.parallel.fast_sweep import _rank_tile_mi, _wparts  # noqa: E402
from ldweaver_tpu.parallel.spmd_sweep import extract_dims  # noqa: E402

B, S = 4096, 616
NT = 8
G = 2_200_000
SR_DIST = 20000
# bench-shape retention: keep 1e6 of 8.59e9 pairs
PROB = 1.0 - 1e6 / 8_589_869_056.0
K, K_ROW = extract_dims(B, PROB)
P_SR = 1 << 17  # bench ladder cap class for dense tiles
print(f"B={B} S={S} K={K} k_row={K_ROW} P_sr={P_SR}", flush=True)

rng = np.random.default_rng(0)
codes = rng.integers(0, 2, (S, 2 * B)).astype(np.uint8)
w64 = rng.uniform(0.05, 0.5, S)
w32, wparts = _wparts(w64)
pos = np.sort(
    rng.choice(np.arange(1, G + 1), 2 * B, replace=False)
).astype(np.int32)

cf_d = jnp.asarray(codes[:, :B].T)
ct_d = jnp.asarray(codes[:, B:].T)
w32_d = jnp.asarray(w32)
wp_d = jnp.asarray(wparts)
rf_d = jnp.asarray(np.full(B, 2, np.float32))
rt_d = jnp.asarray(np.full(B, 2, np.float32))
pf_d = jnp.asarray(pos[:B])
pt_d = jnp.asarray(pos[B:])
neff = np.float32(w64.sum())


def mi_and_masks(acc):
    mi = _rank_tile_mi(
        cf_d, ct_d, w32_d, wp_d, rf_d, rt_d,
        jnp.float32(neff) + acc, 2, 2, 3, pure=True,
    )
    diff = pt_d[None, :] - pf_d[:, None]
    d = diff + jnp.where(diff < 0, G, 0)
    lens = 0.5 * G - jnp.abs(d.astype(jnp.float32) - 0.5 * G)
    sr_ok = lens <= SR_DIST
    lr_ok = lens > SR_DIST
    return mi, sr_ok, lr_ok


def v_mi(acc):
    mi, _, _ = mi_and_masks(acc)
    return mi[0, 0] + mi[B - 1, B - 1]


def v_sr_nonzero(acc):
    mi, sr_ok, _ = mi_and_masks(acc)
    (sr_idx,) = jnp.nonzero(sr_ok.ravel(), size=P_SR, fill_value=0)
    sr_vals = mi.ravel()[sr_idx.astype(jnp.int32)]
    return sr_vals[0] + sr_vals[P_SR - 1]


def v_sr_scatter(acc):
    """Row-major compaction via cumsum + scatter (no global sort)."""
    mi, sr_ok, _ = mi_and_masks(acc)
    flat = sr_ok.ravel()
    posn = jnp.cumsum(flat.astype(jnp.int32)) - 1
    idxs = jnp.where(flat, posn, P_SR)  # overflow slot, dropped
    iota = jnp.arange(B * B, dtype=jnp.int32)
    out = jnp.zeros(P_SR, jnp.int32).at[idxs].set(
        iota, mode="drop", unique_indices=False
    )
    sr_vals = mi.ravel()[out]
    return sr_vals[0] + sr_vals[P_SR - 1]


def v_lr_topk(acc):
    mi, _, lr_ok = mi_and_masks(acc)
    neg = jnp.where(lr_ok, mi, -jnp.inf)
    row_vals, row_idx = jax.lax.top_k(neg, K_ROW)
    n_out = min(K, B * K_ROW)
    rv = row_vals.ravel()
    sk, si = jax.lax.sort_key_val(
        -rv, jnp.arange(rv.size, dtype=jnp.int32), is_stable=True
    )
    vals = -sk[:n_out]
    return vals[0] + vals[n_out - 1] + row_idx.astype(jnp.float32)[0, 0]


def v_lr_rowsort(acc):
    """Per-row two-key sort replacement for top_k: (-val, col) stable
    reproduces top_k's lowest-index-first tie order exactly."""
    mi, _, lr_ok = mi_and_masks(acc)
    neg = jnp.where(lr_ok, mi, -jnp.inf)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    sv, sc = jax.lax.sort((-neg, cols), dimension=1, num_keys=1,
                          is_stable=True)
    row_vals = -sv[:, :K_ROW]
    row_idx = sc[:, :K_ROW]
    n_out = min(K, B * K_ROW)
    rv = row_vals.ravel()
    sk, si = jax.lax.sort_key_val(
        -rv, jnp.arange(rv.size, dtype=jnp.int32), is_stable=True
    )
    vals = -sk[:n_out]
    return vals[0] + vals[n_out - 1] + row_idx.astype(jnp.float32)[0, 0]


def v_cert(acc):
    mi, _, lr_ok = mi_and_masks(acc)
    neg = jnp.where(lr_ok, mi, -jnp.inf)
    n_lr = lr_ok.sum().astype(jnp.int32)
    tot_max = lr_ok.sum(axis=1).max()
    return (n_lr + tot_max).astype(jnp.float32) + neg[0, 0]


def v_full(acc):
    from ldweaver_tpu.parallel.spmd_sweep import _extract_body

    outs = _extract_body(
        cf_d, ct_d, rf_d, rt_d, pf_d, pt_d,
        jnp.ones(B, bool), jnp.ones(B, bool),
        jnp.asarray([0, 1], np.int32), jnp.asarray(True),
        w32_d, wp_d, jnp.float32(neff) + acc, jnp.float32(PROB),
        block=B, sr_dist=SR_DIST, g=G, K=K, k_row=K_ROW, P_sr=P_SR,
        Rf=2, Rt=2, terms=3, pure=True,
    )
    n_lr, exact, tot_max, vals, idx, n_sr, sr_idx, sr_vals = outs
    return (
        vals[0] + sr_vals[0] + n_lr.astype(jnp.float32)
        + n_sr.astype(jnp.float32)
    )


def loop(body):
    @jax.jit
    def run():
        def step(i, acc):
            return body(acc * jnp.float32(1e-9))
        return jax.lax.fori_loop(0, NT, step, jnp.float32(0))
    return run


for name, body in [
    ("mi_only", v_mi),
    ("sr_nonzero", v_sr_nonzero),
    ("sr_scatter", v_sr_scatter),
    ("lr_topk", v_lr_topk),
    ("lr_rowsort", v_lr_rowsort),
    ("cert", v_cert),
    ("full", v_full),
]:
    run = loop(body)
    float(np.asarray(run()))  # compile
    t0 = time.time()
    v = float(np.asarray(run()))
    dt = (time.time() - t0) / NT * 1000
    print(f"{name:12s} {dt:8.2f} ms/tile  (v={v:.3f})", flush=True)
