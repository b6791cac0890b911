"""A/B on the real TPU: fully-fused Pallas stage-1 tile vs the XLA scan
body (pure epilogue + mask + chunked max) at production shape B=4096,
S=1024.  Both variants include stage-2 (flat top-k over candidates) so
the numbers are per-tile production work.  In-jit rep loops.

Run detached:  nohup python scripts/ab_fused_tile.py > /tmp/ab_fused.log 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ldweaver_tpu.ops.pallas_fused_tile import fused_tile_stage1  # noqa: E402
from ldweaver_tpu.parallel.fast_sweep import (  # noqa: E402
    _rank_tile_mi, _tile_lr_topk, _wparts,
)

B, S, NT = 4096, 1024, 32
G, SR = 2_200_000, 20000
rng = np.random.default_rng(0)
codes_f = rng.integers(0, 2, (B, S)).astype(np.uint8)
codes_t = rng.integers(0, 2, (B, S)).astype(np.uint8)
w = rng.uniform(0.05, 0.5, S)
w32, wparts = _wparts(w)
neff = np.float32(w32.sum())
pos = np.sort(rng.choice(np.arange(1, G + 1), 2 * B, replace=False)).astype(np.int32)
pos_f, pos_t = pos[:B], pos[B:]
r2 = np.full(B, 2, np.float32)
val = np.ones(B, bool)
px = np.stack([((codes_f == x) * w32).sum(1).astype(np.float32) for x in range(2)])
py = np.stack([((codes_t == y) * w32).sum(1).astype(np.float32) for y in range(2)])

cf_d = jnp.asarray(codes_f)
ct_d = jnp.asarray(codes_t)
cfT_d = jnp.asarray(codes_f.T)
ctT_d = jnp.asarray(codes_t.T)
wpT_d = jnp.asarray(np.ascontiguousarray(wparts.T))
w32_d = jnp.asarray(w32)
wp_d = jnp.asarray(wparts)
px_d = jnp.asarray(px)
py_d = jnp.asarray(py)
pf_d = jnp.asarray(pos_f)
pt_d = jnp.asarray(pos_t)
vf_d = jnp.asarray(val)
rf_d = jnp.asarray(r2)
neff_d = jnp.asarray(neff)


def timed(run, *args, reps=NT):
    float(np.asarray(run(*args)))
    t0 = time.time()
    v = float(np.asarray(run(*args)))
    dt = (time.time() - t0) / reps
    return dt, v


def loop(body):
    @jax.jit
    def run(*args):
        def step(i, acc):
            return body(acc * jnp.float32(1e-9), *args)
        return jax.lax.fori_loop(0, NT, step, jnp.float32(0))
    return run


def xla_body(acc, cf, ct, w32d, wp, rf, pf, pt):
    mi = _rank_tile_mi(cf, ct, w32d + acc, wp, rf, rf, neff, 2, 2, 3,
                       pure=True)
    diff = pt[None, :] - pf[:, None]
    d = diff + jnp.where(diff < 0, G, 0)
    lens = 0.5 * G - jnp.abs(d.astype(jnp.float32) - 0.5 * G)
    masked = jnp.where(lens > SR, mi, -jnp.inf)
    v, ix = _tile_lr_topk(masked, B, B, 1024)
    return v[0]


def fused_body(acc, cfT, ctT, wpT, pxd, pyd, pf, pt, vf):
    cv, cc = fused_tile_stage1(
        cfT, ctT, wpT, pxd, pyd, pf, pt, vf, vf,
        neff_d + acc, 0, g=G, sr_dist=SR, interpret=False,
    )
    rows = jax.lax.broadcasted_iota(jnp.int32, cv.shape, 0)
    flat = rows * B + cc
    v, sel = jax.lax.top_k(cv.ravel(), 1024)
    _ = flat.ravel()[sel]
    return v[0]


# agreement check first (single dispatch each)
@jax.jit
def xla_once(cf, ct, w32d, wp, rf, pf, pt):
    mi = _rank_tile_mi(cf, ct, w32d, wp, rf, rf, neff, 2, 2, 3, pure=True)
    diff = pt[None, :] - pf[:, None]
    d = diff + jnp.where(diff < 0, G, 0)
    lens = 0.5 * G - jnp.abs(d.astype(jnp.float32) - 0.5 * G)
    masked = jnp.where(lens > SR, mi, -jnp.inf)
    return _tile_lr_topk(masked, B, B, 1024)


@jax.jit
def fused_once(cfT, ctT, wpT, pxd, pyd, pf, pt, vf):
    cv, cc = fused_tile_stage1(
        cfT, ctT, wpT, pxd, pyd, pf, pt, vf, vf,
        neff_d, 0, g=G, sr_dist=SR, interpret=False,
    )
    rows = jax.lax.broadcasted_iota(jnp.int32, cv.shape, 0)
    flat = rows * B + cc
    v, sel = jax.lax.top_k(cv.ravel(), 1024)
    return v, flat.ravel()[sel]

xv, xi = xla_once(cf_d, ct_d, w32_d, wp_d, rf_d, pf_d, pt_d)
pv, pi = fused_once(cfT_d, ctT_d, wpT_d, px_d, py_d, pf_d, pt_d, vf_d)
xv, xi, pv, pi = (np.asarray(a) for a in (xv, xi, pv, pi))
same_idx = np.intersect1d(xi, pi).size
print(f"top-1024 agreement: idx overlap {same_idx}/1024, "
      f"max|dv| {np.abs(np.sort(xv)[::-1] - np.sort(pv)[::-1]).max():.2e}",
      flush=True)

dt, _ = timed(loop(xla_body), cf_d, ct_d, w32_d, wp_d, rf_d, pf_d, pt_d)
print(f"XLA  prod body:  {dt*1e3:6.3f} ms/tile", flush=True)
dt, _ = timed(loop(fused_body), cfT_d, ctT_d, wpT_d, px_d, py_d, pf_d,
              pt_d, vf_d)
print(f"Pallas fused:    {dt*1e3:6.3f} ms/tile", flush=True)
print("done", flush=True)
