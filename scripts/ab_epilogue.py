"""A/B: pure-r specialized MI epilogue vs the general one.

For an r-PURE block pair (every valid site has r == block rmax; pads are
masked downstream), the denominator factorizes:

    denom_xy = (pX[x] + 0.5*Rt) * (pY[y] + 0.5*Rf)

and the marginal-closure telescoping  sum_y pxy = pX[x] + 0.5*Rt  makes
the log-decomposed MI collapse to

    MI * den = sum_xy pxy*log(pxy)                      # ONLY matrix logs
             - sum_x Lx[x]*(pX[x] + 0.5*Rt)             # row vector
             - sum_y Ly[y]*(pY[y] + 0.5*Rf)             # col vector
             + den*log(den)                             # scalar
    with Lx[x] = log(pX[x] + 0.5*Rt), Ly[y] = log(pY[y] + 0.5*Rf),
    den = neff + 0.5*Rf*Rt.

Per matrix cell: 1 log + ~4 mul/add, vs the general path's 1 log + 1 div
+ denominator build.  This harness measures both with the full per-tile
production work (mask + two-stage top-k) and reports the max |MI diff|
over the tile.

Run ON TPU, detached:  nohup python scripts/ab_epilogue.py > /tmp/ab_epi.log 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ldweaver_tpu.parallel.fast_sweep import _rank_tile_mi, _tile_lr_topk, _wparts  # noqa: E402

B, S, T = 4096, 1024, 3
NT = 32
rng = np.random.default_rng(0)
codes = rng.integers(0, 2, (S, B * 2)).astype(np.uint8)
w64 = rng.uniform(0.05, 0.5, S)
w32, wparts = _wparts(w64)
r = np.full(B * 2, 2, np.float32)
pos = np.sort(
    rng.choice(np.arange(1, 2_200_001), B * 2, replace=False)
).astype(np.int32)
neff = np.float32(w32.sum())

cf_d = jnp.asarray(codes[:, :B].T)
ct_d = jnp.asarray(codes[:, B:].T)
w32_d = jnp.asarray(w32)
wp_d = jnp.asarray(wparts)
rf_d = jnp.asarray(r[:B])
rt_d = jnp.asarray(r[B:])
pf_d = jnp.asarray(pos[:B])
pt_d = jnp.asarray(pos[B:])


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


def _counts_and_marginals(cf, ct, w32d, wp, Rf, Rt):
    f32 = jnp.float32
    pX = [((cf == x).astype(f32) * w32d).sum(axis=1) for x in range(Rf)]
    pY = [((ct == y).astype(f32) * w32d).sum(axis=1) for y in range(Rt)]
    onehot_f = cf == 0
    lhs_cat = jnp.concatenate(
        [jnp.where(onehot_f, wp[t][None, :], jnp.bfloat16(0)) for t in range(T)],
        axis=1,
    )
    rv = (ct == 0).astype(jnp.bfloat16)
    rhs_cat = jnp.concatenate([rv] * T, axis=1)
    c00 = jax.lax.dot(lhs_cat, rhs_cat.T, preferred_element_type=f32)
    return c00, pX, pY


def mi_pure22(cf, ct, w32d, wp, neff_):
    """Specialized pure-biallelic MI tile."""
    f32 = jnp.float32
    c00, pX, pY = _counts_and_marginals(cf, ct, w32d, wp, 2, 2)
    den = neff_ + f32(2.0)
    invden = 1.0 / den
    logden = jnp.log(den)
    # pxy cells via closure
    p00 = c00 + 0.5
    p01 = (pX[0][:, None] - c00) + 0.5
    p10 = (pY[0][None, :] - c00) + 0.5
    p11 = (pX[1][:, None] - (pY[0][None, :] - c00)) + 0.5
    ent = (p00 * jnp.log(p00) + p01 * jnp.log(p01)
           + p10 * jnp.log(p10) + p11 * jnp.log(p11))
    lx = (jnp.log(pX[0] + 1.0) * (pX[0] + 1.0)
          + jnp.log(pX[1] + 1.0) * (pX[1] + 1.0))
    ly = (jnp.log(pY[0] + 1.0) * (pY[0] + 1.0)
          + jnp.log(pY[1] + 1.0) * (pY[1] + 1.0))
    return (ent - lx[:, None] - ly[None, :] + den * logden) * invden


def prod_gen_body(acc, cf, ct, w32d, wp, rf, rt, pf, pt):
    mi = _rank_tile_mi(cf, ct, w32d + acc, wp, rf, rt, neff, 2, 2, T)
    diff = pt[None, :] - pf[:, None]
    d = diff + jnp.where(diff < 0, 2_200_000, 0)
    lens = 0.5 * 2_200_000 - jnp.abs(d.astype(jnp.float32) - 0.5 * 2_200_000)
    masked = jnp.where(lens > 20000, mi, -jnp.inf)
    v, ix = _tile_lr_topk(masked, B, B, 1024)
    return v[0]


def prod_pure_body(acc, cf, ct, w32d, wp, pf, pt):
    mi = mi_pure22(cf, ct, w32d + acc, wp, jnp.float32(neff))
    diff = pt[None, :] - pf[:, None]
    d = diff + jnp.where(diff < 0, 2_200_000, 0)
    lens = 0.5 * 2_200_000 - jnp.abs(d.astype(jnp.float32) - 0.5 * 2_200_000)
    masked = jnp.where(lens > 20000, mi, -jnp.inf)
    v, ix = _tile_lr_topk(masked, B, B, 1024)
    return v[0]


@jax.jit
def agreement(cf, ct, w32d, wp, rf, rt):
    a = _rank_tile_mi(cf, ct, w32d, wp, rf, rt, neff, 2, 2, T)
    b = mi_pure22(cf, ct, w32d, wp, jnp.float32(neff))
    return jnp.abs(a - b).max(), jnp.abs(a).max()


d, m = agreement(cf_d, ct_d, w32_d, wp_d, rf_d, rt_d)
print(f"max|general-pure| = {float(d):.3e}   max|MI| = {float(m):.4f}",
      flush=True)

dt, _ = timed(loop(prod_gen_body), cf_d, ct_d, w32_d, wp_d, rf_d, rt_d,
              pf_d, pt_d)
print(f"prod general epilogue:  {dt*1e3:6.3f} ms", flush=True)
dt, _ = timed(loop(prod_pure_body), cf_d, ct_d, w32_d, wp_d, pf_d, pt_d)
print(f"prod pure-r epilogue:   {dt*1e3:6.3f} ms", flush=True)
print("done", flush=True)
