"""MXU ceiling check v4 — reps INSIDE the jit (lax.fori_loop with a carried
scalar), ONE dispatch + ONE tiny pull per variant.  v3's Python-loop-of-
dispatches measured the relay's ~1.4 ms/dispatch enqueue floor, not device
time (K=1024 and K=3072 dots both "took" 1.5 ms).

Variants:
  dot3  bare bf16 [4096,3072]x[3072,4096]->f32, pre-materialized operands
  dot1  same at K=1024 (single-term FLOP floor)
  cons  u8->onehot operand construction + dot (production lhs/rhs build)
  epi   closure+epilogue+mask+topk from a precomputed counts tile (no dot)
  prod  full production per-tile work (cons + dot + epi)

Run ON TPU, detached:  nohup python scripts/ab_ceiling4.py > /tmp/ab_c4.log 2>&1 &
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

lhs3 = jnp.asarray(
    rng.standard_normal((B, T * S)).astype(np.float32)
).astype(jnp.bfloat16)
rhs3 = jnp.asarray(
    rng.standard_normal((B, T * S)).astype(np.float32)
).astype(jnp.bfloat16)

cf_d = jnp.asarray(codes[:, :B].T)
ct_d = jnp.asarray(codes[:, B:].T)
w32_d = jnp.asarray(w32)
wp_d = jnp.asarray(wparts)
rf_d = jnp.asarray(r[:B])
rt_d = jnp.asarray(r[B:])
pf_d = jnp.asarray(pos[:B])
pt_d = jnp.asarray(pos[B:])
cnts_d = jnp.asarray(rng.uniform(0, 50, (B, B)).astype(np.float32))


def timed(run, *args, reps=NT):
    """run is jitted with a static reps loop inside; returns scalar."""
    float(np.asarray(run(*args)))  # compile + absorb one-off
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


def dot_body(acc, lhs, rhs):
    d = jax.lax.dot(
        lhs + acc.astype(jnp.bfloat16), rhs.T,
        preferred_element_type=jnp.float32,
    )
    return d[0, 0] + d[B // 2, B // 2] + d[B - 1, B - 1]


def cons_body(acc, cf, ct, wp):
    onehot_f = cf == 0
    lhs_cat = jnp.concatenate(
        [jnp.where(onehot_f, (wp[t] + acc.astype(jnp.bfloat16))[None, :],
                   jnp.bfloat16(0)) for t in range(T)],
        axis=1,
    )
    rv = (ct == 0).astype(jnp.bfloat16)
    rhs_cat = jnp.concatenate([rv] * T, axis=1)
    d = jax.lax.dot(lhs_cat, rhs_cat.T, preferred_element_type=jnp.float32)
    return d[0, 0] + d[B // 2, B // 2] + d[B - 1, B - 1]


def epi_body(acc, cnts, pX0, pY0, rf, rt, pf, pt):
    # closure from a precomputed (0,0) counts tile + full 4-term epilogue
    den = neff + 0.5 * jnp.outer(rf, rt)
    rxy = 0.25 * jnp.outer(rf, rt)
    c00 = cnts + acc
    cnt = {
        (0, 0): c00,
        (0, 1): pX0[:, None] - c00,
        (1, 0): pY0[None, :] - c00,
    }
    cnt[(1, 1)] = (neff - pX0)[:, None] - cnt[(1, 0)]
    pX = [pX0, neff - pX0]
    pY = [pY0, neff - pY0]
    mi = jnp.zeros((B, B), jnp.float32)
    for x in range(2):
        pxr = pX[x] * (0.5 * rf)
        for y in range(2):
            pxy = cnt[(x, y)] + 0.5
            denom = (
                jnp.outer(pX[x], pY[y]) + rxy + pxr[:, None]
                + (pY[y] * (0.5 * rt))[None, :]
            )
            mi = mi + pxy / den * jnp.log(pxy / denom * den)
    diff = pt[None, :] - pf[:, None]
    d = diff + jnp.where(diff < 0, 2_200_000, 0)
    lens = 0.5 * 2_200_000 - jnp.abs(d.astype(jnp.float32) - 0.5 * 2_200_000)
    masked = jnp.where(lens > 20000, mi, -jnp.inf)
    v, ix = _tile_lr_topk(masked, B, B, 1024)
    return v[0]


def prod_body(acc, cf, ct, w32d, wp, rf, rt, pf, pt):
    mi = _rank_tile_mi(cf, ct, w32d + acc, wp, rf, rt, neff, 2, 2, T)
    diff = pt[None, :] - pf[:, None]
    d = diff + jnp.where(diff < 0, 2_200_000, 0)
    lens = 0.5 * 2_200_000 - jnp.abs(d.astype(jnp.float32) - 0.5 * 2_200_000)
    masked = jnp.where(lens > 20000, mi, -jnp.inf)
    v, ix = _tile_lr_topk(masked, B, B, 1024)
    return v[0]


flops3 = 2 * B * B * (T * S)
flops1 = 2 * B * B * S

px0 = jnp.asarray(((codes[:, :B].T == 0) * w32).sum(axis=1).astype(np.float32))
py0 = jnp.asarray(((codes[:, B:].T == 0) * w32).sum(axis=1).astype(np.float32))

dt, _ = timed(loop(dot_body), lhs3, rhs3)
print(f"dot3 K=3072 bf16 pre-mat:  {dt*1e3:6.3f} ms  {flops3/dt/1e12:5.1f} TFLOP/s", flush=True)
dt, _ = timed(loop(dot_body), lhs3[:, :S], rhs3[:, :S])
print(f"dot1 K=1024 bf16 pre-mat:  {dt*1e3:6.3f} ms  {flops1/dt/1e12:5.1f} TFLOP/s", flush=True)
dt, _ = timed(loop(cons_body), cf_d, ct_d, wp_d)
print(f"cons u8->onehot + dot:     {dt*1e3:6.3f} ms  {flops3/dt/1e12:5.1f} TFLOP/s-eq", flush=True)
dt, _ = timed(loop(epi_body), cnts_d, px0, py0, rf_d, rt_d, pf_d, pt_d)
print(f"epi  closure+logs+topk:    {dt*1e3:6.3f} ms", flush=True)
dt, _ = timed(loop(prod_body), cf_d, ct_d, w32_d, wp_d, rf_d, rt_d, pf_d, pt_d)
print(f"prod full per-tile work:   {dt*1e3:6.3f} ms", flush=True)
print("done", flush=True)
