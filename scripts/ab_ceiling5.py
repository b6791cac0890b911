"""Ceiling v5: where does the ~0.7 ms/iteration FIXED cost come from?

v4 found the marginal dot FLOP rate between K=1024 and K=3072 is ~187
TFLOP/s (~95% of v5e peak) but each fori_loop iteration carries ~0.7 ms
of fixed cost.  Suspects: per-kernel launch/drain inside the device
while-loop, the 64 MB f32 tile write, or the 50 MB lhs-perturbation add.

Variants (all one dispatch + one tiny pull):
  dotK6144   fori_loop dot at K=6144 (fixed-cost model check)
  dotbf16    fori_loop K=3072 dot with bf16 output (32 MB write not 64)
  dot_unroll 32 UNROLLED chained dots in one trace (no while-loop)
  prod1      production per-tile work, 1 tile per loop step (v4 repro)
  prod2      production work, TWO tiles per loop step (batched scan body)
             -> ms/TILE; if much less than prod1, the scan step carries
             large fixed overhead and the sweep should batch tiles

Run ON TPU, detached:  nohup python scripts/ab_ceiling5.py > /tmp/ab_c5.log 2>&1 &
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
codes = rng.integers(0, 2, (S, B * 3)).astype(np.uint8)
w64 = rng.uniform(0.05, 0.5, S)
w32, wparts = _wparts(w64)
r = np.full(B * 3, 2, np.float32)
pos = np.sort(
    rng.choice(np.arange(1, 2_200_001), B * 3, replace=False)
).astype(np.int32)
neff = np.float32(w32.sum())

lhs6 = jnp.asarray(
    rng.standard_normal((B, 6 * S)).astype(np.float32)
).astype(jnp.bfloat16)
rhs6 = jnp.asarray(
    rng.standard_normal((B, 6 * S)).astype(np.float32)
).astype(jnp.bfloat16)

cf_d = jnp.asarray(codes[:, :B].T)
ct_d = jnp.asarray(codes[:, B : 2 * B].T)
ct2_d = jnp.asarray(codes[:, 2 * B :].T)
w32_d = jnp.asarray(w32)
wp_d = jnp.asarray(wparts)
rf_d = jnp.asarray(r[:B])
rt_d = jnp.asarray(r[B : 2 * B])
rt2_d = jnp.asarray(r[2 * B :])
pf_d = jnp.asarray(pos[:B])
pt_d = jnp.asarray(pos[B : 2 * B])
pt2_d = jnp.asarray(pos[2 * B :])


def timed(run, *args, reps=NT):
    float(np.asarray(run(*args)))
    t0 = time.time()
    v = float(np.asarray(run(*args)))
    dt = (time.time() - t0) / reps
    return dt, v


def loop(body, reps=NT):
    @jax.jit
    def run(*args):
        def step(i, acc):
            return body(acc * jnp.float32(1e-9), *args)
        return jax.lax.fori_loop(0, reps, step, jnp.float32(0))
    return run


def dot_body(acc, lhs, rhs, out_dtype):
    d = jax.lax.dot(
        lhs + acc.astype(jnp.bfloat16), rhs.T,
        preferred_element_type=out_dtype,
    )
    return (d[0, 0] + d[B // 2, B // 2] + d[B - 1, B - 1]).astype(jnp.float32)


def tile_work(acc, cf, ct, w32d, wp, rf, rt, pf, pt):
    mi = _rank_tile_mi(cf, ct, w32d + acc, wp, rf, rt, neff, 2, 2, T,
                       pure=True)
    diff = pt[None, :] - pf[:, None]
    d = diff + jnp.where(diff < 0, 2_200_000, 0)
    lens = 0.5 * 2_200_000 - jnp.abs(d.astype(jnp.float32) - 0.5 * 2_200_000)
    masked = jnp.where(lens > 20000, mi, -jnp.inf)
    v, ix = _tile_lr_topk(masked, B, B, 1024)
    return v


flops3 = 2 * B * B * (3 * S)
flops6 = 2 * B * B * (6 * S)

dt, _ = timed(loop(lambda a, l, r_: dot_body(a, l, r_, jnp.float32)),
              lhs6[:, : 3 * S], rhs6[:, : 3 * S])
print(f"dotK3072 f32-out loop:   {dt*1e3:6.3f} ms  {flops3/dt/1e12:5.1f} TF/s",
      flush=True)
dt, _ = timed(loop(lambda a, l, r_: dot_body(a, l, r_, jnp.float32)),
              lhs6, rhs6)
print(f"dotK6144 f32-out loop:   {dt*1e3:6.3f} ms  {flops6/dt/1e12:5.1f} TF/s",
      flush=True)
dt, _ = timed(loop(lambda a, l, r_: dot_body(a, l, r_, jnp.bfloat16)),
              lhs6[:, : 3 * S], rhs6[:, : 3 * S])
print(f"dotK3072 bf16-out loop:  {dt*1e3:6.3f} ms  {flops3/dt/1e12:5.1f} TF/s",
      flush=True)


@jax.jit
def dot_unroll(lhs, rhs):
    acc = jnp.float32(0)
    for _ in range(NT):
        acc = dot_body(acc * jnp.float32(1e-9), lhs, rhs, jnp.float32)
    return acc


dt, _ = timed(dot_unroll, lhs6[:, : 3 * S], rhs6[:, : 3 * S])
print(f"dotK3072 f32-out UNROLL: {dt*1e3:6.3f} ms  {flops3/dt/1e12:5.1f} TF/s",
      flush=True)


def prod1_body(acc, cf, ct, w32d, wp, rf, rt, pf, pt):
    return tile_work(acc, cf, ct, w32d, wp, rf, rt, pf, pt)[0]


def prod2_body(acc, cf, ct, ct2, w32d, wp, rf, rt, rt2, pf, pt, pt2):
    v1 = tile_work(acc, cf, ct, w32d, wp, rf, rt, pf, pt)
    v2 = tile_work(acc, cf, ct2, w32d, wp, rf, rt2, pf, pt2)
    return v1[0] + v2[0]


dt, _ = timed(loop(prod1_body), cf_d, ct_d, w32_d, wp_d, rf_d, rt_d,
              pf_d, pt_d)
print(f"prod 1 tile/step:        {dt*1e3:6.3f} ms/tile", flush=True)
dt, _ = timed(loop(prod2_body, reps=NT // 2), cf_d, ct_d, ct2_d, w32_d, wp_d,
              rf_d, rt_d, rt2_d, pf_d, pt_d, pt2_d, reps=NT)
print(f"prod 2 tiles/step:       {dt*1e3:6.3f} ms/tile", flush=True)
print("done", flush=True)
