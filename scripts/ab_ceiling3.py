"""MXU ceiling check v3 — clean breakdown of the per-tile cost.

Variants (each 32 chained on-device reps, ONE tiny pull at the end):
  warm    throwaway dot to absorb the ~450 ms one-off relay/dispatch cost
          that inflated the FIRST variant of every earlier harness run
  dot     bare bf16 [4096,3072]x[3072,4096] -> f32 from PRE-MATERIALIZED
          bf16 operands (the pure MXU ceiling at the contingency shape)
  dot1    same but K=1024 (single weight term: the FLOP floor if the
          3-term bf16 split were dropped)
  cons    operand construction from u8 codes (one-hot + where + concat,
          exactly as _rank_tile_mi builds lhs_cat/rhs_cat) + the dot
  tile    full _rank_tile_mi(2,2) (dot + marginals + closure + epilogue)
  prod    tile + LR mask + two-stage top-k (per-tile production work)

Run ON TPU, detached:  nohup python scripts/ab_ceiling3.py > /tmp/ab_c3.log 2>&1 &
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


def timed(fn, *args, reps=NT):
    _ = float(np.asarray(fn(jnp.float32(0), *args)))  # compile + sync
    t0 = time.time()
    acc = jnp.float32(0)
    for _i in range(reps):
        acc = fn(acc * jnp.float32(1e-9), *args)  # serialise via carry
    v = float(np.asarray(acc))
    dt = (time.time() - t0) / reps
    return dt, v


# pre-materialized bf16 operands at the contingency shape
lhs3 = jnp.asarray(
    rng.standard_normal((B, T * S)).astype(np.float32)
).astype(jnp.bfloat16)
rhs3 = jnp.asarray(
    rng.standard_normal((B, T * S)).astype(np.float32)
).astype(jnp.bfloat16)
lhs1 = lhs3[:, :S]
rhs1 = rhs3[:, :S]


@jax.jit
def bare_dot(acc, lhs, rhs):
    d = jax.lax.dot(
        lhs + acc.astype(jnp.bfloat16), rhs.T,
        preferred_element_type=jnp.float32,
    )
    return d.sum()


@jax.jit
def cons_dot(acc, cf, ct, wp):
    onehot_f = cf == 0
    lhs_cat = jnp.concatenate(
        [jnp.where(onehot_f, wp[t][None, :], jnp.bfloat16(0)) for t in range(T)],
        axis=1,
    )
    rv = (ct == 0).astype(jnp.bfloat16)
    rhs_cat = jnp.concatenate([rv] * T, axis=1)
    d = jax.lax.dot(lhs_cat, rhs_cat.T, preferred_element_type=jnp.float32)
    return d.sum() + acc


@jax.jit
def tile(acc, cf, ct, w32d, wp, rf, rt):
    return _rank_tile_mi(cf, ct, w32d + acc, wp, rf, rt, neff, 2, 2, T).sum()


@jax.jit
def prod(acc, cf, ct, w32d, wp, rf, rt, pf, pt):
    mi = _rank_tile_mi(cf, ct, w32d + acc, wp, rf, rt, neff, 2, 2, T)
    diff = pt[None, :] - pf[:, None]
    d = diff + jnp.where(diff < 0, 2_200_000, 0)
    lens = 0.5 * 2_200_000 - jnp.abs(d.astype(jnp.float32) - 0.5 * 2_200_000)
    masked = jnp.where(lens > 20000, mi, -jnp.inf)
    v, ix = _tile_lr_topk(masked, B, B, 1024)
    return v.sum()


flops3 = 2 * B * B * (T * S)
flops1 = 2 * B * B * S
args2 = (
    jnp.asarray(codes[:, :B].T), jnp.asarray(codes[:, B:].T),
    jnp.asarray(w32), jnp.asarray(wparts),
    jnp.asarray(r[:B]), jnp.asarray(r[B:]),
)
wp_dev = jnp.asarray(wparts)

# warm throwaway (absorbs the one-off)
timed(bare_dot, lhs1, rhs1, reps=8)
print("warm done", flush=True)

dt, _ = timed(bare_dot, lhs3, rhs3)
print(f"dot  K=3072 bf16 pre-mat:  {dt*1e3:6.2f} ms  {flops3/dt/1e12:5.1f} TFLOP/s", flush=True)
dt, _ = timed(bare_dot, lhs1, rhs1)
print(f"dot1 K=1024 bf16 pre-mat:  {dt*1e3:6.2f} ms  {flops1/dt/1e12:5.1f} TFLOP/s", flush=True)
dt, _ = timed(cons_dot, args2[0], args2[1], wp_dev)
print(f"cons u8->onehot + dot:     {dt*1e3:6.2f} ms  {flops3/dt/1e12:5.1f} TFLOP/s-eq", flush=True)
dt, _ = timed(tile, *args2)
print(f"tile full rank tile:       {dt*1e3:6.2f} ms  {flops3/dt/1e12:5.1f} TFLOP/s-eq", flush=True)
dt, _ = timed(prod, *args2, jnp.asarray(pos[:B]), jnp.asarray(pos[B:]))
print(f"prod tile+mask+topk:       {dt*1e3:6.2f} ms", flush=True)
print("done", flush=True)
