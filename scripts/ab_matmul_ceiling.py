"""MXU ceiling check: time a bare bf16 dot of the exact contingency-matmul
shape used by the biallelic tile ([B, T*S] @ [T*S, B] -> f32), vs the full
_rank_tile_mi(Rf=2, Rt=2) tile, vs tile+mask+two-stage top-k.

Separates "the dot itself" from "everything XLA fuses around it" so we
know whether more kernel work (Pallas) can still pay.

Run ON TPU:  python scripts/ab_matmul_ceiling.py
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
pos = np.sort(rng.choice(np.arange(1, 2_200_001), B * 2, replace=False)).astype(np.int32)
neff = np.float32(w32.sum())

lhs_host = rng.standard_normal((B, T * S)).astype(np.float32)
rhs_host = rng.standard_normal((B, T * S)).astype(np.float32)


def timed(fn, *args, reps=NT):
    """Scalar on-device reduction per rep; ONE tiny host pull at the end
    (a full-tile pull through the relay costs seconds and would swamp the
    measurement - CLAUDE.md)."""
    _ = float(np.asarray(fn(jnp.float32(0), *args)))  # compile
    t0 = time.time()
    acc = jnp.float32(0)
    for i in range(reps):
        acc = fn(acc * jnp.float32(1e-9), *args)  # serialise via carry
    v = float(np.asarray(acc))
    dt = (time.time() - t0) / reps
    return dt, v


# 1) bare dot at the contingency shape
@jax.jit
def bare_dot(acc, lhs, rhs):
    d = jax.lax.dot(
        (lhs + acc).astype(jnp.bfloat16), rhs.astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    )
    return d.sum()


# 2) full rank tile (1 contingency dot + marginals + closure + epilogue)
@jax.jit
def tile(acc, cf, ct, w32d, wp, rf, rt):
    return _rank_tile_mi(cf, ct, w32d + acc, wp, rf, rt, neff, 2, 2, T).sum()


# 3) tile + mask + two-stage top-k (the per-tile production work)
@jax.jit
def tile_topk(acc, cf, ct, w32d, wp, rf, rt, pf, pt):
    mi = _rank_tile_mi(cf, ct, w32d + acc, wp, rf, rt, neff, 2, 2, T)
    diff = pt[None, :] - pf[:, None]
    d = diff + jnp.where(diff < 0, 2_200_000, 0)
    lens = 0.5 * 2_200_000 - jnp.abs(d.astype(jnp.float32) - 0.5 * 2_200_000)
    masked = jnp.where(lens > 20000, mi, -jnp.inf)
    v, ix = _tile_lr_topk(masked, B, B, 1024)
    return v.sum()


flops = 2 * B * B * (T * S)
args2 = (
    jnp.asarray(codes[:, :B].T), jnp.asarray(codes[:, B:].T),
    jnp.asarray(w32), jnp.asarray(wparts),
    jnp.asarray(r[:B]), jnp.asarray(r[B:]),
)
dt, _ = timed(bare_dot, jnp.asarray(lhs_host), jnp.asarray(rhs_host))
print(f"bare dot [B,{T * S}]x[{T * S},B]: {dt * 1e3:.2f} ms  "
      f"{flops / dt / 1e12:.1f} TFLOP/s", flush=True)
dt, _ = timed(tile, *args2)
print(f"rank tile (2,2):               {dt * 1e3:.2f} ms  "
      f"{flops / dt / 1e12:.1f} TFLOP/s-equiv", flush=True)
dt, _ = timed(
    tile_topk, *args2, jnp.asarray(pos[:B]), jnp.asarray(pos[B:])
)
print(f"tile + mask + top-k:           {dt * 1e3:.2f} ms", flush=True)
