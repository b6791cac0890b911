"""Isolate the per-tile LR-candidate reduction cost (the 1.9 ms gap
between `rank tile` and `tile+mask+top-k` in ab_matmul_ceiling.py).

Variants at B=4096, C=128, K=1024:
  tile-only      - _rank_tile_mi alone (baseline 1.83 ms)
  +mask          - tile + lens/tri mask (fusion check)
  +chunk-topk1   - mask + stage-1 lax.top_k(resh, 1) + stage-2 (current)
  +chunk-maxarg  - mask + stage-1 jnp.max/argmax + stage-2
  +row-topk8     - mask + per-row lax.top_k(masked, 8) + stage-2

Run ON TPU:  python scripts/ab_stage1_reduce.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ldweaver_tpu.parallel.fast_sweep import _rank_tile_mi, _wparts  # noqa: E402

B, S, T, C, K = 4096, 1024, 3, 128, 1024
NT = 32
G = 2_200_000
rng = np.random.default_rng(0)
codes = rng.integers(0, 2, (S, B * 2)).astype(np.uint8)
w64 = rng.uniform(0.05, 0.5, S)
w32, wparts = _wparts(w64)
r = np.full(B * 2, 2, np.float32)
pos = np.sort(rng.choice(np.arange(1, G + 1), B * 2, replace=False)).astype(np.int32)
neff = np.float32(w32.sum())


def make(variant):
    def fn(acc, cf, ct, w32d, wp, rf, rt, pf, pt):
        mi = _rank_tile_mi(cf, ct, w32d + acc, wp, rf, rt, neff, 2, 2, T)
        if variant == "tile-only":
            return mi.sum()
        diff = pt[None, :] - pf[:, None]
        d = diff + jnp.where(diff < 0, G, 0)
        lens = 0.5 * G - jnp.abs(d.astype(jnp.float32) - 0.5 * G)
        masked = jnp.where(lens > 20000, mi, -jnp.inf)
        if variant == "+mask":
            return jnp.where(jnp.isfinite(masked), masked, 0.0).sum()
        if variant == "+chunk-topk1":
            resh = masked.reshape(B, B // C, C)
            c_vals, c_idx = jax.lax.top_k(resh, 1)
            c_vals = c_vals[..., 0]
            flat_idx = c_idx[..., 0]
        elif variant == "+chunk-maxarg":
            resh = masked.reshape(B, B // C, C)
            c_vals = resh.max(axis=-1)
            flat_idx = resh.argmax(axis=-1).astype(jnp.int32)
        else:  # +row-topk8
            c_vals, flat_idx = jax.lax.top_k(masked, 8)
        v2, s2 = jax.lax.top_k(c_vals.ravel(), K)
        return v2.sum() + flat_idx.ravel()[s2].sum().astype(jnp.float32)

    return jax.jit(fn)


args = (
    jnp.asarray(codes[:, :B].T), jnp.asarray(codes[:, B:].T),
    jnp.asarray(w32), jnp.asarray(wparts),
    jnp.asarray(r[:B]), jnp.asarray(r[B:]),
    jnp.asarray(pos[:B]), jnp.asarray(pos[B:]),
)
for variant in ("tile-only", "+mask", "+chunk-topk1", "+chunk-maxarg",
                "+row-topk8"):
    fn = make(variant)
    _ = float(np.asarray(fn(jnp.float32(0), *args)))
    t0 = time.time()
    acc = jnp.float32(0)
    for _ in range(NT):
        acc = fn(acc * jnp.float32(1e-9), *args)
    v = float(np.asarray(acc))
    dt = (time.time() - t0) / NT
    print(f"{variant:>14}: {dt * 1e3:6.2f} ms/tile  (chk {v:.3e})", flush=True)
