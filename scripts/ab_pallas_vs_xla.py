"""A/B: fused Pallas rank kernel vs the XLA rank tile on the real TPU.

Run detached (never kill a TPU client):
    nohup python scripts/ab_pallas_vs_xla.py > /tmp/ab_pallas.log 2>&1 &
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

B, S, N = 4096, 1024, 20
rng = np.random.default_rng(0)
codes_f = rng.integers(0, 2, (B, S)).astype(np.uint8)
codes_t = rng.integers(0, 2, (B, S)).astype(np.uint8)
w = rng.uniform(0.05, 0.5, S)
r = np.full(B, 2, np.int64)
neff = float(w.sum())

from ldweaver_tpu.parallel.fast_sweep import _build_rank_tile, _wparts
from ldweaver_tpu.ops.pallas_rank_mi import _build as build_pallas

w32, wparts = _wparts(w)

# XLA path
fx = _build_rank_tile(B, B, 2, 2, 3)
args_x = (jnp.asarray(codes_f), jnp.asarray(codes_t), jnp.asarray(w32),
          jnp.asarray(wparts), jnp.asarray(r, jnp.float32),
          jnp.asarray(r, jnp.float32), jnp.asarray(np.float32(neff)))
out = fx(*args_x); float(out.sum())
t0 = time.time()
acc = None
for _ in range(N):
    o = fx(*args_x)
    acc = o if acc is None else acc + o
v = float(acc.sum()); dt = (time.time() - t0) / N
print(f"XLA rank tile: {dt*1e3:.2f} ms  {B*B/dt/1e6:.0f} Mpairs/s", flush=True)

# Pallas path
from ldweaver_tpu.ops import pallas_rank_mi as prm
px = np.zeros((2, B), np.float32)
py = np.zeros((2, B), np.float32)
for x in range(2):
    px[x] = ((codes_f == x) * w).sum(1)
    py[x] = ((codes_t == x) * w).sum(1)
rf = np.full((1, B), 2, np.float32)
for TF, TT, SK in [(512, 512, 512), (256, 256, 1024), (1024, 512, 1024)]:
    try:
        fp = build_pallas(B, B, S, TF, TT, SK, 2, 2, 3, False)
        args_p = (jnp.asarray(codes_f), jnp.asarray(codes_t),
                  jnp.asarray(wparts), jnp.asarray(px), jnp.asarray(py),
                  jnp.asarray(rf), jnp.asarray(rf),
                  jnp.asarray(np.float32(neff)).reshape(1, 1))
        out = fp(*args_p); float(out.sum())
        t0 = time.time()
        acc = None
        for _ in range(N):
            o = fp(*args_p)
            acc = o if acc is None else acc + o
        v = float(acc.sum()); dt = (time.time() - t0) / N
        print(f"Pallas ({TF},{TT},{SK}): {dt*1e3:.2f} ms  {B*B/dt/1e6:.0f} Mpairs/s", flush=True)
    except Exception as e:
        print(f"Pallas ({TF},{TT},{SK}): FAILED {type(e).__name__}: {e}", flush=True)
print("done", flush=True)
