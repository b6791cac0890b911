"""A/B: fused Pallas rank kernel vs the XLA rank tile on the real TPU.

Methodology: reps INSIDE the jit (lax.fori_loop, carried scalar perturbs
neff), one dispatch + one tiny pull per variant — a Python loop of
dispatches measures the relay's ~1.4 ms enqueue floor instead of device
time.

Run detached (never kill a TPU client):
    nohup python scripts/ab_pallas_vs_xla.py > /tmp/ab_pallas.log 2>&1 &
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

B, S, NT = 4096, 1024, 32
rng = np.random.default_rng(0)
codes_f = rng.integers(0, 2, (B, S)).astype(np.uint8)
codes_t = rng.integers(0, 2, (B, S)).astype(np.uint8)
w = rng.uniform(0.05, 0.5, S)
neff = float(w.sum())

from ldweaver_tpu.parallel.fast_sweep import _rank_tile_mi, _wparts
from ldweaver_tpu.ops.pallas_rank_mi import _build as build_pallas

w32, wparts = _wparts(w)
r = np.full(B, 2, np.float32)


def timed(run, *args, reps=NT):
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


# --- XLA path (tile only, .sum() reduction) ---
def xla_body(acc, cf, ct, w32d, wp, rf, rt):
    mi = _rank_tile_mi(cf, ct, w32d, wp, rf, rt,
                       jnp.float32(neff) + acc, 2, 2, 3)
    return mi.sum()


dt, v = timed(
    loop(xla_body),
    jnp.asarray(codes_f), jnp.asarray(codes_t), jnp.asarray(w32),
    jnp.asarray(wparts), jnp.asarray(r), jnp.asarray(r),
)
print(f"XLA rank tile: {dt*1e3:.3f} ms  {B*B/dt/1e6:.0f} Mpairs/s  sum={v:.1f}",
      flush=True)

# --- Pallas path ---
px = np.zeros((2, B), np.float32)
py = np.zeros((2, B), np.float32)
for x in range(2):
    px[x] = ((codes_f == x) * w).sum(1)
    py[x] = ((codes_t == x) * w).sum(1)
rf2 = np.full((1, B), 2, np.float32)

args_p = (jnp.asarray(codes_f), jnp.asarray(codes_t), jnp.asarray(wparts),
          jnp.asarray(px), jnp.asarray(py), jnp.asarray(rf2),
          jnp.asarray(rf2))

for TF, TT, SK in [(512, 512, 512), (256, 256, 1024), (512, 1024, 1024),
                   (1024, 1024, 512), (2048, 1024, 1024)]:
    try:
        fp = build_pallas(B, B, S, TF, TT, SK, 2, 2, 3, False)

        def pl_body(acc, *a):
            out = fp(*a, (jnp.float32(neff) + acc).reshape(1, 1))
            return out.sum()

        dt, v = timed(loop(pl_body), *args_p)
        print(f"Pallas ({TF},{TT},{SK}): {dt*1e3:.3f} ms  "
              f"{B*B/dt/1e6:.0f} Mpairs/s  sum={v:.1f}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"Pallas ({TF},{TT},{SK}): FAILED {type(e).__name__}: {msg}",
              flush=True)
print("done", flush=True)
