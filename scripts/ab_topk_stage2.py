"""Device-only A/B of the sweep's top-k second stage at B=4096.

Stage 1 (chunked max, one candidate per 128-wide chunk) leaves
B * B/C = 131072 candidates; the second stage picks the global top-1024.
Candidates:
  a) exact lax.top_k(131072, 1024)           (current production path)
  b) lax.approx_max_k(..., recall_target=.99) (TPU PartialReduce op)
  c) two-level: chunked max again (C2=8) then exact top_k over 16k

Run ON TPU as a single process that exits on its own:
    python scripts/ab_topk_stage2.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B = 4096
C = 128
K = 1024
NT = 64  # tiles per timed run

rng = np.random.default_rng(0)
tiles = rng.normal(size=(4, B, B // C)).astype(np.float32)  # stage-1 output


def build(variant):
    def run(stack):
        def body(carry, i):
            cand = stack[i % 4] * (1.0 + 1e-6 * i)  # defeat CSE
            flat = cand.ravel()
            if variant == "exact":
                v, ix = jax.lax.top_k(flat, K)
            elif variant == "approx":
                v, ix = jax.lax.approx_max_k(flat, K, recall_target=0.99)
            elif variant == "sort":
                # exact: full descending sort (O(n log n) beats top_k's
                # O(n k) at k=1024), then slice
                idx0 = jax.lax.broadcasted_iota(
                    jnp.int32, flat.shape, 0
                )
                sv, si = jax.lax.sort_key_val(-flat, idx0)
                v = -sv[:K]
                ix = si[:K]
            else:  # two-level
                C2 = 8
                resh = flat.reshape(-1, C2)
                m1, i1 = jax.lax.top_k(resh, 1)
                v, sel = jax.lax.top_k(m1[:, 0], K)
                ix = sel * C2 + i1[sel, 0]
            return carry + v.sum() + ix.sum().astype(jnp.float32), None

        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(NT))
        return out

    return jax.jit(run)


stack = jnp.asarray(tiles)
print(f"B={B} C={C} cand/tile={B * B // C} K={K} tiles={NT}")
for variant in ("exact", "approx", "sort", "two-level"):
    fn = build(variant)
    v = float(fn(stack))  # compile + run
    t0 = time.time()
    v = float(fn(stack))
    dt = time.time() - t0
    print(f"{variant:>10}: {dt / NT * 1e3:6.2f} ms/tile  (checksum {v:.3e})",
          flush=True)

# recall check for approx (host, one tile)
flat = tiles[0].ravel()
exact_set = set(np.argpartition(-flat, K)[:K].tolist())
va, ia = jax.jit(lambda x: jax.lax.approx_max_k(x, K, recall_target=0.99))(
    jnp.asarray(flat)
)
got = set(np.asarray(ia).tolist())
print(f"approx recall vs exact: {len(got & exact_set) / K:.4f}")
