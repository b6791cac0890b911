"""On-device link extraction shared by the pipelined and SPMD sweeps.

The sharded scan sweeps (parallel/sweep.py, fast_sweep._build_bucket_sweep)
reduce only LR top-k + histograms; the full per-link SR table that the
background model and ARACNE consume (R/computePairwiseMI.R:333-381) was
produced only by the host-driven FastTileRunner loop pulling whole [B, B]
tiles.  This module closes that gap with ONE tile-extraction program used
by BOTH drivers:

  * **SR links**: every tile's short-range pair count is computable
    exactly on host from the (static) positions via circular window
    counts, so `jnp.nonzero(sr_mask, size=P_cap)` compacts each tile's SR
    pairs into a bounded row-major list — no [B, B] tile leaves the
    device, only the O(P_cap) pairs that exist.
  * **LR links**: per-tile type-7 retention (R/computePairwiseMI.R:347-358)
    needs only the two order statistics around the quantile, which for a
    selective retention probability live inside the tile's top-K.  The
    device emits an exact two-stage top-K plus an exactness certificate
    (no stage-1 row/chunk held more candidates than its capacity); the
    host interpolates the threshold in f64 — bit-identical to
    `utils.r_compat.quantile_type7` on the full value set — and keeps
    candidates >= q in row-major order.  Tiles whose certificate fails
    (adversarial density) fall back to one exact full-tile pull.

**Bitwise determinism.** XLA's elementwise codegen is fusion-context
dependent: the same `_rank_tile_mi` graph compiled with different
consumers produces f32 results differing at the ulp level (measured
~1.6e-7 on the log epilogue; contingency counts and marginals stay
bitwise equal).  Codegen IS invariant to scan trip count and to whether
tile operands arrive as slab parameters or dynamic slices of the resident
tensor (verified on the CPU backend), so both drivers compile the SAME
`_extract_body`: the SPMD path as a shard_map'd `lax.scan` over its pair
shard, the pipelined FastTileRunner as a length-1 scan per tile.  Their
sr/lr TSVs are therefore byte-identical BY CONSTRUCTION
(tests/test_spmd_sweep.py), and outputs are invariant to mesh size.

**Memory footprint.** A scan stacks every step's outputs, so sweeping a
whole bucket in one dispatch would hold O(n_tiles * (P_sr + K)) bytes of
extraction output in HBM (2.2 GB at the 131k-SNP bench scale — the round-2
TPU worker crash, BENCH_r02.json).  The driver therefore splits each
bucket's pair list into fixed-size SEGMENTS sized from `out_budget_bytes`
and double-buffers them: segment s+1 is dispatched (async) before segment
s is pulled, bounding device output memory to one budget while transfers
overlap compute.  Segment boundaries cannot change any output byte — the
scan body is identical and emission happens tile-by-tile on host.

**Relay-latency engineering (round 3).**  Per-tile SR caps come from the
pow-4 `sr_cap_ladder` so pull bytes track live links within 4x (a single
global cap pulled 17.7 GB for 1.25 GB live at the bench shape); every
bucket program is AOT-compiled on a worker pool so the 15-40 s relay
compiles overlap pulls; and tile emission PREPARES on a worker thread as
results land, committing in panel order afterwards (emission bytes
unchanged).  Measured on the v5e relay at 131k SNPs x 616 seqs: the full
production leg went 1584 s -> 857 s (caps + emit overlap) -> 663 s (AOT
compile overlap: dispatch 382 s -> 38 s), with identical TSV row counts
at every step.

**Round-trip engineering (round 4).**  With the SR side reduced on
device (parallel/sr_reduce.py) the pull bytes collapsed (1953 -> 21.5 MB
at the bench shape) but pull WALL did not (157 s): the relay charges
~1.2 s of round-trip latency per pull regardless of size, and the driver
issued 6 pulls per segment.  Device-reduce mode therefore packs each
segment's six LR arrays into one u32 buffer on device (`_build_lr_fuse`,
bit-exact unpack on host) — one pull per segment, 6x fewer round trips,
and one process_allgather per segment under multi-process (fewer
collectives, same deterministic order).  Bucket-program compiles are
additionally served from JAX's persistent compilation cache
(utils/compile_cache.py) so repeat runs skip the 15-40 s relay compiles
entirely.

Outputs of the SPMD driver are sharded along the pair axis (`P('b')`).
Under multi-process (`jax.process_count() > 1`) each host feeds its
addressable slice of the pair list, reads back only its addressable
shards, and the per-segment results are `process_allgather`'d so EVERY
host holds the full extraction results and emits identically; callers
gate file writes on `multihost.is_writer()` (tests/test_multihost.py
drives this driver itself with 2 real processes).

**Collective ordering under multi-process.**  gloo (and every XLA
collective backend) requires all processes to launch cross-process
collectives in the SAME order.  The single-process relay optimisation
fans the eight per-segment pulls across a 6-stream pool with two
segments draining concurrently — thread-schedule-dependent order, which
is fine for plain device->host copies but aborts gloo (`Received data
size doesn't match expected size`, the round-3 regression).  When
`process_count() > 1` every pool that issues collectives is therefore
sized to ONE worker: drains run strictly in dispatch order and each
segment's eight `process_allgather`s run serially in array order —
deterministic on every rank by construction.  Concurrency stays on for
the single-process relay case, where it is a measured 4x on pull wall.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from collections import deque
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from ldweaver_tpu.parallel.fast_sweep import (
    _MESH_STORE,
    _build_rank_tile,
    _rank_tile_mi,
    _wparts,
    stratify,
)


# --------------------------------------------------------------------------
# Host-side exact SR pair counts (positions are static)
# --------------------------------------------------------------------------
def _circular_window_counts(p: np.ndarray, q: np.ndarray, g: int,
                            sr_dist: int) -> np.ndarray:
    """#targets q within circular distance <= sr_dist of each p."""
    qs = np.sort(q)
    D = np.concatenate([qs, qs + g])
    a = ((p - sr_dist - 1) % g) + 1
    lo = np.searchsorted(D, a, side="left")
    hi = np.searchsorted(D, a + 2 * sr_dist, side="right")
    return hi - lo


def tile_sr_count(pos_f: np.ndarray, pos_t: np.ndarray, g: int,
                  sr_dist: int, same_block: bool) -> int:
    """Exact SR pair count of one tile under the fast-path emission rule
    (same-block: strict i > j; off-diagonal: all cross pairs)."""
    if pos_f.size == 0 or pos_t.size == 0:
        return 0
    if same_block:
        c = _circular_window_counts(pos_f, pos_f, g, sr_dist)
        return (int(c.sum()) - pos_f.size) // 2
    return int(_circular_window_counts(pos_f, pos_t, g, sr_dist).sum())


def sr_pair_counts(ranked, valid: np.ndarray, g: int,
                   sr_dist: int) -> np.ndarray:
    """[nb, nb] exact SR pair counts for every upper-triangular tile."""
    B = ranked.block
    nb = ranked.rank_codes.shape[1] // B
    pos_blocks = [
        ranked.pos[i * B : (i + 1) * B][valid[i * B : (i + 1) * B]]
        for i in range(nb)
    ]
    counts = np.zeros((nb, nb), np.int64)
    for i in range(nb):
        for j in range(i, nb):
            counts[i, j] = tile_sr_count(
                pos_blocks[i], pos_blocks[j], g, sr_dist, i == j
            )
    return counts


def _next_pow2(n: int, lo: int = 8) -> int:
    return max(lo, 1 << int(np.ceil(np.log2(max(n, 1)))))


def sr_cap_ladder(cap_top: int, lo: int = 1 << 15) -> Tuple[int, ...]:
    """Pow-4 SR-capacity ladder {lo, 4*lo, ...} clamped at cap_top.

    One GLOBAL pow2 cap (the round-2 design) pads every tile to the
    densest tile's SR count; at the 131k-SNP bench shape that pulled
    17.7 GB for 1.25 GB of live links (r-stratification's stable sort
    keeps genomic order inside each r stratum, so near-diagonal tiles
    hold ~4M SR pairs while the median tile holds ZERO).  A pow-4 ladder
    bounds padding at 4x live while keeping the program count at
    O(#buckets * ~4) — each extra cap class is one more ~15 s relay
    compile, so finer (pow2) classes don't pay for themselves."""
    if cap_top <= lo:
        return (cap_top,)
    caps = []
    c = lo
    while c < cap_top:
        caps.append(c)
        c *= 4
    caps.append(cap_top)
    return tuple(caps)


def sr_cap_class(count: int, ladder: Tuple[int, ...]) -> int:
    """Smallest ladder capacity >= count (tiles sharing a class share one
    compiled program; BOTH drivers use this rule so every tile compiles
    the identical `_extract_body` — the byte-identity invariant).

    count == 0 maps to a dedicated ZERO class: the median tile holds no
    SR pair at all (r-stratified order concentrates them near the strata
    diagonals), and SR compaction is the single most expensive piece of
    the extraction tile (scripts/ab_extract.py: 88-162 ms of a 161 ms
    tile) — skipping it where the host PROVES emptiness is an ~8x tile
    speedup for the majority class."""
    if count == 0:
        return 0
    for c in ladder:
        if count <= c:
            return c
    return ladder[-1]


def extract_dims(block: int, lr_prob: Optional[float],
                 k_max: int = 1 << 18) -> Tuple[int, int]:
    """(K, k_row) for the extraction top-K, sized from the retention
    probability: a tile keeps ~m = (1-prob)*B^2 candidates, so K must
    comfortably exceed m (static 8192 forced EVERY tile into the full
    fallback at 32k SNPs where m ~ 31k) and the stage-1 row capacity must
    cover the per-row Poisson load lambda = m/B plus a 6-sigma tail.
    Clamped at k_max; denser retention saturates into the exact full-tile
    fallback (and demotion) by design."""
    if lr_prob is None:
        return 1, 1
    m = (1.0 - lr_prob) * block * block
    lam = m / block
    k_row = int(min(block, max(16, math.ceil(lam + 6.0 * math.sqrt(lam + 1.0) + 8.0))))
    K = int(max(4096, 2.0 * m + 1024.0))
    K = min(K, block * k_row, block * block, k_max)
    return K, k_row


# --------------------------------------------------------------------------
# The shared tile-extraction body
# --------------------------------------------------------------------------
def _extract_body(
    codes_f, codes_t, r_f, r_t, pos_f, pos_t, val_f, val_t, pair, pvalid,
    w32, wparts, neff, prob, *,
    block: int, sr_dist: int, g: int, K: int, k_row: int, P_sr: int,
    Rf: int, Rt: int, terms: int, pure: bool,
):
    """One tile -> fixed-shape link extraction.  Compiled identically by
    both drivers (see module docstring); any change here changes BOTH."""
    import jax
    import jax.numpy as jnp

    mi = _rank_tile_mi(
        codes_f, codes_t, w32, wparts, r_f, r_t, neff, Rf, Rt, terms,
        pure=pure,
    )
    ii = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    same_block = pair[0] == pair[1]
    tri = jnp.where(same_block, ii > jj, True)
    ok = tri & val_f[:, None] & val_t[None, :] & pvalid
    diff = pos_t[None, :] - pos_f[:, None]
    d = diff + jnp.where(diff < 0, g, 0)
    lens = 0.5 * g - jnp.abs(d.astype(jnp.float32) - 0.5 * g)
    sr_ok = ok & (lens <= sr_dist)
    lr_ok = ok & (lens > sr_dist)

    # ---- SR: exact row-major compaction into the host-proven cap.
    # The device count rides along as the exactness cross-check even for
    # the zero class (emit asserts it equals the host's window count).
    n_sr = sr_ok.sum().astype(jnp.int32)
    if P_sr == 0:
        # host-proven empty tile: skip the compaction entirely — it is
        # the dominant cost of the extraction tile (ab_extract.py)
        sr_idx = jnp.zeros((0,), jnp.int32)
        sr_vals = jnp.zeros((0,), mi.dtype)
    else:
        # cumsum + scatter: output identical to
        # jnp.nonzero(size=P_sr, fill_value=0) — ascending flat indices
        # in slots 0..n_sr-1, zeros beyond — but TPU nonzero lowers to a
        # GLOBAL B^2-element sort (162 ms/tile at B=4096) while the
        # prefix-sum + unique-index scatter measures 88 ms
        # (scripts/ab_extract.py)
        flat = sr_ok.ravel()
        dest = jnp.where(
            flat, jnp.cumsum(flat.astype(jnp.int32)) - 1, P_sr
        )  # masked-out slots land out of bounds and are dropped
        sr_idx = (
            jnp.zeros(P_sr, jnp.int32)
            .at[dest]
            .set(
                jnp.arange(block * block, dtype=jnp.int32), mode="drop"
            )
        )
        sr_vals = mi.ravel()[sr_idx]

    # ---- LR: exact two-stage top-K + exactness certificate.  Unlike the
    # LR-only sweep's free chunked-max stage (1 candidate per 128-chunk —
    # too lossy for the ~(1-prob)*B^2 retained candidates of a tile),
    # extraction uses a per-row top-k whose capacity matches the expected
    # per-row candidate load (K/B <= 2 at the defaults).
    neg = jnp.where(lr_ok, mi, -jnp.inf)
    n_lr = lr_ok.sum().astype(jnp.int32)
    row_vals, row_idx = jax.lax.top_k(neg, k_row)
    rows = jax.lax.broadcasted_iota(jnp.int32, (block, k_row), 0)
    flat = rows * block + row_idx
    n_out = min(K, block * k_row)
    if n_out > 4096:
        # lax.top_k is O(n*k): at the SR-analysis K regime (tens of
        # thousands kept per tile) it dominated the tile (~0.5 s measured
        # at K=63k on v5e).  A stable descending sort is O(n log n) and
        # keeps top_k's tie order (lowest flat index first), so the
        # output multiset — and therefore every emitted byte — is
        # unchanged.
        rv = row_vals.ravel()
        sk, si = jax.lax.sort_key_val(
            -rv, jnp.arange(rv.size, dtype=jnp.int32), is_stable=True
        )
        vals = -sk[:n_out]
        idx = flat.ravel()[si[:n_out]]
    else:
        vals, sel = jax.lax.top_k(row_vals.ravel(), n_out)
        idx = flat.ravel()[sel]
    # certificate at the NEEDED depth: the host only reads ranks down to
    # i_lo = n_lr-1-floor((n_lr-1)*prob), so stage 1 must be lossless for
    # values >= the candidate at rank i_cert = i_lo + margin (a kth-depth
    # certificate is far too strict: high-LD rows concentrate dozens of
    # TOP-K entries, but rarely dozens of the ~(1-prob)*B^2 KEPT ones).
    # vstar from the possibly-lossy array only underestimates, so the
    # check is conservative.  +8 covers the f32-vs-f64 floor drift.
    n_lr_f = n_lr.astype(jnp.float32)
    i_cert = n_lr - jnp.floor((n_lr_f - 1.0) * prob).astype(jnp.int32) + 8
    i_cert = jnp.clip(i_cert, 0, n_out - 1)
    i_cert = jnp.minimum(i_cert, jnp.maximum(n_lr - 1, 0))
    vstar = vals[i_cert]
    above = (neg >= vstar) & lr_ok
    tot_max = lr_ok.sum(axis=1).max()
    abv_max = above.sum(axis=1).max()
    exact = (tot_max <= k_row) | (jnp.isfinite(vstar) & (abv_max <= k_row))
    # tot_max rides along so a failed certificate can be retried with a
    # k_row that is lossless BY CONSTRUCTION (tot_max <= k_row') instead
    # of paying the full-B^2-tile fallback transfer
    return (n_lr, exact, tot_max.astype(jnp.int32), vals,
            idx.astype(jnp.int32), n_sr, sr_idx, sr_vals)


@functools.lru_cache(maxsize=None)
def _build_tile_extract(
    block: int, sr_dist: int, g: int, K: int, k_row: int, P_sr: int,
    Rf: int, Rt: int, terms: int, pure: bool,
):
    """Single-tile extraction for the pipelined runner: a length-1 scan of
    `_extract_body` over slab operands — the same compiled body as the
    SPMD scan, so results are bitwise identical across drivers."""
    import jax
    import jax.numpy as jnp

    def fn(codes_f, codes_t, w32, wparts, r_f, r_t, neff,
           pos_f, pos_t, val_f, val_t, pair, pvalid, prob):
        # pvalid/prob are traced (not folded constants) so the compiled
        # body graph is IDENTICAL to the SPMD scan body's — see module
        # docstring on fusion-context-dependent codegen
        def body(carry, _):
            return carry, _extract_body(
                codes_f, codes_t, r_f, r_t, pos_f, pos_t, val_f, val_t,
                pair, pvalid, w32, wparts, neff, prob,
                block=block, sr_dist=sr_dist, g=g, K=K, k_row=k_row,
                P_sr=P_sr, Rf=Rf, Rt=Rt, terms=terms, pure=pure,
            )
        _, ys = jax.lax.scan(body, jnp.int32(0), None, length=1)
        return tuple(y[0] for y in ys)

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _build_spmd_bucket_sweep(
    mesh_key: int,
    block: int,
    nseq: int,
    sr_dist: int,
    g: int,
    K: int,
    k_row: int,
    P_sr: int,
    Rf: int,
    Rt: int,
    terms: int,
    pure: bool,
):
    """shard_map'd scan over this bucket's block pairs (same Rf/Rt/pure
    and the same sr_cap_class ladder cap, so every tile compiles the
    identical `_extract_body` program as the pipelined driver)."""
    mesh = _MESH_STORE[mesh_key]
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    def local(codes, wparts, w32, r, pos, valid, pairs, pair_valid, neff,
              prob):
        def body(carry, inp):
            pair, pvalid = inp
            fs = pair[0] * block
            ts = pair[1] * block
            codes_f = jax.lax.dynamic_slice(codes, (0, fs), (nseq, block)).T
            codes_t = jax.lax.dynamic_slice(codes, (0, ts), (nseq, block)).T
            r_f = jax.lax.dynamic_slice(r, (fs,), (block,)).astype(jnp.float32)
            r_t = jax.lax.dynamic_slice(r, (ts,), (block,)).astype(jnp.float32)
            pos_f = jax.lax.dynamic_slice(pos, (fs,), (block,))
            pos_t = jax.lax.dynamic_slice(pos, (ts,), (block,))
            val_f = jax.lax.dynamic_slice(valid, (fs,), (block,))
            val_t = jax.lax.dynamic_slice(valid, (ts,), (block,))
            return carry, _extract_body(
                codes_f, codes_t, r_f, r_t, pos_f, pos_t, val_f, val_t,
                pair, pvalid, w32, wparts, neff, prob,
                block=block, sr_dist=sr_dist, g=g, K=K, k_row=k_row,
                P_sr=P_sr, Rf=Rf, Rt=Rt, terms=terms, pure=pure,
            )

        _, ys = jax.lax.scan(body, jnp.int32(0), (pairs, pair_valid))
        return ys

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(), P("b"), P("b"), P(),
                      P()),
            out_specs=(P("b"),) * 8,
        )
    )


# --------------------------------------------------------------------------
# Host-side emission from extraction results (shared by both drivers)
# --------------------------------------------------------------------------
@dataclasses.dataclass
class TileExtract:
    n_lr: int
    exact: bool
    vals: np.ndarray  # [K] f32 desc
    idx: np.ndarray  # [K] i32 flat
    n_sr: int
    sr_idx: np.ndarray  # [>=n_sr] i32 row-major
    sr_vals: np.ndarray  # [>=n_sr] f32
    row_max: int = 0  # max LR candidates in any row (retry sizing)


def lr_threshold_from_topk(n_lr: int, vals: np.ndarray, lr_prob: float,
                           K: int) -> Optional[float]:
    """The f64 type-7 retention threshold from the two order statistics
    around the quantile, or None when they fall outside the top-K
    (saturated tile -> caller falls back).  Bit-identical to
    quantile_type7 over the full per-tile LR value set."""
    n = int(n_lr)
    h = (n - 1) * lr_prob
    lo = int(math.floor(h))
    i_lo = n - 1 - lo  # rank from top of x_asc[lo]
    ncand = min(n, K, vals.shape[0])
    if i_lo > ncand - 1:
        return None
    vals64 = vals.astype(np.float64)
    x_lo = vals64[i_lo]
    hi_asc = min(lo + 1, n - 1)
    x_hi = vals64[n - 1 - hi_asc]
    return float(x_lo + (h - lo) * (x_hi - x_lo))


def retry_dims(res: "TileExtract", block: int, lr_prob: float,
               K: int, k_row: int) -> Tuple[int, int]:
    """(K', k_row') for the boosted-capacity retry of a failed tile.

    k_row' >= the tile's measured max per-row candidate count, so the
    stage-1 certificate holds BY CONSTRUCTION; K' covers the exact
    retention rank i_lo (known from n_lr) with the same 2x + 1024 tie
    margin the primary sizing uses.  A retry moves O(K') bytes instead of
    the full B^2 tile — through the high-latency relay that is the
    difference between ~0.1 s and ~10 s per failed tile."""
    n = int(res.n_lr)
    h = (n - 1) * lr_prob
    i_lo = n - 1 - int(math.floor(h))
    K2 = min(block * block, _next_pow2(2 * (i_lo + 1) + 1024))
    k2 = min(block, _next_pow2(max(int(res.row_max), 2 * k_row)))
    return max(K2, K), max(k2, k_row)


def retry_tile_extract(
    ranked, valid, bi: int, bj: int,
    w32_dev, wparts_dev, neff_dev,
    *, g: int, sr_dist: int, lr_prob: float, K2: int, k2: int, P_sr: int,
    slab_f=None, slab_t=None,
) -> "TileExtract":
    """Re-run one tile's extraction with boosted (K2, k2) on the local
    default device (shared by both drivers' fallback paths).  Pass
    device-resident slabs when a cache already holds them."""
    import jax.numpy as jnp

    B = ranked.block
    f_sl = slice(bi * B, (bi + 1) * B)
    t_sl = slice(bj * B, (bj + 1) * B)
    r_f = np.asarray(ranked.r[f_sl], np.float32)
    r_t = np.asarray(ranked.r[t_sl], np.float32)
    pure = bool(ranked.block_pure[bi]) and bool(ranked.block_pure[bj])
    fn = _build_tile_extract(
        B, int(sr_dist), int(g), K2, k2, P_sr,
        int(r_f.max()), int(r_t.max()), 3, pure,
    )
    if slab_f is None:
        slab_f = jnp.asarray(
            np.ascontiguousarray(ranked.rank_codes[:, f_sl].T)
        )
    if slab_t is None:
        slab_t = jnp.asarray(
            np.ascontiguousarray(ranked.rank_codes[:, t_sl].T)
        )
    outs = fn(
        slab_f, slab_t, w32_dev, wparts_dev, r_f, r_t, neff_dev,
        np.asarray(ranked.pos[f_sl], np.int32),
        np.asarray(ranked.pos[t_sl], np.int32),
        np.asarray(valid[f_sl]), np.asarray(valid[t_sl]),
        np.asarray([bi, bj], np.int32), np.True_,
        np.float32(lr_prob),
    )
    n_lr, exact, row_max, vals, idx, n_sr, sr_idx, sr_vals = (
        np.asarray(o) for o in outs
    )
    return TileExtract(
        n_lr=int(n_lr), exact=bool(exact), vals=vals, idx=idx,
        n_sr=int(n_sr), sr_idx=sr_idx, sr_vals=sr_vals,
        row_max=int(row_max),
    )


def prepare_tile_emit(res: TileExtract, *, K: int, nclust: int,
                      **emit_kw) -> Optional[tuple]:
    """Run one tile's emission into LOCAL buffers (the numpy-heavy ~90% of
    emit_tile_extract) so it can execute on a worker thread while the main
    thread blocks on relay pulls.  Returns (per-cluster SR parts, captured
    LR sink calls, n_sr), or None when the tile needs the retry/fallback
    path.  Committing the buffers in panel order afterwards reproduces
    emit_tile_extract's bytes exactly — same helper, same append order."""
    local_sr: List[list] = [[] for _ in range(nclust)]
    calls: List[tuple] = []
    ok = emit_tile_extract(
        res, K=K, sr_links=local_sr,
        lr_rows_sink=lambda *cols: calls.append(cols), **emit_kw
    )
    if not ok:
        return None
    return local_sr, calls, res.n_sr


def commit_tile_emit(prep: tuple, sr_links: List[list],
                     lr_rows_sink: Callable) -> int:
    """Ordered, cheap counterpart of prepare_tile_emit."""
    local_sr, calls, n_sr = prep
    for ci, parts in enumerate(local_sr):
        sr_links[ci].extend(parts)
    for cols in calls:
        lr_rows_sink(*cols)
    return n_sr


def emit_tile_extract(
    res: TileExtract,
    *,
    B: int,
    pos_f: np.ndarray,
    pos_t: np.ndarray,
    pnt_f: np.ndarray,
    pnt_t: np.ndarray,
    g: int,
    sr_dist: int,
    lr_prob: Optional[float],
    K: int,
    expected_sr: int,
    sr_links: List[list],
    lr_rows_sink: Callable,
    sr_to_host: bool = True,
    parts: str = "both",
) -> bool:
    """Emit one tile's links from its extraction result; returns False if
    the tile needs the LR retry/fallback (failed certificate or retention
    kept more than the top-K).

    SR is SINGLE-SOURCED from the primary extraction program: its
    compaction is exact regardless of the LR certificate, so when the LR
    side fails the caller emits `parts="sr"` from the ORIGINAL result
    and reruns only `parts="lr"` on the retry/fallback — every SR value
    comes from one compiled program (the bitwise invariant the on-device
    reduction relies on; different programs may differ at f32 ulp).
    `sr_to_host=False` (device SR reduction, parallel/sr_reduce.py)
    skips the host-side SR append but keeps the exactness assert."""
    from ldweaver_tpu.core.sweep import _emit_pairs

    assert res.n_sr == expected_sr, (
        f"device SR count {res.n_sr} != host count {expected_sr}"
    )
    q = None
    kept_sel = None
    if parts != "sr" and lr_prob is not None and res.n_lr > 0:
        if not res.exact:
            return False
        q = lr_threshold_from_topk(res.n_lr, res.vals, lr_prob, K)
        if q is None:
            return False
        cand = res.vals[: min(res.n_lr, K, res.vals.shape[0])].astype(
            np.float64
        )
        if res.n_lr > cand.size and cand.size and cand[-1] >= q:
            # candidates beyond the top-K could also pass the threshold
            # (tie block crossing the K boundary): the retention would
            # silently drop links the full-tile path keeps — fall back
            return False
        kept_sel = np.flatnonzero(cand >= q)

    if kept_sel is not None and kept_sel.size:
        kidx = res.idx[kept_sel].astype(np.int64)
        kvals = res.vals[kept_sel].astype(np.float64)
        order = np.argsort(kidx, kind="stable")  # row-major
        kidx = kidx[order]
        kvals = kvals[order]
        _emit_pairs(
            kidx // B, kidx % B, kvals, pos_f, pos_t, pnt_f, pnt_t,
            g, sr_dist, lr_prob, sr_links, lr_rows_sink,
            apply_lr_quantile=False, lr_thresh=q,
        )
    if parts != "lr" and sr_to_host and res.n_sr:
        sidx = res.sr_idx[: res.n_sr].astype(np.int64)
        svals = res.sr_vals[: res.n_sr].astype(np.float64)
        _emit_pairs(
            sidx // B, sidx % B, svals, pos_f, pos_t, pnt_f, pnt_t,
            g, sr_dist, None, sr_links, lr_rows_sink,
        )
    return True


# --------------------------------------------------------------------------
# Multi-process plumbing: global arrays in, host copies of sharded results
# out.  All three helpers are identity-cheap in the single-process case.
# --------------------------------------------------------------------------
def _to_global(mesh, x, spec):
    """Commit a host array as a global array with the given PartitionSpec.
    Single-process: a device_put with the explicit NamedSharding (COMMITTED,
    so AOT-compiled executables accept it without resharding).
    Multi-process: the caller passes this process's HOST-LOCAL chunk (the
    full array for replicated specs) and jax assembles the global view."""
    import jax

    x = np.asarray(x)
    if jax.process_count() == 1:
        from jax.sharding import NamedSharding

        return jax.device_put(x, NamedSharding(mesh, spec))
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(x, mesh, spec)


def _local_rows(x: np.ndarray, nsh: int) -> np.ndarray:
    """This process's contiguous slice of a [nsh*k, ...] array sharded
    along axis 0 of a 1-D mesh built from jax.devices() (each process's
    devices are contiguous in that order)."""
    import jax

    if jax.process_count() == 1:
        return x
    per_dev = x.shape[0] // nsh
    ldc = jax.local_device_count()
    lo = jax.process_index() * ldc * per_dev
    return x[lo : lo + ldc * per_dev]


def _pull_sharded(o) -> np.ndarray:
    """Host copy of a P('b')-sharded output.  Single-process: one pull.
    Multi-process: concatenate this host's addressable shards (in global
    order) and allgather across processes so every host sees all tiles.
    Every call records its blocking wall on the active PullRecorder
    (utils/relay_stats.py) — relay round-trip latency is weather and
    every committed artifact carries the histogram."""
    import time as _time

    import jax

    from ldweaver_tpu.utils.relay_stats import record_pull

    t0 = _time.time()
    try:
        if jax.process_count() == 1:
            return np.asarray(o)
        shards = sorted(
            o.addressable_shards, key=lambda s: s.index[0].start or 0
        )
        local = np.concatenate(
            [np.asarray(s.data) for s in shards], axis=0
        )
        from jax.experimental import multihost_utils

        return multihost_utils.process_allgather(local, tiled=True)
    finally:
        record_pull(_time.time() - t0)


@functools.lru_cache(maxsize=None)
def _build_lr_fuse(mesh_key: int):
    """Pack a segment's six LR output arrays into ONE u32 buffer
    [rows, 4 + 2K] on device: columns (n_lr, exact, row_max, n_sr) then
    the f32 bits of vals then idx.  The relay charges ~1.2 s of
    round-trip latency per pull regardless of size (r4 bench: pull_s
    157 s for 21.5 MB over 21 segments x 6 arrays), so device mode
    pulls one fused buffer per segment — 6x fewer round trips, same
    bytes, bit-exact unpack.  Pure per-row bit moves, no collectives:
    safe to dispatch from any drain thread in any process count."""
    from ldweaver_tpu.parallel.fast_sweep import _MESH_STORE

    mesh = _MESH_STORE[mesh_key]
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    def fn(n_lr, exact, row_max, vals, idx, n_sr):
        u = lambda x: jax.lax.bitcast_convert_type(x, jnp.uint32)  # noqa: E731
        head = jnp.stack(
            [u(n_lr), exact.astype(jnp.uint32), u(row_max), u(n_sr)],
            axis=1,
        )
        return jnp.concatenate([head, u(vals), u(idx)], axis=1)

    return jax.jit(
        fn, out_shardings=NamedSharding(mesh, PartitionSpec("b"))
    )


@functools.lru_cache(maxsize=None)
def _build_codes_unpack(mesh_key: int, n: int):
    """Replicated on-device unpack of nibble-packed rank codes (see
    parallel/slabs.py — codes are 0..4, two per byte), so the big
    [nseq, nsnp] operand crosses the bandwidth-limited relay at half
    the bytes.  Exact inverse; every downstream program sees the
    identical u8 tensor."""
    from ldweaver_tpu.parallel.fast_sweep import _MESH_STORE

    mesh = _MESH_STORE[mesh_key]
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    def fn(p):
        lo = p & jnp.uint8(0xF)
        hi = p >> jnp.uint8(4)
        return jnp.stack([lo, hi], axis=2).reshape(p.shape[0], -1)[:, :n]

    return jax.jit(
        fn, out_shardings=NamedSharding(mesh, PartitionSpec())
    )


def _codes_to_global(mesh, mesh_key: int, codes: np.ndarray):
    """Upload the rank-code tensor replicated, nibble-packed when legal
    (single-process, values fit a nibble); multi-process keeps the plain
    path — the assembly helper handles host-local chunks there and the
    upload is host-local anyway."""
    import jax
    from jax.sharding import PartitionSpec

    if jax.process_count() > 1 or int(codes.max(initial=0)) > 0xF:
        return _to_global(mesh, codes, PartitionSpec())
    from ldweaver_tpu.parallel.slabs import pack_nibbles

    n = codes.shape[1]
    return _build_codes_unpack(mesh_key, n)(
        _to_global(mesh, pack_nibbles(codes), PartitionSpec())
    )


# --------------------------------------------------------------------------
# Shared stratify + device code upload (BLK4 Hamming and BLK5 reuse ONE
# upload), and the device Hamming-weight program computed from it
# --------------------------------------------------------------------------
_PREP_CACHE: Dict[tuple, tuple] = {}  # one-slot: key -> (mesh, mesh_key, ranked, codes_dev)


def fast_block_size(nsnp: int, max_blk_sz: int) -> int:
    """The fast/SPMD tile size: pow2-capped max_blk_sz (the measured v5e
    optimum 4096 must not degrade to the reference's 1000-multiple
    rounding — core/sweep.perform_mi_computation uses this same rule, and
    BLK4 must too so the two blocks share one device upload)."""
    import math as _math

    return min(max_blk_sz, 1 << int(_math.ceil(_math.log2(max(nsnp, 2)))))


def prepare_spmd_codes(snp_data, block: int, n_devices: Optional[int]):
    """Stratify + upload the rank-code tensor ONCE per (data, block,
    mesh) and cache the device reference, so BLK4 (Hamming weights) and
    BLK5 (the MI sweep) share a single host->device transfer instead of
    each pushing its own ~40 MB through the relay (VERDICT r4 weak #2:
    BLK4 was 129 s of the 439 s e2e for milliseconds of compute).
    Returns (mesh, mesh_key, ranked, codes_dev).  One-slot cache: the
    previous entry's device memory is released when the data changes."""
    import zlib

    from ldweaver_tpu.parallel.sweep import get_mesh

    mesh = get_mesh(n_devices)
    mesh_key = id(mesh)
    _MESH_STORE[mesh_key] = mesh
    # fingerprint EVERY stratify input, not just codes: a run whose
    # positions file changed under identical code bytes must not reuse a
    # stale stratification (same rule as the segment-checkpoint CRC)
    crc = 0
    for a in (snp_data.codes, snp_data.pos, snp_data.r,
              snp_data.acgtn_table):
        crc = zlib.crc32(
            np.ascontiguousarray(a).view(np.uint8).ravel(), crc
        )
    key = (crc, snp_data.codes.shape, int(block), mesh_key)
    hit = _PREP_CACHE.get(key)
    if hit is not None:
        return hit
    ranked = stratify(
        snp_data.codes, snp_data.acgtn_table, snp_data.pos, snp_data.r,
        block,
    )
    codes_dev = _codes_to_global(mesh, mesh_key, ranked.rank_codes)
    _PREP_CACHE.clear()  # one slot: drop the previous device tensor
    _PREP_CACHE[key] = (mesh, mesh_key, ranked, codes_dev)
    return _PREP_CACHE[key]


@functools.lru_cache(maxsize=None)
def _build_hamming(mesh_key: int, nseq: int, nsnp: int, npad: int,
                   thresh: int):
    """Neighbour counts for the Hamming weights from the RANKED code
    tensor (reference `estimate_Hamming_distance_weights`,
    R/performPopulationStuctureCorrection.R:20-81).  Valid because the
    equality count sum_i 1[c_s[i] == c_t[i]] is invariant under (a) any
    column permutation (stratify's r-sort) and (b) any per-site
    INJECTIVE relabelling (rank_encode maps each site's alleles through
    a permutation of 0..4), and the `npad` zero pad columns match for
    every pair, adding exactly npad to each count — subtracted back.
    bf16 one-hot matmuls with f32 accumulation are integer-exact for
    counts < 2^24.  ONE dispatch, ONE [nseq] i32 pull."""
    mesh = _MESH_STORE[mesh_key]
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    def fn(codes):  # [nseq, nsnp + npad] u8 replicated
        acc = jnp.zeros((nseq, nseq), jnp.float32)
        for a in range(5):
            m = (codes == a).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot(
                m, m.T, preferred_element_type=jnp.float32
            )
        shared = acc - np.float32(npad)
        near = (nsnp - shared) < thresh  # strict <, R/perform...R:76
        return near.sum(axis=1).astype(jnp.int32)

    return jax.jit(
        fn, out_shardings=NamedSharding(mesh, PartitionSpec())
    )


def hamming_weights_spmd(
    snp_data, threshold: float, max_blk_sz: int,
    n_devices: Optional[int] = None, max_nseq: int = 16384,
) -> Optional[np.ndarray]:
    """BLK4 on the shared BLK5 upload (see prepare_spmd_codes).  Returns
    None when the workspace would not comfortably fit — the [nseq, nseq]
    f32 accumulator AND the [nseq, nsnp] bf16 one-hot operands (which
    scale with nsnp, ~4.3 GB at 16k seqs x 131k SNPs) — so the caller
    falls back to the seq-blocked `hamming_weights_jax`."""
    nseq = snp_data.nseq
    if nseq > max_nseq:
        return None
    from ldweaver_tpu.parallel.slabs import auto_budget

    block = fast_block_size(snp_data.nsnp, max_blk_sz)
    hbm = auto_budget() or (8 << 30)
    nsnp_pad = snp_data.nsnp + ((-snp_data.nsnp) % block)
    # live set: codes u8 + 2 bf16 one-hot operands (m and m.T alias at
    # the HLO level but budget both) + f32 acc
    est = nseq * nsnp_pad * (1 + 2 * 2) + 4 * nseq * nseq
    if est > hbm * 0.45:
        return None
    mesh, mesh_key, ranked, codes_dev = prepare_spmd_codes(
        snp_data, block, n_devices
    )
    npad = ranked.pos.size - snp_data.nsnp
    thresh = int(snp_data.nsnp * threshold)  # as.integer truncation, :23
    fn = _build_hamming(mesh_key, nseq, snp_data.nsnp, int(npad), thresh)
    import time as _time

    from ldweaver_tpu.utils.relay_stats import record_pull

    t0 = _time.time()
    neigh = np.asarray(fn(codes_dev), dtype=np.int64)
    record_pull(_time.time() - t0)
    return 1.0 / (neigh + 1.0)


@functools.lru_cache(maxsize=None)
def _build_lr_concat(mesh_key: int):
    """Concatenate a chunk's fused LR buffers on device (one jit object;
    traces are cached per input row-pattern, and the persistent compile
    cache makes repeat patterns disk reads)."""
    from ldweaver_tpu.parallel.fast_sweep import _MESH_STORE

    mesh = _MESH_STORE[mesh_key]
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    return jax.jit(
        lambda bs: jnp.concatenate(bs, axis=0),
        out_shardings=NamedSharding(mesh, PartitionSpec("b")),
    )


def _unfuse_lr(buf: np.ndarray, K: int) -> Dict[str, np.ndarray]:
    """Host inverse of _build_lr_fuse — bit-exact by construction: every
    int32-origin column (the head counts and idx) decodes via .view, not
    value conversion, so the unpack stays correct even if a head column
    ever carries a negative value (ADVICE r4)."""
    return dict(
        n_lr=np.ascontiguousarray(buf[:, 0]).view(np.int32),
        exact=buf[:, 1].astype(bool),
        row_max=np.ascontiguousarray(buf[:, 2]).view(np.int32),
        n_sr=np.ascontiguousarray(buf[:, 3]).view(np.int32),
        vals=np.ascontiguousarray(buf[:, 4 : 4 + K]).view(np.float32),
        idx=np.ascontiguousarray(buf[:, 4 + K : 4 + 2 * K]).view(np.int32),
    )


class _SegCheckpoint:
    """Segment-granular sweep resume for the SPMD driver (the reference
    resumes only at whole-file granularity, R/BacGWES.R:382-385; the
    fast path already resumes per block pair).  Each drained segment's
    PULLED arrays are persisted as one npz (atomic rename); on resume a
    hit skips the segment's device->host pulls — in host sr mode the
    dispatch too — which is where all the relay wall-clock lives.  A
    manifest keyed by the full segment plan (any knob that changes
    segmentation changes the plan) invalidates stale checkpoints."""

    def __init__(self, directory: str, config_key: str):
        import hashlib

        self.dir = directory
        os.makedirs(directory, exist_ok=True)
        key = hashlib.sha256(config_key.encode()).hexdigest()
        manifest = os.path.join(directory, "manifest.txt")
        stale = True
        if os.path.exists(manifest):
            try:
                stale = open(manifest).read() != key
            except OSError:
                pass
        if stale:
            for f in os.listdir(directory):
                if f.endswith(".npz"):
                    os.unlink(os.path.join(directory, f))
            with open(manifest, "wt") as fh:
                fh.write(key)

    def _path(self, i: int) -> str:
        return os.path.join(self.dir, f"seg_{i}.npz")

    def load(self, i: int):
        try:
            with np.load(self._path(i)) as z:
                return {k: z[k] for k in z.files}
        except (OSError, ValueError):
            return None

    def save(self, i: int, arrays: Dict[str, np.ndarray]) -> None:
        tmp = self._path(i) + ".tmp.npz"
        np.savez(tmp, **arrays)
        os.replace(tmp, self._path(i))


def _default_out_budget() -> int:
    """Device bytes one in-flight extraction segment may occupy.  Host
    sr mode: at most FOUR segments' outputs are live at once (two
    enqueued by the double-buffered dispatch loop + up to two whose
    drains are still pulling) — 1 GiB at the default on a 16 GB v5e.
    Device sr mode: the SR outputs stay resident by design (gated on
    fitting ~35% of HBM) and the fused LR buffers are chunk-flushed at
    this budget with <=2 chunks draining, so un-pulled LR bytes stay
    ~3x this.  Overridable via LDW_SPMD_OUT_BUDGET."""
    env = os.environ.get("LDW_SPMD_OUT_BUDGET")
    if env:
        return int(env)
    return 256 << 20


# --------------------------------------------------------------------------
# The SPMD driver: budget-bounded scan segments per bucket, double-buffered
# dispatch/pull, emission in pipeline order
# --------------------------------------------------------------------------
def spmd_blk5_sweep(
    snp_data,
    hdw: np.ndarray,
    paint: np.ndarray,
    neff: float,
    sr_dist: int,
    lr_retain_links: float,
    lr_links_approx: Optional[float],
    sr_links: List[list],
    lr_rows_sink: Callable,
    block: int,
    n_devices: Optional[int] = None,
    perform_sr_only: bool = False,
    topk_cap: int = 1 << 18,
    out_budget_bytes: Optional[int] = None,
    verbose: bool = True,
    sr_reduce: str = "auto",
    checkpoint_dir: Optional[str] = None,
):
    """Run BLK5's sweep as budget-bounded SPMD scan segments per
    (Rf, Rt, pure) bucket and emit links exactly like the FastTileRunner
    extract path (same tile order, same row-major per-tile order, same
    f64 thresholds, same compiled body), so sr/lr TSVs come out
    byte-identical.  Returns (emission stats, DeviceSrReduction | None).

    `out_budget_bytes` caps the extraction output held on device by one
    in-flight segment (two segments are in flight); it bounds total HBM
    output memory independent of nsnp — the structural fix for the
    round-2 bench crash.  Segmentation is output-invariant.

    `sr_reduce` selects where the SR background model's heavy pass runs:
    "host" pulls the full SR table (the round-3 behaviour, the byte
    oracle); "device" keeps every segment's SR scan outputs resident and
    reduces them on device (parallel/sr_reduce.py) — only group stats +
    positive-residual candidates ever leave the chip, and the caller
    finishes with `merge_and_sort_sr_links_from_candidates` (TSVs
    byte-identical to "host" by construction); "part" forces the
    grid-partitioned shard-local reduction (the >HBM scale path on a
    multi-device mesh); "auto" picks device / part / host by memory fit
    and warns loudly on a host fallback.  All modes are byte-identical."""
    from ldweaver_tpu.parallel.slabs import panel_pair_order

    # shared stratify + upload (BLK4 may already have paid for both)
    mesh, mesh_key, ranked, codes_dev = prepare_spmd_codes(
        snp_data, block, n_devices
    )
    nsh = mesh.devices.size
    B = ranked.block
    nb = ranked.rank_codes.shape[1] // B
    valid = np.arange(ranked.pos.size) < snp_data.nsnp
    paint_sorted = np.concatenate(
        [paint[ranked.perm], np.zeros(ranked.pos.size - snp_data.nsnp, np.int64)]
    )
    g = snp_data.g
    lr_prob = (
        None
        if (perform_sr_only or lr_links_approx is None)
        else max(0.0, 1.0 - lr_retain_links / lr_links_approx)
    )
    K, k_row = extract_dims(B, lr_prob, k_max=topk_cap)

    # exact SR counts + the pow-4 capacity ladder (sr_cap_ladder): each
    # tile's SR cap is its ladder class, so pull bytes track live links
    # within 4x instead of padding every tile to the global max.  The cap
    # joins the bucket key — tiles sharing (Rf, Rt, pure, cap) share one
    # compiled program, identical to the pipelined driver's per-tile
    # program (sr_cap_class is the shared rule).
    sr_counts = sr_pair_counts(ranked, valid, g, sr_dist)
    ladder = sr_cap_ladder(_next_pow2(int(sr_counts.max())))
    buckets: Dict[Tuple[int, int, bool, int], List[Tuple[int, int]]] = {}
    for i in range(nb):
        for j in range(i, nb):
            key = (
                int(ranked.block_rmax[i]),
                int(ranked.block_rmax[j]),
                bool(ranked.block_pure[i]) and bool(ranked.block_pure[j]),
                sr_cap_class(int(sr_counts[i, j]), ladder),
            )
            buckets.setdefault(key, []).append((i, j))

    w32, wparts = _wparts(hdw)
    from jax.sharding import PartitionSpec as P

    wparts_dev = _to_global(mesh, wparts, P())
    w32_dev = _to_global(mesh, w32, P())
    r_dev = _to_global(mesh, ranked.r, P())
    pos_dev = _to_global(mesh, np.asarray(ranked.pos, np.int32), P())
    valid_dev = _to_global(mesh, valid, P())
    neff_dev = _to_global(mesh, np.float32(neff), P())
    prob_dev = _to_global(
        mesh, np.float32(1.0 if lr_prob is None else lr_prob), P()
    )

    # Segment each bucket's pair list so one in-flight segment's stacked
    # scan outputs stay under the byte budget (module docstring).  The
    # per-tile output size now varies by cap class, so segment length is
    # per bucket; every segment of a bucket (including the remainder) is
    # padded to ONE length -> exactly one compiled program per bucket
    # (padding computes dead tiles at ~2 ms each, far cheaper than a
    # second ~15 s relay compile; dead rows ride the pull only for the
    # remainder segment).
    if out_budget_bytes is None:
        out_budget_bytes = _default_out_budget()

    segments: List[Tuple[Tuple[int, int, bool, int], List[Tuple[int, int]], int]] = []
    for key, plist in sorted(buckets.items(), key=lambda kv: -len(kv[1])):
        per_tile_bytes = 8 * (K + key[3]) + 32
        seg = max(1, out_budget_bytes // per_tile_bytes)
        seg = max(nsh, (seg // nsh) * nsh)
        seg = min(seg, len(plist) + ((-len(plist)) % nsh))
        for s0 in range(0, len(plist), seg):
            segments.append((key, plist[s0 : s0 + seg], seg))

    # ---- where does the SR background reduction run?
    #   "flat" (reported as sr_reduce="device"): every segment's
    #     (ladder-padded) SR outputs stay resident and the single-pass
    #     programs replicate the flat link arrays — bounded by one
    #     device's HBM budget.
    #   "part" (sr_reduce="device-part"): the grid-partitioned >HBM
    #     path (sr_reduce.py) — shard-local compaction per k2 range, so
    #     the replicated working set is one range, not the whole table.
    #     Needs nsh > 1 to reduce per-device residency.
    #   "host": pull the full SR table (the byte oracle; GB-scale pulls
    #     through the relay — warn LOUDLY when a fallback lands here).
    padded_sr_bytes = sum(8 * k[3] * p for k, _c, p in segments)
    env_budget = os.environ.get("LDW_SR_BUDGET")
    if env_budget:
        sr_budget = int(env_budget)
    else:
        from ldweaver_tpu.parallel.slabs import auto_budget

        hbm = auto_budget()
        sr_budget = int(hbm * 0.35) if hbm else (4 << 30)
    # the int32 distance key k2 = g - |2d - g| computes 2*d on device:
    # every device mode honours the overflow gate (silently wrong
    # groupings are worse than the host fallback's correctness)
    g_ok = g < (1 << 30)
    flat_fits = padded_sr_bytes <= sr_budget
    # partitioned per-device footprint: the sharded seg residency
    # (/nsh) plus transient flat locals (~3x) must fit; the replicated
    # range buffer is sized to sr_budget//2 by partition_plan
    part_possible = nsh > 1 and (padded_sr_bytes // nsh) * 3 <= sr_budget
    if not g_ok:
        sr_mode = "host"
        if sr_reduce in ("device", "part") and verbose:
            print(
                f"sr_reduce={sr_reduce!r} ignored: g >= 2^30 overflows"
                " the int32 distance key; using the host path",
                flush=True,
            )
    elif sr_reduce == "host":
        sr_mode = "host"
    elif sr_reduce == "device":
        sr_mode = "flat"  # explicit override: user accepts the budget
    elif sr_reduce == "part":
        # partitioning only reduces per-device residency with >1 device;
        # on one device honour the budget like "auto" (flat-if-fits,
        # else host) rather than silently replicating an over-budget
        # table
        if nsh > 1:
            sr_mode = "part"
        else:
            sr_mode = "flat" if flat_fits else "host"
            if verbose or sr_mode == "host":
                print(
                    f"sr_reduce='part' on a 1-device mesh: using the"
                    f" {'flat device' if flat_fits else 'HOST-pull'}"
                    " path instead (partitioning cannot reduce"
                    " per-device residency without more devices).",
                    flush=True,
                )
    else:  # auto
        sr_mode = (
            "flat" if flat_fits else ("part" if part_possible else "host")
        )
        if sr_mode == "host":
            print(
                f"WARNING: SR outputs ({padded_sr_bytes / 1e9:.1f} GB"
                f" padded) exceed the device budget"
                f" ({sr_budget / 1e9:.1f} GB) and the mesh has"
                f" {nsh} device(s): falling back to HOST-pull SR"
                " reduction — expect GB-scale device->host transfers"
                " (relay-bound).  Add devices or raise LDW_SR_BUDGET"
                " to keep the reduction on device.", flush=True,
            )
    device_reduce = sr_mode != "host"

    results: Dict[Tuple[int, int], object] = {}
    inflight: deque = deque()
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    from ldweaver_tpu.utils.relay_stats import PullRecorder, set_recorder

    pull_rec = PullRecorder()
    set_recorder(pull_rec)

    debug = os.environ.get("LDW_SPMD_DEBUG") == "1"
    t_phase = {"dispatch_s": 0.0, "pull_s": 0.0, "emit_s": 0.0}
    nclust = len(sr_links)
    # device-reduce state: per-segment kept device refs (sr_idx, sr_vals,
    # n_sr, pairs), keyed by segment index so the jit trace signature is
    # deterministic regardless of drain completion order
    seg_keep: Dict[int, tuple] = {}
    paint_dev = (
        _to_global(mesh, paint_sorted.astype(np.int32), P())
        if device_reduce else None
    )
    _EMPTY_I32 = np.zeros(0, np.int32)
    _EMPTY_F32 = np.zeros(0, np.float32)

    def _tile_emit_kw(bi: int, bj: int) -> dict:
        f_sl = slice(bi * B, (bi + 1) * B)
        t_sl = slice(bj * B, (bj + 1) * B)
        return dict(
            B=B,
            pos_f=ranked.pos[f_sl], pos_t=ranked.pos[t_sl],
            pnt_f=paint_sorted[f_sl], pnt_t=paint_sorted[t_sl],
            g=g, sr_dist=sr_dist, lr_prob=lr_prob,
            expected_sr=int(sr_counts[bi, bj]),
            sr_to_host=not device_reduce,
        )

    def _prepare(res: TileExtract, bi: int, bj: int):
        """Worker-thread tile preparation; returns (prep, None) on
        success, (None, res) when the tile needs the on-device
        retry/fallback (rare) so the main thread still has the result."""
        prep = prepare_tile_emit(
            res, K=K, nclust=nclust, **_tile_emit_kw(bi, bj)
        )
        return (prep, None) if prep is not None else (None, res)

    # one worker: the numpy-heavy emission runs while the main thread
    # blocks inside relay pulls / compiles (both release the GIL); a
    # second worker would just contend with the puller on this 2-vCPU
    # host when it is not blocked
    pool = ThreadPoolExecutor(max_workers=1)
    # The relay multiplexes device->host streams: 3 concurrent 256 MB
    # pulls measured 40 MB/s aggregate vs 9 MB/s serial (pull_s was 350 s
    # of the 663 s leg).  Two segments drain concurrently, each pulling
    # its eight output arrays (two of them large) through a shared
    # 6-stream pool.  Multi-process runs MUST instead issue their
    # collectives (the allgathers inside _pull_sharded) in one
    # deterministic order on every rank, so both pools collapse to a
    # single worker: drains execute FIFO in dispatch order, and each
    # drain's eight allgathers run serially in array order (module
    # docstring, "Collective ordering under multi-process").
    import jax

    multiproc = jax.process_count() > 1
    pull_pool = ThreadPoolExecutor(max_workers=1 if multiproc else 6)
    drain_pool = ThreadPoolExecutor(max_workers=1 if multiproc else 2)
    # dedicated worker for the on-device SR reduction so it never queues
    # behind tile-prepare jobs on `pool`
    bg_pool = ThreadPoolExecutor(max_workers=1)
    pending_drains: deque = deque()

    # segment-granular resume (multi-process runs skip it: per-host disk
    # state cannot be assumed shared or consistent across ranks)
    # device-mode LR drains group this many segments per pull (round
    # trips are the dominant and most variable relay cost; the byte-cap
    # flush below still bounds un-pulled HBM at ~out_budget, so the
    # count cap can be generous — at the bench shape 32 turns 3 pulls
    # into 1); 1 restores strict per-segment pulls (and the tightest
    # crash granularity)
    pull_chunk = max(1, int(os.environ.get("LDW_SPMD_PULL_CHUNK", "32")))
    chunk_pend: list = []
    chunk_bytes = 0
    seg_ckpt = None
    if checkpoint_dir and not multiproc:
        # the plan must fingerprint the DATA, not just the shapes: a
        # genotype correction that leaves every block's rank max, purity
        # flag and pow-4 SR cap class unchanged would otherwise replay a
        # stale run's MI arrays silently.  crc32 streams ~1 GB/s, so
        # this costs ~0.1 s at the bench shape (only when checkpointing)
        import zlib

        crc = 0
        for a in (ranked.rank_codes, ranked.pos, ranked.r,
                  paint_sorted, hdw):
            crc = zlib.crc32(np.ascontiguousarray(a).view(np.uint8), crc)
        plan = repr((
            snp_data.nsnp, snp_data.nseq, g, int(sr_dist),
            float(lr_retain_links), lr_prob, B, K, k_row, int(topk_cap),
            nsh, "device" if device_reduce else "host", crc,
            [(k, tuple(c)) for k, c, _p in segments],
        ))
        seg_ckpt = _SegCheckpoint(checkpoint_dir, plan)
    seg_hits = 0

    def _emit_pulled(chunk, arrs: dict) -> None:
        """Queue per-tile emission prep from a segment's pulled arrays
        (fresh pulls and checkpoint replays share this path)."""
        n_lr, exact, row_max = arrs["n_lr"], arrs["exact"], arrs["row_max"]
        vals, idx, n_sr = arrs["vals"], arrs["idx"], arrs["n_sr"]
        for s, (bi, bj) in enumerate(chunk):
            nl = int(n_lr[s])
            ns = int(n_sr[s])
            ncand = min(nl, vals.shape[1])
            res = TileExtract(
                n_lr=nl, exact=bool(exact[s]),
                # truncate to live entries so host memory tracks actual
                # link counts, not the padded caps
                vals=vals[s, :ncand].copy(), idx=idx[s, :ncand].copy(),
                n_sr=ns,
                sr_idx=(
                    _EMPTY_I32 if device_reduce
                    else arrs["sr_idx"][s, :ns].copy()
                ),
                sr_vals=(
                    _EMPTY_F32 if device_reduce
                    else arrs["sr_vals"][s, :ns].copy()
                ),
                row_max=int(row_max[s]),
            )
            results[(bi, bj)] = pool.submit(_prepare, res, bi, bj)

    def _drain_segment(seg_i, chunk, outs, pairs_g, t_disp, pre):
        # host sr mode only (device mode drains in chunks, below)
        t0 = _time.time()
        assert pre is None  # host-mode hits never dispatch or drain
        pulled = list(pull_pool.map(_pull_sharded, outs))
        arrs = dict(zip(
            ("n_lr", "exact", "row_max", "vals", "idx", "n_sr",
             "sr_idx", "sr_vals"),
            pulled,
        ))
        if seg_ckpt is not None:
            seg_ckpt.save(seg_i, arrs)
        # overlapping drains both add their blocked wall time: pull_s is
        # an upper bound on (and without overlap equals) the pull wall
        t_phase["pull_s"] += _time.time() - t0
        if debug:
            print(
                f"  spmd segment: {len(chunk)} tiles, dispatch {t_disp:.2f}s,"
                f" pull {_time.time() - t0:.2f}s",
                flush=True,
            )
        _emit_pulled(chunk, arrs)

    def _drain_lr_chunk(items):
        """Device-mode drain of a GROUP of segments: their fused LR
        buffers (one [rows, 4+2K] u32 per segment, already resident)
        concatenate on device and cross in ONE pull.  Relay round-trip
        latency is the dominant and most VARIABLE pull cost (measured
        1.2 s/pull in one session, ~38 s/pull hours later), so the pull
        count is the only robust lever; checkpoint granularity stays
        per-segment (each slice is saved as its own npz)."""
        t0 = _time.time()
        bufs = [b for (_s, _c, b, p) in items if p is None]
        host = None
        if bufs:
            cat = (
                _build_lr_concat(mesh_key)(bufs) if len(bufs) > 1
                else bufs[0]
            )
            host = _pull_sharded(cat)
        t_phase["pull_s"] += _time.time() - t0
        if debug:
            print(
                f"  spmd chunk: {len(items)} segments, pull"
                f" {_time.time() - t0:.2f}s"
                f" ({0 if host is None else host.nbytes >> 20} MB)",
                flush=True,
            )
        off = 0
        for seg_i, chunk, buf, pre in items:
            if pre is None:
                rows = buf.shape[0]
                arrs = _unfuse_lr(host[off : off + rows], K)
                off += rows
                if seg_ckpt is not None:
                    seg_ckpt.save(seg_i, arrs)
            else:
                arrs = pre  # resume: pull skipped, dispatch rebuilt HBM
            _emit_pulled(chunk, arrs)

    def drain_one():
        pending_drains.append(drain_pool.submit(_drain_segment, *inflight.popleft()))
        # <=2 drains in flight: together with the <=2-deep dispatch queue
        # this bounds live scan outputs at 4x out_budget_bytes (see
        # _default_out_budget)
        while len(pending_drains) >= 2:
            pending_drains.popleft().result()

    def _aot_compile(key: Tuple[int, int, bool, int], padded: int):
        """AOT-compile one bucket program.  Runs on a small worker pool:
        PJRT compilation releases the GIL (and executes server-side
        through the relay, ~15-40 s per program), so compiles overlap the
        main thread's pulls instead of serialising with them — at the
        131k bench shape compilation was 382 s of the 603 s sweep.
        Falls back to the plain jit fn if AOT lowering is unavailable."""
        Rf, Rt, pure, P_cls = key
        fn = _build_spmd_bucket_sweep(
            mesh_key, B, snp_data.nseq, int(sr_dist), int(g), K,
            k_row, P_cls, Rf, Rt, 3, pure,
        )
        try:
            import jax
            from jax.sharding import NamedSharding

            shb = NamedSharding(mesh, P("b"))
            lowered = fn.lower(
                codes_dev, wparts_dev, w32_dev, r_dev, pos_dev, valid_dev,
                jax.ShapeDtypeStruct((padded, 2), np.int32, sharding=shb),
                jax.ShapeDtypeStruct((padded,), np.bool_, sharding=shb),
                neff_dev, prob_dev,
            )
            return lowered.compile()
        except Exception:
            return fn

    # compiles are process-local (no collectives), but keep them in one
    # deterministic order under multi-process as cheap insurance
    compile_pool = ThreadPoolExecutor(max_workers=1 if multiproc else 2)
    prog_futs = {}
    for key, _chunk, padded in segments:  # dispatch order == submit order
        if (key, padded) not in prog_futs:
            prog_futs[(key, padded)] = compile_pool.submit(
                _aot_compile, key, padded
            )

    try:
        with mesh:
            for seg_i, (key, chunk, padded) in enumerate(segments):
                pre = seg_ckpt.load(seg_i) if seg_ckpt is not None else None
                if pre is not None:
                    seg_hits += 1
                    if not device_reduce:
                        # host sr mode: everything the segment produced is
                        # on disk — skip the dispatch entirely
                        _emit_pulled(chunk, pre)
                        continue
                    # device sr mode: the scan must still run to rebuild
                    # the device-resident SR outputs, but its pulls are
                    # skipped (the relay cost) — see _drain_lr_chunk
                t0 = _time.time()
                pairs = np.zeros((padded, 2), np.int32)
                pairs[: len(chunk)] = np.asarray(chunk, np.int32)
                pair_valid = np.zeros(padded, bool)
                pair_valid[: len(chunk)] = True
                fn = prog_futs[(key, padded)].result()
                pairs_g = _to_global(mesh, _local_rows(pairs, nsh), P("b"))
                outs = fn(
                    codes_dev, wparts_dev, w32_dev, r_dev, pos_dev,
                    valid_dev, pairs_g,
                    _to_global(mesh, _local_rows(pair_valid, nsh), P("b")),
                    neff_dev, prob_dev,
                )
                t_phase["dispatch_s"] += _time.time() - t0
                if device_reduce:
                    # SR bulk NEVER leaves the device: keep the scan
                    # outputs for the on-device reduction; the tiny LR
                    # side is packed to one buffer per segment and
                    # drained in CHUNKS of pull_chunk segments — the
                    # pull count is the only lever robust to relay
                    # round-trip weather (_drain_lr_chunk)
                    seg_keep[seg_i] = (outs[6], outs[7], outs[5], pairs_g)
                    buf = (
                        _build_lr_fuse(mesh_key)(*outs[:6])
                        if pre is None else None
                    )
                    chunk_pend.append((seg_i, chunk, buf, pre))
                    if buf is not None:
                        chunk_bytes += buf.nbytes
                    # flush on count OR bytes: a pending chunk holds at
                    # most ~out_budget of fused LR buffers, so with <=2
                    # draining chunks live fused bytes stay ~3x budget
                    # even on LR-dominated shapes (sparse SR, big K)
                    if (
                        len(chunk_pend) >= pull_chunk
                        or chunk_bytes >= out_budget_bytes
                    ):
                        items, chunk_pend = chunk_pend, []
                        chunk_bytes = 0
                        pending_drains.append(
                            drain_pool.submit(_drain_lr_chunk, items)
                        )
                        while len(pending_drains) >= 2:
                            pending_drains.popleft().result()
                    continue
                inflight.append(
                    (seg_i, chunk, outs, pairs_g, _time.time() - t0, pre)
                )
                # double buffer: keep segment s+1 enqueued while pulling s
                while len(inflight) >= 2:
                    drain_one()
            while inflight:
                drain_one()
            if chunk_pend:
                pending_drains.append(
                    drain_pool.submit(_drain_lr_chunk, chunk_pend)
                )
                chunk_pend = []

            def _submit_reduction():
                from ldweaver_tpu.parallel.sr_reduce import (
                    run_device_reduction,
                )

                segs_t = tuple(seg_keep[i] for i in range(len(segments)))
                pos_blocks = [
                    ranked.pos[i * B : (i + 1) * B][
                        valid[i * B : (i + 1) * B]
                    ]
                    for i in range(nb)
                ] if sr_mode == "part" else None
                return bg_pool.submit(
                    run_device_reduction, mesh, segs_t, pos_dev, paint_dev,
                    ranked_pos=ranked.pos, paint_sorted=paint_sorted,
                    B=B, nb=nb, g=g, sr_dist=int(sr_dist), nclust=nclust,
                    total_sr=int(sr_counts.sum()),
                    mode=sr_mode,
                    seg_chunks=[(c, p) for _k, c, p in segments],
                    pos_blocks=pos_blocks,
                    part_budget_bytes=max(sr_budget // 2, 64 << 20),
                )

            # kick off the on-device SR reduction on its own worker so
            # its compiles/pulls overlap the LR chunk drains AND the
            # emission loop (the r4 pipeline ran them back-to-back:
            # ~226 s of LR pulls then ~220 s of reduction, two serial
            # relay-bound phases for 1.5 s of device work).  Every
            # segment's SR outputs are resident once the dispatch loop
            # above finishes, so the reduction only needs the drains for
            # nothing — it can start NOW.  Single-process only:
            # multi-process must issue its cross-process collectives
            # (the drains' process_allgathers) in one deterministic
            # order on every rank, so there the reduction still waits
            # for the drains to finish.
            red_fut = None
            if device_reduce and not multiproc:
                red_fut = _submit_reduction()
            while pending_drains:  # join (+ surface exceptions of) drains
                pending_drains.popleft().result()

        if device_reduce and red_fut is None:
            red_fut = _submit_reduction()

        t_emit0 = _time.time()
        per_tile_pull = (
            (lambda k: 8 * K + 32) if device_reduce
            else (lambda k: 8 * (K + k[3]) + 32)
        )
        stats = dict(
            tiles=0, fallbacks=0, retries=0, sr_pairs=0,
            segments=len(segments), programs=len(buckets),
            seg_ckpt_hits=seg_hits,
            sr_reduce={"flat": "device", "part": "device-part"}.get(
                sr_mode, "host"
            ),
            pull_mb=round(
                sum(p * per_tile_pull(k) for k, _, p in segments) / 1e6, 1
            ),
        )
        # local single-device constants for retry/fallback dispatches
        import jax.numpy as jnp

        w32_loc = jnp.asarray(w32)
        wparts_loc = jnp.asarray(wparts)
        neff_loc = jnp.asarray(np.float32(neff))

        for bi, bj in panel_pair_order(nb, nb):
            prep, res = results.pop((bi, bj)).result()
            stats["tiles"] += 1
            if prep is not None:  # common case: committed in panel order
                stats["sr_pairs"] += commit_tile_emit(
                    prep, sr_links, lr_rows_sink
                )
                continue
            emit_kw = _tile_emit_kw(bi, bj)
            emit_kw.update(sr_links=sr_links, lr_rows_sink=lr_rows_sink)
            # the LR certificate failed, but SR compaction is exact
            # regardless: emit SR once from the PRIMARY extraction (the
            # single source — a retry/fallback program may differ at f32
            # ulp) and redo only the LR side below
            emit_tile_extract(res, K=K, parts="sr", **emit_kw)
            stats["sr_pairs"] += res.n_sr
            done = False
            if lr_prob is not None:
                # boosted-capacity retry before the full-tile transfer —
                # only when it moves fewer bytes than the B^2 f32 tile
                K2, k2 = retry_dims(res, B, lr_prob, K, k_row)
                if K2 * 8 < B * B * 4:
                    res2 = retry_tile_extract(
                        ranked, valid, bi, bj, w32_loc, wparts_loc,
                        neff_loc, g=g, sr_dist=sr_dist, lr_prob=lr_prob,
                        K2=K2, k2=k2,
                        P_sr=sr_cap_class(int(sr_counts[bi, bj]), ladder),
                    )
                    stats["retries"] += 1
                    done = emit_tile_extract(
                        res2, K=K2, parts="lr", **emit_kw
                    )
            if not done:
                stats["fallbacks"] += 1
                _fallback_full_tile(
                    ranked, valid, paint_sorted, bi, bj,
                    w32_loc, wparts_loc, neff_loc,
                    g, sr_dist, lr_prob, sr_links, lr_rows_sink,
                    emit_sr=False,
                )
        # emit_s is the emission loop alone; waiting out the (overlapped)
        # SR reduction is its own line item so the phase split stays
        # honest (the r4 artifact folded the reduction wait into emit_s
        # and made host emission look like the bottleneck)
        t_phase["emit_s"] = _time.time() - t_emit0
        t_bgw = _time.time()
        dev_sr = red_fut.result() if red_fut is not None else None
        t_phase["bg_wait_s"] = _time.time() - t_bgw
        if dev_sr is not None:
            stats.update(dev_sr.stats)
    finally:
        # exception-safe: a failure anywhere above must not leak pools —
        # ThreadPoolExecutor's atexit join could then block interpreter
        # exit on a wedged relay pull (CLAUDE.md: never kill a TPU client)
        for p in (pool, compile_pool, pull_pool, drain_pool, bg_pool):
            p.shutdown(cancel_futures=True)
        set_recorder(None)
    stats.update({k: round(v, 2) for k, v in t_phase.items()})
    stats.update(pull_rec.summary())
    if verbose or debug:
        print(
            f"SPMD sweep: {stats['tiles']} tiles over {nsh} device(s), "
            f"{stats['sr_pairs']} sr pairs, {stats['fallbacks']} fallbacks,"
            f" sr_reduce={stats['sr_reduce']},"
            f" dispatch {t_phase['dispatch_s']:.2f}s"
            f" pull {t_phase['pull_s']:.2f}s"
            f" emit {t_phase['emit_s']:.2f}s",
            flush=True,
        )
    return stats, dev_sr


def _fallback_full_tile(
    ranked, valid, paint_sorted, bi, bj, w32_dev, wparts_dev, neff_dev,
    g, sr_dist, lr_prob, sr_links, lr_rows_sink, emit_sr=True,
):
    """Exact full-tile extraction for tiles the bounded extraction cannot
    certify (same program as FastTileRunner's full-transfer fallback).
    With emit_sr=False only the LR side is emitted (the tile's SR links
    were already single-sourced from the primary extraction)."""
    if not emit_sr:
        sr_links = [[] for _ in sr_links]  # discard SR appends
    import jax.numpy as jnp

    from ldweaver_tpu.core.sweep import _emit_pairs

    B = ranked.block
    f_sl = slice(bi * B, (bi + 1) * B)
    t_sl = slice(bj * B, (bj + 1) * B)
    r_f = ranked.r[f_sl]
    r_t = ranked.r[t_sl]
    pure = bool(ranked.block_pure[bi]) and bool(ranked.block_pure[bj])
    fn = _build_rank_tile(B, B, int(r_f.max()), int(r_t.max()), 3, pure=pure)
    slab_f = jnp.asarray(np.ascontiguousarray(ranked.rank_codes[:, f_sl].T))
    slab_t = jnp.asarray(np.ascontiguousarray(ranked.rank_codes[:, t_sl].T))
    mi = np.asarray(
        fn(slab_f, slab_t, w32_dev, wparts_dev,
           np.asarray(r_f, np.float32), np.asarray(r_t, np.float32),
           neff_dev),
        np.float64,
    )
    val_f = valid[f_sl]
    val_t = valid[t_sl]
    if bi == bj:
        fii, fjj = np.tril_indices(B, -1)
        fii = fii.astype(np.int32)
        fjj = fjj.astype(np.int32)
    else:
        fii = np.repeat(np.arange(B, dtype=np.int32), B)
        fjj = np.tile(np.arange(B, dtype=np.int32), B)
    okm = val_f[fii] & val_t[fjj]
    fii, fjj = fii[okm], fjj[okm]
    if fii.size:
        _emit_pairs(
            fii, fjj, mi[fii, fjj],
            ranked.pos[f_sl], ranked.pos[t_sl],
            paint_sorted[f_sl], paint_sorted[t_sl],
            g, sr_dist, lr_prob, sr_links, lr_rows_sink,
        )
