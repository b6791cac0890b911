"""Rank-compacted, r-stratified MI sweep - the speed-of-light fast path.

Two structural observations cut the reference's 25-matmul / 25-log
per-block-pair cost (R/computePairwiseMI.R:270-298) by an order of
magnitude:

  1. **Allele-rank compaction.** The MI statistic is permutation-
     invariant over allele identity: it only consumes the contingency
     counts n_XY, the marginals n_X, the distinct-allele counts r and the
     presence gates uq (section 2.3 of SURVEY.md).  Re-encoding each
     site's alleles by frequency rank (0 = major allele) compresses the
     5-allele axis to the site's actual r <= 5 alleles with no loss.

  2. **Marginal closure.** sum_y n_XY = n_X exactly (every sequence
     carries exactly one allele class per site), so the last rank row and
     column of each contingency tile derive from the marginals: only
     (r_f - 1) * (r_t - 1) contingency matmuls are needed.

Stratifying SNPs by r (a stable sort) makes blocks r-homogeneous, so each
block-pair compiles with static (Rf, Rt): a biallelic x biallelic tile -
the dominant case in real data - needs ONE matmul and 4 log terms instead
of 25 and 25.

Parity note: this fast path intentionally diverges from two reference
quirks (use parallel/sweep.py or the core engine for exact compat):
  * block composition differs (r-stratified vs contiguous), so the
    per-block LR retention quantiles differ slightly;
  * off-diagonal block pairs keep their in-block-diagonal pairs (the
    reference silently drops them, R/computePairwiseMI.R:309) and RXY is
    the mathematically-intended 0.25*r_f*r_t (not the transposed alias).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import numpy as np


# --------------------------------------------------------------------------
# Host-side rank compaction + stratification
# --------------------------------------------------------------------------
@dataclasses.dataclass
class RankedSnps:
    rank_codes: np.ndarray  # [nseq, nsnp] uint8 (0..r-1, sorted by r)
    pos: np.ndarray  # [nsnp] permuted genome positions
    r: np.ndarray  # [nsnp] permuted distinct-allele counts (ascending)
    perm: np.ndarray  # sorted-order -> original-site index
    block: int
    block_rmax: np.ndarray  # [nb] max r within each block
    # True where every VALID (non-pad) site of the block has r == rmax;
    # such blocks qualify for the telescoped pure-r epilogue (pad rows
    # then hold garbage-but-finite values, masked out downstream)
    block_pure: np.ndarray = None


def rank_encode(codes: np.ndarray, acgtn_table: np.ndarray) -> np.ndarray:
    """Map each site's alleles to frequency ranks (0 = most frequent;
    count ties broken by allele index, deterministic)."""
    nseq, nsnp = codes.shape
    # order alleles per site by (-count, allele); rank_of[site, allele]
    order = np.argsort(
        -(acgtn_table.T * 8 - np.arange(5)[None, :]), axis=1, kind="stable"
    )  # [nsnp, 5] allele ids in rank order
    rank_of = np.empty((nsnp, 5), dtype=np.uint8)
    np.put_along_axis(
        rank_of, order, np.arange(5, dtype=np.uint8)[None, :].repeat(nsnp, 0), axis=1
    )
    return rank_of[np.arange(nsnp)[None, :], codes]


def stratify(
    codes: np.ndarray,
    acgtn_table: np.ndarray,
    pos: np.ndarray,
    r: np.ndarray,
    block: int,
) -> RankedSnps:
    """Rank-encode + stable-sort sites by r + pad to a block multiple.

    Padded sites get r=1 (single-allele: every contingency count lands in
    rank 0 and the uq gate x<r kills all but the (0,0) term, whose
    pxy/denom ratio contributes log(~1) ~ 0 ... they are additionally
    masked out by `valid` downstream)."""
    rank_codes = rank_encode(codes, acgtn_table)
    perm = np.argsort(r, kind="stable")
    rank_codes = np.ascontiguousarray(rank_codes[:, perm])
    pos_s = pos[perm]
    r_s = r[perm].astype(np.int32)

    nsnp = pos_s.size
    npad = (-nsnp) % block
    if npad:
        nseq = codes.shape[0]
        rank_codes = np.concatenate(
            [rank_codes, np.zeros((nseq, npad), np.uint8)], axis=1
        )
        pos_s = np.concatenate([pos_s, np.zeros(npad, pos_s.dtype)])
        r_s = np.concatenate([r_s, np.ones(npad, np.int32)])
    nb = rank_codes.shape[1] // block
    block_rmax = np.array(
        [int(r_s[i * block : (i + 1) * block].max()) for i in range(nb)],
        dtype=np.int32,
    )
    block_pure = np.array(
        [
            bool(
                (r_s[i * block : min((i + 1) * block, nsnp)] == block_rmax[i]).all()
            )
            for i in range(nb)
        ],
        dtype=bool,
    )
    return RankedSnps(
        rank_codes=rank_codes,
        pos=pos_s,
        r=r_s,
        perm=perm,
        block=block,
        block_rmax=block_rmax,
        block_pure=block_pure,
    )


def _wparts(w, terms: int = 3):
    """(w_f32, stacked bf16 split terms) for the contingency matmuls."""
    import jax.numpy as jnp

    w32 = np.asarray(w, np.float32)
    parts = []
    resid = w32.copy()
    for _ in range(terms):
        p = resid.astype(jnp.bfloat16)
        parts.append(np.asarray(p))
        resid = resid - np.asarray(p, np.float32)
    return w32, np.stack(parts)


# --------------------------------------------------------------------------
# Rank-compacted MI tile (static Rf, Rt)
# --------------------------------------------------------------------------
def _rank_tile_mi(codes_f, codes_t, w32, wparts, r_f, r_t, neff, Rf, Rt,
                  precision_terms: int, pure: bool = False):
    """[B,B] MI tile over rank codes with (Rf-1)(Rt-1) matmuls.

    uq gating is implicit: rank x occurs iff x < r(site), so the gate is
    (x < r_f) outer (y < r_t).

    pure=True (every VALID site has r == Rf / Rt; see RankedSnps.block_pure)
    switches to the telescoped epilogue: with constant r the denominator
    factorizes, denom_xy = (pX[x] + 0.5*Rt) * (pY[y] + 0.5*Rf), and the
    closure identity sum_y pxy = pX[x] + 0.5*Rt collapses the log-
    decomposed sum to

        MI*den = sum_xy pxy*log(pxy)              # only matrix-logs left
               - sum_x Lx[x]*(pX[x] + 0.5*Rt)     # row vector
               - sum_y Ly[y]*(pY[y] + 0.5*Rf)     # col vector
               + den*log(den),  den = neff + 0.5*Rf*Rt

    cutting the per-cell cost from log+div+denominator-build to log+mul
    (measured 1.65 vs 2.00 ms/tile at B=4096, scripts/ab_epilogue.py; the
    VPU log epilogue, not the MXU dot, bounds the sweep).  Counts/pxy are
    built identically to the general path, so agreement is at the few-ulp
    level of the ~den*log(den)-magnitude aggregates (~1e-6 absolute).
    Pad rows/cols (r=1 < rmax) get garbage-but-finite values; every
    consumer masks pads via `valid` before use."""
    import jax
    import jax.numpy as jnp

    f32 = jnp.float32
    B_f, B_t = codes_f.shape[0], codes_t.shape[0]
    den = neff + 0.5 * jnp.outer(r_f, r_t)
    rxy = 0.25 * jnp.outer(r_f, r_t)

    # exact f32 marginals
    pX = [((codes_f == x).astype(f32) * w32).sum(axis=1) for x in range(Rf)]
    pY = [((codes_t == y).astype(f32) * w32).sum(axis=1) for y in range(Rt)]

    # fold the weight-split terms into ONE deeper contraction per allele
    # pair: lhs_cat [B, T*S] @ rhs tiled [B, T*S] - same FLOPs as T
    # separate dots but a single K=T*S matmul keeps the MXU pipelined
    counts: Dict[Tuple[int, int], object] = {}
    rhs1 = [(codes_t == y).astype(jnp.bfloat16) for y in range(max(Rt - 1, 1))]
    rhs_cat = [
        jnp.concatenate([rv] * precision_terms, axis=1) for rv in rhs1
    ]
    for x in range(max(Rf - 1, 1)):
        onehot_f = codes_f == x
        lhs_cat = jnp.concatenate(
            [
                jnp.where(onehot_f, wp[None, :], jnp.bfloat16(0))
                for wp in wparts[:precision_terms]
            ],
            axis=1,
        )
        for y in range(max(Rt - 1, 1)):
            counts[(x, y)] = jax.lax.dot(
                lhs_cat, rhs_cat[y].T, preferred_element_type=f32
            )

    # marginal closure for the last column / row / corner
    if Rf == 1:
        # degenerate: every from-site is monomorphic -> n_0y(f,t) = n_y(t)
        for y in range(Rt):
            counts[(0, y)] = jnp.broadcast_to(pY[y][None, :], (B_f, B_t))
    elif Rt == 1:
        for x in range(Rf):
            counts[(x, 0)] = jnp.broadcast_to(pX[x][:, None], (B_f, B_t))
    else:
        for x in range(Rf - 1):
            s = None
            for y in range(Rt - 1):
                s = counts[(x, y)] if s is None else s + counts[(x, y)]
            counts[(x, Rt - 1)] = pX[x][:, None] - s
        for y in range(Rt):
            s = None
            for x in range(Rf - 1):
                s = counts[(x, y)] if s is None else s + counts[(x, y)]
            counts[(Rf - 1, y)] = pY[y][None, :] - s

    if pure and Rf >= 2 and Rt >= 2:
        den_s = neff + f32(0.5 * Rf * Rt)
        logden = jnp.log(den_s)
        invden = 1.0 / den_s
        ent = jnp.zeros((B_f, B_t), f32)
        for x in range(Rf):
            for y in range(Rt):
                pxy = counts[(x, y)] + 0.5
                ent = ent + pxy * jnp.log(pxy)
        lx = jnp.zeros((B_f,), f32)
        for x in range(Rf):
            px_s = pX[x] + f32(0.5 * Rt)
            lx = lx + jnp.log(px_s) * px_s
        ly = jnp.zeros((B_t,), f32)
        for y in range(Rt):
            py_s = pY[y] + f32(0.5 * Rf)
            ly = ly + jnp.log(py_s) * py_s
        return (ent - lx[:, None] - ly[None, :] + den_s * logden) * invden

    mi = jnp.zeros((B_f, B_t), f32)
    for x in range(Rf):
        gate_x = (x < r_f).astype(f32)
        pxr = pX[x] * (0.5 * r_f)
        for y in range(Rt):
            pxy = counts[(x, y)] + 0.5
            denom = (
                jnp.outer(pX[x], pY[y])
                + rxy
                + pxr[:, None]
                + (pY[y] * (0.5 * r_t))[None, :]
            )
            uq = jnp.outer(gate_x, (y < r_t).astype(f32))
            mi = mi + uq * pxy / den * jnp.log(pxy / denom * den)
    return mi


def _tile_lr_topk(masked, block_f: int, block_t: int, topk: int):
    """Two-stage top-k of a masked [Bf, Bt] tile -> (vals, flat idx).

    A flat top_k over B*B elements is O(n*k) and dominates the sweep
    (measured 8.8 ms/tile at k=64 vs 1.8 ms for matmuls+epilogue); reduce
    per row (small tiles) or per 128-wide chunk (large tiles) first, then
    across the survivors.  Exact unless one row/chunk holds more than the
    stage-1 capacity of the global top-k within a single tile (the
    pipeline's summary path adds an exact saturation fallback)."""
    import jax
    import jax.numpy as jnp

    if block_t <= 1024:
        k_row = min(64, block_t, topk)
        row_vals, row_idx = jax.lax.top_k(masked, k_row)
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_f, k_row), 0)
        flat = rows * block_t + row_idx
        vals, sel = jax.lax.top_k(
            row_vals.ravel(), min(topk, block_f * k_row)
        )
        return vals, flat.ravel()[sel]
    # chunked-max first stage: a plain max/argmax per 128-wide chunk FUSES
    # into the epilogue's elementwise pass (measured FREE on v5e: 2.06 vs
    # 3.80 ms/tile for lax.top_k(resh, 1), scripts/ab_stage1_reduce.py);
    # identical semantics incl. first-index tie breaking.  Candidates are
    # sparse at scale so one-per-chunk loses nothing.
    C = 128
    pad = (-block_t) % C  # non-multiple blocks (round_blk_sz gives 1000s)
    if pad:
        masked = jnp.pad(masked, ((0, 0), (0, pad)),
                         constant_values=-jnp.inf)
    nch = (block_t + pad) // C
    resh = masked.reshape(block_f, nch, C)
    c_vals = resh.max(axis=-1)
    c_idx = resh.argmax(axis=-1).astype(jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_f, nch), 0)
    cols = (
        jax.lax.broadcasted_iota(jnp.int32, (block_f, nch), 1) * C + c_idx
    )
    # pad-only chunks are all -inf; clamp their column so the flat index
    # stays in range (the -inf value is filtered by every consumer)
    flat = rows * block_t + jnp.minimum(cols, block_t - 1)
    vals, sel = jax.lax.top_k(c_vals.ravel(), min(topk, block_f * nch))
    return vals, flat.ravel()[sel]


@functools.lru_cache(maxsize=None)
def _build_rank_tile_summary(
    Bf: int, Bt: int, Rf: int, Rt: int, terms: int, K: int,
    nrow_cap: int, ncol_cap: int, pure: bool = False,
):
    """Jitted tile + on-device summaries, so only O(K + caps^2) bytes leave
    the device per block-pair:
      * type-7 quantile threshold over the valid long-range MI values
        (jnp.quantile's default 'linear' interpolation IS R's type 7),
      * two-stage top-K of long-range MI (vals + flat idx),
      * a gathered [nrow_cap, ncol_cap] submatrix covering the rows/cols
        that can participate in short-range pairs (host-computed indices).
    """
    import jax
    import jax.numpy as jnp

    def fn(codes_f, codes_t, w32, wparts, r_f, r_t, neff,
           pos_f, pos_t, val_f, val_t, same_block, g, sr_dist, prob,
           row_sel, col_sel):
        mi = _rank_tile_mi(
            codes_f, codes_t, w32, wparts, r_f, r_t, neff, Rf, Rt, terms,
            pure=pure,
        )
        ii = jax.lax.broadcasted_iota(jnp.int32, (Bf, Bt), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (Bf, Bt), 1)
        tri = jnp.where(same_block, ii > jj, True)
        ok = tri & val_f[:, None] & val_t[None, :]
        diff = pos_t[None, :] - pos_f[:, None]
        d = diff + jnp.where(diff < 0, g, 0)
        lens = 0.5 * g.astype(jnp.float32) - jnp.abs(
            d.astype(jnp.float32) - 0.5 * g.astype(jnp.float32)
        )
        lr_mask = ok & (lens > sr_dist)

        masked = jnp.where(lr_mask, mi, jnp.nan)
        thresh = jnp.nanquantile(masked, prob)  # type-7 interpolation
        neg = jnp.where(lr_mask, mi, -jnp.inf)
        above = neg >= thresh
        n_above = above.sum()
        # exact-saturation guards: the host falls back to a full-tile pull
        # if either the global candidate count exceeds K or any single row
        # exceeds the per-row top-k capacity
        n_row_max = above.sum(axis=1).max()
        k_row = min(16, Bt, K)
        row_vals, row_idx = jax.lax.top_k(neg, k_row)
        rows = jax.lax.broadcasted_iota(jnp.int32, (Bf, k_row), 0)
        flat = rows * Bt + row_idx
        vals, sel = jax.lax.top_k(row_vals.ravel(), min(K, Bf * k_row))
        idx = flat.ravel()[sel]
        sub = mi[row_sel][:, col_sel]
        return thresh, n_above, n_row_max, vals, idx, sub

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _build_rank_tile(Bf: int, Bt: int, Rf: int, Rt: int, terms: int,
                     pure: bool = False):
    """Jitted single rank-compacted MI tile (host-extraction pipeline path)."""
    import jax

    def fn(codes_f, codes_t, w32, wparts, r_f, r_t, neff):
        return _rank_tile_mi(
            codes_f, codes_t, w32, wparts, r_f, r_t, neff, Rf, Rt, terms,
            pure=pure,
        )

    return jax.jit(fn)


def mi_tile_rank(
    rank_codes_f: np.ndarray,
    rank_codes_t: np.ndarray,
    w: np.ndarray,
    r_f: np.ndarray,
    r_t: np.ndarray,
    neff: float,
    precision_terms: int = 3,
) -> np.ndarray:
    """Host-facing rank-compacted tile (bucketed static Rf/Rt compile)."""
    import jax
    import jax.numpy as jnp

    Rf = int(r_f.max())
    Rt = int(r_t.max())
    w32 = np.asarray(w, np.float32)
    parts = []
    resid = w32.copy()
    for _ in range(precision_terms):
        p = resid.astype(jnp.bfloat16)
        parts.append(np.asarray(p))
        resid = resid - np.asarray(p, np.float32)
    fn = _build_rank_tile(
        rank_codes_f.shape[0], rank_codes_t.shape[0], Rf, Rt, precision_terms
    )
    out = fn(
        jnp.asarray(rank_codes_f),
        jnp.asarray(rank_codes_t),
        jnp.asarray(w32),
        jnp.asarray(np.stack(parts)),
        jnp.asarray(r_f, jnp.float32),
        jnp.asarray(r_t, jnp.float32),
        jnp.asarray(np.float32(neff)),
    )
    return np.asarray(jax.device_get(out), dtype=np.float64)


@functools.lru_cache(maxsize=None)
def _build_bucket_sweep(
    mesh_key,  # id for cache keying; actual mesh passed via closure store
    block: int,
    nseq: int,
    sr_dist: int,
    g: int,
    topk: int,
    Rf: int,
    Rt: int,
    precision_terms: int,
    pure: bool = False,
):
    mesh = _MESH_STORE[mesh_key]
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    def local_sweep(codes, wparts, w32, r, pos, valid, pairs, pair_valid,
                    pslots, neff):
        def body(carry, inp):
            best_v, best_s, best_x = carry
            pair, pvalid, pslot = inp
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

            mi = _rank_tile_mi(
                codes_f, codes_t, w32, wparts, r_f, r_t, neff, Rf, Rt,
                precision_terms, pure=pure,
            )

            ii = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
            same_block = pair[0] == pair[1]
            tri = jnp.where(same_block, ii > jj, True)
            ok = tri & val_f[:, None] & val_t[None, :] & pvalid
            # branchless circular distance: positions are in [1, g] so
            # (a - b) mod g == a - b + (a < b) * g  (no integer division)
            diff = pos_t[None, :] - pos_f[:, None]
            d = diff + jnp.where(diff < 0, g, 0)
            lens = 0.5 * g - jnp.abs(d.astype(jnp.float32) - 0.5 * g)
            lr_ok = ok & (lens > sr_dist)

            masked = jnp.where(lr_ok, mi, -jnp.inf)
            vals, idx = _tile_lr_topk(masked, block, block, topk)
            npick = vals.shape[0]
            cat_v = jnp.concatenate([best_v, vals])
            cat_s = jnp.concatenate(
                [best_s, jnp.full((npick,), pslot, jnp.int32)]
            )
            cat_x = jnp.concatenate([best_x, idx])
            nv, ni = jax.lax.top_k(cat_v, topk)
            return (nv, cat_s[ni], cat_x[ni]), None

        init = (
            jax.lax.pcast(jnp.full((topk,), -jnp.inf, jnp.float32), ("b",), to="varying"),
            jax.lax.pcast(jnp.zeros((topk,), jnp.int32), ("b",), to="varying"),
            jax.lax.pcast(jnp.zeros((topk,), jnp.int32), ("b",), to="varying"),
        )
        (bv, bs, bx), _ = jax.lax.scan(
            body, init, (pairs, pair_valid, pslots)
        )
        gv = jax.lax.all_gather(bv, "b").ravel()
        gs = jax.lax.all_gather(bs, "b").ravel()
        gx = jax.lax.all_gather(bx, "b").ravel()
        mv, mi_ = jax.lax.top_k(gv, topk)
        return mv, gs[mi_], gx[mi_]

    return jax.jit(
        jax.shard_map(
            local_sweep,
            mesh=mesh,
            in_specs=(
                P(), P(), P(), P(), P(), P(), P("b"), P("b"), P("b"), P(),
            ),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    )


_MESH_STORE: Dict[int, object] = {}


@dataclasses.dataclass
class FastSweepState:
    """One-time device preparation for the fast sweep (rank-encoded SNP
    tensor resident in HBM + bucketed pair lists).  Amortised across the
    whole O(nsnp^2) sweep; prepare once, sweep many."""

    mesh: object
    mesh_key: int
    ranked: RankedSnps
    buckets: Dict[Tuple[int, int], List[Tuple[int, int]]]
    codes_dev: object
    wparts_dev: object
    w32_dev: object
    r_dev: object
    pos_dev: object
    valid_dev: object
    neff: np.float32
    block: int
    nseq: int
    g: int
    streaming: bool = False
    slab_cache: object = None  # single-device alias (first of slab_caches)
    panel: int = 0
    slab_caches: list = None  # per-device caches (streaming round-robin)
    stream_devices: list = None


def prepare_fast_sweep(
    snp_data,
    hdw: np.ndarray,
    block: int = 4096,
    n_devices: Optional[int] = None,
    hbm_budget_bytes: Optional[int] = None,
) -> FastSweepState:
    """Rank-encode + stratify + move the SNP tensor to device.

    If the rank-code tensor exceeds `hbm_budget_bytes` (e.g. 50k seqs x
    500k SNPs = 25 GB > a 16 GB v5e), the sweep switches to slab
    STREAMING: tiles are fed from an LRU device cache of [block, nseq]
    slabs in panel order (see parallel/slabs.py), so HBM holds only the
    working set while host->device traffic stays ~panel-fold below the
    naive 2-uploads-per-tile."""
    import jax.numpy as jnp

    from ldweaver_tpu.parallel.slabs import SlabCache, plan_budget
    from ldweaver_tpu.parallel.sweep import get_mesh

    from ldweaver_tpu.parallel.slabs import auto_budget

    mesh = get_mesh(n_devices)
    mesh_key = id(mesh)
    _MESH_STORE[mesh_key] = mesh

    if hbm_budget_bytes is None:
        hbm_budget_bytes = auto_budget(mesh.devices.flat[0])

    ranked = stratify(
        snp_data.codes, snp_data.acgtn_table, snp_data.pos, snp_data.r, block
    )
    nb = ranked.rank_codes.shape[1] // block
    valid = np.arange(ranked.rank_codes.shape[1]) < snp_data.nsnp

    # bucket key = (Rf, Rt, both-blocks-pure): pure pairs compile with the
    # telescoped epilogue (~18% faster/tile), mixed-r pairs keep the
    # general gated formula
    buckets: Dict[Tuple[int, int, bool], List[Tuple[int, int]]] = {}
    for i in range(nb):
        for j in range(i, nb):
            key = (
                int(ranked.block_rmax[i]),
                int(ranked.block_rmax[j]),
                bool(ranked.block_pure[i]) and bool(ranked.block_pure[j]),
            )
            buckets.setdefault(key, []).append((i, j))

    streaming, max_slabs, panel = plan_budget(
        snp_data.nseq, block, nb, hbm_budget_bytes
    )
    w32, wparts = _wparts(hdw)
    stream_devices = list(mesh.devices.flat) if streaming else None
    slab_caches = (
        [
            SlabCache(ranked.rank_codes, block, max_slabs, device=d,
                      pack=True)  # rank_encode emits 0..4
            for d in stream_devices
        ]
        if streaming
        else None
    )
    return FastSweepState(
        mesh=mesh,
        mesh_key=mesh_key,
        ranked=ranked,
        buckets=buckets,
        codes_dev=None if streaming else jnp.asarray(ranked.rank_codes),
        wparts_dev=jnp.asarray(wparts),
        w32_dev=jnp.asarray(w32),
        r_dev=jnp.asarray(ranked.r),
        pos_dev=jnp.asarray(ranked.pos, jnp.int32),
        valid_dev=jnp.asarray(valid),
        neff=np.float32(np.asarray(hdw, np.float64).sum()),
        block=block,
        nseq=snp_data.nseq,
        g=snp_data.g,
        streaming=streaming,
        slab_cache=slab_caches[0] if streaming else None,
        panel=panel,
        slab_caches=slab_caches,
        stream_devices=stream_devices,
    )


def fast_lr_topk(
    snp_data=None,
    hdw: np.ndarray = None,
    block: int = 4096,
    sr_dist: int = 20000,
    topk: int = 4096,
    n_devices: Optional[int] = None,
    precision_terms: int = 3,
    state: Optional[FastSweepState] = None,
    hbm_budget_bytes: Optional[int] = None,
):
    """Full fast sweep -> global long-range top-k (pos1, pos2, MI).

    Pass `state` from prepare_fast_sweep to skip the one-time host prep
    and transfer (e.g. when sweeping repeatedly or timing the sweep)."""
    import jax.numpy as jnp

    if state is None:
        state = prepare_fast_sweep(
            snp_data, hdw, block, n_devices, hbm_budget_bytes
        )
    if state.streaming:
        return _fast_lr_topk_streaming(
            state, sr_dist, topk, precision_terms
        )
    mesh = state.mesh
    mesh_key = state.mesh_key
    nsh = mesh.devices.size
    ranked = state.ranked
    buckets = state.buckets
    block = state.block
    codes_dev = state.codes_dev
    wparts_dev = state.wparts_dev
    w32_dev = state.w32_dev
    r_dev = state.r_dev
    pos_dev = state.pos_dev
    valid_dev = state.valid_dev
    neff = state.neff

    # dispatch every bucket asynchronously; merge the per-bucket top-k ON
    # DEVICE so a single small pull finishes the sweep (pulls through the
    # relay have high latency and would serialise the buckets)
    pending = []
    with mesh:
        for bidx, ((Rf, Rt, pure), plist) in enumerate(
            sorted(buckets.items(), key=lambda kv: -len(kv[1]))
        ):
            pairs = np.asarray(plist, np.int32)
            npad = (-len(pairs)) % nsh
            pair_valid = np.ones(len(pairs) + npad, bool)
            if npad:
                pairs = np.concatenate(
                    [pairs, np.zeros((npad, 2), np.int32)]
                )
                pair_valid[-npad:] = False
            pslots = np.arange(len(pairs), dtype=np.int32)
            fn = _build_bucket_sweep(
                mesh_key, block, state.nseq, sr_dist, state.g,
                min(topk, block * block), Rf, Rt, precision_terms, pure,
            )
            out = fn(
                codes_dev, wparts_dev, w32_dev, r_dev, pos_dev, valid_dev,
                jnp.asarray(pairs),
                jnp.asarray(pair_valid),
                jnp.asarray(pslots),
                jnp.asarray(neff),
            )
            pending.append((bidx, pairs, out))

        k_each = min(topk, block * block)
        merge = _build_topk_merge(len(pending), k_each, topk)
        flat_args = []
        for bidx, pairs, (mv_d, ms_d, mx_d) in pending:
            flat_args.extend([mv_d, ms_d, mx_d])
        fused_m = merge(*flat_args)

    fused = np.asarray(fused_m)  # ONE pull ends the sweep
    mv = np.ascontiguousarray(fused[0]).view(np.float32)
    mb = np.ascontiguousarray(fused[1]).view(np.int32).astype(np.int64)
    ms = np.ascontiguousarray(fused[2]).view(np.int32).astype(np.int64)
    mx = np.ascontiguousarray(fused[3]).view(np.int32).astype(np.int64)
    keep = np.isfinite(mv)
    mv, mb, ms, mx = mv[keep], mb[keep], ms[keep], mx[keep]
    pairs_by_bucket = {bidx: pairs for bidx, pairs, _ in pending}
    bi = np.array(
        [pairs_by_bucket[b][s, 0] for b, s in zip(mb, ms)], np.int64
    )
    bj = np.array(
        [pairs_by_bucket[b][s, 1] for b, s in zip(mb, ms)], np.int64
    )
    ii = mx // block
    jj = mx % block
    pos2 = ranked.pos[bi * block + ii]
    pos1 = ranked.pos[bj * block + jj]
    order = np.argsort(-mv, kind="stable")
    return pos1[order], pos2[order], mv[order]


# --------------------------------------------------------------------------
# Slab-streaming sweep (SNP tensor > HBM): per-tile dispatch fed by the
# SlabCache, LR top-k folded on device in chunks
# --------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _build_stream_tile(
    block: int, nseq: int, Rf: int, Rt: int, terms: int, topk: int,
    sr_dist: int, g: int, pure: bool = False,
):
    """Jitted single streaming tile: slab operands come from the cache,
    per-site arrays stay device-resident and are dynamically sliced."""
    import jax
    import jax.numpy as jnp

    def fn(codes_f, codes_t, r, pos, valid, fs, ts, w32, wparts, neff,
           same_block):
        r_f = jax.lax.dynamic_slice(r, (fs,), (block,)).astype(jnp.float32)
        r_t = jax.lax.dynamic_slice(r, (ts,), (block,)).astype(jnp.float32)
        pos_f = jax.lax.dynamic_slice(pos, (fs,), (block,))
        pos_t = jax.lax.dynamic_slice(pos, (ts,), (block,))
        val_f = jax.lax.dynamic_slice(valid, (fs,), (block,))
        val_t = jax.lax.dynamic_slice(valid, (ts,), (block,))
        mi = _rank_tile_mi(
            codes_f, codes_t, w32, wparts, r_f, r_t, neff, Rf, Rt, terms,
            pure=pure,
        )
        ii = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
        tri = jnp.where(same_block, ii > jj, True)
        ok = tri & val_f[:, None] & val_t[None, :]
        diff = pos_t[None, :] - pos_f[:, None]
        d = diff + jnp.where(diff < 0, g, 0)
        lens = 0.5 * g - jnp.abs(d.astype(jnp.float32) - 0.5 * g)
        lr_ok = ok & (lens > sr_dist)
        masked = jnp.where(lr_ok, mi, -jnp.inf)
        return _tile_lr_topk(masked, block, block, topk)

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _build_stream_merge(n_tiles: int, k_each: int, topk: int):
    """Fold a chunk of per-tile top-k results into the running global
    top-k carry, entirely on device."""
    import jax
    import jax.numpy as jnp

    def merge(bv, bt, bx, vals, tids, idxs):
        cv = jnp.concatenate([bv, vals.reshape(n_tiles * k_each)])
        ct = jnp.concatenate([bt, tids.reshape(n_tiles * k_each)])
        cx = jnp.concatenate([bx, idxs.reshape(n_tiles * k_each)])
        nv, sel = jax.lax.top_k(cv, topk)
        return nv, ct[sel], cx[sel]

    return jax.jit(merge)


def _fast_lr_topk_streaming(
    state: "FastSweepState",
    sr_dist: int,
    topk: int,
    precision_terms: int = 3,
    merge_chunk: int = 32,
):
    """Slab-streaming fast sweep: panel-ordered tiles round-robin over the
    requested devices' per-device LRU slab caches (like FastTileRunner),
    with per-device chunked top-k folding and one final cross-device
    merge + pull."""
    import jax
    import jax.numpy as jnp

    from ldweaver_tpu.parallel.slabs import panel_pair_order

    ranked = state.ranked
    B = state.block
    nb = ranked.rank_codes.shape[1] // B
    caches = state.slab_caches or [state.slab_cache]
    devices = state.stream_devices or [None]
    nd = len(caches)
    panel = state.panel
    k_each = min(topk, B * B)

    # per-device replicas of the small shared operands
    consts = [
        (
            jax.device_put(np.asarray(state.r_dev), d),
            jax.device_put(np.asarray(state.pos_dev), d),
            jax.device_put(np.asarray(state.valid_dev), d),
            jax.device_put(np.asarray(state.w32_dev), d),
            jax.device_put(np.asarray(state.wparts_dev), d),
            jax.device_put(np.float32(state.neff), d),
        )
        for d in devices
    ]
    carries = [
        (
            jax.device_put(np.full((topk,), -np.inf, np.float32), d),
            jax.device_put(np.zeros((topk,), np.int32), d),
            jax.device_put(np.zeros((topk,), np.int32), d),
        )
        for d in devices
    ]
    tile_meta: List[Tuple[int, int]] = []
    pend: List[Tuple[List, List, List]] = [([], [], []) for _ in range(nd)]

    def flush(di):
        pend_vals, pend_idx, pend_tid = pend[di]
        if not pend_vals:
            return
        m = len(pend_vals)
        merge = _build_stream_merge(m, k_each, topk)
        vals = jnp.stack(pend_vals)
        idxs = jnp.stack(pend_idx)
        tids = jax.device_put(
            np.repeat(np.asarray(pend_tid, np.int32), k_each), devices[di]
        )
        carries[di] = merge(*carries[di], vals, tids, idxs)
        pend[di] = ([], [], [])

    cur_panel = -1
    order = list(panel_pair_order(nb, panel))
    # host->device slab uploads double-buffer behind compute: the NEXT
    # tiles' slabs prefetch on a worker while the current tile's program
    # runs (VERDICT r3 next-#7 — uploads dominated the streaming leg:
    # 19 x 67 MB serial through the relay)
    from concurrent.futures import ThreadPoolExecutor

    upload_pool = ThreadPoolExecutor(max_workers=2)
    LOOKAHEAD = 2
    try:
        for rr, (bi, bj) in enumerate(order):
            p = bi // panel
            if p != cur_panel:
                cur_panel = p
                for c in caches:
                    c.unpin()
                    c.pin(range(p * panel, min((p + 1) * panel, nb)))
            di = rr % nd
            for ahead in range(1, LOOKAHEAD + 1):
                if rr + ahead < len(order):
                    nbi, nbj = order[rr + ahead]
                    if nbi // panel == cur_panel:  # stay in pinned panel
                        ca = caches[(rr + ahead) % nd]
                        ca.prefetch(nbi, upload_pool)
                        ca.prefetch(nbj, upload_pool)
            Rf = int(ranked.block_rmax[bi])
            Rt = int(ranked.block_rmax[bj])
            fn = _build_stream_tile(
                B, state.nseq, Rf, Rt, precision_terms, k_each,
                int(sr_dist), int(state.g),
                pure=bool(ranked.block_pure[bi])
                and bool(ranked.block_pure[bj]),
            )
            cf = caches[di].get(bi)
            ct = caches[di].get(bj)
            r_d, pos_d, val_d, w32_d, wparts_d, neff_d = consts[di]
            vals, idx = fn(
                cf, ct, r_d, pos_d, val_d,
                np.int32(bi * B), np.int32(bj * B),
                w32_d, wparts_d, neff_d,
                np.bool_(bi == bj),
            )
            pend_vals, pend_idx, pend_tid = pend[di]
            pend_vals.append(vals)
            pend_idx.append(idx)
            pend_tid.append(len(tile_meta))
            tile_meta.append((bi, bj))
            if len(pend_vals) >= merge_chunk:
                flush(di)
        for di in range(nd):
            flush(di)
        for c in caches:
            c.unpin()
    finally:
        # exception-safe best effort: cancel QUEUED prefetches so they
        # never start; a worker already blocked inside block_until_ready
        # on a wedged relay is still joined at interpreter exit (no way
        # to interrupt it — CLAUDE.md: never kill a TPU client).  Clear
        # each cache's pending map so a cancelled future is re-uploaded
        # as a plain miss if the cache is ever reused (SlabCache.get
        # also tolerates one directly).
        upload_pool.shutdown(wait=False, cancel_futures=True)
        for c in caches:
            c.purge_dead_pending()

    # cross-device merge: pull the nd small carries, combine on host
    mv = np.concatenate([np.asarray(c[0]) for c in carries])
    mt = np.concatenate([np.asarray(c[1]) for c in carries]).astype(np.int64)
    mx = np.concatenate([np.asarray(c[2]) for c in carries]).astype(np.int64)
    sel = np.argsort(-mv, kind="stable")[:topk]
    mv, mt, mx = mv[sel], mt[sel], mx[sel]
    keep = np.isfinite(mv)
    mv, mt, mx = mv[keep], mt[keep], mx[keep]
    meta = np.asarray(tile_meta, np.int64).reshape(-1, 2)
    bi = meta[mt, 0]
    bj = meta[mt, 1]
    ii = mx // B
    jj = mx % B
    pos2 = ranked.pos[bi * B + ii]
    pos1 = ranked.pos[bj * B + jj]
    order = np.argsort(-mv, kind="stable")
    return pos1[order], pos2[order], mv[order]


@functools.lru_cache(maxsize=None)
def _build_topk_merge(n_buckets: int, k_each: int, topk: int):
    """Device-side merge of per-bucket top-k triples -> global top-k
    (vals, bucket_id, pair_slot, in-tile idx)."""
    import jax
    import jax.numpy as jnp

    def merge(*flat):
        vs, bs, ss, xs = [], [], [], []
        for b in range(n_buckets):
            mv, ms, mx = flat[3 * b : 3 * b + 3]
            vs.append(mv)
            bs.append(jnp.full((mv.shape[0],), b, jnp.int32))
            ss.append(ms)
            xs.append(mx)
        v = jnp.concatenate(vs)
        bcat = jnp.concatenate(bs)
        s = jnp.concatenate(ss)
        x = jnp.concatenate(xs)
        out_v, sel = jax.lax.top_k(v, min(topk, v.shape[0]))
        # ONE fused u32 [4, topk] buffer: the relay charges a full round
        # trip per pull, and four small pulls were ~4x the latency of one
        # (bit-exact unpack on host via .view)
        u = lambda a: jax.lax.bitcast_convert_type(a, jnp.uint32)  # noqa: E731
        return jnp.stack([u(out_v), u(bcat[sel]), u(s[sel]), u(x[sel])])

    return jax.jit(merge)
