"""Multi-device sharded MI sweep.

The reference is single-host (OpenMP + BLAS threads only - SURVEY.md
section 2.4); the TPU-native scaling axis is the nsnp x nsnp pair space:

  * the SNP code tensor, weights and per-site stats are REPLICATED,
  * the list of block-pairs is SHARDED over a 1-D device mesh ('b'),
  * each device scans its local pairs with `lax.scan`, computing one
    [B, B] MI tile per pair entirely on device,
  * per-tile reductions (long-range top-k candidates + MI histograms for
    the distance-decay background model) are merged across the mesh with
    XLA collectives (all_gather + top_k, psum), so only O(k) scalars ever
    leave the device.

This mirrors the reference's streaming LR retention
(R/computePairwiseMI.R:347-364) as a collective top-k merge, and its
per-distance q95 statistics (R/computePairwiseMI.R:422) as psum'd
histograms.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np


_MESH_CACHE: dict = {}


def get_mesh(n_devices: Optional[int] = None):
    """1-D 'b' mesh over the (first n_devices) local devices.  Memoized
    per device tuple so repeat callers (BLK4 Hamming, BLK5 sweep, the SR
    reduction) share ONE Mesh object — id()-keyed caches like
    spmd_sweep._PREP_CACHE depend on that identity."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    key = tuple(id(d) for d in devs)
    mesh = _MESH_CACHE.get(key)
    if mesh is None:
        mesh = Mesh(np.array(devs), axis_names=("b",))
        _MESH_CACHE[key] = mesh
    return mesh


def pad_snp_tensor(codes: np.ndarray, pos: np.ndarray, r: np.ndarray,
                   uqe: np.ndarray, block: int):
    """Pad the SNP axis to a multiple of `block`.  Padded sites get code 5
    (matches no allele -> empty one-hot rows), uq=0 (gates every term to
    zero) and a huge sentinel position."""
    nseq, nsnp = codes.shape
    npad = (-nsnp) % block
    if npad:
        codes = np.concatenate(
            [codes, np.full((nseq, npad), 5, dtype=codes.dtype)], axis=1
        )
        # sentinel position 0: padded sites are excluded by `valid`, the
        # value only has to keep the int32 mod arithmetic well-defined
        pos = np.concatenate([pos, np.zeros(npad, dtype=pos.dtype)])
        r = np.concatenate([r, np.ones(npad, dtype=r.dtype)])
        uqe = np.concatenate([uqe, np.zeros((npad, 5), dtype=uqe.dtype)])
    valid = np.arange(codes.shape[1]) < nsnp
    return codes, pos, r, uqe, valid


def block_pair_list(nsnp_padded: int, block: int) -> np.ndarray:
    """Upper-triangular block pairs [(bi, bj)] (make_blocks equivalent,
    R/computePairwiseMI.R:147-165) over the padded SNP axis."""
    nb = nsnp_padded // block
    return np.array(
        [(i, j) for i in range(nb) for j in range(i, nb)], dtype=np.int32
    )


def pad_pairs(pairs: np.ndarray, n_shards: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pad the pair list to a multiple of the mesh size; padded entries are
    marked invalid and contribute nothing."""
    p = (-len(pairs)) % n_shards
    valid = np.ones(len(pairs) + p, dtype=bool)
    if p:
        pairs = np.concatenate([pairs, np.zeros((p, 2), dtype=pairs.dtype)])
        valid[-p:] = False
    return pairs, valid


def _split_bf16(w32, terms: int):
    """Split a float32 vector into `terms` bfloat16 pieces whose f32 sum
    reconstructs ~8*terms mantissa bits.  One-hot slabs are exact in bf16,
    so weighted contingency counts from bf16 MXU passes with f32
    accumulation recover near-f32 precision at bf16 matmul rate (the MXU
    is ~8x faster in bf16 than emulated-f32 on v5e)."""
    import jax.numpy as jnp

    parts = []
    resid = w32
    for _ in range(terms):
        p = resid.astype(jnp.bfloat16)
        parts.append(p)
        resid = resid - p.astype(jnp.float32)
    return parts


def _contingency_dot(codes_f, codes_t, w32, x, y, precision: str):
    """Weighted contingency counts n_XY = sum_s w_s 1[f=x] 1[t=y] for one
    allele pair, as MXU matmul(s).  precision:
      'bf16'   - single bf16 pass (weights rounded to 8 mantissa bits)
      'bf16x3' - 3-term bf16 split of w, f32 accumulation (~f32 exact)
      'f32'    - float32 with Precision.HIGHEST (slow emulated path)
    """
    import jax
    import jax.numpy as jnp

    if precision == "f32":
        lhs = (codes_f == x).astype(jnp.float32) * w32
        rhs = (codes_t == y).astype(jnp.float32)
        return jax.lax.dot(
            lhs, rhs.T, precision=jax.lax.Precision.HIGHEST
        )
    rhs = (codes_t == y).astype(jnp.bfloat16)
    terms = 1 if precision == "bf16" else 3
    onehot_f = codes_f == x
    acc = None
    for wp in _split_bf16(w32, terms):
        lhs = jnp.where(onehot_f, wp, jnp.bfloat16(0))
        d = jax.lax.dot(lhs, rhs.T, preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    return acc


def _tile_mi(codes_f, codes_t, w, r_f, r_t, uq_f, uq_t, neff,
             precision: str = "bf16x3"):
    """On-device MI tile; same math as core.mi.mi_tile_jax but taking
    already-sliced operands (used inside scan bodies).  RXY uses the
    square-tile compat aliasing 0.25*r_f[t]*r_t[f] (valid because padded
    blocks are uniform B x B - see core/mi.py docstring)."""
    import jax.numpy as jnp

    f32 = jnp.float32
    w32 = w.astype(f32)
    rf32 = r_f.astype(f32)
    rt32 = r_t.astype(f32)
    den = neff + 0.5 * jnp.outer(rf32, rt32)
    rxy = 0.25 * jnp.outer(rt32, rf32)  # square-tile aliasing (compat)
    mi = jnp.zeros((codes_f.shape[0], codes_t.shape[0]), dtype=f32)
    pX = [((codes_f == a).astype(f32) * w32).sum(axis=1) for a in range(5)]
    pY = [((codes_t == a).astype(f32) * w32).sum(axis=1) for a in range(5)]
    for x in range(5):
        pxr = pX[x] * (0.5 * rf32)
        for y in range(5):
            pxy = _contingency_dot(codes_f, codes_t, w32, x, y, precision) + 0.5
            denom = (
                jnp.outer(pX[x], pY[y])
                + rxy
                + pxr[:, None]
                + (pY[y] * (0.5 * rt32))[None, :]
            )
            uq = jnp.outer(uq_f[:, x], uq_t[:, y]).astype(f32)
            mi = mi + uq * pxy / den * jnp.log(pxy / denom * den)
    return mi


def build_sharded_sweep(
    mesh,
    block: int,
    nseq: int,
    sr_dist: int,
    g: int,
    topk: int,
    hist_bins: int = 256,
    hist_max: float = 4.0,
    precision: str = "bf16x3",
):
    """Compile the sharded sweep step.

    Returns fn(codes, w, r, uqe, pos, valid, pairs, pair_valid, neff) ->
      (topk_vals, topk_flat_idx, hist) where
      * topk_* are the globally merged top-k long-range MI candidates
        (flat_idx encodes pair_slot * B*B + i * B + j),
      * hist is the psum'd histogram of short-range MI values (background
        model statistics).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map

    nsh = mesh.devices.size

    def local_sweep(codes, w, r, uqe, pos, valid, pairs, pair_valid, neff):
        # pairs: [P_local, 2]; everything else replicated
        def body(carry, inp):
            hist = carry
            pair, pvalid, pslot = inp
            fs = pair[0] * block
            ts = pair[1] * block
            codes_f = jax.lax.dynamic_slice(
                codes, (0, fs), (nseq, block)
            ).T
            codes_t = jax.lax.dynamic_slice(
                codes, (0, ts), (nseq, block)
            ).T
            r_f = jax.lax.dynamic_slice(r, (fs,), (block,))
            r_t = jax.lax.dynamic_slice(r, (ts,), (block,))
            uq_f = jax.lax.dynamic_slice(uqe, (fs, 0), (block, 5))
            uq_t = jax.lax.dynamic_slice(uqe, (ts, 0), (block, 5))
            pos_f = jax.lax.dynamic_slice(pos, (fs,), (block,))
            pos_t = jax.lax.dynamic_slice(pos, (ts,), (block,))
            val_f = jax.lax.dynamic_slice(valid, (fs,), (block,))
            val_t = jax.lax.dynamic_slice(valid, (ts,), (block,))

            mi = _tile_mi(codes_f, codes_t, w, r_f, r_t, uq_f, uq_t, neff,
                          precision=precision)

            ii = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
            same_block = pair[0] == pair[1]
            # diagonal blocks: i > j; off-diagonal: i != j (reference
            # emission rule, R/computePairwiseMI.R:306-310)
            tri = jnp.where(same_block, ii > jj, ii != jj)
            ok = (
                tri
                & val_f[:, None]
                & val_t[None, :]
                & pvalid
            )
            # exact int32 circular distance, then the half-integral part
            # in f32 (R/computePairwiseMI.R:330)
            d = jnp.mod(pos_t[None, :] - pos_f[:, None], g)
            lens = 0.5 * g - jnp.abs(d.astype(jnp.float32) - 0.5 * g)

            lr_ok = ok & (lens > sr_dist)
            sr_ok = ok & (lens <= sr_dist)

            # two-stage top-k (row-wise then merged) - a flat top_k over
            # B*B elements is O(n*k) and would dominate the sweep
            masked = jnp.where(lr_ok, mi, -jnp.inf)
            k_row = min(64, block, topk)
            row_vals, row_idx = jax.lax.top_k(masked, k_row)
            rows = jax.lax.broadcasted_iota(jnp.int32, (block, k_row), 0)
            flat_rc = rows * block + row_idx
            vals, sel = jax.lax.top_k(
                row_vals.ravel(), min(topk, block * k_row)
            )
            idx = flat_rc.ravel()[sel]
            if vals.shape[0] < topk:  # pad to a fixed carry width
                pad = topk - vals.shape[0]
                vals = jnp.concatenate(
                    [vals, jnp.full((pad,), -jnp.inf, vals.dtype)]
                )
                idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
            # keep (pair_slot, in-tile index) separately: the flat product
            # pslot*B*B overflows int32 at scale
            slot_arr = jnp.full((topk,), pslot, dtype=jnp.int32)

            # histogram of SR MI values (for background statistics)
            binw = hist_max / hist_bins
            b = jnp.clip((mi / binw).astype(jnp.int32), 0, hist_bins - 1)
            hist = hist + jnp.zeros(hist_bins, jnp.int32).at[
                jnp.where(sr_ok, b, hist_bins - 1).ravel()
            ].add(jnp.where(sr_ok, 1, 0).ravel())
            return hist, (vals, slot_arr, idx)

        # GLOBAL pair slot = shard_index * local_count + local_index, so
        # host-side decoding indexes the global pair list
        my_shard = jax.lax.axis_index("b")
        slots = (
            my_shard * pairs.shape[0]
            + jax.lax.broadcasted_iota(
                jnp.int32, (pairs.shape[0], 1), 0
            ).squeeze(-1)
        )
        # the carry becomes device-varying inside shard_map - mark it so
        hist0 = jax.lax.pcast(jnp.zeros(hist_bins, jnp.int32), ("b",), to="varying")
        hist, (vals, slot_arrs, idxs) = jax.lax.scan(
            body, hist0, (pairs, pair_valid, slots)
        )
        # local top-k over all local pairs
        lv, li = jax.lax.top_k(vals.ravel(), topk)
        ls = slot_arrs.ravel()[li]
        lx = idxs.ravel()[li]
        # collective merge over ICI: all_gather candidates, re-top-k
        gv = jax.lax.all_gather(lv, "b").ravel()
        gs = jax.lax.all_gather(ls, "b").ravel()
        gx = jax.lax.all_gather(lx, "b").ravel()
        mv, mi_ = jax.lax.top_k(gv, topk)
        ms = gs[mi_]
        mx = gx[mi_]
        hist = jax.lax.psum(hist, "b")
        return mv, ms, mx, hist

    fn = shard_map(
        local_sweep,
        mesh=mesh,
        in_specs=(  # noqa: C408

            P(),  # codes
            P(),  # w
            P(),  # r
            P(),  # uqe
            P(),  # pos
            P(),  # valid
            P("b"),  # pairs
            P("b"),  # pair_valid
            P(),  # neff
        ),
        out_specs=(P(), P(), P(), P()),
        # ms/mx are value-replicated (same all_gather+top_k result on every
        # device) but the VMA checker cannot infer it through the gather
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_lr_topk(
    snp_data,
    hdw: np.ndarray,
    block: int = 512,
    sr_dist: int = 20000,
    topk: int = 1024,
    n_devices: Optional[int] = None,
):
    """Host-facing driver: run the full sharded sweep and return the
    global long-range top-k links as (pos1, pos2, MI) numpy arrays."""
    import jax.numpy as jnp

    mesh = get_mesh(n_devices)
    nsh = mesh.devices.size
    codes, pos, r, uqe, valid = pad_snp_tensor(
        snp_data.codes, snp_data.pos, snp_data.r, snp_data.uqe, block
    )
    pairs = block_pair_list(codes.shape[1], block)
    pairs, pair_valid = pad_pairs(pairs, nsh)
    fn = build_sharded_sweep(
        mesh, block, snp_data.nseq, sr_dist, snp_data.g, topk
    )
    neff = np.float32(np.asarray(hdw, np.float64).sum())
    with mesh:
        mv, ms, mx, hist = fn(
            jnp.asarray(codes),
            jnp.asarray(hdw, jnp.float32),
            jnp.asarray(r, jnp.float32),
            jnp.asarray(uqe, jnp.float32),
            jnp.asarray(pos, jnp.int32),
            jnp.asarray(valid),
            jnp.asarray(pairs),
            jnp.asarray(pair_valid),
            jnp.asarray(neff),
        )
    mv = np.asarray(mv)
    ms = np.asarray(ms).astype(np.int64)
    mx = np.asarray(mx).astype(np.int64)
    keep = np.isfinite(mv)
    mv, ms, mx = mv[keep], ms[keep], mx[keep]
    ii = mx // block
    jj = mx % block
    bi = pairs[ms, 0].astype(np.int64)
    bj = pairs[ms, 1].astype(np.int64)
    pos2 = pos[bi * block + ii]  # from side
    pos1 = pos[bj * block + jj]  # to side (reference orientation)
    return pos1, pos2, mv, np.asarray(hist)
