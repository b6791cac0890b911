"""On-device SR background reduction.

The production bottleneck after round 3 was BLK5's SR side: the sweep
pulled the full per-link SR table (1.95 GB at the 131k-SNP bench shape,
358 s through the relay) so the host background model
(`core/background.py`, reference `mergeNsort_sr_links`,
R/computePairwiseMI.R:400-495) could (1) fit the per-cluster log-log
q95-decay model and (2) score/threshold every link.  Both reduce to tiny
sufficient data:

  * the decay fit needs, per (cluster, distance) group, only the group
    COUNT and the two order statistics around rank floor((n-1)*0.95) —
    the same order-statistic interpolation trick the LR retention already
    uses (`spmd_sweep.lr_threshold_from_topk`);
  * the beta MLE + srp + dedup + cutoff consume only links with POSITIVE
    residual against the fitted curve (~5% of links), because
    `merge_and_sort_sr_links` drops `diff <= 0` rows before every f64
    reduction (R which() semantics, R/computePairwiseMI.R:449).

So the sweep's per-segment SR scan outputs now STAY on device (they are
kept alive instead of pulled), and two compiled passes replace the bulk
transfer:

  pass 1 — group statistics: circular distances are exact half-integers,
    so the int key k2 = 2*len = g - |2d - g| groups links exactly like
    the host's `_len_sort`.  Per cluster, a two-key `lax.sort`
    ((k2, monotone-f32-bits of MI)) orders every live link; group
    boundaries come from vectorised searchsorted over the static key
    grid, and the two order statistics are gathers at
    rank lo = m - ceil(m/20) (integer-exact; equals the host's
    int((n-1)*0.95) for all n < 4e16 — proven in
    tests/test_sr_reduce.py).  One ~MB pull replaces the table.
  pass 2 — candidate extraction: the host rebuilds the f64 fits from the
    pulled stats (bit-equal to the oracle: same values, same f64
    interpolation/OLS), converts them to per-(cluster, k2) f32 thresholds
    rounded DOWN (so every link with f64 diff > 0 passes the f32 filter
    — the band only ADDS rows that the strict host-side `diff > 0` later
    drops), and one compiled pass compacts the candidate links
    (gi, gj, MI) — O(candidates) bytes leave the device.

Host post-processing (`candidates_to_tables`) reorders the pulled
candidates into the CANONICAL emission order (panel tile order,
row-major within tile — exactly the per-cluster append order of the
host path) so every downstream f64 reduction (beta sufficient sums,
np pairwise summation order, srp, dedup) sees the identical value
sequence -> sr_links.tsv comes out byte-identical to the host-pull path
(`core/background.merge_and_sort_sr_links_from_candidates`).

Scale gate: this path keeps the (ladder-padded) SR scan outputs resident
in HBM, so the driver only takes it when their size fits the device
budget (`spmd_blk5_sweep` sr_reduce="auto"); beyond that the host-pull
path remains the fallback.  A key-partitioned all_to_all over the mesh
is the >HBM scaling design, not yet needed at measured shapes.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Dict, List, Optional, Tuple

import numpy as np


# --------------------------------------------------------------------------
# f32 <-> order-preserving u32 bits
# --------------------------------------------------------------------------
def _mono_u32(v):
    """Order-preserving f32 -> u32 (sign-magnitude to biased): total order
    matches IEEE numeric order, with -0.0 just below +0.0 (ties at value
    zero are arithmetic no-ops downstream; see q95 analysis in tests)."""
    import jax
    import jax.numpy as jnp

    b = jax.lax.bitcast_convert_type(v, jnp.uint32)
    top = jnp.uint32(1 << 31)
    return jnp.where(b >= top, ~b, b | top)


def _unmono_f32(u):
    import jax
    import jax.numpy as jnp

    top = jnp.uint32(1 << 31)
    b = jnp.where(u >= top, u & (top - jnp.uint32(1)), ~u)
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def rank_lo(n):
    """floor((n-1) * 0.95) via exact integer arithmetic:
    floor(19m/20) = m - ceil(m/20) with m = n-1.  Overflow-safe for
    m < 2^31 - 19 and bit-equal to the host's int((n-1)*0.95) for all
    realistic n (tests/test_sr_reduce.py::test_rank_formula)."""
    m = n - 1
    return m - (m + 19) // 20


# --------------------------------------------------------------------------
# Shared flattening of the kept per-segment scan outputs
# --------------------------------------------------------------------------
def _flat_segments(segs, pos, paint, B: int, g: int, sr_dist: int,
                   mesh=None):
    """Concatenate every segment's [rows, P_sr] SR outputs into flat
    per-link arrays (k2 distance key, MI, cluster pair, global indices,
    live mask).  Live applies the background model's STRICT
    0 < len < sr_dist filter (R/computePairwiseMI.R:417-419): k2 in
    [1, 2*sr_dist - 1].

    With a mesh, the flat arrays are constrained REPLICATED: one
    all_gather each, after which the sorts/compactions run collective-
    free on every device.  GSPMD's distributed lowering of sort/nonzero
    over the P('b')-sharded inputs is a rendezvous storm on the virtual
    CPU mesh (measured 156 s on a 1268-SNP toy) and no faster on real
    hardware at these sizes; a key-partitioned all_to_all is the >HBM
    scaling path (module docstring).  nsh == 1 — the measured chip —
    makes this a no-op."""
    import jax
    import jax.numpy as jnp

    k2s, mis, c1s, c2s, gis, gjs, lives = [], [], [], [], [], [], []
    for sr_idx, sr_vals, n_sr, pairs in segs:
        rows, P = sr_idx.shape
        live = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, P), 1)
            < n_sr[:, None]
        )
        gi = pairs[:, 0:1] * B + sr_idx // B
        gj = pairs[:, 1:2] * B + sr_idx % B
        pf = pos[gi]
        pt = pos[gj]
        diff = pt - pf
        d = diff + jnp.where(diff < 0, g, 0)
        k2 = g - jnp.abs(2 * d - g)  # == 2 * circular_len, exact integer
        live = live & (k2 >= 1) & (k2 <= 2 * sr_dist - 1)
        k2s.append(k2.ravel())
        mis.append(sr_vals.ravel())
        c1s.append(paint[gi].ravel())
        c2s.append(paint[gj].ravel())
        gis.append(gi.ravel())
        gjs.append(gj.ravel())
        lives.append(live.ravel())
    cat = jnp.concatenate
    out = (
        cat(k2s), cat(mis), cat(c1s), cat(c2s), cat(gis), cat(gjs),
        cat(lives),
    )
    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        out = tuple(
            jax.lax.with_sharding_constraint(x, rep) for x in out
        )
    return out


_DEAD = (1 << 31) - 1  # sorts after every valid k2


@functools.lru_cache(maxsize=None)
def _build_group_stats(mesh_key: int, B: int, g: int, sr_dist: int,
                       nclust: int):
    """Pass 1: per-(cluster, k2) group count + the two order statistics
    around rank floor((n-1)*0.95), all on device.  Outputs are replicated
    so multi-process hosts pull identical (tiny) arrays."""
    from ldweaver_tpu.parallel.fast_sweep import _MESH_STORE

    mesh = _MESH_STORE[mesh_key]
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fn(segs, pos, paint):
        k2, mi, c1, c2, _gi, _gj, live = _flat_segments(
            segs, pos, paint, B, g, sr_dist, mesh
        )
        mono = _mono_u32(mi)
        base = jnp.where(live, k2, _DEAD)
        grid = jnp.arange(1, 2 * sr_dist, dtype=jnp.int32)
        F = base.shape[0]
        ns, xlo, xhi = [], [], []
        for c in range(1, nclust + 1):
            member = (c1 == c) | (c2 == c)
            keyc = jnp.where(member, base, _DEAD)
            ks, vs = jax.lax.sort((keyc, mono), num_keys=2)
            starts = jnp.searchsorted(ks, grid, side="left").astype(
                jnp.int32
            )
            ends = jnp.searchsorted(ks, grid + 1, side="left").astype(
                jnp.int32
            )
            n = ends - starts
            m = n - 1
            lo = jnp.maximum(rank_lo(n), 0)
            hi = jnp.clip(lo + 1, 0, jnp.maximum(m, 0))
            i_lo = jnp.clip(starts + lo, 0, F - 1)
            i_hi = jnp.clip(starts + hi, 0, F - 1)
            ns.append(n)
            xlo.append(_unmono_f32(vs[i_lo]))
            xhi.append(_unmono_f32(vs[i_hi]))
        # one fused u32 [3, nclust, grid] buffer (counts, f32 bits of
        # x_lo/x_hi): the stats cross in a single relay round trip
        u = lambda x: jax.lax.bitcast_convert_type(  # noqa: E731
            x.astype(jnp.int32) if x.dtype != jnp.float32 else x,
            jnp.uint32,
        )
        return jnp.stack(
            [u(jnp.stack(ns)), u(jnp.stack(xlo)), u(jnp.stack(xhi))]
        )

    return jax.jit(fn, out_shardings=NamedSharding(mesh, P()))


@functools.lru_cache(maxsize=None)
def _build_cand_count(mesh_key: int, B: int, g: int, sr_dist: int,
                      nclust: int):
    """Count-only half of pass 2: the scalar candidate count, pulled
    FIRST so the compaction program's static cap can be sized from the
    true count instead of a worst-case guess (the r4 bench pulled a
    402 MB buffer for 94 MB of live candidates — 4.3x padding)."""
    from ldweaver_tpu.parallel.fast_sweep import _MESH_STORE

    mesh = _MESH_STORE[mesh_key]
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fn(segs, pos, paint, T):
        k2, mi, c1, c2, _gi, _gj, live = _flat_segments(
            segs, pos, paint, B, g, sr_dist, mesh
        )
        k2c = jnp.clip(k2, 0, 2 * sr_dist)
        keep = jnp.zeros_like(live)
        for c in range(1, nclust + 1):
            thr = T[c - 1][k2c]
            keep = keep | (((c1 == c) | (c2 == c)) & (mi >= thr))
        return (keep & live).sum(dtype=jnp.int32)

    return jax.jit(fn, out_shardings=NamedSharding(mesh, P()))


@functools.lru_cache(maxsize=None)
def _build_candidates(mesh_key: int, B: int, g: int, sr_dist: int,
                      nclust: int, cap: int):
    """Pass 2: compact every link whose MI clears ANY member cluster's
    f32-rounded-down threshold at its distance key.  `count` certifies
    the static cap; the driver retries with a bigger cap on overflow."""
    from ldweaver_tpu.parallel.fast_sweep import _MESH_STORE

    mesh = _MESH_STORE[mesh_key]
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fn(segs, pos, paint, T):
        k2, mi, c1, c2, gi, gj, live = _flat_segments(
            segs, pos, paint, B, g, sr_dist, mesh
        )
        k2c = jnp.clip(k2, 0, 2 * sr_dist)
        keep = jnp.zeros_like(live)
        for c in range(1, nclust + 1):
            thr = T[c - 1][k2c]
            keep = keep | (((c1 == c) | (c2 == c)) & (mi >= thr))
        keep = keep & live
        count = keep.sum(dtype=jnp.int32)
        (idx,) = jnp.nonzero(keep, size=cap, fill_value=0)
        # one fused [cap, 3] u32 buffer: the relay charges ~1.2 s of
        # round-trip latency per pull, so (gi, gj, mi-bits) cross
        # together; the host bit-exactly unpacks (run_device_reduction)
        u = lambda x: jax.lax.bitcast_convert_type(  # noqa: E731
            x.astype(jnp.int32) if x.dtype != jnp.float32 else x,
            jnp.uint32,
        )
        return jnp.stack([u(gi[idx]), u(gj[idx]), u(mi[idx])], 1), count

    return jax.jit(fn, out_shardings=NamedSharding(mesh, P()))


# --------------------------------------------------------------------------
# Host side: exact f64 fits from the pulled stats, thresholds, tables
# --------------------------------------------------------------------------
def fits_from_group_stats(ns: np.ndarray, xlo: np.ndarray, xhi: np.ndarray,
                          sr_dist: int) -> Dict[int, object]:
    """Per-cluster ClusterFit from the device group stats — bit-equal to
    `fit_cluster_background` over the full link multiset: the type-7 q95
    needs only (n, x_lo, x_hi) per group and f64 interpolation, and the
    log-log OLS sees the identical (uniq, q95) rows."""
    from ldweaver_tpu.core.background import _fit_from_q95

    nclust = ns.shape[0]
    grid = np.arange(1, 2 * sr_dist, dtype=np.int64)
    fits: Dict[int, object] = {}
    for ci in range(1, nclust + 1):
        n = ns[ci - 1].astype(np.int64)
        sel = n > 0
        if not sel.any():
            continue
        nn = n[sel]
        h = (nn - 1) * 0.95
        lo = np.floor(h).astype(np.int64)
        # the device gathered ranks with the integer identity; it must
        # agree with the f64 host rank for the stats to be the right
        # order statistics (proven for all n < 4e16; belt and braces)
        assert np.array_equal(lo, rank_lo(nn)), "rank identity violated"
        v_lo = xlo[ci - 1][sel].astype(np.float64)
        v_hi = xhi[ci - 1][sel].astype(np.float64)
        # n == 1 assigns v[0] directly (preserves -0.0 bit-exactly, like
        # the host oracle's special case); otherwise the oracle's interp
        q95 = np.where(nn == 1, v_lo, v_lo + (h - lo) * (v_hi - v_lo))
        uniq = grid[sel] / 2.0
        fits[ci] = _fit_from_q95(uniq, q95)
    return fits


def threshold_tables(fits: Dict[int, object], nclust: int,
                     sr_dist: int) -> np.ndarray:
    """[nclust, 2*sr_dist + 1] f32 thresholds T[c-1][k2]: the fitted
    curve at each distance key under the reference's `mean_dist[len]`
    index-by-value quirk (background.fit_lookup), rounded DOWN to f32 so
    MI >= T catches every link with f64 MI - fitted > 0.  Out-of-range
    keys (incl. the strict len == sr_dist and len <= 0 exclusions) and
    clusters without a fit get +inf (never candidates — the oracle drops
    them identically: NaN lookup -> NaN diff -> which() drops)."""
    T = np.full((nclust, 2 * sr_dist + 1), np.inf, dtype=np.float32)
    k2 = np.arange(1, 2 * sr_dist, dtype=np.int64)
    for ci, fit in fits.items():
        idx = (k2 >> 1) - 1  # trunc(len) - 1, the 1-based index quirk
        ok = (idx >= 0) & (idx < fit.fitted.size)
        v64 = fit.fitted[idx[ok]]
        v32 = v64.astype(np.float32)
        over = v32.astype(np.float64) > v64
        v32[over] = np.nextafter(v32[over], np.float32(-np.inf))
        row = np.full(2 * sr_dist + 1, np.inf, dtype=np.float32)
        row[k2[ok]] = v32
        T[ci - 1] = row
    return T


def candidates_to_tables(
    gi: np.ndarray, gj: np.ndarray, mi: np.ndarray, count: int,
    ranked_pos: np.ndarray, paint_sorted: np.ndarray,
    g: int, B: int, nb: int, nclust: int,
) -> List[object]:
    """Pulled candidates -> per-cluster LinkTables in the CANONICAL
    emission order: tiles in panel_pair_order(nb, nb), row-major within
    a tile, with the same orientation normalisation as `_emit_pairs`
    (pos2 from the row site, pos1 from the column site, swapped to
    pos1 < pos2).  This makes each cluster's candidate table an ordered
    subsequence-preserving superset of the host path's per-cluster
    concatenation, so the positive-residual restriction downstream is
    value-for-value identical."""
    from ldweaver_tpu.core.mi import LinkTable, circular_len
    from ldweaver_tpu.parallel.slabs import panel_pair_order

    gi = np.asarray(gi[:count], np.int64)
    gj = np.asarray(gj[:count], np.int64)
    mi = np.asarray(mi[:count], np.float64)
    rank = np.empty((nb, nb), np.int64)
    for t, (bi, bj) in enumerate(panel_pair_order(nb, nb)):
        rank[bi, bj] = t
    key = rank[gi // B, gj // B] * (B * B) + (gi % B) * B + (gj % B)
    o = np.argsort(key, kind="stable")
    gi, gj, mi = gi[o], gj[o], mi[o]
    pos2 = ranked_pos[gi]
    pos1 = ranked_pos[gj]
    c2 = paint_sorted[gi]
    c1 = paint_sorted[gj]
    swap = pos1 > pos2
    pos1_n = np.where(swap, pos2, pos1)
    pos2_n = np.where(swap, pos1, pos2)
    c1_n = np.where(swap, c2, c1)
    c2_n = np.where(swap, c1, c2)
    lens = circular_len(pos1_n, pos2_n, g)
    tables = []
    for c in range(1, nclust + 1):
        m = (c1_n == c) | (c2_n == c)
        tables.append(
            LinkTable(
                pos1=pos1_n[m], pos2=pos2_n[m], clust1=c1_n[m],
                clust2=c2_n[m], len=lens[m], MI=mi[m],
            )
        )
    return tables


# --------------------------------------------------------------------------
# Driver
# --------------------------------------------------------------------------
@dataclasses.dataclass
class DeviceSrReduction:
    """Everything `merge_and_sort_sr_links_from_candidates` needs."""

    fits: Dict[int, object]
    tables: List[object]
    stats: Dict[str, float]


def _next_pow2(n: int, lo: int = 1 << 14) -> int:
    return max(lo, 1 << int(np.ceil(np.log2(max(n, 1)))))


def run_device_reduction(
    mesh, segs, pos_dev, paint_dev, *,
    ranked_pos: np.ndarray, paint_sorted: np.ndarray,
    B: int, nb: int, g: int, sr_dist: int, nclust: int, total_sr: int,
    cap0: Optional[int] = None,
) -> DeviceSrReduction:
    """Run both device passes + the host fit, returning candidate tables
    in canonical order.  Safe to call from a worker thread (pure jax
    dispatch + pulls + numpy); collectives live INSIDE the compiled
    programs, issued in one deterministic order."""
    from ldweaver_tpu.parallel.fast_sweep import _MESH_STORE

    mesh_key = id(mesh)
    _MESH_STORE[mesh_key] = mesh
    stats: Dict[str, float] = {}
    from ldweaver_tpu.core.mi import LinkTable

    if total_sr == 0 or not segs:
        empty = [
            LinkTable(*(np.zeros(0, np.int64),) * 4,
                      np.zeros(0), np.zeros(0))
            for _ in range(nclust)
        ]
        return DeviceSrReduction(fits={}, tables=empty, stats=stats)

    t0 = time.time()
    stats_fn = _build_group_stats(mesh_key, B, int(g), int(sr_dist), nclust)
    sbuf = np.asarray(stats_fn(segs, pos_dev, paint_dev))  # ONE pull
    ns = sbuf[0].astype(np.int32)
    xlo = sbuf[1].copy().view(np.float32)
    xhi = sbuf[2].copy().view(np.float32)
    stats["bg_stats_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    fits = fits_from_group_stats(ns, xlo, xhi, sr_dist)
    T = threshold_tables(fits, nclust, sr_dist)
    stats["bg_fit_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    # count first (a scalar pull), then compact at a cap sized from the
    # TRUE count: pow2 rounding bounds pull padding at 2x, vs the 4-8x a
    # worst-case 12.5%-of-links guess paid (402 MB pulled for 94 MB live
    # at the r4 bench shape).  The count program's compile is a one-off
    # amortised by the persistent compile cache.
    if cap0:
        cap = cap0
    else:
        count_fn = _build_cand_count(mesh_key, B, int(g), int(sr_dist),
                                     nclust)
        pre_count = int(np.asarray(count_fn(segs, pos_dev, paint_dev, T)))
        stats["cand_precount_s"] = round(time.time() - t0, 2)
        cap = _next_pow2(pre_count)
    retries = 0
    while True:
        cand_fn = _build_candidates(
            mesh_key, B, int(g), int(sr_dist), nclust, cap
        )
        buf_d, cnt_d = cand_fn(segs, pos_dev, paint_dev, T)
        count = int(np.asarray(cnt_d))
        if count <= cap:
            break
        cap = _next_pow2(count)
        retries += 1
    buf = np.asarray(buf_d)  # ONE pull carries (gi, gj, mi bits)
    gi = buf[:, 0].astype(np.int32)
    gj = buf[:, 1].astype(np.int32)
    mi = np.ascontiguousarray(buf[:, 2]).view(np.float32)
    stats["bg_cand_s"] = round(time.time() - t0, 2)
    stats["cand_count"] = count
    stats["cand_mb"] = round(12 * cap / 1e6, 1)
    stats["cand_retries"] = retries

    t0 = time.time()
    tables = candidates_to_tables(
        gi, gj, mi, count, ranked_pos, paint_sorted, g, B, nb, nclust
    )
    stats["bg_order_s"] = round(time.time() - t0, 2)
    return DeviceSrReduction(fits=fits, tables=tables, stats=stats)
