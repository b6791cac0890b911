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

Scale gate: the single-pass programs above REPLICATE the flat link
arrays, so `spmd_blk5_sweep` takes them only when they fit one device's
budget.  Past that, on a multi-device mesh, the GRID-PARTITIONED path
(mode="part", round 5) splits the k2 grid into ranges sized from exact
host-side counts, compacts each range SHARD-LOCALLY (no replication)
and sorts at range scale — byte-identical outputs by construction
(disjoint exhaustive ranges preserve every group multiset;
tests/test_sr_reduce.py::test_partitioned_reduce_byte_identical).  Only
when neither fits does the host-pull fallback remain, and it warns
loudly.
"""

from __future__ import annotations

import dataclasses
import functools
import os
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
    hardware at these sizes; the grid-partitioned shard-local passes are
    the >HBM scaling path (module docstring).  nsh == 1 — the measured
    chip — makes this a no-op."""
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
# >HBM scale path: grid-partitioned reduction over the mesh.
#
# The single-pass programs above REPLICATE the flat link arrays on every
# device (the all_gather in _flat_segments) because GSPMD's distributed
# sort is a rendezvous storm; that caps the device path at flat arrays
# that fit one device's HBM.  Past that, the k2 grid [1, 2*sr_dist) is
# split into contiguous RANGES sized from exact host-side counts (every
# link's distance key is a pure function of the static positions), and
# each range runs two steps:
#   (a) a shard_map'd pass where each device compacts ITS OWN row shard's
#       links in the range into a host-proven cap — no replication, no
#       collectives;
#   (b) the same sort + order-statistics program as the single-pass path,
#       over the compacted range only (replicated, but now bounded by the
#       range size, not the whole table).
# Group multisets are identical to the single-pass path (ranges are
# disjoint and exhaustive), so the fits — and therefore sr_links.tsv —
# stay byte-identical to the host-pull oracle.  Candidate extraction
# needs no ranges at all: its compaction is shard-local (order is
# irrelevant — candidates_to_tables re-sorts canonically), so it scales
# with the mesh in one pass.  Preserves `mergeNsort_sr_links` semantics
# (R/computePairwiseMI.R:400-495).
# --------------------------------------------------------------------------
def _tile_count_le(pos_f: np.ndarray, pos_t: np.ndarray, g: int,
                   max_len: int, same_block: bool) -> int:
    """Exact #pairs of one tile with integer circular len <= max_len."""
    from ldweaver_tpu.parallel.spmd_sweep import tile_sr_count

    if max_len <= 0:
        return 0
    return tile_sr_count(pos_f, pos_t, g, max_len, same_block)


def partition_plan(
    seg_chunks, nsh: int, pos_blocks, g: int, sr_dist: int,
    part_budget_bytes: int, bytes_per_link: int = 16,
) -> Tuple[np.ndarray, np.ndarray]:
    """(bounds, caps): k2-range boundaries [P+1] (ranges [b_i, b_{i+1}),
    b_0 = 1, b_P = 2*sr_dist) and per-(partition, device) EXACT live
    counts [P, nsh], grown until every range's replicated buffer
    (nsh * max_dev_count * bytes_per_link) fits the budget.

    seg_chunks: [(chunk tile list, padded_rows)] in dispatch order — the
    scan shards each segment's rows contiguously over devices, so device
    d owns chunk[d*rpd : (d+1)*rpd] of every segment."""
    # per-device tile lists (host mirror of the P('b') row sharding)
    dev_tiles: List[list] = [[] for _ in range(nsh)]
    for chunk, padded in seg_chunks:
        rpd = padded // nsh
        for d in range(nsh):
            dev_tiles[d].extend(chunk[d * rpd : (d + 1) * rpd])

    def counts_at(bound_k2: int) -> np.ndarray:
        """[nsh] counts of live links with k2 < bound_k2 per device."""
        max_len = (bound_k2 - 1) // 2  # k2 <= bound-1  <=>  len <= this
        out = np.zeros(nsh, np.int64)
        for d in range(nsh):
            for bi, bj in dev_tiles[d]:
                out[d] += _tile_count_le(
                    pos_blocks[bi], pos_blocks[bj], g, max_len, bi == bj
                )
        return out

    P = 2
    while True:
        bounds = np.unique(
            np.linspace(1, 2 * sr_dist, P + 1).astype(np.int64)
        )
        cum = np.stack([counts_at(int(b)) for b in bounds])  # [P+1, nsh]
        caps = cum[1:] - cum[:-1]  # [P, nsh]
        worst = int(caps.max(axis=1).max()) if caps.size else 0
        if worst * nsh * bytes_per_link <= part_budget_bytes:
            return bounds, caps
        if P >= 256 or len(bounds) - 1 >= 2 * sr_dist - 1:
            # a single grid cell (one distance key) holds more links
            # than the budget — ranges cannot split below one cell.
            # Proceed (the replicated range buffer will exceed the
            # budget) but say so LOUDLY instead of OOMing silently.
            print(
                f"WARNING: SR reduction partition {worst * nsh * bytes_per_link / 1e9:.1f} GB"
                f" exceeds the {part_budget_bytes / 1e9:.1f} GB range"
                " budget even at one-distance-key granularity; the"
                " grid-partitioned pass may exhaust device memory —"
                " consider more devices or sr_reduce='host'.",
                flush=True,
            )
            return bounds, caps
        P *= 2


@functools.lru_cache(maxsize=None)
def _build_part_compact(mesh_key: int, B: int, g: int, sr_dist: int,
                        lo: int, hi: int, cap: int):
    """Range step (a): shard-local compaction of (k2, mono-MI, c1, c2)
    for live links with k2 in [lo, hi).  Dead/padding slots carry the
    _DEAD key, so the downstream sort needs no counts."""
    from ldweaver_tpu.parallel.fast_sweep import _MESH_STORE

    mesh = _MESH_STORE[mesh_key]
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    def local(segs, pos, paint):
        k2, mi, c1, c2, _gi, _gj, live = _flat_segments(
            segs, pos, paint, B, g, sr_dist, None
        )
        inrange = live & (k2 >= lo) & (k2 < hi)
        (idx,) = jnp.nonzero(inrange, size=cap, fill_value=-1)
        ok = idx >= 0
        idx0 = jnp.maximum(idx, 0)
        out_k2 = jnp.where(ok, k2[idx0], _DEAD).astype(jnp.uint32)
        out = jnp.stack(
            [
                out_k2,
                _mono_u32(mi[idx0]),
                c1[idx0].astype(jnp.uint32),
                c2[idx0].astype(jnp.uint32),
            ],
            axis=1,
        )
        return out

    return jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(P("b"), P(), P()), out_specs=P("b"),
        )
    )


@functools.lru_cache(maxsize=None)
def _build_part_stats(mesh_key: int, lo: int, hi: int, nclust: int):
    """Range step (b): the single-pass sort + rank-gather restricted to
    grid slice [lo, hi), over the compacted range buffer."""
    from ldweaver_tpu.parallel.fast_sweep import _MESH_STORE

    mesh = _MESH_STORE[mesh_key]
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fn(buf):  # [rows, 4] u32: (k2|DEAD, mono, c1, c2)
        buf = jax.lax.with_sharding_constraint(
            buf, NamedSharding(mesh, P())
        )
        key = buf[:, 0].astype(jnp.int32)
        mono = buf[:, 1]
        c1 = buf[:, 2].astype(jnp.int32)
        c2 = buf[:, 3].astype(jnp.int32)
        grid = jnp.arange(lo, hi, dtype=jnp.int32)
        F = key.shape[0]
        ns, xlo, xhi = [], [], []
        for c in range(1, nclust + 1):
            member = (c1 == c) | (c2 == c)
            keyc = jnp.where(member, key, _DEAD)
            ks, vs = jax.lax.sort((keyc, mono), num_keys=2)
            starts = jnp.searchsorted(ks, grid, side="left").astype(
                jnp.int32
            )
            ends = jnp.searchsorted(ks, grid + 1, side="left").astype(
                jnp.int32
            )
            n = ends - starts
            m = n - 1
            rlo = jnp.maximum(rank_lo(n), 0)
            rhi = jnp.clip(rlo + 1, 0, jnp.maximum(m, 0))
            i_lo = jnp.clip(starts + rlo, 0, F - 1)
            i_hi = jnp.clip(starts + rhi, 0, F - 1)
            ns.append(n)
            xlo.append(_unmono_f32(vs[i_lo]))
            xhi.append(_unmono_f32(vs[i_hi]))
        u = lambda x: jax.lax.bitcast_convert_type(  # noqa: E731
            x.astype(jnp.int32) if x.dtype != jnp.float32 else x,
            jnp.uint32,
        )
        return jnp.stack(
            [u(jnp.stack(ns)), u(jnp.stack(xlo)), u(jnp.stack(xhi))]
        )

    return jax.jit(fn, out_shardings=NamedSharding(mesh, P()))


@functools.lru_cache(maxsize=None)
def _build_local_cand_count(mesh_key: int, B: int, g: int, sr_dist: int,
                            nclust: int):
    """Shard-local candidate counts [nsh] (no replication)."""
    from ldweaver_tpu.parallel.fast_sweep import _MESH_STORE

    mesh = _MESH_STORE[mesh_key]
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    def local(segs, pos, paint, T):
        k2, mi, c1, c2, _gi, _gj, live = _flat_segments(
            segs, pos, paint, B, g, sr_dist, None
        )
        k2c = jnp.clip(k2, 0, 2 * sr_dist)
        keep = jnp.zeros_like(live)
        for c in range(1, nclust + 1):
            thr = T[c - 1][k2c]
            keep = keep | (((c1 == c) | (c2 == c)) & (mi >= thr))
        return (keep & live).sum(dtype=jnp.int32)[None]

    return jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(P("b"), P(), P(), P()), out_specs=P("b"),
        )
    )


@functools.lru_cache(maxsize=None)
def _build_local_candidates(mesh_key: int, B: int, g: int, sr_dist: int,
                            nclust: int, cap: int):
    """Shard-local candidate compaction: each device packs its own
    (gi, gj, mi-bits) rows; the host truncates each device's slice to
    its count and concatenates.  Emission order is irrelevant —
    candidates_to_tables re-sorts into the canonical order."""
    from ldweaver_tpu.parallel.fast_sweep import _MESH_STORE

    mesh = _MESH_STORE[mesh_key]
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    def local(segs, pos, paint, T):
        k2, mi, c1, c2, gi, gj, live = _flat_segments(
            segs, pos, paint, B, g, sr_dist, None
        )
        k2c = jnp.clip(k2, 0, 2 * sr_dist)
        keep = jnp.zeros_like(live)
        for c in range(1, nclust + 1):
            thr = T[c - 1][k2c]
            keep = keep | (((c1 == c) | (c2 == c)) & (mi >= thr))
        keep = keep & live
        count = keep.sum(dtype=jnp.int32)
        (idx,) = jnp.nonzero(keep, size=cap, fill_value=0)
        u = lambda x: jax.lax.bitcast_convert_type(  # noqa: E731
            x.astype(jnp.int32) if x.dtype != jnp.float32 else x,
            jnp.uint32,
        )
        return (
            jnp.stack([u(gi[idx]), u(gj[idx]), u(mi[idx])], 1),
            count[None],
        )

    return jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(P("b"), P(), P(), P()),
            out_specs=(P("b"), P("b")),
        )
    )


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


def _pull(x) -> np.ndarray:
    """One device->host pull, recorded on the active PullRecorder."""
    from ldweaver_tpu.utils.relay_stats import record_pull

    t0 = time.time()
    try:
        return np.asarray(x)
    finally:
        record_pull(time.time() - t0)


def _pull_big(arr, n_streams: int = 8, min_bytes: int = 16 << 20):
    """Pull a large replicated device array over several CONCURRENT
    streams.  The relay multiplexes device->host copies (3 concurrent
    256 MB pulls measured 40 MB/s aggregate vs 9 MB/s serial —
    spmd_sweep module docstring); the r4 bench spent 139.7 s pulling the
    100 MB candidate buffer on one stream.  Row-count is pow2 by
    construction (the candidate cap), so the equal slices reuse one
    compiled slice program per cap value."""
    import jax

    nbytes = arr.size * arr.dtype.itemsize
    k = min(n_streams, max(1, int(nbytes // min_bytes)), arr.shape[0])
    if k <= 1 or jax.process_count() > 1:
        return _pull(arr)
    from concurrent.futures import ThreadPoolExecutor

    rows = arr.shape[0]
    step = rows // k
    parts = [arr[i * step : (i + 1) * step] for i in range(k)]
    if k * step < rows:
        parts.append(arr[k * step :])
    with ThreadPoolExecutor(max_workers=len(parts)) as ex:
        outs = list(ex.map(_pull, parts))
    return np.concatenate(outs, axis=0)


def _next_pow2(n: int, lo: int = 1 << 14) -> int:
    return max(lo, 1 << int(np.ceil(np.log2(max(n, 1)))))


def run_device_reduction(
    mesh, segs, pos_dev, paint_dev, *,
    ranked_pos: np.ndarray, paint_sorted: np.ndarray,
    B: int, nb: int, g: int, sr_dist: int, nclust: int, total_sr: int,
    cap0: Optional[int] = None,
    mode: str = "flat",
    seg_chunks=None,
    pos_blocks=None,
    part_budget_bytes: Optional[int] = None,
) -> DeviceSrReduction:
    """Run both device passes + the host fit, returning candidate tables
    in canonical order.  Safe to call from a worker thread (pure jax
    dispatch + pulls + numpy); collectives live INSIDE the compiled
    programs, issued in one deterministic order.

    mode="flat": the single-pass path (replicates the flat link arrays;
    bounded by one device's HBM).  mode="part": the grid-partitioned
    >HBM path — requires seg_chunks, pos_blocks and part_budget_bytes;
    byte-identical outputs by construction (disjoint exhaustive ranges,
    identical group multisets)."""
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

    nsh = mesh.devices.size
    t0 = time.time()
    if mode == "part":
        assert seg_chunks is not None and pos_blocks is not None
        bounds, caps = partition_plan(
            seg_chunks, nsh, pos_blocks, g, sr_dist,
            part_budget_bytes or (1 << 30),
        )
        grid_n = 2 * sr_dist - 1
        ns = np.zeros((nclust, grid_n), np.int32)
        xlo = np.zeros((nclust, grid_n), np.float32)
        xhi = np.zeros((nclust, grid_n), np.float32)
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            if i == len(bounds) - 2:
                hi = 2 * sr_dist  # last range is right-inclusive to the
                # grid end (grid keys are 1 .. 2*sr_dist - 1)
            cap = int(caps[i].max())
            if cap == 0:
                continue  # host-proven empty range
            buf_d = _build_part_compact(
                mesh_key, B, int(g), int(sr_dist), lo, hi, cap
            )(segs, pos_dev, paint_dev)
            sbuf = _pull(
                _build_part_stats(mesh_key, lo, hi, nclust)(buf_d)
            )
            sl = slice(lo - 1, hi - 1)  # grid index = k2 - 1
            ns[:, sl] = sbuf[0].view(np.int32)
            xlo[:, sl] = sbuf[1].view(np.float32)
            xhi[:, sl] = sbuf[2].view(np.float32)
        stats["sr_partitions"] = len(bounds) - 1
    else:
        stats_fn = _build_group_stats(
            mesh_key, B, int(g), int(sr_dist), nclust
        )
        sbuf = _pull(stats_fn(segs, pos_dev, paint_dev))  # ONE pull
        ns = sbuf[0].astype(np.int32)
        xlo = sbuf[1].copy().view(np.float32)
        xhi = sbuf[2].copy().view(np.float32)
    stats["bg_stats_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    fits = fits_from_group_stats(ns, xlo, xhi, sr_dist)
    T = threshold_tables(fits, nclust, sr_dist)
    stats["bg_fit_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    if mode == "part":
        gi, gj, mi, count, retries = _candidates_sharded(
            mesh_key, segs, pos_dev, paint_dev, T, B, g, sr_dist, nclust,
            nsh, stats, t0,
        )
    else:
        # Cap sizing.  Candidates are the positive-residual links against
        # the q95 fit — ~5% of live links by construction (the fit tracks
        # the 95th percentile).  The default caps at pow2(8% of
        # total_sr): ~1.6x headroom above typical, bounded 2x padding
        # after pow2 — and SKIPS the dedicated count round trip the r4
        # design paid (a full elementwise pass + a scalar pull on the
        # critical path: 26-46 s at measured relay weather).  The
        # compaction's own count certifies the cap; a rare overflow
        # retries once at the exact count.  LDW_SR_PRECOUNT=1 restores
        # the count-first sizing (tightest pull bytes).
        if cap0:
            cap = cap0
        elif os.environ.get("LDW_SR_PRECOUNT") == "1":
            count_fn = _build_cand_count(mesh_key, B, int(g), int(sr_dist),
                                         nclust)
            pre_count = int(_pull(count_fn(segs, pos_dev, paint_dev, T)))
            stats["cand_precount_s"] = round(time.time() - t0, 2)
            cap = _next_pow2(pre_count)
        else:
            cap = _next_pow2(max(1 << 17, int(0.08 * total_sr)))
        retries = 0
        while True:
            cand_fn = _build_candidates(
                mesh_key, B, int(g), int(sr_dist), nclust, cap
            )
            buf_d, cnt_d = cand_fn(segs, pos_dev, paint_dev, T)
            count = int(_pull(cnt_d))
            if count <= cap:
                break
            cap = _next_pow2(count)
            retries += 1
        # the count crossed first (scalar), so the big (gi, gj, mi-bits)
        # buffer is sliced to pow2(count) ON DEVICE before pulling —
        # tight pull bytes without the r4 count-first pass (pow2
        # granularity so the slice program recompiles only when the
        # live count crosses a power of two) — then crosses on
        # concurrent streams
        nkeep = min(cap, _next_pow2(count, lo=1 << 13))
        buf = _pull_big(buf_d[:nkeep] if nkeep < cap else buf_d)
        gi = buf[:count, 0].astype(np.int32)
        gj = buf[:count, 1].astype(np.int32)
        mi = np.ascontiguousarray(buf[:count, 2]).view(np.float32)
        stats["cand_mb"] = round(12 * nkeep / 1e6, 1)
    stats["bg_cand_s"] = round(time.time() - t0, 2)
    stats["cand_count"] = count
    stats["cand_retries"] = retries

    t0 = time.time()
    tables = candidates_to_tables(
        gi, gj, mi, count, ranked_pos, paint_sorted, g, B, nb, nclust
    )
    stats["bg_order_s"] = round(time.time() - t0, 2)
    return DeviceSrReduction(fits=fits, tables=tables, stats=stats)


def _candidates_sharded(mesh_key, segs, pos_dev, paint_dev, T, B, g,
                        sr_dist, nclust, nsh, stats, t0):
    """Shard-local candidate extraction for the partitioned path: counts
    per device, cap = max, compact, pull, truncate-and-concat."""
    from ldweaver_tpu.parallel.spmd_sweep import _pull_sharded

    counts0 = _pull(
        _build_local_cand_count(mesh_key, B, int(g), int(sr_dist), nclust)(
            segs, pos_dev, paint_dev, T
        )
    ).astype(np.int64)
    stats["cand_precount_s"] = round(time.time() - t0, 2)
    cap = _next_pow2(int(counts0.max()))
    retries = 0
    while True:
        buf_d, cnt_d = _build_local_candidates(
            mesh_key, B, int(g), int(sr_dist), nclust, cap
        )(segs, pos_dev, paint_dev, T)
        counts = _pull_sharded(cnt_d).astype(np.int64)
        if counts.max() <= cap:
            break
        cap = _next_pow2(int(counts.max()))
        retries += 1
    buf = _pull_sharded(buf_d)  # [nsh*cap, 3] u32
    parts = [
        buf[d * cap : d * cap + int(counts[d])] for d in range(nsh)
    ]
    flat = (
        np.concatenate(parts, axis=0)
        if parts else np.zeros((0, 3), np.uint32)
    )
    gi = flat[:, 0].astype(np.int32)
    gj = flat[:, 1].astype(np.int32)
    mi = np.ascontiguousarray(flat[:, 2]).view(np.float32)
    stats["cand_mb"] = round(12 * cap * nsh / 1e6, 1)
    return gi, gj, mi, int(counts.sum()), retries

