"""Blocked all-vs-all MI sweep driver (reference `perform_MI_computation`,
R/computePairwiseMI.R:46-145 + per-block `perform_MI_computation_ACGTN`,
R/computePairwiseMI.R:167-386).

Single-device flow; the multi-device sharded sweep lives in
parallel/sweep.py and reuses the same per-tile kernel + host extraction.
"""

from __future__ import annotations

import os
import time
from typing import Callable, List, Optional

import numpy as np

from ldweaver_tpu.core import mi as mi_mod
from ldweaver_tpu.core.background import SrLinks, merge_and_sort_sr_links
from ldweaver_tpu.core.aracne import run_aracne
from ldweaver_tpu.core.mi import (
    LinkTable,
    circular_len,
    estimate_lr_links,
    make_blocks,
    round_blk_sz,
    tile_pair_indices,
)
from ldweaver_tpu.core.snp_tensor import SnpData
from ldweaver_tpu.utils.r_compat import quantile_type7
from ldweaver_tpu.io.writers import append_tsv_rows, format_float


def _tile_backend(backend: str) -> Callable:
    if backend == "numpy":
        return mi_mod.mi_tile_numpy
    if backend == "jax":
        return mi_mod.mi_tile_jax
    if backend == "pallas":
        from ldweaver_tpu.ops.pallas_mi import mi_tile_pallas

        return mi_tile_pallas
    raise ValueError(f"unknown MI backend {backend!r}")


def sweep_block_pair(
    snp_data: SnpData,
    hdw: np.ndarray,
    paint: np.ndarray,
    neff: float,
    fs: int,
    fe: int,
    ts: int,
    te: int,
    sr_dist: int,
    lr_retain_links: float,
    lr_links_approx: Optional[float],
    sr_links: List[LinkTable],
    lr_rows_sink: Callable,
    backend: str = "jax",
    rxy_compat: bool = True,
    perform_sr_only: bool = False,
):
    """One block-pair: MI tile + SR/LR link extraction
    (R/computePairwiseMI.R:167-386).  fs/fe/ts/te are 1-based inclusive.
    """
    g = snp_data.g
    from_idx = np.arange(fs - 1, fe, dtype=np.int64)
    to_idx = np.arange(ts - 1, te, dtype=np.int64)
    pos = snp_data.pos

    if perform_sr_only:
        # drop sites forming no short-range pair (strict <, :182-183)
        pf = pos[from_idx].astype(np.float64)
        pt = pos[to_idx].astype(np.float64)
        lens_ft = 0.5 * g - np.abs(
            np.mod(pt[None, :] - pf[:, None], g) - 0.5 * g
        )
        kp_f = (np.abs(lens_ft) < sr_dist).any(axis=1)
        kp_t = (np.abs(lens_ft) < sr_dist).any(axis=0)
        from_idx = from_idx[kp_f]
        to_idx = to_idx[kp_t]
        if from_idx.size == 0 or to_idx.size == 0:
            return

    pos_f = pos[from_idx]
    pos_t = pos[to_idx]
    paint_f = paint[from_idx]
    paint_t = paint[to_idx]
    r_f = snp_data.r[from_idx]
    r_t = snp_data.r[to_idx]
    uq_f = snp_data.uqe[from_idx]
    uq_t = snp_data.uqe[to_idx]
    codes_f = np.ascontiguousarray(snp_data.codes[:, from_idx].T)
    codes_t = np.ascontiguousarray(snp_data.codes[:, to_idx].T)

    tile_fn = _tile_backend(backend)
    mi = tile_fn(
        codes_f, codes_t, hdw, r_f, r_t, uq_f, uq_t, neff, rxy_compat=rxy_compat
    )
    mi = np.asarray(mi, dtype=np.float64)

    diagonal_block = fs == ts and fe == te
    ii, jj = tile_pair_indices(from_idx.size, to_idx.size, diagonal_block)
    if ii.size == 0:
        return

    pos2 = pos_f[ii]
    pos1 = pos_t[jj]  # orientation per R/computePairwiseMI.R:319-320
    clust2 = paint_f[ii]
    clust1 = paint_t[jj]
    lens = circular_len(pos1, pos2, g)  # :330
    vals = mi[ii, jj]

    sr_mask = lens <= sr_dist  # :333
    lr_mask = ~sr_mask

    if lr_mask.any() and not perform_sr_only:
        lrv = vals[lr_mask]
        prob = max(
            0.0, 1.0 - lr_retain_links / lr_links_approx
        )  # :352 (block factors cancel)
        disc_thresh = quantile_type7(lrv, prob)
        keep = lrv >= disc_thresh  # :358
        if keep.any():
            sel = np.flatnonzero(lr_mask)[keep]
            lr_rows_sink(
                pos1[sel],
                pos2[sel],
                clust1[sel],
                clust2[sel],
                lens[sel],
                vals[sel],
            )

    if sr_mask.any():
        sel = np.flatnonzero(sr_mask)
        t = LinkTable(
            pos1=pos1[sel],
            pos2=pos2[sel],
            clust1=clust1[sel],
            clust2=clust2[sel],
            len=lens[sel],
            MI=vals[sel],
        )
        nclust = len(sr_links)
        for ci in range(1, nclust + 1):
            m = (t.clust1 == ci) | (t.clust2 == ci)  # .compareToRow, :373
            if m.any():
                sr_links[ci - 1].append(t.take(np.flatnonzero(m)))


def _emit_pairs(
    ii, jj, vals, pos_f, pos_t, paint_f, paint_t, g, sr_dist,
    lr_prob, sr_links, lr_rows_sink, apply_lr_quantile=True,
    lr_thresh=None,
):
    """Shared link emission: orientation-normalise, split SR/LR, apply the
    per-block LR retention quantile, bin SR links per cluster."""
    pos2 = pos_f[ii]
    pos1 = pos_t[jj]
    clust2 = paint_f[ii]
    clust1 = paint_t[jj]
    # normalise orientation to pos1 < pos2 (the r-stratified permutation
    # makes raw emission orientation arbitrary; the reference's diagonal
    # blocks emit pos1 < pos2 - R/computePairwiseMI.R:306-320)
    swap = pos1 > pos2
    pos1_n = np.where(swap, pos2, pos1)
    pos2_n = np.where(swap, pos1, pos2)
    clust1_n = np.where(swap, clust2, clust1)
    clust2_n = np.where(swap, clust1, clust2)
    pos1, pos2, clust1, clust2 = pos1_n, pos2_n, clust1_n, clust2_n
    lens = circular_len(pos1, pos2, g)

    sr_mask = lens <= sr_dist
    lr_mask = ~sr_mask
    if lr_mask.any() and lr_prob is not None:
        lrv = vals[lr_mask]
        if apply_lr_quantile:
            disc_thresh = quantile_type7(lrv, lr_prob)
        else:
            disc_thresh = lr_thresh
        keep = lrv >= disc_thresh
        if keep.any():
            sel = np.flatnonzero(lr_mask)[keep]
            lr_rows_sink(
                pos1[sel], pos2[sel], clust1[sel], clust2[sel],
                lens[sel], vals[sel],
            )
    if sr_mask.any():
        sel = np.flatnonzero(sr_mask)
        t = LinkTable(
            pos1=pos1[sel], pos2=pos2[sel], clust1=clust1[sel],
            clust2=clust2[sel], len=lens[sel], MI=vals[sel],
        )
        for ci in range(1, len(sr_links) + 1):
            m = (t.clust1 == ci) | (t.clust2 == ci)
            if m.any():
                sr_links[ci - 1].append(t.take(np.flatnonzero(m)))


def _circular_window_counts(p: np.ndarray, q: np.ndarray, g: int,
                            sr_dist: int) -> np.ndarray:
    """#targets q within circular distance <= sr_dist of each p (host
    side; used to find SR-capable rows/cols of a tile)."""
    qs = np.sort(q)
    D = np.concatenate([qs, qs + g])
    a = ((p - sr_dist - 1) % g) + 1  # shift window into [1, g]
    lo = np.searchsorted(D, a, side="left")
    hi = np.searchsorted(D, a + 2 * sr_dist, side="right")
    return hi - lo


def _next_pow2(n: int, lo: int = 8) -> int:
    return max(lo, 1 << int(np.ceil(np.log2(max(n, 1)))))


class FastTileRunner:
    """Fast-path tile executor with a device-slab cache and split
    dispatch/finish so the pipeline can queue tiles ahead (JAX async
    dispatch) and overlap device compute with host link extraction.

    Transfer modes per tile:
      'extract' (the 'auto' default) — the shared on-device link
        extraction (parallel/spmd_sweep._extract_body): row-major SR
        compaction into the host-proven exact cap + certified two-stage
        LR top-K; O(P_sr + K) bytes leave the device instead of B^2, and
        results are bitwise identical to the SPMD scan sweep (same
        compiled body).
      'summary' — legacy quantile/top-K/SR-submatrix reduction.
      'full' — pull the whole [B, B] MI tile (also the exact fallback
        when extraction saturates)."""

    def __init__(
        self,
        ranked,
        paint_sorted: np.ndarray,
        valid: np.ndarray,
        hdw: np.ndarray,
        neff: float,
        g: int,
        sr_dist: int,
        lr_retain_links: float,
        lr_links_approx: Optional[float],
        sr_links: List[list],
        transfer: str = "auto",
        topk: int = 8192,
        max_slabs: Optional[int] = None,
        devices=None,
    ):
        import jax

        from ldweaver_tpu.parallel.fast_sweep import _wparts
        from ldweaver_tpu.parallel.slabs import SlabCache

        self.ranked = ranked
        self.paint_sorted = paint_sorted
        self.valid = valid
        self.hdw = np.asarray(hdw, np.float64)
        self.neff = neff
        self.g = g
        self.sr_dist = sr_dist
        self.sr_links = sr_links
        self.transfer = transfer
        self.topk = topk
        self.lr_prob = (
            None
            if lr_links_approx is None
            else max(0.0, 1.0 - lr_retain_links / lr_links_approx)
        )
        # Multi-device: tiles round-robin over `devices` (pair-space data
        # parallelism - the TPU-native distribution axis per SURVEY.md
        # section 2.4); the SNP slabs are cached per device, small per-tile
        # operands travel with each dispatch.  Results are device-invariant,
        # so the assignment only affects throughput, never output.
        self.devices = list(devices) if devices else [jax.devices()[0]]
        w32, wparts = _wparts(self.hdw)
        self._consts = [
            (
                jax.device_put(w32, d),
                jax.device_put(wparts, d),
                jax.device_put(np.float32(neff), d),
            )
            for d in self.devices
        ]
        self.caches = [
            SlabCache(ranked.rank_codes, ranked.block, max_slabs, device=d,
                      pack=True)  # rank_encode emits 0..4
            for d in self.devices
        ]
        self.cache = self.caches[0]  # single-device alias (tests, fallback)
        self._rr = 0  # round-robin cursor
        # saturation accounting: every summary tile that overflows its
        # top-K (globally or per-row) costs one synchronous full re-run.
        # On adversarially dense data (most pairs above the retention
        # threshold) that would double every tile, so after repeated
        # saturations the runner demotes itself to full transfers — a
        # pure throughput decision; outputs are transfer-mode invariant.
        self.fallbacks = 0
        self.retries = 0
        self._summary_ok = 0
        self._demoted = False

    def _pure(self, bi: int, bj: int) -> bool:
        """Both blocks r-pure -> telescoped epilogue (fast_sweep
        _rank_tile_mi pure=True).  Pad rows' garbage values are safe: the
        summary path masks via val_f/val_t and rows_sel/cols_sel are
        valid-filtered; the full path's host extraction masks pads too."""
        bp = getattr(self.ranked, "block_pure", None)
        if bp is None:
            return False
        return bool(bp[bi]) and bool(bp[bj])

    def _mode(self) -> str:
        """Per-tile transfer mode.  'extract' (the 'auto' default) pulls
        only the bounded on-device link extraction (parallel/spmd_sweep's
        shared body — O(P_sr + K) bytes/tile instead of the B^2 full
        tile); 'summary' and 'full' remain as explicit overrides, and
        demotion (repeated saturation) forces 'full'."""
        if self._demoted or self.transfer == "full":
            return "full"
        if self.transfer == "summary":
            return "summary"
        return "extract"  # 'auto' / 'extract'

    def _extract_dims(self):
        """(K, k_row) sized from the retention probability — shared with
        the SPMD driver so both compile identical extraction programs."""
        from ldweaver_tpu.parallel.spmd_sweep import extract_dims

        return extract_dims(self.ranked.block, self.lr_prob)

    @property
    def _K(self) -> int:
        return self._extract_dims()[0]

    def pin_panel(self, rows) -> None:
        rows = list(rows)
        for c in self.caches:
            c.unpin()
            c.pin(rows)

    def unpin_all(self) -> None:
        for c in self.caches:
            c.unpin()

    # -- dispatch: queue device work, do NOT block on results ------------
    def dispatch(self, bi: int, bj: int) -> dict:
        di = self._rr % len(self.devices)
        self._rr += 1
        slab_f = self.caches[di].get(bi)
        slab_t = self.caches[di].get(bj)
        mode = self._mode()
        if mode == "extract":
            return self._dispatch_extract(bi, bj, slab_f, slab_t, di)
        if mode == "summary":
            return self._dispatch_summary(bi, bj, slab_f, slab_t, di)
        return self._dispatch_full(bi, bj, slab_f, slab_t, di)

    def _sr_counts(self):
        """Lazily computed exact SR pair counts per tile + the pow-4
        capacity ladder (spmd_sweep.sr_cap_ladder).  Each tile's SR cap is
        its ladder class — the SAME rule the SPMD driver buckets by, so
        both drivers compile the identical program per tile (byte-identity
        invariant) while pull bytes track live links within 4x."""
        if getattr(self, "_sr_counts_cache", None) is None:
            from ldweaver_tpu.parallel.spmd_sweep import (
                _next_pow2,
                sr_cap_ladder,
                sr_pair_counts,
            )

            counts = sr_pair_counts(
                self.ranked, self.valid, self.g, self.sr_dist
            )
            self._sr_counts_cache = (
                counts, sr_cap_ladder(_next_pow2(int(counts.max())))
            )
        return self._sr_counts_cache

    def _tile_cap(self, bi: int, bj: int) -> int:
        from ldweaver_tpu.parallel.spmd_sweep import sr_cap_class

        counts, ladder = self._sr_counts()
        return sr_cap_class(int(counts[bi, bj]), ladder)

    def _dispatch_extract(self, bi, bj, slab_f, slab_t, di=0) -> dict:
        from ldweaver_tpu.parallel.spmd_sweep import _build_tile_extract

        ranked = self.ranked
        B = ranked.block
        f_sl = slice(bi * B, (bi + 1) * B)
        t_sl = slice(bj * B, (bj + 1) * B)
        pos_f = ranked.pos[f_sl]
        pos_t = ranked.pos[t_sl]
        val_f = self.valid[f_sl]
        val_t = self.valid[t_sl]
        r_f = ranked.r[f_sl]
        r_t = ranked.r[t_sl]
        counts, _ = self._sr_counts()
        cnt = int(counts[bi, bj])
        K, k_row = self._extract_dims()
        fn = _build_tile_extract(
            B, int(self.sr_dist), int(self.g), K, k_row,
            self._tile_cap(bi, bj),
            int(r_f.max()), int(r_t.max()), 3, pure=self._pure(bi, bj),
        )
        w32_d, wparts_d, neff_d = self._consts[di]
        outs = fn(
            slab_f, slab_t, w32_d, wparts_d,
            np.asarray(r_f, np.float32), np.asarray(r_t, np.float32),
            neff_d,
            np.asarray(pos_f, np.int32), np.asarray(pos_t, np.int32),
            np.asarray(val_f), np.asarray(val_t),
            np.asarray([bi, bj], np.int32), np.True_,
            np.float32(1.0 if self.lr_prob is None else self.lr_prob),
        )
        return dict(
            kind="extract", bi=bi, bj=bj, outs=outs, expected_sr=cnt, di=di
        )

    def _dispatch_summary(self, bi, bj, slab_f, slab_t, di=0) -> dict:
        from ldweaver_tpu.parallel.fast_sweep import _build_rank_tile_summary

        ranked = self.ranked
        B = ranked.block
        g = self.g
        f_sl = slice(bi * B, (bi + 1) * B)
        t_sl = slice(bj * B, (bj + 1) * B)
        pos_f = ranked.pos[f_sl]
        pos_t = ranked.pos[t_sl]
        val_f = self.valid[f_sl]
        val_t = self.valid[t_sl]
        r_f = ranked.r[f_sl]
        r_t = ranked.r[t_sl]

        # SR-capable rows/cols from positions (host, cheap)
        row_cnt = _circular_window_counts(pos_f, pos_t[val_t], g, self.sr_dist)
        col_cnt = _circular_window_counts(pos_t, pos_f[val_f], g, self.sr_dist)
        rows_sel = np.flatnonzero((row_cnt > 0) & val_f)
        cols_sel = np.flatnonzero((col_cnt > 0) & val_t)
        nrow_cap = _next_pow2(rows_sel.size)
        ncol_cap = _next_pow2(cols_sel.size)
        row_pad = np.zeros(nrow_cap, np.int32)
        row_pad[: rows_sel.size] = rows_sel
        col_pad = np.zeros(ncol_cap, np.int32)
        col_pad[: cols_sel.size] = cols_sel

        fn = _build_rank_tile_summary(
            B, B, int(r_f.max()), int(r_t.max()), 3, self.topk,
            nrow_cap, ncol_cap, pure=self._pure(bi, bj),
        )
        w32_d, wparts_d, neff_d = self._consts[di]
        # small per-tile operands stay as numpy: jit transfers them to the
        # committed device of the slab/const operands
        outs = fn(
            slab_f,
            slab_t,
            w32_d,
            wparts_d,
            np.asarray(r_f, np.float32),
            np.asarray(r_t, np.float32),
            neff_d,
            np.asarray(pos_f, np.int32),
            np.asarray(pos_t, np.int32),
            np.asarray(val_f),
            np.asarray(val_t),
            bool(bi == bj),
            np.int32(g),
            np.float32(self.sr_dist),
            np.float32(self.lr_prob),
            row_pad,
            col_pad,
        )
        return dict(
            kind="summary", bi=bi, bj=bj, outs=outs,
            rows_sel=rows_sel, cols_sel=cols_sel, di=di,
        )

    def _dispatch_full(self, bi, bj, slab_f, slab_t, di=0) -> dict:
        from ldweaver_tpu.parallel.fast_sweep import _build_rank_tile

        ranked = self.ranked
        B = ranked.block
        f_sl = slice(bi * B, (bi + 1) * B)
        t_sl = slice(bj * B, (bj + 1) * B)
        r_f = ranked.r[f_sl]
        r_t = ranked.r[t_sl]
        fn = _build_rank_tile(B, B, int(r_f.max()), int(r_t.max()), 3,
                              pure=self._pure(bi, bj))
        w32_d, wparts_d, neff_d = self._consts[di]
        out = fn(
            slab_f, slab_t, w32_d, wparts_d,
            np.asarray(r_f, np.float32), np.asarray(r_t, np.float32),
            neff_d,
        )
        return dict(kind="full", bi=bi, bj=bj, out=out, di=di)

    # -- finish: pull + host extraction ----------------------------------
    def finish(self, pending: dict, lr_rows_sink: Callable) -> None:
        lr_only = False
        if pending["kind"] in ("summary", "extract"):
            if pending["kind"] == "summary":
                done = self._finish_summary(pending, lr_rows_sink)
            else:
                done = self._finish_extract(pending, lr_rows_sink)
                if not done:
                    # the LR certificate failed but SR compaction is
                    # exact regardless: emit SR once from the PRIMARY
                    # extraction program (single source — retry/fallback
                    # programs can differ at f32 ulp; same policy as the
                    # SPMD driver) and redo only the LR side
                    from ldweaver_tpu.parallel.spmd_sweep import (
                        emit_tile_extract,
                    )

                    kw = self._emit_kw(pending)
                    kw["lr_rows_sink"] = lr_rows_sink
                    emit_tile_extract(
                        pending["res"], K=self._K, parts="sr", **kw
                    )
                    lr_only = True
                    done = self._retry_extract(pending, lr_rows_sink)
            if done:
                self._summary_ok += 1
                return
            # saturated top-K: exact full-tile fallback (synchronous).
            # At most ONE extra dispatch per tile; repeated saturation
            # demotes the runner to full transfers so an adversarially
            # dense dataset cannot serialise the whole sweep.
            self.fallbacks += 1
            if self.fallbacks >= 4 and self.fallbacks >= self._summary_ok:
                self._demoted = True
            bi, bj = pending["bi"], pending["bj"]
            di = pending.get("di", 0)
            pending = self._dispatch_full(
                bi, bj, self.caches[di].get(bi), self.caches[di].get(bj), di
            )
            pending["lr_only"] = lr_only
        self._finish_full(pending, lr_rows_sink)

    def _emit_kw(self, pending: dict) -> dict:
        B = self.ranked.block
        bi, bj = pending["bi"], pending["bj"]
        f_sl = slice(bi * B, (bi + 1) * B)
        t_sl = slice(bj * B, (bj + 1) * B)
        return dict(
            B=B,
            pos_f=self.ranked.pos[f_sl], pos_t=self.ranked.pos[t_sl],
            pnt_f=self.paint_sorted[f_sl], pnt_t=self.paint_sorted[t_sl],
            g=self.g, sr_dist=self.sr_dist, lr_prob=self.lr_prob,
            expected_sr=pending["expected_sr"],
            sr_links=self.sr_links,
        )

    def _finish_extract(self, pending: dict, lr_rows_sink: Callable) -> bool:
        from ldweaver_tpu.parallel.spmd_sweep import (
            TileExtract,
            emit_tile_extract,
        )

        n_lr, exact, row_max, vals, idx, n_sr, sr_idx, sr_vals = (
            np.asarray(o) for o in pending["outs"]
        )
        res = TileExtract(
            n_lr=int(n_lr), exact=bool(exact), vals=vals, idx=idx,
            n_sr=int(n_sr), sr_idx=sr_idx, sr_vals=sr_vals,
            row_max=int(row_max),
        )
        pending["res"] = res  # retry sizing reads n_lr / row_max
        kw = self._emit_kw(pending)
        kw["lr_rows_sink"] = lr_rows_sink
        return emit_tile_extract(res, K=self._K, **kw)

    def _retry_extract(self, pending: dict, lr_rows_sink: Callable) -> bool:
        """Boosted-capacity retry of a failed extraction — the SAME policy
        as the SPMD driver (parallel/spmd_sweep.spmd_blk5_sweep), so the
        two drivers keep emitting identical bytes."""
        from ldweaver_tpu.parallel.spmd_sweep import (
            emit_tile_extract,
            retry_dims,
            retry_tile_extract,
        )

        if self.lr_prob is None:
            return False
        res = pending["res"]
        B = self.ranked.block
        K, k_row = self._extract_dims()
        K2, k2 = retry_dims(res, B, self.lr_prob, K, k_row)
        if K2 * 8 >= B * B * 4:  # full tile moves fewer bytes
            return False
        bi, bj = pending["bi"], pending["bj"]
        di = pending.get("di", 0)
        w32_d, wparts_d, neff_d = self._consts[di]
        res2 = retry_tile_extract(
            self.ranked, self.valid, bi, bj, w32_d, wparts_d, neff_d,
            g=self.g, sr_dist=self.sr_dist, lr_prob=self.lr_prob,
            K2=K2, k2=k2, P_sr=self._tile_cap(bi, bj),
            slab_f=self.caches[di].get(bi), slab_t=self.caches[di].get(bj),
        )
        self.retries += 1
        kw = self._emit_kw(pending)
        kw["lr_rows_sink"] = lr_rows_sink
        # LR only: the tile's SR was already emitted from the primary
        # extraction (finish(); single-source policy)
        return emit_tile_extract(res2, K=K2, parts="lr", **kw)

    def _finish_summary(self, pending: dict, lr_rows_sink: Callable) -> bool:
        ranked = self.ranked
        B = ranked.block
        g = self.g
        bi, bj = pending["bi"], pending["bj"]
        rows_sel, cols_sel = pending["rows_sel"], pending["cols_sel"]
        thresh, n_above, n_row_max, vals, idx, sub = pending["outs"]
        n_above = int(n_above)
        if n_above > vals.shape[0] or int(n_row_max) > 16:
            return False  # saturated (globally or per-row)
        f_sl = slice(bi * B, (bi + 1) * B)
        t_sl = slice(bj * B, (bj + 1) * B)
        pos_f = ranked.pos[f_sl]
        pos_t = ranked.pos[t_sl]
        paint_f = self.paint_sorted[f_sl]
        paint_t = self.paint_sorted[t_sl]
        thresh = float(thresh)
        vals = np.asarray(vals, np.float64)
        idx = np.asarray(idx, np.int64)

        # LR candidates above the on-device quantile threshold
        if np.isfinite(thresh):
            keep = np.isfinite(vals) & (vals >= thresh)
            if keep.any():
                ii = (idx[keep] // B).astype(np.int64)
                jj = (idx[keep] % B).astype(np.int64)
                _emit_pairs(
                    ii, jj, vals[keep], pos_f, pos_t, paint_f, paint_t, g,
                    self.sr_dist, self.lr_prob, self.sr_links, lr_rows_sink,
                    apply_lr_quantile=False, lr_thresh=thresh,
                )

        # SR pairs from the gathered submatrix
        if rows_sel.size and cols_sel.size:
            sub = np.asarray(sub, np.float64)[: rows_sel.size, : cols_sel.size]
            pi = pos_f[rows_sel]
            pj = pos_t[cols_sel]
            lens = circular_len(
                pj[None, :].astype(np.float64),
                pi[:, None].astype(np.float64),
                g,
            )
            mask = lens <= self.sr_dist
            if bi == bj:
                mask &= rows_sel[:, None] > cols_sel[None, :]
            ri, cj = np.nonzero(mask)
            if ri.size:
                _emit_pairs(
                    rows_sel[ri], cols_sel[cj], sub[ri, cj],
                    pos_f, pos_t, paint_f, paint_t, g, self.sr_dist,
                    None, self.sr_links, lr_rows_sink,
                )
        return True

    def _finish_full(self, pending: dict, lr_rows_sink: Callable) -> None:
        ranked = self.ranked
        B = ranked.block
        bi, bj = pending["bi"], pending["bj"]
        mi = np.asarray(pending["out"], np.float64)
        f_sl = slice(bi * B, (bi + 1) * B)
        t_sl = slice(bj * B, (bj + 1) * B)
        pos_f = ranked.pos[f_sl]
        pos_t = ranked.pos[t_sl]
        paint_f = self.paint_sorted[f_sl]
        paint_t = self.paint_sorted[t_sl]
        val_f = self.valid[f_sl]
        val_t = self.valid[t_sl]

        if bi == bj:
            ii, jj = np.tril_indices(B, -1)
            ii = ii.astype(np.int32)
            jj = jj.astype(np.int32)
        else:
            ii = np.repeat(np.arange(B, dtype=np.int32), B)
            jj = np.tile(np.arange(B, dtype=np.int32), B)
        ok = val_f[ii] & val_t[jj]
        ii, jj = ii[ok], jj[ok]
        if ii.size == 0:
            return
        # as an extract-fallback the tile's SR links were already
        # single-sourced from the primary extraction: discard SR here
        sr_links = (
            [[] for _ in self.sr_links] if pending.get("lr_only")
            else self.sr_links
        )
        _emit_pairs(
            ii, jj, mi[ii, jj], pos_f, pos_t, paint_f, paint_t, self.g,
            self.sr_dist, self.lr_prob, sr_links, lr_rows_sink,
        )


def sweep_block_pair_fast(
    ranked,
    paint_sorted: np.ndarray,
    valid: np.ndarray,
    hdw: np.ndarray,
    neff: float,
    g: int,
    bi: int,
    bj: int,
    sr_dist: int,
    lr_retain_links: float,
    lr_links_approx: Optional[float],
    sr_links: List[LinkTable],
    lr_rows_sink: Callable,
    transfer: str = "auto",
):
    """Fast-path block pair, synchronous (dispatch + finish back to back).

    Unlike the compat path, off-diagonal block pairs KEEP their in-block
    diagonal pairs (the reference drops them - a quirk, not a feature).
    The pipeline uses FastTileRunner directly to queue tiles ahead."""
    runner = FastTileRunner(
        ranked, paint_sorted, valid, hdw, neff, g, sr_dist,
        lr_retain_links, lr_links_approx, sr_links, transfer=transfer,
    )
    runner.finish(runner.dispatch(bi, bj), lr_rows_sink)


class _BlockCheckpoint:
    """Block-granular sweep checkpointing: each completed block-pair's SR
    contributions + retained LR rows are persisted as one npz (written
    atomically); a manifest keyed by the sweep configuration invalidates
    stale checkpoints."""

    def __init__(self, directory: str, config_key):
        import json

        self.dir = directory
        os.makedirs(directory, exist_ok=True)
        manifest = os.path.join(directory, "manifest.json")
        key = json.dumps(list(map(str, config_key)))
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

    def _path(self, key):
        return os.path.join(self.dir, f"blk_{key}.npz")

    def done(self, key) -> bool:
        return os.path.exists(self._path(key))

    def save(self, key, sr_links, before_counts, lr_acc):
        payload = {}
        for ci, parts in enumerate(sr_links):
            n0 = before_counts[ci]
            if len(parts) > n0:
                tail = LinkTable.concat(parts[n0:])
                for f in ("pos1", "pos2", "clust1", "clust2", "len", "MI"):
                    payload[f"sr{ci}_{f}"] = getattr(tail, f)
        for k, cols in enumerate(lr_acc):
            for j, name in enumerate(
                ("pos1", "pos2", "clust1", "clust2", "len", "MI")
            ):
                payload[f"lr{k}_{name}"] = cols[j]
        payload["n_lr"] = np.int64(len(lr_acc))
        tmp = self._path(key) + ".tmp.npz"
        np.savez_compressed(tmp, **payload)
        os.replace(tmp, self._path(key))

    def replay(self, key, sr_links, lr_sink):
        z = np.load(self._path(key))
        for ci in range(len(sr_links)):
            if f"sr{ci}_pos1" in z:
                part = LinkTable(
                    *[z[f"sr{ci}_{f}"]
                      for f in ("pos1", "pos2", "clust1", "clust2", "len", "MI")]
                )
                sr_links[ci].append(part)
        for k in range(int(z["n_lr"])):
            lr_sink(
                *[z[f"lr{k}_{name}"]
                  for name in ("pos1", "pos2", "clust1", "clust2", "len", "MI")]
            )


def perform_mi_computation(
    snp_data: SnpData,
    hdw: np.ndarray,
    cds_var,
    lr_save_path: str,
    sr_save_path: str,
    plt_folder: Optional[str] = None,
    sr_dist: int = 20000,
    lr_retain_links: float = 1e6,
    max_blk_sz: int = 10000,
    srp_cutoff: float = 3.0,
    run_aracne_flag: bool = True,
    perform_sr_analysis_only: bool = False,
    order_links: bool = True,
    backend: str = "jax",
    rxy_compat: bool = True,
    r_compat_sampling: bool = True,
    verbose: bool = True,
    checkpoint_dir: Optional[str] = None,
    device_budget_bytes: Optional[int] = None,
    pipeline_depth: int = 4,
    n_devices: Optional[int] = None,
    phase_timings: Optional[dict] = None,
    sr_reduce: str = "auto",
):
    """Full MI computation + background model + ARACNE + TSV outputs.

    Returns the reduced short-range link table (SrLinks with ARACNE column),
    like the reference returns sr_links_red (R/computePairwiseMI.R:143).

    device_budget_bytes bounds the fast path's device-resident slab
    working set (HBM cap for >HBM SNP tensors); pipeline_depth is how
    many tiles are dispatched ahead of host extraction PER DEVICE;
    n_devices round-robins fast-path tiles over that many local devices
    (None = all local devices; outputs are device-count invariant).
    phase_timings, if given a dict, is filled with the wall-clock split
    (sweep / background fit / aracne / sr write, plus the SPMD driver's
    dispatch-pull-emit stats) for benchmarking and observability.
    """
    t000 = time.time()
    from ldweaver_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()  # repeat compiles of the sweep programs
    # become disk reads (~15-40 s each through the relay otherwise)
    # the reference rounds the block size to a 1000-multiple (:69); that
    # quirk only shapes the COMPAT path's block decomposition.  The
    # fast/spmd tile size is an internal knob where 4096 (a pow2, the
    # measured v5e optimum) must not degrade to 4000.  Shared with BLK4's
    # device Hamming so both resolve the same prepare_spmd_codes entry.
    from ldweaver_tpu.parallel.spmd_sweep import fast_block_size

    fast_blk = fast_block_size(snp_data.nsnp, max_blk_sz)
    max_blk_sz = round_blk_sz(max_blk_sz)  # :69
    blocks = make_blocks(snp_data.nsnp, max_blk_sz)
    nclust = cds_var.nclust
    # per-cluster PART lists (concatenated once after the sweep: a
    # concat per block would be quadratic in total links)
    sr_links: List[list] = [[] for _ in range(nclust)]
    neff = float(np.asarray(hdw, dtype=np.float64).sum())  # :77

    lr_links_approx = None
    if not perform_sr_analysis_only:
        lr_links_approx = estimate_lr_links(
            snp_data.pos, snp_data.g, sr_dist, r_compat=r_compat_sampling
        )
        if os.path.exists(lr_save_path):
            os.unlink(lr_save_path)

    def lr_sink(pos1, pos2, clust1, clust2, lens, vals):
        # fast row formatting: "%.15g" is byte-identical to format_float
        # for finite values (it collapses integral floats to int form like
        # R's as.character); +0.0 normalises -0.0 -> "0" like R.  ~3x the
        # throughput of per-value formatting - the LR sink writes up to
        # lr_retain_links rows and was the dominant host cost after the
        # sweep itself.
        lens = np.asarray(lens, np.float64) + 0.0
        vals = np.asarray(vals, np.float64) + 0.0
        if np.isnan(lens).any() or np.isnan(vals).any():  # NA semantics
            rows = zip(pos1, pos2, clust1, clust2, lens, vals)
            append_tsv_rows(
                lr_save_path,
                (
                    (
                        str(int(a)),
                        str(int(b)),
                        str(int(c)),
                        str(int(d)),
                        format_float(e),
                        format_float(f),
                    )
                    for a, b, c, d, e, f in rows
                ),
            )
            return
        fmt = "%d\t%d\t%d\t%d\t%.15g\t%.15g\n"
        with open(lr_save_path, "at") as fh:
            fh.write(
                "".join(
                    fmt % t
                    for t in zip(
                        np.asarray(pos1, np.int64).tolist(),
                        np.asarray(pos2, np.int64).tolist(),
                        np.asarray(clust1, np.int64).tolist(),
                        np.asarray(clust2, np.int64).tolist(),
                        lens.tolist(),
                        vals.tolist(),
                    )
                )
            )

    chkpt = (
        _BlockCheckpoint(
            checkpoint_dir,
            config_key=(
                snp_data.nsnp, snp_data.nseq, sr_dist,
                float(lr_retain_links), max_blk_sz, backend, nclust,
            ),
        )
        if checkpoint_dir
        else None
    )

    def run_block(key, fn):
        """Run one block-pair with block-granular checkpoint/restart
        (SURVEY.md section 5: the reference resumes only at whole-file
        granularity, R/BacGWES.R:382-385; the TPU sweep restarts per
        pair-block)."""
        if chkpt is not None and chkpt.done(key):
            chkpt.replay(key, sr_links, lr_sink)
            return
        before = [len(t) for t in sr_links]
        lr_acc = []

        def capture_sink(*cols):
            lr_acc.append(tuple(np.asarray(c) for c in cols))
            lr_sink(*cols)

        fn(capture_sink)
        if chkpt is not None:
            chkpt.save(key, sr_links, before, lr_acc)

    from ldweaver_tpu.utils.profiling import maybe_trace

    _dev_sr = None
    if backend == "spmd":
        # budget-bounded SPMD scan segments per rank bucket over the
        # device mesh; the complete BLK5 link extraction (SR table +
        # per-tile LR retention) comes off the mesh with fixed-shape scan
        # outputs — no host tile loop (parallel/spmd_sweep.py).
        # Byte-identical to backend="fast".  checkpoint_dir enables
        # SEGMENT-granular resume (each drained segment's pulled arrays
        # persist; a resume skips the pulls — and in host sr mode the
        # dispatch — of completed segments).  device_budget_bytes here
        # caps the device-resident extraction OUTPUT per in-flight
        # segment.
        from ldweaver_tpu.parallel.spmd_sweep import spmd_blk5_sweep

        _spmd_stats, _dev_sr = spmd_blk5_sweep(
            snp_data,
            np.asarray(hdw, dtype=np.float64),
            cds_var.paint,
            neff,
            sr_dist,
            lr_retain_links,
            None if perform_sr_analysis_only else lr_links_approx,
            sr_links,
            lr_sink,
            block=fast_blk,
            n_devices=n_devices,
            perform_sr_only=perform_sr_analysis_only,
            out_budget_bytes=device_budget_bytes,
            verbose=verbose,
            sr_reduce=sr_reduce,
            checkpoint_dir=(
                os.path.join(checkpoint_dir, "spmd_segs")
                if checkpoint_dir else None
            ),
        )
        if phase_timings is not None:
            phase_timings["spmd"] = _spmd_stats
    elif backend == "fast":
        # rank-compacted, r-stratified fast path (see parallel/fast_sweep).
        # Tiles are dispatched `pipeline_depth` ahead of extraction (JAX
        # async dispatch) so host link extraction overlaps device compute,
        # fed from a device-slab LRU cache (one upload per slab instead of
        # two per tile; bounded working set when device_budget_bytes is
        # set - parallel/slabs.py).
        from collections import deque

        from ldweaver_tpu.parallel.fast_sweep import stratify
        from ldweaver_tpu.parallel.slabs import panel_pair_order, plan_budget

        blk = fast_blk
        ranked = stratify(
            snp_data.codes, snp_data.acgtn_table, snp_data.pos, snp_data.r, blk
        )
        paint_sorted = np.concatenate(
            [
                cds_var.paint[ranked.perm],
                np.zeros(ranked.pos.size - snp_data.nsnp, dtype=np.int64),
            ]
        )
        valid = np.arange(ranked.pos.size) < snp_data.nsnp
        nb = ranked.rank_codes.shape[1] // ranked.block
        hdw64 = np.asarray(hdw, dtype=np.float64)
        from ldweaver_tpu.parallel.slabs import auto_budget

        if device_budget_bytes is None:
            device_budget_bytes = auto_budget()  # HBM cap when reported
        _, max_slabs, panel = plan_budget(
            snp_data.nseq, ranked.block, nb, device_budget_bytes
        )
        import jax

        devices = jax.devices()[: (n_devices or None)]
        runner = FastTileRunner(
            ranked, paint_sorted, valid, hdw64, neff, snp_data.g, sr_dist,
            lr_retain_links,
            None if perform_sr_analysis_only else lr_links_approx,
            sr_links, max_slabs=max_slabs, devices=devices,
        )
        depth = max(1, pipeline_depth) * len(runner.devices)

        def depth_limit() -> int:
            """In-flight tile cap.  Extract-mode tiles pin only O(P_sr+K)
            bytes, but full-transfer tiles (explicit transfer='full' or
            post-demotion) each pin a BxB f32 output; under a streaming
            budget a deep pipeline of those can blow plan_budget's
            workspace reserve, so clamp to what ~20% of the budget holds
            (checked per iteration: demotion can flip the mode mid-run)."""
            if device_budget_bytes is None or runner._mode() != "full":
                return depth
            tile_bytes = ranked.block * ranked.block * 4
            cap = max(1, int(device_budget_bytes * 0.2 / tile_bytes))
            return min(depth, cap * len(runner.devices))

        k = 0
        npairs_total = nb * (nb + 1) // 2
        queue: deque = deque()

        def finish_one():
            nonlocal k
            key, pending, t0 = queue.popleft()
            run_block(key, lambda sink: runner.finish(pending, sink))
            k += 1
            if verbose:
                print(
                    f"Block {k} of {npairs_total} ... "
                    f"done in {time.time() - t0:.2f} s"
                )

        cur_panel = -1
        for bi, bj in panel_pair_order(nb, panel):
            p = bi // panel
            if p != cur_panel:
                cur_panel = p
                runner.pin_panel(range(p * panel, min((p + 1) * panel, nb)))
            key = f"fast_{bi}_{bj}"
            if chkpt is not None and chkpt.done(key):
                run_block(key, lambda sink: None)  # replays the checkpoint
                k += 1
                continue
            queue.append((key, runner.dispatch(bi, bj), time.time()))
            while len(queue) >= depth_limit():
                finish_one()
        while queue:
            finish_one()
        runner.unpin_all()
        if verbose:
            ups = sum(c.uploads for c in runner.caches)
            hits = sum(c.hits for c in runner.caches)
            print(
                f"Slab cache: {ups} uploads, {hits} hits over "
                f"{npairs_total} tiles x {len(runner.devices)} device(s)"
            )
    else:
        for bi in range(blocks.shape[0]):
            t0 = time.time()
            fs, fe, ts, te = (int(v) for v in blocks[bi])
            run_block(
                f"compat_{fs}_{ts}",
                lambda sink, fs=fs, fe=fe, ts=ts, te=te: sweep_block_pair(
                    snp_data,
                    np.asarray(hdw, dtype=np.float64),
                    cds_var.paint,
                    neff,
                    fs,
                    fe,
                    ts,
                    te,
                    sr_dist,
                    lr_retain_links,
                    lr_links_approx,
                    sr_links,
                    sink,
                    backend=backend,
                    rxy_compat=rxy_compat,
                    perform_sr_only=perform_sr_analysis_only,
                ),
            )
            if verbose:
                print(
                    f"Block {bi + 1} of {blocks.shape[0]} ... "
                    f"done in {time.time() - t0:.2f} s"
                )

    _t_sweep_end = time.time()
    if backend == "spmd" and _dev_sr is not None:
        # the SR table never left the device: finish the background model
        # from the on-device group stats + candidate links (byte-identical
        # to the host path — parallel/sr_reduce.py module docstring)
        from ldweaver_tpu.core.background import (
            merge_and_sort_sr_links_from_candidates,
        )

        sr_links_red, sr_check, fits = merge_and_sort_sr_links_from_candidates(
            nclust, _dev_sr.tables, _dev_sr.fits, sr_dist, srp_cutoff
        )
    else:
        sr_tables = [LinkTable.concat(parts) for parts in sr_links]
        sr_links_red, sr_check, fits = merge_and_sort_sr_links(
            nclust, sr_tables, sr_dist, srp_cutoff
        )
    _t_bg_end = time.time()

    if plt_folder is not None:
        os.makedirs(plt_folder, exist_ok=True)
        from ldweaver_tpu.io.writers import save_cluster_fits

        save_cluster_fits(fits, plt_folder)

    if run_aracne_flag and len(sr_links_red) > 0:
        labels = run_aracne(
            sr_links_red.pos1,
            sr_links_red.pos2,
            sr_links_red.MI,
            sr_check.pos1,
            sr_check.pos2,
            sr_check.MI,
        )
        sr_links_red.ARACNE = labels.astype(np.int64)
    else:
        sr_links_red.ARACNE = np.ones(len(sr_links_red), dtype=np.int64)
    _t_aracne_end = time.time()

    if order_links and len(sr_links_red) > 0:  # :134-137
        order = np.argsort(-sr_links_red.srp_max, kind="stable")
        sr_links_red = sr_links_red.take(order)

    # sr_links.tsv: 9 cols, no header (schema R/BacGWES.R:385)
    if os.path.exists(sr_save_path):
        os.unlink(sr_save_path)
    append_tsv_rows(
        sr_save_path,
        (
            (
                str(int(sr_links_red.clust_c[i])),
                str(int(sr_links_red.pos1[i])),
                str(int(sr_links_red.pos2[i])),
                str(int(sr_links_red.clust1[i])),
                str(int(sr_links_red.clust2[i])),
                format_float(sr_links_red.len[i]),
                format_float(sr_links_red.MI[i]),
                format_float(sr_links_red.srp_max[i]),
                str(int(sr_links_red.ARACNE[i])),
            )
            for i in range(len(sr_links_red))
        ),
    )
    if phase_timings is not None:
        phase_timings.update(
            sweep_s=round(_t_sweep_end - t000, 2),
            background_s=round(_t_bg_end - _t_sweep_end, 2),
            aracne_s=round(_t_aracne_end - _t_bg_end, 2),
            sr_write_s=round(time.time() - _t_aracne_end, 2),
        )
    if verbose:
        print(f"All done in {(time.time() - t000) / 60:.2f} mins")
    return sr_links_red
