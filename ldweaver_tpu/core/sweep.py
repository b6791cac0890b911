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


def sweep_block_pair_fast_summary(
    ranked,
    paint_sorted: np.ndarray,
    valid: np.ndarray,
    hdw: np.ndarray,
    neff: float,
    g: int,
    bi: int,
    bj: int,
    sr_dist: int,
    lr_prob: float,
    sr_links: List[LinkTable],
    lr_rows_sink: Callable,
    topk: int = 8192,
) -> bool:
    """Device-summary block pair: only O(K) LR candidates + the SR-capable
    submatrix leave the device.  Returns False if the top-K saturated (the
    caller must re-run with the full-tile path)."""
    import jax.numpy as jnp

    from ldweaver_tpu.parallel.fast_sweep import (
        _build_rank_tile_summary,
        _wparts,
    )

    B = ranked.block
    f_sl = slice(bi * B, (bi + 1) * B)
    t_sl = slice(bj * B, (bj + 1) * B)
    pos_f = ranked.pos[f_sl]
    pos_t = ranked.pos[t_sl]
    val_f = valid[f_sl]
    val_t = valid[t_sl]
    paint_f = paint_sorted[f_sl]
    paint_t = paint_sorted[t_sl]
    r_f = ranked.r[f_sl]
    r_t = ranked.r[t_sl]

    # SR-capable rows/cols from positions (host, cheap)
    row_cnt = _circular_window_counts(pos_f, pos_t[val_t], g, sr_dist)
    col_cnt = _circular_window_counts(pos_t, pos_f[val_f], g, sr_dist)
    rows_sel = np.flatnonzero((row_cnt > 0) & val_f)
    cols_sel = np.flatnonzero((col_cnt > 0) & val_t)
    nrow_cap = _next_pow2(rows_sel.size)
    ncol_cap = _next_pow2(cols_sel.size)
    row_pad = np.zeros(nrow_cap, np.int32)
    row_pad[: rows_sel.size] = rows_sel
    col_pad = np.zeros(ncol_cap, np.int32)
    col_pad[: cols_sel.size] = cols_sel

    Rf = int(r_f.max())
    Rt = int(r_t.max())
    fn = _build_rank_tile_summary(
        B, B, Rf, Rt, 3, topk, nrow_cap, ncol_cap
    )
    w32, wparts = _wparts(hdw)
    codes_f = np.ascontiguousarray(ranked.rank_codes[:, f_sl].T)
    codes_t = np.ascontiguousarray(ranked.rank_codes[:, t_sl].T)
    thresh, n_above, n_row_max, vals, idx, sub = fn(
        jnp.asarray(codes_f),
        jnp.asarray(codes_t),
        jnp.asarray(w32),
        jnp.asarray(wparts),
        jnp.asarray(r_f, jnp.float32),
        jnp.asarray(r_t, jnp.float32),
        jnp.asarray(np.float32(neff)),
        jnp.asarray(pos_f, jnp.int32),
        jnp.asarray(pos_t, jnp.int32),
        jnp.asarray(val_f),
        jnp.asarray(val_t),
        jnp.asarray(bool(bi == bj)),
        jnp.asarray(np.int32(g)),
        jnp.asarray(np.float32(sr_dist)),
        jnp.asarray(np.float32(lr_prob)),
        jnp.asarray(row_pad),
        jnp.asarray(col_pad),
    )
    n_above = int(n_above)
    if n_above > vals.shape[0] or int(n_row_max) > 16:
        return False  # saturated (globally or per-row): full-tile fallback
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
                sr_dist, lr_prob, sr_links, lr_rows_sink,
                apply_lr_quantile=False, lr_thresh=thresh,
            )

    # SR pairs from the gathered submatrix
    if rows_sel.size and cols_sel.size:
        sub = np.asarray(sub, np.float64)[: rows_sel.size, : cols_sel.size]
        pi = pos_f[rows_sel]
        pj = pos_t[cols_sel]
        lens = circular_len(
            pj[None, :].astype(np.float64), pi[:, None].astype(np.float64), g
        )
        mask = lens <= sr_dist
        if bi == bj:
            mask &= rows_sel[:, None] > cols_sel[None, :]
        ri, cj = np.nonzero(mask)
        if ri.size:
            _emit_pairs(
                rows_sel[ri], cols_sel[cj], sub[ri, cj],
                pos_f, pos_t, paint_f, paint_t, g, sr_dist,
                None, sr_links, lr_rows_sink,
            )
    return True


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
    """Fast-path block pair: rank-compacted tile + host extraction.

    Unlike the compat path, off-diagonal block pairs KEEP their in-block
    diagonal pairs (the reference drops them - a quirk, not a feature).

    transfer: 'full' always pulls the whole MI tile; 'summary' uses the
    on-device quantile/top-K/SR-submatrix reduction; 'auto' chooses
    'summary' when the retention probability is selective enough for the
    top-K to be safe."""
    from ldweaver_tpu.parallel.fast_sweep import mi_tile_rank

    B = ranked.block
    lr_prob = (
        None
        if lr_links_approx is None
        else max(0.0, 1.0 - lr_retain_links / lr_links_approx)
    )
    use_summary = transfer == "summary" or (
        transfer == "auto"
        and lr_prob is not None
        and lr_prob > 0.0
        and (1.0 - lr_prob) * B < 48  # two-stage top-k row capacity
        and B >= 1024
    )
    if use_summary:
        if sweep_block_pair_fast_summary(
            ranked, paint_sorted, valid, hdw, neff, g, bi, bj, sr_dist,
            lr_prob, sr_links, lr_rows_sink,
        ):
            return
        # saturated top-K: fall through to the full-tile path
    f_sl = slice(bi * B, (bi + 1) * B)
    t_sl = slice(bj * B, (bj + 1) * B)
    codes_f = np.ascontiguousarray(ranked.rank_codes[:, f_sl].T)
    codes_t = np.ascontiguousarray(ranked.rank_codes[:, t_sl].T)
    r_f = ranked.r[f_sl]
    r_t = ranked.r[t_sl]
    mi = mi_tile_rank(codes_f, codes_t, hdw, r_f, r_t, neff)

    pos_f = ranked.pos[f_sl]
    pos_t = ranked.pos[t_sl]
    paint_f = paint_sorted[f_sl]
    paint_t = paint_sorted[t_sl]
    val_f = valid[f_sl]
    val_t = valid[t_sl]

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
    _emit_pairs(
        ii, jj, mi[ii, jj], pos_f, pos_t, paint_f, paint_t, g, sr_dist,
        lr_prob, sr_links, lr_rows_sink,
    )


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
):
    """Full MI computation + background model + ARACNE + TSV outputs.

    Returns the reduced short-range link table (SrLinks with ARACNE column),
    like the reference returns sr_links_red (R/computePairwiseMI.R:143).
    """
    t000 = time.time()
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

    if backend == "fast":
        # rank-compacted, r-stratified fast path (see parallel/fast_sweep)
        from ldweaver_tpu.parallel.fast_sweep import stratify

        blk = min(max_blk_sz, 1 << int(np.ceil(np.log2(max(snp_data.nsnp, 2)))))
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
        k = 0
        npairs_total = nb * (nb + 1) // 2
        for bi in range(nb):
            for bj in range(bi, nb):
                t0 = time.time()
                run_block(
                    f"fast_{bi}_{bj}",
                    lambda sink, bi=bi, bj=bj: sweep_block_pair_fast(
                        ranked, paint_sorted, valid, hdw64, neff,
                        snp_data.g, bi, bj, sr_dist, lr_retain_links,
                        None if perform_sr_analysis_only else lr_links_approx,
                        sr_links, sink,
                    ),
                )
                k += 1
                if verbose:
                    print(
                        f"Block {k} of {npairs_total} ... "
                        f"done in {time.time() - t0:.2f} s"
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

    sr_tables = [LinkTable.concat(parts) for parts in sr_links]
    sr_links_red, sr_check, fits = merge_and_sort_sr_links(
        nclust, sr_tables, sr_dist, srp_cutoff
    )

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
    if verbose:
        print(f"All done in {(time.time() - t000) / 60:.2f} mins")
    return sr_links_red
