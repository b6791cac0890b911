"""Pipelined fast sweep inside perform_mi_computation: queueing tiles
ahead of extraction and bounding the device slab working set must not
change any output (links, srp, TSV bytes)."""

import numpy as np
import pytest

from ldweaver_tpu.core.cds import CdsVar, Clusters
from ldweaver_tpu.core.sweep import perform_mi_computation


def _cds_var(sd, nclust=2, seed=0):
    rng = np.random.default_rng(seed)
    paint = rng.integers(1, nclust + 1, size=sd.nsnp).astype(np.int64)
    return CdsVar(
        var_estimate=np.zeros(1), cds_start=np.zeros(1, np.int64),
        cds_end=np.zeros(1, np.int64),
        clusts=Clusters(np.array([1]), 0.0), paint=paint,
        ref=np.array(["A"] * sd.nsnp), alt=np.array([""] * sd.nsnp),
        allele_table=sd.acgtn_table, nclust=nclust,
    )


def test_pipelined_budgeted_fast_matches_sync(toy_snp_data, toy_hdw, tmp_path):
    sd = toy_snp_data
    cds_var = _cds_var(sd)

    def run(tag, **kw):
        lr = str(tmp_path / f"lr_{tag}.tsv")
        sr = str(tmp_path / f"sr_{tag}.tsv")
        links = perform_mi_computation(
            sd, toy_hdw, cds_var, lr_save_path=lr, sr_save_path=sr,
            plt_folder=None, sr_dist=2000, srp_cutoff=3.0,
            backend="fast", max_blk_sz=1000, verbose=False, **kw,
        )
        return links, open(sr).read(), sorted(open(lr).read().splitlines())

    base, sr_base, lr_base = run("sync", pipeline_depth=1)
    deep, sr_deep, lr_deep = run("deep", pipeline_depth=7)
    assert sr_deep == sr_base
    assert lr_deep == lr_base

    # tiny budget: slabs stream through the LRU cache in panel order; the
    # LR row ORDER may change (different tile traversal) but the link SETS
    # and the final sr table must be identical
    budget = sd.nseq * 256 * 6  # few-slab working set
    slim, sr_slim, lr_slim = run(
        "slim", pipeline_depth=3, device_budget_bytes=budget
    )
    assert sr_slim == sr_base
    assert lr_slim == lr_base
    assert np.array_equal(slim.pos1, base.pos1)
    assert np.array_equal(slim.srp_max, base.srp_max)


def test_multi_device_round_robin_matches_single(toy_snp_data, toy_hdw, tmp_path):
    """Round-robining fast-path tiles over the 8-device virtual CPU mesh
    must produce byte-identical outputs to a single-device run (the
    assignment is pure data parallelism over the pair space)."""
    sd = toy_snp_data
    cds_var = _cds_var(sd, seed=3)

    def run(tag, nd):
        lr = str(tmp_path / f"lr_{tag}.tsv")
        sr = str(tmp_path / f"sr_{tag}.tsv")
        links = perform_mi_computation(
            sd, toy_hdw, cds_var, lr_save_path=lr, sr_save_path=sr,
            plt_folder=None, sr_dist=2000, srp_cutoff=3.0,
            backend="fast", max_blk_sz=1000, verbose=False,
            n_devices=nd, pipeline_depth=2,
        )
        return links, open(sr).read(), sorted(open(lr).read().splitlines())

    one, sr1, lr1 = run("d1", 1)
    eight, sr8, lr8 = run("d8", 8)
    assert sr8 == sr1
    assert lr8 == lr1
    assert np.array_equal(one.pos1, eight.pos1)
    assert np.array_equal(one.srp_max, eight.srp_max)


def test_summary_saturation_falls_back_to_full(toy_snp_data, toy_hdw):
    """A tiny top-K capacity forces the summary path to saturate; the
    runner must transparently re-run the tile full and produce exactly
    the full-transfer link sets."""
    from ldweaver_tpu.core.sweep import FastTileRunner
    from ldweaver_tpu.parallel.fast_sweep import stratify

    sd = toy_snp_data
    neff = float(toy_hdw.sum())
    paint = np.ones(sd.nsnp, dtype=np.int64)
    ranked = stratify(sd.codes, sd.acgtn_table, sd.pos, sd.r, 1024)
    paint_sorted = np.concatenate(
        [paint[ranked.perm], np.zeros(ranked.pos.size - sd.nsnp, np.int64)]
    )
    valid = np.arange(ranked.pos.size) < sd.nsnp
    nb = ranked.rank_codes.shape[1] // 1024
    approx, retain = 700000.0, 5000.0  # ~5000 kept >> topk=64 -> saturates

    def sweep(transfer, topk):
        sr_links = [[]]
        lr = []

        def sink(p1, p2, c1, c2, ln, mi):
            lr.extend(zip(p1.tolist(), p2.tolist(), mi.tolist()))

        runner = FastTileRunner(
            ranked, paint_sorted, valid, toy_hdw, neff, sd.g, 2000,
            retain, approx, sr_links, transfer=transfer, topk=topk,
        )
        for bi in range(nb):
            for bj in range(bi, nb):
                runner.finish(runner.dispatch(bi, bj), sink)
        srk = {
            (int(a), int(b))
            for parts in sr_links for t in parts
            for a, b in zip(t.pos1, t.pos2)
        }
        return {(a, b) for a, b, _ in lr}, srk

    lr_sat, sr_sat = sweep("summary", topk=64)   # saturates -> fallback
    lr_full, sr_full = sweep("full", topk=64)
    assert sr_sat == sr_full
    assert lr_sat == lr_full  # fallback is exact, not boundary-noisy
    assert len(lr_full) > 1000


def _dup_heavy_synth(nsnp=1024, ndup=48, nseq=64, g=2_000_000, seed=9):
    """Synthetic SnpData where `ndup` SNPs share one identical pattern:
    their pairwise MIs are all maximal and far apart (LR), so any tile
    containing them has rows with > 16 candidates above the retention
    threshold — the per-row saturation case (core/sweep.py n_row_max)."""
    from ldweaver_tpu.core.snp_tensor import SnpData

    rng = np.random.default_rng(seed)
    major = rng.integers(0, 4, size=nsnp)
    minor = (major + rng.integers(1, 4, size=nsnp)) % 4
    maf = rng.uniform(0.05, 0.5, size=nsnp)
    codes = np.where(
        rng.random((nseq, nsnp)) < maf[None, :], minor[None, :], major[None, :]
    ).astype(np.uint8)
    # duplicate one balanced pattern across ndup columns spread genome-wide
    pattern = (rng.random(nseq) < 0.5).astype(np.uint8)  # A/C split
    dup_cols = np.linspace(0, nsnp - 1, ndup).astype(np.int64)
    codes[:, dup_cols] = pattern[:, None]
    pos = np.sort(
        rng.choice(np.arange(1, g + 1), nsnp, replace=False)
    ).astype(np.int64)
    acgtn = np.zeros((5, nsnp), np.int64)
    for k in range(5):
        acgtn[k] = (codes == k).sum(axis=0)
    uqe = (acgtn > 0).astype(np.uint8).T
    r = uqe.sum(axis=1).astype(np.int32)
    sd = SnpData(
        codes=codes, pos=pos, g=g,
        seq_names=[str(i) for i in range(nseq)],
        acgtn_table=acgtn, uqe=uqe, r=r,
    )
    return sd, rng.uniform(0.1, 0.6, size=nseq)


def _run_fast_tiles(sd, hdw, transfer, topk, retain, approx, block=512,
                    sr_dist=2000):
    from ldweaver_tpu.core.sweep import FastTileRunner
    from ldweaver_tpu.parallel.fast_sweep import stratify

    neff = float(hdw.sum())
    paint = np.ones(sd.nsnp, dtype=np.int64)
    ranked = stratify(sd.codes, sd.acgtn_table, sd.pos, sd.r, block)
    paint_sorted = np.concatenate(
        [paint[ranked.perm], np.zeros(ranked.pos.size - sd.nsnp, np.int64)]
    )
    valid = np.arange(ranked.pos.size) < sd.nsnp
    nb = ranked.rank_codes.shape[1] // block
    sr_links = [[]]
    lr = []

    def sink(p1, p2, c1, c2, ln, mi):
        lr.extend(zip(p1.tolist(), p2.tolist(), mi.tolist()))

    runner = FastTileRunner(
        ranked, paint_sorted, valid, hdw, neff, sd.g, sr_dist,
        retain, approx, sr_links, transfer=transfer, topk=topk,
    )
    full_dispatches = [0]
    orig = runner._dispatch_full

    def spy(*a, **k):
        full_dispatches[0] += 1
        return orig(*a, **k)

    runner._dispatch_full = spy
    ntiles = 0
    for bi in range(nb):
        for bj in range(bi, nb):
            runner.finish(runner.dispatch(bi, bj), sink)
            ntiles += 1
    srk = {
        (int(a), int(b))
        for parts in sr_links for t in parts
        for a, b in zip(t.pos1, t.pos2)
    }
    return {(a, b): m for a, b, m in lr}, srk, runner, full_dispatches[0], ntiles


def test_per_row_saturation_exact_and_bounded(toy_hdw):
    """Adversarial density: duplicated SNP patterns give single rows > 16
    LR candidates above a selective threshold (n_row_max saturation,
    NOT global top-K overflow).  The fallback must be exact and cost at
    most one extra full dispatch per saturated tile."""
    sd, w = _dup_heavy_synth()
    # selective retention: ~0.1% of pairs kept -> normal rows hold < 1
    # candidate, duplicate rows hold ~47 -> per-row saturation only
    retain, approx = 500.0, 500_000.0
    topk = 32768  # far above any tile's candidate count: no global overflow

    lr_s, sr_s, run_s, fulls_s, ntiles = _run_fast_tiles(
        sd, w, "summary", topk, retain, approx
    )
    lr_f, sr_f, run_f, fulls_f, _ = _run_fast_tiles(
        sd, w, "full", topk, retain, approx
    )
    assert run_s.fallbacks >= 1, "expected per-row saturation"
    assert sr_s == sr_f
    assert lr_s.keys() == lr_f.keys()
    for k in lr_s:
        assert lr_s[k] == pytest.approx(lr_f[k], rel=1e-6)
    # cost bound: one full dispatch per fallback + any post-demotion tiles;
    # never more than one full dispatch per tile overall
    assert fulls_s <= ntiles
    assert fulls_f == ntiles


def test_saturation_demotes_to_full_transfers(toy_hdw):
    """When EVERY tile saturates (retention threshold below all values),
    the runner demotes itself after 4 wasted summary dispatches instead
    of paying dispatch-twice for the whole sweep."""
    sd, w = _dup_heavy_synth(nsnp=1280)
    # retain > approx -> lr_prob == 0 -> threshold = min -> all above
    lr_s, sr_s, run_s, fulls_s, ntiles = _run_fast_tiles(
        sd, w, "summary", 1024, retain=2000.0, approx=1000.0, block=256
    )
    assert ntiles >= 10
    assert run_s._demoted
    assert run_s.fallbacks == 4  # bounded: not one per tile
    assert fulls_s == ntiles  # every tile still extracted exactly once full
    lr_f, sr_f, *_ = _run_fast_tiles(
        sd, w, "full", 1024, retain=2000.0, approx=1000.0, block=256
    )
    assert sr_s == sr_f and lr_s.keys() == lr_f.keys()


def test_pipelined_checkpoint_resume_mid_queue(toy_snp_data, toy_hdw, tmp_path):
    """Checkpoints written by a pipelined run replay correctly on rerun."""
    sd = toy_snp_data
    cds_var = _cds_var(sd, nclust=1, seed=1)
    chk = str(tmp_path / "chk")

    def run(tag, chkpt):
        lr = str(tmp_path / f"lr_{tag}.tsv")
        sr = str(tmp_path / f"sr_{tag}.tsv")
        links = perform_mi_computation(
            sd, toy_hdw, cds_var, lr_save_path=lr, sr_save_path=sr,
            plt_folder=None, sr_dist=2000, srp_cutoff=3.0,
            backend="fast", max_blk_sz=1000, verbose=False,
            checkpoint_dir=chkpt, pipeline_depth=5,
        )
        return links, open(lr).read()

    a, lr_a = run("a", chk)
    b, lr_b = run("b", chk)  # pure replay
    assert lr_a == lr_b
    assert np.array_equal(a.pos1, b.pos1)
    assert np.array_equal(a.srp_max, b.srp_max)
