"""Hamming weights, CDS diversity / k-means / painter, background model,
and ARACNE unit tests."""

import numpy as np
import pytest

from ldweaver_tpu.core.aracne import run_aracne
from ldweaver_tpu.core.background import (
    fit_cluster_background,
    fit_lookup,
    merge_and_sort_sr_links,
)
from ldweaver_tpu.core.cds import (
    Clusters,
    painter,
    perform_clustering,
    reference_mask,
)
from ldweaver_tpu.core.hamming import hamming_weights_jax, hamming_weights_numpy
from ldweaver_tpu.core.mi import LinkTable
from ldweaver_tpu.utils.r_compat import quantile_type7


# ---------------------------------------------------------------- hamming
def test_hamming_bruteforce():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 5, size=(12, 60)).astype(np.uint8)
    w = hamming_weights_numpy(codes, threshold=0.5)
    nsnp = 60
    thresh = int(nsnp * 0.5)
    for s in range(12):
        cnt = 0
        for t in range(12):
            shared = int((codes[s] == codes[t]).sum())
            if nsnp - shared < thresh:
                cnt += 1
        assert w[s] == pytest.approx(1.0 / (cnt + 1))


def test_hamming_jax_matches_numpy(toy_snp_data):
    w_np = hamming_weights_numpy(toy_snp_data.codes, 0.1)
    w_jx = hamming_weights_jax(toy_snp_data.codes, 0.1)
    assert np.array_equal(w_np, w_jx)


def test_hamming_spmd_matches_numpy(toy_snp_data):
    """BLK4's shared-upload path: Hamming weights from the STRATIFIED
    rank-code tensor (per-site relabelling + column permutation + zero
    pad columns) must equal the f64 oracle exactly — equality counts are
    invariant to all three (spmd_sweep._build_hamming docstring)."""
    from ldweaver_tpu.core.hamming import estimate_hamming_distance_weights

    w_np = hamming_weights_numpy(toy_snp_data.codes, 0.1)
    # block 1024 < nsnp=1268 -> the ranked tensor has pad columns
    w_sp = estimate_hamming_distance_weights(
        toy_snp_data, 0.1, backend="spmd", max_blk_sz=1024
    )
    assert np.array_equal(w_np, w_sp)
    # oversize nseq gate: falls back to the seq-blocked jax path
    from ldweaver_tpu.parallel.spmd_sweep import hamming_weights_spmd

    assert hamming_weights_spmd(
        toy_snp_data, 0.1, max_blk_sz=1024, max_nseq=4
    ) is None


def test_hamming_self_weight_bound(toy_hdw):
    # every sequence counts itself -> weight <= 1/2
    assert toy_hdw.max() <= 0.5
    assert toy_hdw.min() > 0


# ---------------------------------------------------------------- cds
def test_reference_mask():
    mask = reference_mask(np.array(["A", "C", "G", "T", "N", "-", "x"]))
    assert mask[0, 0] == 0 and mask[1:, 0].all()
    assert mask[1, 1] == 0
    assert mask[4, 4] == 0 and mask[4, 5] == 0
    assert mask[:, 6].all()  # unknown char leaves column unmasked


def test_perform_clustering_relabels_by_size():
    # sizes: big cluster near 0 (6 pts), mid (3 pts), small (1 pt)
    x = np.array([0.1, 0.11, 0.12, 0.09, 0.1, 0.13, 1.0, 1.1, 1.05, 5.0])
    cl = perform_clustering(x, nclust=3)
    lab = cl.km_clst_ord
    assert (lab[:6] == 1).all()
    assert (lab[6:9] == 2).all()
    assert lab[9] == 3
    assert cl.cutoff == pytest.approx(0.13)


def test_painter_basic_and_gap_fill():
    pos = np.arange(1, 21) * 10  # 10..200
    # CDS cluster 1 covers (5, 95) strict; cluster 2 covers (105, 185)
    clusters = Clusters(km_clst_ord=np.array([1, 2]), cutoff=0.0)
    paint = painter(pos, clusters, np.array([5, 105]), np.array([95, 185]))
    # pos 10..90 -> 1 ; pos 110..180 -> 2
    assert (paint[:9] == 1).all()
    # pos 100 is unpainted (not strictly inside either) -> split-filled
    # pos 190,200 unpainted at the end -> right-edge fill from the left
    assert paint[-1] in (1, 2)
    assert set(np.unique(paint)) <= {1, 2}


def test_painter_strict_boundaries_and_dropped_final_run():
    pos = np.array([5, 10, 20, 30])
    clusters = Clusters(km_clst_ord=np.array([1]), cutoff=0.0)
    # CDS [10, 30]: pos 10 and 30 are ON the boundary -> not painted
    paint = painter(pos, clusters, np.array([10]), np.array([30]))
    # pos 20 strictly inside -> 1; leading zeros edge-filled to 1.
    # The trailing SNP stays 0: the reference's run-length scan drops the
    # final run when the last element starts a new run
    # (R/estimateCDSDiversity.R:166-180) so the right-edge patch never
    # sees it - replicated quirk.
    assert paint.tolist() == [1, 1, 1, 0]


# ---------------------------------------------------------------- background
def test_quantile_type7_matches_R():
    x = np.array([1.0, 2.0, 3.0, 4.0, 10.0])
    # R: quantile(c(1,2,3,4,10), .95) = 8.8
    assert quantile_type7(x, 0.95) == pytest.approx(8.8)
    assert quantile_type7(x, 0.0) == 1.0
    assert quantile_type7(x, 1.0) == 10.0


def test_fit_lookup_indexes_by_value():
    # fitted vector has 3 entries; len=2 -> second entry, len=5 -> NaN
    from ldweaver_tpu.core.background import ClusterFit

    fit = ClusterFit(
        lens=np.array([10.0, 20.0, 30.0]),
        q95=np.ones(3),
        fitted=np.array([0.5, 0.6, 0.7]),
        coef=(0.0, 0.0),
        beta_shape=(np.nan, np.nan),
    )
    out = fit_lookup(fit, np.array([1.0, 2.0, 3.0, 5.0, 2.5]))
    assert out[0] == 0.5 and out[1] == 0.6 and out[2] == 0.7
    assert np.isnan(out[3])
    assert out[4] == 0.6  # R truncates fractional subscripts


def test_merge_and_sort_cross_cluster_dedup():
    rng = np.random.default_rng(5)
    n = 4000
    lens = rng.integers(1, 200, size=n).astype(np.float64)
    mi = 0.05 + 0.3 * rng.random(n) * (200.0 / (lens + 50))
    # cluster tables: same links appear in both clusters with clust1 != clust2
    t = LinkTable(
        pos1=np.arange(n, dtype=np.int64),
        pos2=np.arange(n, dtype=np.int64) + 100000,
        clust1=np.ones(n, dtype=np.int64),
        clust2=np.full(n, 2, dtype=np.int64),
        len=lens,
        MI=mi,
    )
    red, check, fits = merge_and_sort_sr_links(2, [t, t], 20000, srp_cutoff=0.0)
    # each link retained at most once
    keys = set(zip(red.pos1.tolist(), red.pos2.tolist()))
    assert len(keys) == len(red)
    assert len(check) >= len(red)
    # srp positive and finite
    assert np.isfinite(red.srp_max).all()
    assert (red.srp_max > 0).all()


# ---------------------------------------------------------------- aracne
def test_aracne_triplet():
    # Links: X-Z weak (0.1), X-Y strong (0.5), Y-Z strong (0.4)
    full = dict(
        pos1=np.array([1, 1, 2]),
        pos2=np.array([3, 2, 3]),
        mi=np.array([0.1, 0.5, 0.4]),
    )
    labels = run_aracne(
        np.array([1, 1, 2]),
        np.array([3, 2, 3]),
        np.array([0.1, 0.5, 0.4]),
        full["pos1"],
        full["pos2"],
        full["mi"],
    )
    # X-Z indirect (both X-Y and Y-Z exceed it); the others direct
    assert labels.tolist() == [False, True, True]


def test_aracne_ties_are_direct():
    # equal MI does NOT mark indirect (strict <, src/computeMI.cpp:69-74)
    labels = run_aracne(
        np.array([1]),
        np.array([3]),
        np.array([0.4]),
        np.array([1, 1, 2]),
        np.array([3, 2, 3]),
        np.array([0.4, 0.4, 0.4]),
    )
    assert labels.tolist() == [True]


def test_aracne_no_common_neighbour():
    labels = run_aracne(
        np.array([1]),
        np.array([2]),
        np.array([0.01]),
        np.array([1, 2]),
        np.array([2, 5]),
        np.array([0.01, 0.9]),
    )
    assert labels.tolist() == [True]


def test_aracne_native_matches_python():
    rng = np.random.default_rng(17)
    n = 600
    positions = rng.choice(np.arange(100, 100000), size=80, replace=False)
    p1 = positions[rng.integers(0, 80, n)]
    p2 = positions[rng.integers(0, 80, n)]
    keep = p1 != p2
    p1, p2 = p1[keep], p2[keep]
    lo = np.minimum(p1, p2)
    hi = np.maximum(p1, p2)
    uniq = np.unique(np.stack([lo, hi], 1), axis=0)
    lo, hi = uniq[:, 0], uniq[:, 1]
    mi = rng.random(lo.size)
    chk = slice(0, lo.size // 2)
    a = run_aracne(lo[chk], hi[chk], mi[chk], lo, hi, mi, use_native=False)
    b = run_aracne(lo[chk], hi[chk], mi[chk], lo, hi, mi, use_native=True)
    assert np.array_equal(a, b)


def test_hamming_blocked_matches_numpy():
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 5, (300, 500)).astype(np.uint8)
    a = hamming_weights_numpy(codes, 0.3)
    b = hamming_weights_jax(codes, 0.3, seq_block=128)  # multi-block + pad
    assert np.array_equal(a, b)
