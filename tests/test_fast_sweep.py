"""Fast rank-compacted sweep vs the f64 oracle on the toy data."""

import numpy as np
import pytest

from ldweaver_tpu.core.mi import circular_len, mi_tile_numpy
from ldweaver_tpu.parallel.fast_sweep import (
    fast_lr_topk,
    rank_encode,
    stratify,
)


def test_rank_encode_roundtrip(toy_snp_data):
    sd = toy_snp_data
    rk = rank_encode(sd.codes, sd.acgtn_table)
    # ranks bounded by r at each site
    assert (rk < sd.r[None, :]).all()
    # rank 0 is the major allele: its count equals the max count
    maj_count = np.array(
        [(rk[:, s] == 0).sum() for s in range(sd.nsnp)]
    )
    assert np.array_equal(maj_count, sd.acgtn_table.max(axis=0))
    # contingency invariance: counts per rank match sorted allele counts
    for s in [0, 17, 500]:
        rank_counts = np.bincount(rk[:, s], minlength=5)
        allele_counts = np.sort(sd.acgtn_table[:, s])[::-1]
        assert np.array_equal(rank_counts, allele_counts)


def test_stratify_blocks_sorted(toy_snp_data):
    sd = toy_snp_data
    ranked = stratify(sd.codes, sd.acgtn_table, sd.pos, sd.r, 256)
    n = sd.nsnp
    assert (np.diff(ranked.r[:n]) >= 0).all()
    # permutation round-trips positions
    assert set(ranked.pos[:n].tolist()) == set(sd.pos.tolist())


def test_fast_topk_matches_oracle(toy_snp_data, toy_hdw):
    sd = toy_snp_data
    w = toy_hdw
    neff = float(w.sum())
    sr_dist = 2000
    K = 200

    # oracle: full all-vs-all tile (single diagonal block; compat == exact
    # RXY there), upper-triangle pairs, LR filter, top-K by MI
    tile = mi_tile_numpy(
        np.ascontiguousarray(sd.codes.T),
        np.ascontiguousarray(sd.codes.T),
        w,
        sd.r,
        sd.r,
        sd.uqe,
        sd.uqe,
        neff,
    )
    iu, ju = np.triu_indices(sd.nsnp, 1)
    lens = circular_len(sd.pos[ju], sd.pos[iu], sd.g)
    lr = lens > sr_dist
    vals = tile[iu[lr], ju[lr]]
    order = np.argsort(-vals, kind="stable")[:K]
    oracle_vals = vals[order]

    pos1, pos2, mi = fast_lr_topk(
        sd, w, block=256, sr_dist=sr_dist, topk=K, n_devices=8
    )
    assert mi.size == K
    # value agreement (bf16x3 + marginal closure ~ 1e-5 relative)
    assert np.allclose(np.sort(mi), np.sort(oracle_vals), rtol=5e-4, atol=1e-5)
    # pair-set agreement away from the boundary: every fast link whose MI
    # clears the oracle's K-th value by a margin must be in the oracle set
    oracle_pairs = {
        (min(a, b), max(a, b))
        for a, b in zip(sd.pos[iu[lr][order]], sd.pos[ju[lr][order]])
    }
    margin = oracle_vals[-1] + 1e-4
    for p1, p2, v in zip(pos1, pos2, mi):
        if v > margin:
            assert (min(p1, p2), max(p1, p2)) in oracle_pairs


def test_fast_backend_full_mi_computation(toy_snp_data, toy_hdw, tmp_path):
    """backend='fast' end-to-end MI computation vs the exact numpy path
    (toy data is a single diagonal block, where the fast path's RXY and
    emission rules coincide with the compat path)."""
    from ldweaver_tpu.core.cds import CdsVar, Clusters
    from ldweaver_tpu.core.sweep import perform_mi_computation

    sd = toy_snp_data
    rng = np.random.default_rng(0)
    paint = rng.integers(1, 3, size=sd.nsnp).astype(np.int64)
    cds_var = CdsVar(
        var_estimate=np.zeros(1), cds_start=np.zeros(1, np.int64),
        cds_end=np.zeros(1, np.int64),
        clusts=Clusters(np.array([1]), 0.0), paint=paint,
        ref=np.array(["A"] * sd.nsnp), alt=np.array([""] * sd.nsnp),
        allele_table=sd.acgtn_table, nclust=2,
    )
    out = {}
    for backend in ("numpy", "fast"):
        lr = str(tmp_path / f"lr_{backend}.tsv")
        sr = str(tmp_path / f"sr_{backend}.tsv")
        links = perform_mi_computation(
            sd, toy_hdw, cds_var, lr_save_path=lr, sr_save_path=sr,
            plt_folder=None, sr_dist=2000, srp_cutoff=3.0,
            backend=backend, verbose=False,
        )
        out[backend] = links
    a, b = out["numpy"], out["fast"]
    # same number of retained links within tie-noise
    assert abs(len(a) - len(b)) <= max(2, int(0.01 * len(a)))
    ka = {(p1, p2): m for p1, p2, m in zip(a.pos1, a.pos2, a.MI)}
    kb = {(p1, p2): m for p1, p2, m in zip(b.pos1, b.pos2, b.MI)}
    common = set(ka) & set(kb)
    assert len(common) >= 0.99 * min(len(ka), len(kb))
    for key in list(common)[:500]:
        assert abs(ka[key] - kb[key]) < 5e-4 * max(1.0, abs(ka[key]))


def test_summary_transfer_matches_full(toy_snp_data, toy_hdw):
    """Device-summary transfer path vs full-tile pulls on a selective
    LR-retention setup (thresholds computed on device vs host may differ
    in the last float, so boundary links get a small tolerance)."""
    from ldweaver_tpu.core.sweep import sweep_block_pair_fast
    from ldweaver_tpu.core.mi import LinkTable
    from ldweaver_tpu.parallel.fast_sweep import stratify

    sd = toy_snp_data
    hdw = toy_hdw
    neff = float(hdw.sum())
    rng = np.random.default_rng(2)
    paint = rng.integers(1, 3, size=sd.nsnp).astype(np.int64)

    ranked = stratify(sd.codes, sd.acgtn_table, sd.pos, sd.r, 1024)
    paint_sorted = np.concatenate(
        [paint[ranked.perm], np.zeros(ranked.pos.size - sd.nsnp, np.int64)]
    )
    valid = np.arange(ranked.pos.size) < sd.nsnp
    # selective retention: keep ~400 of the LR links
    approx = 700000.0
    retain = 400.0

    results = {}
    for transfer in ("full", "summary"):
        sr_links = [[], []]  # per-cluster part lists
        lr_rows = []

        def sink(p1, p2, c1, c2, ln, mi):
            lr_rows.append((p1.copy(), p2.copy(), mi.copy()))

        nb = ranked.rank_codes.shape[1] // 1024
        for bi in range(nb):
            for bj in range(bi, nb):
                sweep_block_pair_fast(
                    ranked, paint_sorted, valid, hdw, neff, sd.g,
                    bi, bj, 2000, retain, approx, sr_links, sink,
                    transfer=transfer,
                )
        lr = (
            set()
            if not lr_rows
            else {
                (int(a), int(b))
                for p1, p2, _ in lr_rows
                for a, b in zip(p1, p2)
            }
        )
        srk = {
            (int(a), int(b))
            for parts in sr_links
            for t in parts
            for a, b in zip(t.pos1, t.pos2)
        }
        results[transfer] = (lr, srk)

    lr_f, sr_f = results["full"]
    lr_s, sr_s = results["summary"]
    assert sr_f == sr_s  # SR extraction must agree exactly
    assert len(lr_f) > 50
    # LR sets agree up to threshold-boundary noise
    assert len(lr_f ^ lr_s) <= max(4, int(0.02 * len(lr_f)))


def test_block_checkpoint_resume(toy_snp_data, toy_hdw, tmp_path):
    """Interrupting the sweep and re-running resumes from completed
    block-pairs and produces identical outputs."""
    from ldweaver_tpu.core.cds import CdsVar, Clusters
    from ldweaver_tpu.core.sweep import perform_mi_computation

    sd = toy_snp_data
    paint = np.ones(sd.nsnp, dtype=np.int64)
    cds_var = CdsVar(
        var_estimate=np.zeros(1), cds_start=np.zeros(1, np.int64),
        cds_end=np.zeros(1, np.int64),
        clusts=Clusters(np.array([1]), 0.0), paint=paint,
        ref=np.array(["A"] * sd.nsnp), alt=np.array([""] * sd.nsnp),
        allele_table=sd.acgtn_table, nclust=1,
    )

    def run(tag, chkpt):
        lr = str(tmp_path / f"lr_{tag}.tsv")
        sr = str(tmp_path / f"sr_{tag}.tsv")
        links = perform_mi_computation(
            sd, toy_hdw, cds_var, lr_save_path=lr, sr_save_path=sr,
            plt_folder=None, sr_dist=2000, srp_cutoff=3.0,
            backend="numpy", max_blk_sz=1000, verbose=False,
            checkpoint_dir=chkpt,
        )
        return links, open(lr).read()

    chkpt = str(tmp_path / "chk")
    base, lr_base = run("a", None)
    first, lr_first = run("b", chkpt)
    # all blocks checkpointed now; a re-run replays them
    import os

    n_blk = len([f for f in os.listdir(chkpt) if f.endswith(".npz")])
    assert n_blk == 3  # ceil(1268/1000)=2 blocks -> 3 upper-tri pairs
    second, lr_second = run("c", chkpt)
    assert lr_first == lr_second == lr_base
    assert np.array_equal(first.pos1, second.pos1)
    assert np.allclose(first.srp_max, second.srp_max)
    assert np.array_equal(first.srp_max, base.srp_max)


@pytest.mark.parametrize("rmax_f,rmax_t", [(2, 2), (2, 5), (3, 3), (4, 2), (5, 5), (1, 3)])
def test_rank_tile_all_bucket_shapes(rmax_f, rmax_t):
    """_rank_tile_mi (marginal closure + implicit uq gating) vs the
    oracle for every (Rf, Rt) bucket shape, including r=1 monomorphic
    padding sites."""
    from ldweaver_tpu.core.mi import mi_tile_numpy
    from ldweaver_tpu.parallel.fast_sweep import mi_tile_rank

    rng = np.random.default_rng(rmax_f * 10 + rmax_t)
    F, T, S = 40, 36, 200
    w = rng.uniform(0.1, 1.0, S)

    def make(B, rmax):
        codes = np.zeros((B, S), np.uint8)
        r = np.zeros(B, np.int64)
        for i in range(B):
            ri = int(rng.integers(1, rmax + 1))
            r[i] = ri
            # rank codes with every rank 0..ri-1 present
            codes[i] = rng.integers(0, ri, S)
            codes[i, :ri] = np.arange(ri)
        return codes, r

    codes_f, r_f = make(F, rmax_f)
    codes_t, r_t = make(T, rmax_t)
    uq_f = (np.arange(5)[None, :] < r_f[:, None]).astype(np.uint8)
    uq_t = (np.arange(5)[None, :] < r_t[:, None]).astype(np.uint8)
    neff = float(w.sum())
    oracle = mi_tile_numpy(
        codes_f, codes_t, w, r_f, r_t, uq_f, uq_t, neff, rxy_compat=False
    )
    fast = mi_tile_rank(codes_f, codes_t, w, r_f, r_t, neff)
    assert np.allclose(fast, oracle, rtol=2e-4, atol=2e-5), (
        np.abs(fast - oracle).max()
    )


@pytest.mark.parametrize("Rf,Rt", [(2, 2), (3, 3), (2, 5), (5, 5)])
def test_rank_tile_pure_epilogue(Rf, Rt):
    """The telescoped pure-r epilogue (denominator factorization +
    marginal-closure telescoping; ~18% faster/tile on v5e) must agree
    with both the oracle and the general gated path when every site has
    r == rmax."""
    import jax.numpy as jnp

    from ldweaver_tpu.core.mi import mi_tile_numpy
    from ldweaver_tpu.parallel.fast_sweep import _build_rank_tile, _wparts

    rng = np.random.default_rng(Rf * 10 + Rt)
    F, T, S = 40, 36, 200
    w = rng.uniform(0.1, 1.0, S)

    def make(B, R):
        codes = rng.integers(0, R, (B, S)).astype(np.uint8)
        codes[:, :R] = np.arange(R)[None, :]  # every rank present
        return codes, np.full(B, R, np.int64)

    codes_f, r_f = make(F, Rf)
    codes_t, r_t = make(T, Rt)
    uq_f = (np.arange(5)[None, :] < r_f[:, None]).astype(np.uint8)
    uq_t = (np.arange(5)[None, :] < r_t[:, None]).astype(np.uint8)
    neff = float(w.sum())
    oracle = mi_tile_numpy(
        codes_f, codes_t, w, r_f, r_t, uq_f, uq_t, neff, rxy_compat=False
    )
    w32, wparts = _wparts(w)
    args = (
        jnp.asarray(codes_f), jnp.asarray(codes_t), jnp.asarray(w32),
        jnp.asarray(wparts), jnp.asarray(r_f, jnp.float32),
        jnp.asarray(r_t, jnp.float32), jnp.asarray(np.float32(neff)),
    )
    general = np.asarray(_build_rank_tile(F, T, Rf, Rt, 3, pure=False)(*args))
    pure = np.asarray(_build_rank_tile(F, T, Rf, Rt, 3, pure=True)(*args))
    assert np.allclose(pure, oracle, rtol=2e-4, atol=2e-5), (
        np.abs(pure - oracle).max()
    )
    assert np.allclose(pure, general, atol=2e-5), (
        np.abs(pure - general).max()
    )


def test_bench_machinery_smoke():
    """bench.py's synth + fast_lr_topk path runs end-to-end (tiny shapes,
    CPU) so the benchmark cannot bit-rot."""
    import bench

    codes, pos, uqe, r, w = bench.synth(1024, 128)
    from ldweaver_tpu.core.snp_tensor import SnpData

    acgtn = np.zeros((5, codes.shape[1]), np.int64)
    for k in range(5):
        acgtn[k] = (codes == k).sum(axis=0)
    sd = SnpData(codes, pos, bench.G, [str(i) for i in range(128)],
                 acgtn, uqe, r)
    from ldweaver_tpu.parallel.fast_sweep import fast_lr_topk

    pos1, pos2, mi = fast_lr_topk(sd, w, block=256, sr_dist=20000, topk=64)
    assert mi.size == 64 and np.isfinite(mi).all()
    assert (np.minimum(pos1, pos2) >= 1).all()
