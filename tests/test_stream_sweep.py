"""Slab-streaming fast sweep: results must match the resident-tensor
sweep exactly, while host->device uploads stay ~panel-fold below the
naive two-per-tile count (parallel/slabs.py)."""

import numpy as np
import pytest

from ldweaver_tpu.core.snp_tensor import SnpData
from ldweaver_tpu.parallel.fast_sweep import fast_lr_topk, prepare_fast_sweep
from ldweaver_tpu.parallel.slabs import SlabCache, panel_pair_order, plan_budget


def _synth(nsnp=1024, nseq=64, g=200_000, seed=3):
    rng = np.random.default_rng(seed)
    major = rng.integers(0, 4, size=nsnp)
    minor = (major + rng.integers(1, 4, size=nsnp)) % 4
    maf = rng.uniform(0.05, 0.5, size=nsnp)
    codes = np.where(
        rng.random((nseq, nsnp)) < maf[None, :], minor[None, :], major[None, :]
    ).astype(np.uint8)
    ncells = rng.random((nseq, nsnp)) < 0.01
    codes[ncells] = 4
    pos = np.sort(rng.choice(np.arange(1, g + 1), nsnp, replace=False)).astype(
        np.int64
    )
    acgtn = np.zeros((5, nsnp), np.int64)
    for k in range(5):
        acgtn[k] = (codes == k).sum(axis=0)
    uqe = (acgtn > 0).astype(np.uint8).T
    r = uqe.sum(axis=1).astype(np.int32)
    w = rng.uniform(0.1, 0.6, size=nseq)
    return (
        SnpData(
            codes=codes,
            pos=pos,
            g=g,
            seq_names=[str(i) for i in range(nseq)],
            acgtn_table=acgtn,
            uqe=uqe,
            r=r,
        ),
        w,
    )


def test_panel_pair_order_covers_upper_triangle():
    nb = 9
    for panel in (1, 2, 4, 9, 16):
        pairs = list(panel_pair_order(nb, panel))
        assert sorted(pairs) == [(i, j) for i in range(nb) for j in range(i, nb)]
        assert len(set(pairs)) == nb * (nb + 1) // 2


def test_plan_budget_thresholds():
    # 64 seqs x 128-block x 8 blocks = 64 KiB total
    stream, max_slabs, panel = plan_budget(64, 128, 8, None)
    assert not stream
    stream, max_slabs, panel = plan_budget(64, 128, 8, 10 ** 9)
    assert not stream  # fits comfortably
    stream, max_slabs, panel = plan_budget(64, 128, 8, 64 * 128 * 5)
    # floor of 4 slabs: panel rows pinned + current column + a prefetch
    # slot (slabs.plan_budget)
    assert stream and max_slabs == 4 and panel == 2


def test_slab_cache_lru_and_pinning():
    rng = np.random.default_rng(0)
    rank_codes = rng.integers(0, 3, size=(16, 8 * 32)).astype(np.uint8)
    cache = SlabCache(rank_codes, block=32, max_slabs=3)
    a = cache.get(0)
    np.testing.assert_array_equal(
        np.asarray(a), rank_codes[:, 0:32].T
    )
    cache.get(1)
    cache.get(2)
    assert cache.uploads == 3
    cache.get(0)  # hit, becomes MRU
    assert cache.hits == 1
    cache.get(3)  # evicts 1 (LRU)
    cache.get(1)  # miss again
    assert cache.uploads == 5
    # pinning protects the working set
    cache.pin([0, 1])
    cache.get(0)
    cache.get(1)
    u0 = cache.uploads
    assert cache.uploads == u0
    cache.get(4)
    cache.get(5)  # evictions must skip pinned 0/1
    cache.get(0)
    cache.get(1)
    assert cache.uploads == u0 + 2  # only 4 and 5 were uploaded


def test_streaming_matches_resident_sweep():
    sd, w = _synth()
    block = 128
    res = fast_lr_topk(sd, w, block=block, sr_dist=5000, topk=256)
    state = prepare_fast_sweep(
        sd, w, block=block, hbm_budget_bytes=64 * 128 * 6
    )
    assert state.streaming and state.slab_cache is not None
    stream = fast_lr_topk(state=state, sr_dist=5000, topk=256)

    def canon(t):
        p1, p2, mi = t
        lo = np.minimum(p1, p2)
        hi = np.maximum(p1, p2)
        order = np.lexsort((hi, lo))
        return lo[order], hi[order], mi[order]

    r1, r2, rmi = canon(res)
    s1, s2, smi = canon(stream)
    np.testing.assert_array_equal(r1, s1)
    np.testing.assert_array_equal(r2, s2)
    np.testing.assert_allclose(rmi, smi, rtol=0, atol=0)

    # upload accounting: naive is 2 uploads per tile = nb*(nb+1); the
    # panel traversal must stay far below that and above nb (each slab
    # must be uploaded at least once, on some device's cache)
    nb = state.ranked.rank_codes.shape[1] // block
    nd = len(state.slab_caches)
    uploads = sum(c.uploads for c in state.slab_caches)
    naive = nb * (nb + 1)
    panel = state.panel
    # per-device panel bound, summed over the round-robin devices
    bound = nd * (nb + (nb * nb) // max(panel, 1) + nb)
    assert nb <= uploads <= min(bound, nd * naive), (uploads, bound, naive)


def test_auto_budget_cpu_safe():
    """auto_budget must never crash; on CPU it may return None (no
    bytes_limit) or a positive int, and the resident default must hold
    for small data either way."""
    from ldweaver_tpu.parallel.slabs import auto_budget

    b = auto_budget()
    assert b is None or (isinstance(b, int) and b > 0)
    sd, w = _synth(nsnp=256, nseq=32)
    state = prepare_fast_sweep(sd, w, block=64)  # auto budget path
    assert not state.streaming  # tiny tensor always fits


@pytest.mark.parametrize("seed,slabs", [(11, 3), (12, 4), (13, 7)])
def test_streaming_equivalence_randomized(seed, slabs):
    """Random data x random cache capacities: streaming must always equal
    the resident sweep bit-for-bit (panel order and eviction schedule are
    internal details)."""
    sd, w = _synth(nsnp=640, nseq=40, g=150_000, seed=seed)
    block = 64
    res = fast_lr_topk(sd, w, block=block, sr_dist=4000, topk=128)
    budget = int(40 * 64 * (slabs + 1) / 0.6)  # -> max_slabs ~ slabs+1
    state = prepare_fast_sweep(sd, w, block=block, hbm_budget_bytes=budget)
    assert state.streaming
    stream = fast_lr_topk(state=state, sr_dist=4000, topk=128)

    def canon(t):
        lo = np.minimum(t[0], t[1])
        hi = np.maximum(t[0], t[1])
        o = np.lexsort((hi, lo))
        return lo[o], hi[o], t[2][o]

    for a, b in zip(canon(res), canon(stream)):
        np.testing.assert_array_equal(a, b)


def test_streaming_multi_device_matches_single():
    """Streaming sweeps must honor n_devices: tiles round-robin over
    per-device slab caches and the merged top-k equals the single-device
    result exactly (every device compiles the same tile program)."""
    sd, w = _synth(nsnp=640, nseq=40, g=150_000, seed=21)
    block = 64
    budget = int(40 * 64 * 7 / 0.6)

    def run(nd):
        state = prepare_fast_sweep(
            sd, w, block=block, n_devices=nd, hbm_budget_bytes=budget
        )
        assert state.streaming
        assert len(state.slab_caches) == nd
        out = fast_lr_topk(state=state, sr_dist=4000, topk=128)
        ups = sum(c.uploads for c in state.slab_caches)
        return out, ups

    one, ups1 = run(1)
    eight, ups8 = run(8)

    def canon(t):
        lo = np.minimum(t[0], t[1])
        hi = np.maximum(t[0], t[1])
        o = np.lexsort((hi, lo))
        return lo[o], hi[o], t[2][o]

    for a, b in zip(canon(one), canon(eight)):
        np.testing.assert_array_equal(a, b)
    assert ups8 >= ups1  # per-device caches upload independently


def test_streaming_second_sweep_reuses_compilation():
    sd, w = _synth(nsnp=512, nseq=48)
    state = prepare_fast_sweep(
        sd, w, block=64, hbm_budget_bytes=48 * 64 * 6
    )
    a = fast_lr_topk(state=state, sr_dist=5000, topk=128)
    b = fast_lr_topk(state=state, sr_dist=5000, topk=128)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[2], b[2])
