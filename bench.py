"""Headline benchmark: SNP-pairs/s/chip for the all-vs-all MI sweep.

Prints ONE JSON line:
  {"metric": "snp_pairs_per_s_per_chip", "value": N, "unit": "pairs/s",
   "vs_baseline": R, "detail": {..., "pipeline_pairs_per_s": ...,
   "streaming_pairs_per_s": ...}}

Three measurements, each SUBPROCESS-ISOLATED (one crashed TPU client can
neither poison the other legs nor inherit a wedged relay grant — the
round-2 pipeline-leg crash took the streaming leg down with it):
  1. **sweep** (the headline value): the fast rank-compacted LR-top-k
     sweep of the Hamming-weighted 5-allele contingency MI statistic
     (reference: R/computePairwiseMI.R:167-398 + src/computeMI.cpp:11-21)
     over a synthetic nsnp x nseq tensor - device-only reduction, one
     host pull per rep.  The headline is the MEDIAN of BENCH_SWEEP_REPS
     (default 5) back-to-back executions — robust to relay pull weather
     (a single-sample headline swung 20%+ round-over-round with no code
     change on the timed path); the rep list and best are in detail.
  2. **pipeline** (detail.pipeline_*): the PRODUCTION path end-to-end -
     perform_mi_computation(backend="spmd") at 616 sequences (the
     reference README's S. pneumoniae scale, README.md:123) including
     budget-bounded extraction transfers, host link emission, the
     background model fit, ARACNE and both TSVs.
  3. **streaming** (detail.streaming_*): the >HBM slab-streaming sweep at
     nseq >= 16k with a forced budget, reporting pairs/s + upload count.

vs_baseline: the reference implementation is 64-thread OpenMP + BLAS on
CPU (no published numbers exist - BASELINE.md).  The baseline is a PINNED
constant (CPU_BASELINE_* below) so the ratio is comparable across rounds;
re-measure with `python bench.py --leg cpu` (methodology in the
constant's comment).

Legs run sequentially and each child exits on its own (never killed -
CLAUDE.md: a killed TPU client wedges the relay'd chip), strictly one
TPU client at a time.

Env knobs: BENCH_NSNP/BENCH_NSEQ/BENCH_BLOCK (sweep), BENCH_PIPE_NSNP,
BENCH_STREAM_NSNP/NSEQ, BENCH_SKIP_PIPELINE/BENCH_SKIP_STREAMING=1,
BENCH_SMOKE=1 (tiny CPU shapes to validate the harness end-to-end),
BENCH_MEASURE_CPU=1 (re-measure the CPU baseline instead of the pinned
constant).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

SMOKE = os.environ.get("BENCH_SMOKE") == "1"
if SMOKE:
    # Force the CPU backend BEFORE any jax import reaches the axon PJRT
    # plugin: the env var alone is overridden by the plugin's
    # sitecustomize registration (CLAUDE.md), so set the config too.
    import jax

    jax.config.update("jax_platforms", "cpu")
NSEQ = int(os.environ.get("BENCH_NSEQ", 64 if SMOKE else 1024))
NSNP = int(os.environ.get("BENCH_NSNP", 2048 if SMOKE else 131072))
BLOCK = int(os.environ.get("BENCH_BLOCK", 512 if SMOKE else 4096))
PIPE_NSNP = int(os.environ.get("BENCH_PIPE_NSNP", 2048 if SMOKE else 131072))
PIPE_NSEQ = 64 if SMOKE else 616  # README.md:123's S. pneumoniae scale
STREAM_NSNP = int(
    os.environ.get("BENCH_STREAM_NSNP", 2048 if SMOKE else 32768)
)
STREAM_NSEQ = int(
    os.environ.get("BENCH_STREAM_NSEQ", 256 if SMOKE else 16384)
)
SR_DIST = 20000
G = 2_200_000  # S. pneumoniae-scale genome
BASELINE_THREADS = 64

# Pinned CPU baseline (VERDICT r2 next-#4: the per-round 2-thread torch
# measurement extrapolated x32 swung the headline ratio by 25% between
# rounds with the TPU number unchanged).  Methodology: bench_cpu_reference
# (faithful torch-CPU f64 transliteration of the reference block kernel:
# 25 dgemm contingency counts + the fastHadamard elementwise log pass,
# src/computeMI.cpp:19) on the 2-vCPU build host, synth (nsnp=131072,
# nseq=1024), block=1024, BEST timed tile, linearly scaled 2 -> 64
# threads.  Observed across rounds: 1.547e6 (r1), 2.028e6 (r2),
# [1.723e6, 1.716e6, 1.780e6] (r3, 3 reps x 5 tiles, 2026-08-19).  Pinned
# at the MAX ever observed — the most generous plausible baseline — so
# vs_baseline is a stable LOWER bound on the true ratio.
CPU_BASELINE_PAIRS_PER_S_MEASURED = 2.028e6
CPU_BASELINE_THREADS_MEASURED = 2
CPU_BASELINE_PAIRS_PER_S_64T = CPU_BASELINE_PAIRS_PER_S_MEASURED * (
    BASELINE_THREADS / CPU_BASELINE_THREADS_MEASURED
)


def synth(nsnp, nseq, seed=0):
    rng = np.random.default_rng(seed)
    # allele codes with realistic skew: mostly biallelic sites
    major = rng.integers(0, 4, size=nsnp)
    minor = (major + rng.integers(1, 4, size=nsnp)) % 4
    maf = rng.uniform(0.02, 0.5, size=nsnp)
    u = rng.random((nseq, nsnp))
    codes = np.where(u < maf[None, :], minor[None, :], major[None, :]).astype(
        np.uint8
    )
    # realistic allele-richness profile: ~15% of sites carry N calls
    # (matches the toy data's r distribution: 85% r=2, 15% r=3+)
    n_sites = rng.random(nsnp) < 0.15
    ncells = (rng.random((nseq, nsnp)) < 0.03) & n_sites[None, :]
    codes[ncells] = 4
    pos = np.sort(
        rng.choice(np.arange(1, G + 1), size=nsnp, replace=False)
    ).astype(np.int64)
    acgtn = np.zeros((5, nsnp), np.int64)
    for k in range(5):
        acgtn[k] = (codes == k).sum(axis=0)
    uqe = (acgtn > 0).astype(np.uint8).T
    r = uqe.sum(axis=1).astype(np.int32)
    w = rng.uniform(0.05, 0.5, size=nseq)
    return codes, pos, uqe, r, w


SWEEP_REPS = int(os.environ.get("BENCH_SWEEP_REPS", 2 if SMOKE else 5))


def bench_tpu(codes, pos, uqe, r, w):
    """Time the fast rank-compacted sweep (the production fast path).

    The first call compiles + runs every bucket; then SWEEP_REPS
    back-to-back executions are timed individually (each one execution
    plus its single relay pull) and the MEDIAN is the headline.  A single
    sample was indistinguishable from relay pull weather (±25% on a
    sub-second leg — CLAUDE.md "pull latency is weather"; the r4
    headline "regression", VERDICT r4 weak #1); the median of 5 is
    robust to a bad round trip while the full rep list + best are
    reported for cross-round comparison."""
    from ldweaver_tpu.core.snp_tensor import SnpData

    acgtn = np.zeros((5, codes.shape[1]), np.int64)
    for k in range(5):
        acgtn[k] = (codes == k).sum(axis=0)
    sd = SnpData(
        codes=codes,
        pos=pos,
        g=G,
        seq_names=[str(i) for i in range(codes.shape[0])],
        acgtn_table=acgtn,
        uqe=uqe,
        r=r,
    )
    from ldweaver_tpu.parallel.fast_sweep import (
        fast_lr_topk,
        prepare_fast_sweep,
    )

    # one-time prep (rank encode + device transfer) amortises over the
    # O(nsnp^2) sweep; warmup compiles all buckets
    state = prepare_fast_sweep(sd, w, block=BLOCK)
    fast_lr_topk(sr_dist=SR_DIST, topk=1024, state=state)  # warmup/compile
    walls = []
    for _ in range(max(1, SWEEP_REPS)):
        t0 = time.time()
        pos1, pos2, mi = fast_lr_topk(
            sr_dist=SR_DIST, topk=1024, state=state
        )
        walls.append(time.time() - t0)
        assert np.isfinite(mi).all() and mi.size > 0
    walls_sorted = sorted(walls)
    n = len(walls_sorted)
    median = (
        walls_sorted[n // 2]
        if n % 2
        else 0.5 * (walls_sorted[n // 2 - 1] + walls_sorted[n // 2])
    )
    nsnp = codes.shape[1]
    pairs_count = nsnp * (nsnp - 1) // 2
    return pairs_count / median, median, pairs_count, walls


def _snp_data(codes, pos, uqe, r):
    from ldweaver_tpu.core.snp_tensor import SnpData

    acgtn = np.zeros((5, codes.shape[1]), np.int64)
    for k in range(5):
        acgtn[k] = (codes == k).sum(axis=0)
    return SnpData(
        codes=codes, pos=pos, g=G,
        seq_names=[str(i) for i in range(codes.shape[0])],
        acgtn_table=acgtn, uqe=uqe, r=r,
    )


def leg_sweep():
    codes, pos, uqe, r, w = synth(NSNP, NSEQ)
    rate, median, pairs_count, walls = bench_tpu(codes, pos, uqe, r, w)
    best = min(walls)
    return {
        "nsnp": NSNP,
        "nseq": NSEQ,
        "block": BLOCK,
        "pairs": pairs_count,
        "sweep_pairs_per_s": round(rate, 1),
        "sweep_wall_s": round(median, 3),  # median of the reps below
        "sweep_wall_reps_s": [round(x, 3) for x in walls],
        "sweep_wall_best_s": round(best, 3),
        "sweep_pairs_per_s_best": round(pairs_count / best, 1),
    }


def leg_pipeline():
    """The user-visible production number: perform_mi_computation with
    backend="spmd" end-to-end — budget-bounded SPMD scan segments with
    double-buffered incremental pulls (parallel/spmd_sweep.py), host link
    emission, background model, ARACNE, sr/lr TSVs."""
    import tempfile

    from ldweaver_tpu.core.cds import CdsVar, Clusters
    from ldweaver_tpu.core.sweep import perform_mi_computation

    nsnp, nseq = PIPE_NSNP, PIPE_NSEQ
    codes, pos, uqe, r, w = synth(nsnp, nseq, seed=1)
    sd = _snp_data(codes, pos, uqe, r)
    rng = np.random.default_rng(2)
    nclust = 3  # reference default num_clusts_CDS
    cds_var = CdsVar(
        var_estimate=np.zeros(1), cds_start=np.zeros(1, np.int64),
        cds_end=np.zeros(1, np.int64), clusts=Clusters(np.array([1]), 0.0),
        paint=rng.integers(1, nclust + 1, size=nsnp).astype(np.int64),
        ref=np.array(["A"] * nsnp), alt=np.array([""] * nsnp),
        allele_table=sd.acgtn_table, nclust=nclust,
    )
    phases: dict = {}
    with tempfile.TemporaryDirectory() as td:
        t0 = time.time()
        links = perform_mi_computation(
            sd, w, cds_var,
            lr_save_path=f"{td}/lr_links.tsv",
            sr_save_path=f"{td}/sr_links.tsv",
            plt_folder=None, sr_dist=SR_DIST, lr_retain_links=1e6,
            max_blk_sz=BLOCK, srp_cutoff=3.0, backend="spmd",
            verbose=False, phase_timings=phases,
        )
        wall = time.time() - t0
        n_lr_rows = sum(1 for _ in open(f"{td}/lr_links.tsv"))
    pairs_count = nsnp * (nsnp - 1) // 2
    return dict(
        pipeline_pairs_per_s=round(pairs_count / wall, 1),
        pipeline_wall_s=round(wall, 2),
        pipeline_nsnp=nsnp,
        pipeline_nseq=nseq,
        pipeline_sr_links=int(len(links)),
        pipeline_lr_rows=n_lr_rows,
        pipeline_phases=phases,
    )


def leg_streaming():
    """The >HBM slab-streaming sweep: a forced budget streams rank-code
    slabs through the per-device LRU caches; reports pairs/s and the
    host->device upload count (VERDICT round-1 weak #3)."""
    from ldweaver_tpu.parallel.fast_sweep import (
        fast_lr_topk,
        prepare_fast_sweep,
    )

    nsnp, nseq = STREAM_NSNP, STREAM_NSEQ
    codes, pos, uqe, r, w = synth(nsnp, nseq, seed=3)
    sd = _snp_data(codes, pos, uqe, r)
    slab_bytes = nseq * BLOCK
    nb = -(-nsnp // BLOCK)
    # usable (60%) holds ~0.45*nb slabs < nb total -> always streams
    budget = int(slab_bytes * 0.75 * nb)
    state = prepare_fast_sweep(
        sd, w, block=BLOCK, hbm_budget_bytes=budget
    )
    assert state.streaming, "budget did not force streaming"
    fast_lr_topk(state=state, sr_dist=SR_DIST, topk=1024)  # warmup/compile
    u0 = sum(c.uploads for c in state.slab_caches)
    s0 = sum(c.upload_s for c in state.slab_caches)
    t0 = time.time()
    pos1, pos2, mi = fast_lr_topk(state=state, sr_dist=SR_DIST, topk=1024)
    wall = time.time() - t0
    uploads = sum(c.uploads for c in state.slab_caches) - u0
    upload_s = sum(c.upload_s for c in state.slab_caches) - s0
    assert mi.size > 0
    pairs_count = nsnp * (nsnp - 1) // 2
    return dict(
        streaming_pairs_per_s=round(pairs_count / wall, 1),
        streaming_wall_s=round(wall, 2),
        streaming_nsnp=nsnp,
        streaming_nseq=nseq,
        streaming_uploads=int(uploads),
        # wall spent inside device_put across upload threads; prefetch
        # overlaps it with compute, so upload_s > wall is possible and
        # means the overlap is working (VERDICT r3 next-#7)
        streaming_upload_s=round(upload_s, 2),
        streaming_slab_mb=round(slab_bytes / 1e6, 1),
        streaming_budget_mb=round(budget / 1e6, 1),
    )


def bench_cpu_reference(codes, uqe, r, w, block=1024, n_tiles=3):
    """Faithful torch-CPU transliteration of the reference block kernel:
    per allele pair a dgemm contingency count + the elementwise
    MI += uq*pxy/den*log(pxy/denom*den) pass (src/computeMI.cpp:19).

    The first tile is an untimed warmup and the BEST per-tile throughput
    is reported (generous to the baseline; the 2-core measurement is
    noisy)."""
    import torch

    torch.set_num_threads(os.cpu_count())
    # the reference computes in R doubles throughout (f64 BLAS)
    S = codes.shape[0]
    neff = float(w.sum())
    best = 0.0
    for t in range(n_tiles + 1):  # tile 0 = warmup
        sl = slice(t * block, (t + 1) * block)
        c = torch.from_numpy(np.ascontiguousarray(codes[:, sl].T))
        wt = torch.from_numpy(np.sqrt(w)).double()
        rr = torch.from_numpy(r[sl].astype(np.float64))
        uq = torch.from_numpy(uqe[sl].astype(np.float64))
        t0 = time.time()
        # the reference weights both sides by sqrt(hdw)
        # (R/computePairwiseMI.R:238-257)
        slabs = [((c == a).double() * wt) for a in range(5)]
        pXs = [(m * m).sum(1) for m in slabs]
        den = neff + 0.5 * torch.outer(rr, rr)
        rxy = 0.25 * torch.outer(rr, rr)
        mi = torch.zeros((block, block), dtype=torch.float64)
        for x in range(5):
            pxr = pXs[x] * 0.5 * rr
            for y in range(5):
                pxy = slabs[x] @ slabs[y].T + 0.5
                denom = (
                    torch.outer(pXs[x], pXs[y])
                    + rxy
                    + pxr[:, None]
                    + (pXs[y] * 0.5 * rr)[None, :]
                )
                uqm = torch.outer(uq[:, x], uq[:, y])
                mi += uqm * pxy / den * torch.log(pxy / denom * den)
        _ = float(mi.sum())
        if t > 0:
            best = max(best, block * block / (time.time() - t0))
    return best


def leg_cpu():
    """Re-measure the CPU baseline with the pinned methodology."""
    codes, pos, uqe, r, w = synth(NSNP, NSEQ)
    cpu_block = min(1024, NSNP // 2)
    rate = bench_cpu_reference(
        codes, uqe, r, w, block=cpu_block,
        n_tiles=min(5, NSNP // cpu_block - 1),
    )
    return {
        "cpu_pairs_per_s_measured": round(rate, 1),
        "cpu_threads_measured": os.cpu_count() or 1,
    }


LEGS = {
    "sweep": leg_sweep,
    "pipeline": leg_pipeline,
    "streaming": leg_streaming,
    "cpu": leg_cpu,
}


def _run_leg_subprocess(leg: str) -> dict:
    """Run one leg in a fresh child (its own TPU claim; exits on its own —
    never killed, CLAUDE.md).  The child prints one JSON line on its last
    stdout line; a crashed child yields a {leg}_error entry without
    touching the other legs."""
    env = os.environ.copy()
    # XLA persistent compilation cache: bucket programs cost 15-40 s EACH
    # to compile through the relay; the cache amortises them across legs
    # and runs (a standard production feature — jax falls back silently
    # when the backend cannot serialise executables)
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "ldweaver_tpu",
                     "xla"),  # same dir as utils/compile_cache.py so
        # bench legs and library runs (pipeline, e2e) share one cache
    )
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--leg", leg],
        capture_output=True, text=True, env=env,
    )
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout or "").strip().splitlines()
        return {f"{leg}_error": " | ".join(tail[-3:]) or f"rc={proc.returncode}"}
    try:
        return json.loads(proc.stdout.strip().splitlines()[-1])
    except Exception as e:
        return {f"{leg}_error": f"unparseable child output: {e!r}"}


def main():
    if "--leg" in sys.argv:
        leg = sys.argv[sys.argv.index("--leg") + 1]
        print(json.dumps(LEGS[leg]()))
        return

    detail = _run_leg_subprocess("sweep")
    if os.environ.get("BENCH_SKIP_PIPELINE") != "1":
        detail.update(_run_leg_subprocess("pipeline"))
    if os.environ.get("BENCH_SKIP_STREAMING") != "1":
        detail.update(_run_leg_subprocess("streaming"))

    if os.environ.get("BENCH_MEASURE_CPU") == "1" or SMOKE:
        detail.update(_run_leg_subprocess("cpu"))
        cpu_rate = detail.get(
            "cpu_pairs_per_s_measured", CPU_BASELINE_PAIRS_PER_S_MEASURED
        )
        ncpu = detail.get("cpu_threads_measured", os.cpu_count() or 1)
        cpu_rate_64t = cpu_rate * (BASELINE_THREADS / ncpu)
    else:
        cpu_rate_64t = CPU_BASELINE_PAIRS_PER_S_64T
        detail.update(
            {
                "cpu_pairs_per_s_pinned": CPU_BASELINE_PAIRS_PER_S_MEASURED,
                "cpu_threads_pinned": CPU_BASELINE_THREADS_MEASURED,
            }
        )
    detail["baseline_threads_assumed"] = BASELINE_THREADS

    tpu_rate = detail.get("sweep_pairs_per_s", 0.0)
    result = {
        "metric": "snp_pairs_per_s_per_chip",
        "value": tpu_rate,
        "unit": "pairs/s",
        "vs_baseline": round(tpu_rate / cpu_rate_64t, 2),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
