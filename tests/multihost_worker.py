"""Worker process for the 2-process multihost test (test_multihost.py).

Each worker brings up jax.distributed against a localhost coordinator
BEFORE any backend touch, takes its `process_pairs` shard of the global
block-pair list, sweeps it with FastTileRunner on its LOCAL devices, and
dumps its partial link tables; the parent asserts the merged output
equals a single-process run bitwise.

With mode="spmd" (5th arg) the worker instead drives the production SPMD
driver itself — perform_mi_computation(backend="spmd") over the GLOBAL
2-process mesh (shard_map'd scan, addressable-shard reads, per-segment
process_allgather) — and writes full sr/lr TSVs to per-process paths; the
parent asserts the writer host's TSVs equal a single-process run bitwise.

Usage: python tests/multihost_worker.py <pid> <nproc> <port> <outdir> [mode]
"""

import os
import sys


def main():
    pid, nproc, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "fast"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    # bring-up FIRST — before jax.devices() or any array op
    from ldweaver_tpu.parallel.multihost import (
        initialize_multihost,
        is_writer,
        process_pairs,
    )

    initialize_multihost(f"localhost:{port}", nproc, pid)
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid
    assert is_writer() == (pid == 0)

    import numpy as np

    from ldweaver_tpu.core.sweep import FastTileRunner
    from ldweaver_tpu.parallel.fast_sweep import stratify
    from tests.test_stream_sweep import _synth

    if mode == "spmd":
        run_spmd_pipeline(pid, outdir)
        return

    sd, w = _synth(nsnp=512, nseq=48, g=400_000, seed=7)
    block = 128
    ranked = stratify(sd.codes, sd.acgtn_table, sd.pos, sd.r, block)
    nb = ranked.rank_codes.shape[1] // block
    pairs_all = np.array(
        [(i, j) for i in range(nb) for j in range(i, nb)], np.int32
    )
    mine, slots = process_pairs(pairs_all)

    paint = np.ones(sd.nsnp, np.int64)
    paint_sorted = np.concatenate(
        [paint[ranked.perm], np.zeros(ranked.pos.size - sd.nsnp, np.int64)]
    )
    valid = np.arange(ranked.pos.size) < sd.nsnp
    sr_links = [[]]
    lr_rows = []

    def sink(p1, p2, c1, c2, ln, mi):
        lr_rows.append((np.asarray(p1), np.asarray(p2), np.asarray(mi)))

    runner = FastTileRunner(
        ranked, paint_sorted, valid, w, float(w.sum()), sd.g, 2000,
        2000.0, 500_000.0, sr_links, devices=jax.local_devices(),
    )
    for bi, bj in mine:
        runner.finish(runner.dispatch(int(bi), int(bj)), sink)

    lr = (
        np.concatenate([r[0] for r in lr_rows]),
        np.concatenate([r[1] for r in lr_rows]),
        np.concatenate([r[2] for r in lr_rows]),
    ) if lr_rows else (np.zeros(0, np.int64),) * 3
    sr_parts = sr_links[0]
    sr_pos1 = np.concatenate([t.pos1 for t in sr_parts]) if sr_parts else np.zeros(0, np.int64)
    sr_pos2 = np.concatenate([t.pos2 for t in sr_parts]) if sr_parts else np.zeros(0, np.int64)
    sr_mi = np.concatenate([t.MI for t in sr_parts]) if sr_parts else np.zeros(0)

    np.savez(
        os.path.join(outdir, f"part{pid}.npz"),
        lr_pos1=lr[0], lr_pos2=lr[1], lr_mi=lr[2],
        sr_pos1=sr_pos1, sr_pos2=sr_pos2, sr_mi=sr_mi,
        slots=slots, n_pairs=len(mine),
    )
    print(f"worker {pid}: {len(mine)} pairs, {sr_pos1.size} sr, "
          f"{lr[0].size} lr", flush=True)


def spmd_case():
    """The shared dataset/config of the 2-process SPMD pipeline test
    (imported by test_multihost.py for the single-process reference)."""
    import numpy as np

    from ldweaver_tpu.core.cds import CdsVar, Clusters
    from tests.test_stream_sweep import _synth

    sd, w = _synth(nsnp=512, nseq=48, g=400_000, seed=7)
    rng = np.random.default_rng(4)
    nclust = 2
    cds_var = CdsVar(
        var_estimate=np.zeros(1), cds_start=np.zeros(1, np.int64),
        cds_end=np.zeros(1, np.int64), clusts=Clusters(np.array([1]), 0.0),
        paint=rng.integers(1, nclust + 1, size=sd.nsnp).astype(np.int64),
        ref=np.array(["A"] * sd.nsnp), alt=np.array([""] * sd.nsnp),
        allele_table=sd.acgtn_table, nclust=nclust,
    )
    kw = dict(
        plt_folder=None, sr_dist=2000, lr_retain_links=2000.0,
        max_blk_sz=1000, srp_cutoff=3.0, backend="spmd", verbose=False,
        # tiny budget -> several segments even on the toy set, so the
        # multi-process path exercises segment-wise allgathers too
        device_budget_bytes=1 << 16,
    )
    return sd, w, cds_var, kw


def run_spmd_pipeline(pid: int, outdir: str) -> None:
    """Drive perform_mi_computation(backend="spmd") on the global
    2-process mesh; every process emits identical links (replicated
    emission, module docstring of parallel/spmd_sweep) and writes TSVs to
    its OWN paths — the parent asserts both equal the single-process
    bytes, which proves is_writer() gating is sufficient in production."""
    from ldweaver_tpu.core.sweep import perform_mi_computation

    sd, w, cds_var, kw = spmd_case()
    perform_mi_computation(
        sd, w, cds_var,
        lr_save_path=os.path.join(outdir, f"spmd{pid}_lr.tsv"),
        sr_save_path=os.path.join(outdir, f"spmd{pid}_sr.tsv"),
        **kw,
    )
    print(f"worker {pid}: spmd pipeline done", flush=True)


if __name__ == "__main__":
    main()
