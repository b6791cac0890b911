"""Multi-process execution: jax.distributed bring-up ordering, pair-list
sharding, and a REAL 2-process run (localhost coordinator) whose merged
sweep output equals the single-process run bitwise (BASELINE.md's
"N >= 2 hosts" requirement; SURVEY.md section 2.4)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from ldweaver_tpu.parallel.multihost import process_pairs


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_process_pairs_single_process():
    pairs = np.array([(i, j) for i in range(4) for j in range(i, 4)], np.int32)
    mine, slots = process_pairs(pairs)
    assert np.array_equal(mine, pairs)
    assert np.array_equal(slots, np.arange(len(pairs)))


def test_process_pairs_split_properties(monkeypatch):
    import ldweaver_tpu.parallel.multihost as mh

    pairs = np.array([(i, j) for i in range(6) for j in range(i, 6)], np.int32)

    class _FakeJax:
        @staticmethod
        def process_count():
            return 3

        @staticmethod
        def process_index():
            return 0

    shards = []
    for idx in range(3):
        _FakeJax.process_index = staticmethod(lambda idx=idx: idx)
        monkeypatch.setitem(sys.modules, "jax", _FakeJax)
        shards.append(mh.process_pairs(pairs))
    monkeypatch.delitem(sys.modules, "jax")
    # disjoint cover of the global list, with global slot indices
    all_slots = np.concatenate([s for _, s in shards])
    assert np.array_equal(np.sort(all_slots), np.arange(len(pairs)))
    merged = np.concatenate([m for m, _ in shards])
    assert np.array_equal(
        merged[np.argsort(all_slots)], pairs
    )


_COLLECTIVE_WORKER = """
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
from ldweaver_tpu.parallel.multihost import initialize_multihost
initialize_multihost(f"localhost:{port}", 2, pid)
import jax, numpy as np, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(np.array(jax.devices()), ("b",))
fn = jax.jit(jax.shard_map(lambda x: jax.lax.psum(x, "b"), mesh=mesh,
                           in_specs=P("b"), out_specs=P()))
xs = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("b")), np.arange(4.0)[2*pid:2*pid+2], (4,))
out = fn(xs)
v = float(np.asarray(jax.device_get(out.addressable_shards[0].data))[0])
assert v == 6.0, v
print("psum ok", flush=True)
"""


def test_two_process_collective_psum(tmp_path):
    """XLA collectives (psum over a 2-process global mesh, gloo backend)
    work across processes — the primitive the sharded sweeps' top-k /
    histogram merges ride on under multi-host."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = "/root/repo"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _COLLECTIVE_WORKER, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd="/root/repo",
        )
        for i in range(2)
    ]
    for p in procs:
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, out[-2000:]
        assert "psum ok" in out


def test_two_process_spmd_driver_matches_single_process(tmp_path):
    """Launch 2 real processes that drive the production SPMD driver
    itself (perform_mi_computation(backend='spmd') over the global
    2-process mesh — addressable-shard reads + per-segment allgather,
    VERDICT r2 next-#5).  The writer host's full sr/lr TSVs must equal a
    single-process run byte-for-byte; the second host's too (emission is
    replicated, so is_writer() gating is sufficient)."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = "/root/repo"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), str(tmp_path),
             "spmd"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd="/root/repo",
        )
        for i in range(2)
    ]
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-3000:]
        assert "spmd pipeline done" in out

    # single-process reference: same dataset/config (output is mesh- and
    # process-count-invariant by construction)
    from ldweaver_tpu.core.sweep import perform_mi_computation
    from tests.multihost_worker import spmd_case

    sd, w, cds_var, kw = spmd_case()
    perform_mi_computation(
        sd, w, cds_var,
        lr_save_path=str(tmp_path / "ref_lr.tsv"),
        sr_save_path=str(tmp_path / "ref_sr.tsv"),
        **kw,
    )
    ref_sr = (tmp_path / "ref_sr.tsv").read_bytes()
    ref_lr = (tmp_path / "ref_lr.tsv").read_bytes()
    assert len(ref_sr) > 0 and len(ref_lr) > 0
    for pid in range(2):
        assert (tmp_path / f"spmd{pid}_sr.tsv").read_bytes() == ref_sr
        assert (tmp_path / f"spmd{pid}_lr.tsv").read_bytes() == ref_lr


def test_two_process_sweep_merges_to_single_process(tmp_path):
    """Launch 2 real processes against a localhost coordinator; each
    sweeps its process_pairs shard on its local devices.  The union of
    their link tables must equal the single-process sweep bitwise (the
    extract program is identical; only the pair-list partition differs)."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = "/root/repo"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd="/root/repo",
        )
        for i in range(2)
    ]
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-3000:]

    parts = [np.load(tmp_path / f"part{i}.npz") for i in range(2)]

    # single-process reference (same synth data, same extract program)
    from ldweaver_tpu.core.sweep import FastTileRunner
    from ldweaver_tpu.parallel.fast_sweep import stratify
    from tests.test_stream_sweep import _synth

    sd, w = _synth(nsnp=512, nseq=48, g=400_000, seed=7)
    block = 128
    ranked = stratify(sd.codes, sd.acgtn_table, sd.pos, sd.r, block)
    nb = ranked.rank_codes.shape[1] // block
    npairs = nb * (nb + 1) // 2
    assert parts[0]["n_pairs"] + parts[1]["n_pairs"] == npairs

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
        2000.0, 500_000.0, sr_links,
    )
    for bi in range(nb):
        for bj in range(bi, nb):
            runner.finish(runner.dispatch(bi, bj), sink)

    def link_set(pos1, pos2, mi):
        return sorted(zip(pos1.tolist(), pos2.tolist(), mi.tolist()))

    ref_sr = link_set(
        np.concatenate([t.pos1 for t in sr_links[0]]),
        np.concatenate([t.pos2 for t in sr_links[0]]),
        np.concatenate([t.MI for t in sr_links[0]]),
    )
    got_sr = link_set(
        np.concatenate([p["sr_pos1"] for p in parts]),
        np.concatenate([p["sr_pos2"] for p in parts]),
        np.concatenate([p["sr_mi"] for p in parts]),
    )
    assert got_sr == ref_sr  # bitwise: same compiled extract program

    ref_lr = link_set(
        np.concatenate([r[0] for r in lr_rows]),
        np.concatenate([r[1] for r in lr_rows]),
        np.concatenate([r[2] for r in lr_rows]),
    )
    got_lr = link_set(
        np.concatenate([p["lr_pos1"] for p in parts]),
        np.concatenate([p["lr_pos2"] for p in parts]),
        np.concatenate([p["lr_mi"] for p in parts]),
    )
    assert got_lr == ref_lr
