"""Segment-granular resume for the SPMD driver (VERDICT r3 next-#4): a
run that dies mid-sweep must resume from the per-segment checkpoints and
produce byte-identical TSVs, in both SR-reduction modes."""

import numpy as np
import pytest

import ldweaver_tpu.parallel.spmd_sweep as spmd
from tests.test_sr_reduce import _synth_case
from tests.test_spmd_sweep import _run


@pytest.mark.parametrize("mode", ["device", "host"])
def test_interrupt_then_resume_byte_identical(tmp_path, monkeypatch, mode):
    # one segment per device-mode pull so the injected crash lands
    # between chunk drains (default chunking could fit every segment of
    # this small case into a single pull — then nothing crashes)
    monkeypatch.setenv("LDW_SPMD_PULL_CHUNK", "1")
    sd, w, cds_var = _synth_case(seed=41)
    kw = dict(
        device_budget_bytes=1 << 16,  # several segments
        sr_reduce=mode,
    )
    # reference run, no checkpointing
    _, sr_ref, lr_ref = _run(
        sd, w, cds_var, tmp_path, f"ref{mode}", "spmd", **kw
    )
    assert sr_ref

    ck = tmp_path / f"ck_{mode}"
    orig = spmd._pull_sharded
    orig_save = spmd._SegCheckpoint.save
    saved = {"n": 0}

    # deterministic fault injection: two drains run concurrently on
    # drain_pool sharing the 6-worker pull_pool, so a fixed call-count
    # trip wire can fire while segment 0's own pulls are still pending
    # (leaving zero checkpoints — a flake seen in round 4).  Keying the
    # crash on "first checkpoint written" guarantees >=1 saved segment
    # AND a crash on the next pull regardless of thread scheduling.
    def counting_save(self, i, arrays):
        orig_save(self, i, arrays)
        saved["n"] += 1

    def dying_pull(o):
        if saved["n"] >= 1:
            raise RuntimeError("simulated relay crash")
        return orig(o)

    monkeypatch.setattr(spmd._SegCheckpoint, "save", counting_save)
    monkeypatch.setattr(spmd, "_pull_sharded", dying_pull)
    with pytest.raises(RuntimeError, match="simulated relay crash"):
        _run(
            sd, w, cds_var, tmp_path, f"die{mode}", "spmd",
            checkpoint_dir=str(ck), **kw,
        )
    monkeypatch.setattr(spmd, "_pull_sharded", orig)
    segs_saved = list((ck / "spmd_segs").glob("seg_*.npz"))
    assert segs_saved, "crash left no segment checkpoints"

    # resume: completed segments replay from disk
    _, sr_res, lr_res = _run(
        sd, w, cds_var, tmp_path, f"res{mode}", "spmd",
        checkpoint_dir=str(ck), phase_timings=(pt := {}), **kw,
    )
    assert pt["spmd"]["seg_ckpt_hits"] >= 1
    assert sr_res == sr_ref
    assert lr_res == lr_ref

    # a second full resume replays every segment
    _, sr_res2, lr_res2 = _run(
        sd, w, cds_var, tmp_path, f"res2{mode}", "spmd",
        checkpoint_dir=str(ck), phase_timings=(pt2 := {}), **kw,
    )
    assert pt2["spmd"]["seg_ckpt_hits"] == pt2["spmd"]["segments"]
    assert sr_res2 == sr_ref
    assert lr_res2 == lr_ref


def test_data_change_invalidates(tmp_path):
    """Same shapes, same knobs, different GENOTYPES: the plan crc must
    invalidate the checkpoints (a content change that leaves every
    block's rank max / purity / cap class intact would otherwise replay
    the stale run's MI arrays silently)."""
    sd, w, cds_var = _synth_case(seed=44)
    ck = tmp_path / "ck"
    _run(
        sd, w, cds_var, tmp_path, "a", "spmd",
        checkpoint_dir=str(ck), device_budget_bytes=1 << 16,
    )
    sd.codes[0, 0] = (int(sd.codes[0, 0]) + 1) % 2  # one corrected call
    _, sr_b, lr_b = _run(
        sd, w, cds_var, tmp_path, "b", "spmd",
        checkpoint_dir=str(ck), device_budget_bytes=1 << 16,
        phase_timings=(pt := {}),
    )
    assert pt["spmd"]["seg_ckpt_hits"] == 0
    _, sr_c, lr_c = _run(
        sd, w, cds_var, tmp_path, "c", "spmd",
        device_budget_bytes=1 << 16,
    )
    assert sr_b == sr_c and lr_b == lr_c


def test_stale_plan_invalidates(tmp_path):
    """Changing an output-relevant knob must invalidate checkpoints
    instead of replaying mismatched arrays.  (A changed budget that
    yields the SAME segment plan legitimately keeps them — the plan is
    the key.)"""
    sd, w, cds_var = _synth_case(seed=43)
    ck = tmp_path / "ck"
    _run(
        sd, w, cds_var, tmp_path, "a", "spmd",
        checkpoint_dir=str(ck), device_budget_bytes=1 << 16,
    )
    # different sr_dist -> different extraction -> manifest invalidates
    _, sr_b, lr_b = _run(
        sd, w, cds_var, tmp_path, "b", "spmd",
        checkpoint_dir=str(ck), device_budget_bytes=1 << 16,
        sr_dist=1500, phase_timings=(pt := {}),
    )
    assert pt["spmd"]["seg_ckpt_hits"] == 0
    _, sr_a, lr_a = _run(sd, w, cds_var, tmp_path, "c", "spmd",
                         device_budget_bytes=1 << 16, sr_dist=1500)
    assert sr_b == sr_a and lr_b == lr_a
