"""End-to-end pipeline tests on the toy data, mirroring the reference's
own integration test strategy (tests/testthat/test-pipeline.R): run the
full pipeline with two independent MI backends and assert link-table
equivalence (their mega-vs-std oracle pattern -> our numpy-vs-jax)."""

import os

import numpy as np
import pandas as pd
import pytest

from ldweaver_tpu.io import readers
from ldweaver_tpu.pipeline import ldweaver
from tests.conftest import TOY_ALN, TOY_POS


@pytest.fixture(scope="module")
def run_jax(toy_gbk_path, tmp_path_factory):
    dset = str(tmp_path_factory.mktemp("run") / "jax_run")
    pos = np.loadtxt(TOY_POS, dtype=np.int64)
    sr = ldweaver(
        dset=dset,
        aln_path=TOY_ALN,
        aln_has_all_bases=False,
        pos=pos,
        gbk_path=toy_gbk_path,
        validate_ref_ann_lengths=False,
        backend="jax",
    )
    return dset, sr


@pytest.fixture(scope="module")
def run_numpy(toy_gbk_path, tmp_path_factory):
    dset = str(tmp_path_factory.mktemp("run") / "np_run")
    pos = np.loadtxt(TOY_POS, dtype=np.int64)
    sr = ldweaver(
        dset=dset,
        aln_path=TOY_ALN,
        aln_has_all_bases=False,
        pos=pos,
        gbk_path=toy_gbk_path,
        validate_ref_ann_lengths=False,
        backend="numpy",
    )
    return dset, sr


def test_pipeline_outputs_exist(run_jax):
    dset, sr = run_jax
    assert len(sr) > 0
    for rel in [
        "Temp/sr_links.tsv",
        "Temp/lr_links.tsv",
        "Tophits/sr_tophits.tsv",
        "Tophits/lr_tophits.tsv",
        "Annotated_links/sr_links_annotated.tsv",
        "Annotated_links/lr_links_annotated.tsv",
        "GWESPlots/sr_gwes_combi.png",
        "GWESPlots/lr_gwes.png",
        "GWESExplorer/SR_GWESExplorer/snps.loci",
        "GWESExplorer/SR_GWESExplorer/snps.aln",
        "GWESExplorer/SR_GWESExplorer/snps.outliers",
        "Fit/c1_fit_data.npz",
    ]:
        assert os.path.exists(os.path.join(dset, rel)), rel


def test_timings_cover_every_block(run_jax):
    """timings.json must carry a wall-clock entry for every executed
    block (aux tracing parity; the reference prints per-block Sys.time()
    deltas, R/BacGWES.R passim)."""
    import json

    dset, _ = run_jax
    timings = json.load(open(os.path.join(dset, "timings.json")))
    expected = {
        "blk1_parse_alignment", "blk2_annotation_parse",
        "blk3_cds_diversity", "blk4_hamming_weights",
        "blk5_mi_computation", "blk6_ld_map", "blk7_gwes_plots",
        "blk8_annotation_tophits", "blk9_tanglegram",
        "blk10_gwes_explorer", "blk11_network_plot", "blk12_lr_analysis",
    }
    assert expected <= set(timings), sorted(expected - set(timings))
    # scalar entries are wall clocks; blk5_phases is the nested BLK5
    # dispatch/pull/emit + relay-weather stats dict (round 5)
    assert all(
        v >= 0 for v in timings.values() if not isinstance(v, dict)
    )
    if "blk5_phases" in timings:
        assert timings["blk5_phases"].get("sweep_s", 0) >= 0


def test_timings_survive_block_crash(toy_gbk_path, tmp_path, monkeypatch):
    """A block that raises must still leave its partial wall clock in
    timings.json (ADVICE r2: the manual enter/exit pairs lost the raising
    block's timing and skipped the final dump)."""
    import json

    import ldweaver_tpu.pipeline as pl

    def boom(*a, **kw):
        raise RuntimeError("synthetic BLK4 crash")

    monkeypatch.setattr(pl, "estimate_hamming_distance_weights", boom)
    dset = str(tmp_path / "crash_run")
    pos = np.loadtxt(TOY_POS, dtype=np.int64)
    with pytest.raises(RuntimeError, match="synthetic BLK4 crash"):
        ldweaver(
            dset=dset,
            aln_path=TOY_ALN,
            aln_has_all_bases=False,
            pos=pos,
            gbk_path=toy_gbk_path,
            validate_ref_ann_lengths=False,
            backend="numpy",
        )
    timings = json.load(open(os.path.join(dset, "timings.json")))
    for blk in ("blk1_parse_alignment", "blk2_annotation_parse",
                "blk3_cds_diversity", "blk4_hamming_weights"):
        assert blk in timings, timings
    assert "blk5_mi_computation" not in timings


def test_sr_links_schema(run_jax):
    dset, _ = run_jax
    df = readers.read_short_range_links(os.path.join(dset, "Temp/sr_links.tsv"))
    assert list(df.columns) == [
        "clust_c", "pos1", "pos2", "clust1", "clust2",
        "len", "MI", "srp_max", "ARACNE",
    ]
    assert (df["len"] > 0).all() and (df["len"] <= 20000).all()
    assert df["ARACNE"].isin([0, 1]).all()
    # pos1 < pos2 for diagonal-block links on toy data (single block)
    assert (df["pos1"] < df["pos2"]).all()


def test_lr_links_schema(run_jax):
    dset, _ = run_jax
    df = readers.read_long_range_links(
        os.path.join(dset, "Temp/lr_links.tsv"), sr_dist=20000
    )
    assert (df["len"] >= 20000).all()
    assert np.isfinite(df["MI"]).all()


def test_backends_agree_on_rankings(run_jax, run_numpy):
    """The reference compares its two sparse backends row-by-row on the
    first 10 tophits (test-pipeline.R:32-37); we do the same for
    numpy (f64) vs jax (f32 HIGHEST) MI backends."""
    dset_j, _ = run_jax
    dset_n, _ = run_numpy
    tj = readers.read_top_hits(os.path.join(dset_j, "Tophits/sr_tophits.tsv"))
    tn = readers.read_top_hits(os.path.join(dset_n, "Tophits/sr_tophits.tsv"))
    assert len(tj) > 0 and len(tn) > 0
    matched = 0
    for x in range(min(10, len(tj), len(tn))):
        row_j = tj.iloc[x]
        match = tn[
            ((tn["pos1"] == row_j["pos1"]) & (tn["pos2"] == row_j["pos2"]))
            | ((tn["pos1"] == row_j["pos2"]) & (tn["pos2"] == row_j["pos1"]))
        ]
        if len(match) == 0:
            # Perfectly co-inherited SNP groups produce exactly-tied MI
            # values; ARACNE's strict '<' DPI test (src/computeMI.cpp:69-74)
            # then flips on float noise between backends, moving a link in
            # or out of the ARACNE==1 tophit filter.  Verify the link is a
            # genuine tie-flip, not a computation divergence.
            an = readers.read_annotated_links(
                os.path.join(dset_n, "Annotated_links/sr_links_annotated.tsv")
            )
            m = an[
                (an["pos1"] == row_j["pos1"]) & (an["pos2"] == row_j["pos2"])
            ]
            assert len(m) == 1, f"tophit {x} absent from numpy run entirely"
            assert m.iloc[0]["MI"] == pytest.approx(row_j["MI"], rel=5e-4)
            continue
        row_n = match.iloc[0]
        matched += 1
        assert row_j["MI"] == pytest.approx(row_n["MI"], rel=5e-4)
        assert row_j["srp"] == pytest.approx(row_n["srp"], rel=5e-3)
        assert row_j["links"] == row_n["links"]
    assert matched >= 7, "too many tophit mismatches between backends"


def test_sr_links_agree_across_backends(run_jax, run_numpy):
    dset_j, _ = run_jax
    dset_n, _ = run_numpy
    sj = readers.read_short_range_links(os.path.join(dset_j, "Temp/sr_links.tsv"))
    sn = readers.read_short_range_links(os.path.join(dset_n, "Temp/sr_links.tsv"))
    # same link set (srp cutoff may flip borderline links; allow tiny slack)
    kj = set(zip(sj["pos1"], sj["pos2"]))
    kn = set(zip(sn["pos1"], sn["pos2"]))
    assert len(kj ^ kn) <= max(2, int(0.002 * max(len(kj), len(kn))))


def test_resume_uses_blk2_blk3_caches(toy_gbk_path, tmp_path, monkeypatch):
    """With save_additional_outputs, BLK2/BLK3 persist parsed_gbk.pkl and
    cds_var.npz and a resumed run loads them instead of recomputing
    (R/BacGWES.R:314-319,358-364)."""
    import ldweaver_tpu.pipeline as pl

    dset = str(tmp_path / "cache_run")
    pos = np.loadtxt(TOY_POS, dtype=np.int64)
    kwargs = dict(
        dset=dset,
        aln_path=TOY_ALN,
        aln_has_all_bases=False,
        pos=pos,
        gbk_path=toy_gbk_path,
        validate_ref_ann_lengths=False,
        backend="jax",
        save_additional_outputs=True,
    )
    sr_first = ldweaver(**kwargs)
    for rel in ("parsed_gbk.pkl", "cds_var.npz", "hdw.npz", "snp_ACGTN.npz"):
        assert os.path.exists(
            os.path.join(dset, "Additional_Outputs", rel)
        ), rel

    # a resumed run must not re-parse or re-estimate
    def _boom(*a, **k):
        raise AssertionError("recomputed despite cache")

    monkeypatch.setattr(pl, "parse_genbank_file", _boom)
    monkeypatch.setattr(pl, "estimate_variation_in_cds", _boom)
    sr_again = ldweaver(**kwargs)
    assert len(sr_again) == len(sr_first)
    assert np.allclose(
        np.sort(sr_again["MI"].to_numpy()), np.sort(sr_first["MI"].to_numpy())
    )


def test_resume_from_cache(run_jax, toy_gbk_path):
    """Re-running on an existing dset resumes from saved artifacts
    (R/BacGWES.R:226-241,300-303,382-385)."""
    dset, sr_first = run_jax
    pos = np.loadtxt(TOY_POS, dtype=np.int64)
    sr_again = ldweaver(
        dset=dset,
        aln_path=TOY_ALN,
        aln_has_all_bases=False,
        pos=pos,
        gbk_path=toy_gbk_path,
        validate_ref_ann_lengths=False,
        backend="jax",
    )
    assert len(sr_again) == len(sr_first)
    assert np.allclose(
        np.sort(sr_again["MI"].to_numpy()), np.sort(sr_first["MI"].to_numpy())
    )
