"""CLI surface tests (argument plumbing; the heavy paths are covered by
the pipeline tests)."""

import os

import numpy as np

from ldweaver_tpu.cli import build_parser, main
from tests.conftest import TOY_ALN, TOY_POS


def test_parser_run_args():
    p = build_parser()
    args = p.parse_args(
        ["run", "--dset", "d", "--aln", "a.fa", "--gbk", "g.gbk",
         "--sr-dist", "15000", "--backend", "fast", "--sr-only"]
    )
    assert args.cmd == "run" and args.sr_dist == 15000
    assert args.backend == "fast" and args.sr_only


def test_cli_full_run(toy_gbk_path, tmp_path):
    dset = str(tmp_path / "cli_run")
    rc = main(
        ["run", "--dset", dset, "--aln", TOY_ALN, "--pos", TOY_POS,
         "--gbk", toy_gbk_path, "--no-length-validation",
         "--backend", "fast", "--tanglegram-segments", "3"]
    )
    assert rc == 0
    assert os.path.exists(os.path.join(dset, "Tophits/sr_tophits.tsv"))


def test_cli_ldmap(toy_gbk_path, tmp_path):
    # reuse the run from test_cli_full_run's dset? separate tiny fixture:
    dset = str(tmp_path / "cli_run2")
    main(
        ["run", "--dset", dset, "--aln", TOY_ALN, "--pos", TOY_POS,
         "--gbk", toy_gbk_path, "--no-length-validation",
         "--backend", "fast", "--no-annotate"]
    )
    out = str(tmp_path / "ld.png")
    rc = main(
        ["ldmap", "--lr-links", os.path.join(dset, "Temp/lr_links.tsv"),
         "--sr-links", os.path.join(dset, "Temp/sr_links.tsv"),
         "--out", out]
    )
    assert rc == 0 and os.path.exists(out)
