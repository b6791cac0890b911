"""Interactive HTML artifact exports (viz_html.py): the reference ships
chromoMap htmlwidgets (R/createTanglegram.R:278-293) and igraph networks;
the TPU build ships equivalent self-contained SVG+JS pages next to every
PNG."""

import numpy as np
import pandas as pd

from ldweaver_tpu.viz_html import write_network_html, write_tanglegram_html


def test_tanglegram_html_selfcontained(tmp_path):
    pos1 = np.array([100, 150, 5000])
    pos2 = np.array([400, 420, 5400])
    mi = np.array([0.5, 0.2, 0.9])
    segs = np.array([1, 1, 2])
    out = tmp_path / "t.html"
    write_tanglegram_html(
        pos1, pos2, mi, segs, lambda p: f"gene{p}", str(out)
    )
    txt = out.read_text()
    assert txt.count("<svg") == 2  # one panel per segment
    assert "gene100" in txt and "gene5400" in txt
    assert "MI 0.9" in txt
    assert "http" not in txt.split("xmlns")[0]  # no external resources
    assert "<script>" in txt  # inline interactivity


def test_tanglegram_html_escapes_markup(tmp_path):
    out = tmp_path / "esc.html"
    write_tanglegram_html(
        np.array([1]), np.array([10]), np.array([0.1]), np.array([1]),
        lambda p: '<bad>&"name', str(out)
    )
    txt = out.read_text()
    assert "<bad>" not in txt
    assert "&lt;bad&gt;" in txt


def test_network_html(tmp_path):
    out = tmp_path / "n.html"
    write_network_html(
        ["geneA", "geneB"], ["geneB", "geneC"], np.array([0.5, 0.7]),
        str(out), title="test net"
    )
    txt = out.read_text()
    assert "geneA" in txt and "geneC" in txt
    assert 'class="link"' in txt and 'class="node"' in txt


def test_create_network_writes_html(tmp_path):
    from ldweaver_tpu.plots import create_network

    tophits = pd.DataFrame(
        dict(
            pos1=[1, 2], pos2=[10, 20],
            pos1_genreg=["gA", "gB"], pos2_genreg=["gB", "gC"],
            MI=[0.4, 0.6],
        )
    )
    png = tmp_path / "net.png"
    create_network(tophits, str(png), plot_title="t")
    assert png.exists()
    assert (tmp_path / "net.html").exists()


def test_create_tanglegram_writes_html(tmp_path):
    from ldweaver_tpu.tanglegram import create_tanglegram

    tophits = pd.DataFrame(
        dict(pos1=[100, 5000], pos2=[300, 5300], MI=[0.3, 0.8])
    )
    create_tanglegram(tophits, [], str(tmp_path), break_segments=2)
    assert (tmp_path / "tanglegram.html").exists()
