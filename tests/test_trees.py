"""Tree viewer tests: newick parsing, midpoint rooting, rendering."""

import numpy as np
import pandas as pd
import pytest

from ldweaver_tpu.trees import midpoint_root, parse_newick, view_tree


def test_parse_newick_basic():
    t = parse_newick("((A:1,B:2):0.5,(C:3,D:1):0.25);")
    leaves = sorted(n.name for n in t.leaves())
    assert leaves == ["A", "B", "C", "D"]
    assert t.children[0].children[1].name == "B"
    assert t.children[0].children[1].length == 2.0


def test_parse_newick_quoted():
    t = parse_newick("('seq one':1,'seq:two':2);")
    assert sorted(n.name for n in t.leaves()) == ["seq one", "seq:two"]


def test_midpoint_root_balances_depths():
    # caterpillar tree with a long pendant edge: A is 10 away, others close
    t = parse_newick("(A:10,(B:1,(C:1,D:1):1):1);")
    r = midpoint_root(t)
    # depth of deepest tip on each side of the root should be ~equal
    def depth(n, d=0.0):
        if n.is_leaf:
            return [d + n.length]
        out = []
        for c in n.children:
            out.extend(depth(c, d + n.length))
        return out

    sides = [max(depth(c)) for c in r.children]
    assert len(sides) == 2
    assert sides[0] == pytest.approx(sides[1], abs=1e-9)


def test_view_tree_renders(tmp_path, toy_snp_data):
    sd = toy_snp_data
    names = sd.seq_names[:12]
    # simple ladder tree over the first 12 sequences (names contain ':'
    # so they must be quoted, as ape does when writing such labels)
    q = [f"'{n}'" for n in names]
    core = f"({q[0]}:1,{q[1]}:1)"
    for n in q[2:]:
        core = f"({core}:1,{n}:1)"
    (tmp_path / "t.nwk").write_text(core + ";")

    # SNP fasta subset for those sequences
    idx = np.arange(30)
    chars = sd.to_fasta_rows(idx)
    with open(tmp_path / "snps.fa", "wt") as fh:
        for i, nm in enumerate(names):
            fh.write(f">{nm}\n" + chars[i].tobytes().decode() + "\n")
    np.savetxt(tmp_path / "snps.pos", sd.pos[idx], fmt="%d")

    links = pd.DataFrame(
        dict(pos1=sd.pos[[0, 3]], pos2=sd.pos[[10, 20]])
    )
    md = pd.DataFrame(dict(id=names, clade=["x", "y"] * 6))
    out = view_tree(
        str(tmp_path / "t.nwk"),
        str(tmp_path / "snps.fa"),
        str(tmp_path / "snps.pos"),
        links_df=links,
        metadata_df=md,
        plot_save_path=str(tmp_path / "tree.png"),
        plot_height=6,
        plot_width=8,
    )
    import os

    assert os.path.exists(out)
