"""Tanglegram segmentation parity (R/createTanglegram.R:35-49).

The reference cuts tophit pos1 into `break_segments` pseudo-chromosomes
with `cutree(hclust(dist(pos1)), k)` — hclust's default is COMPLETE
linkage — then relabels clusters by applying `order(min pos1 per cluster)`
directly (not its inverse; a reference quirk).
"""

import numpy as np
import pandas as pd
import pytest

from ldweaver_tpu.tanglegram import (
    _hclust_complete_cutree_1d,
    _segment_links,
    create_tanglegram,
)


def test_cutree_hand_computed():
    # complete linkage on [1,2,10,11,30]: merge (1,2) h=1, (10,11) h=1,
    # then {1,2}+{10,11} h=10, then +{30} h=29.  k=3 cuts below h=10.
    vals = np.array([1, 2, 10, 11, 30])
    labs = _hclust_complete_cutree_1d(vals, 3)
    assert labs.tolist() == [1, 1, 2, 2, 3]
    # k=2: {1,2,10,11} vs {30}
    assert _hclust_complete_cutree_1d(vals, 2).tolist() == [1, 1, 1, 1, 2]
    # k=1
    assert _hclust_complete_cutree_1d(vals, 1).tolist() == [1] * 5


def test_cutree_complete_vs_single_differ():
    # Case where complete linkage differs from largest-gap (single-linkage)
    # cuts: [0, 6, 11, 20] with k=2.  Largest gap is 11->20 (9), so single
    # linkage gives {0,6,11},{20}.  Complete linkage merges (6,11) h=5,
    # then {6,11}+{0} span 11 vs {6,11}+{20} span 14 -> {0,6,11} h=11,
    # ... same here.  Use the classic chaining case instead:
    # [0, 10, 21, 33] gaps 10,11,12 -> single merges left-first chain;
    # complete: merge (0,10) h=10, then (21,33) span 12 < {0,10}+21 span 21
    # -> k=2 gives {0,10},{21,33}; single-linkage largest-gap cut is at 12:
    # {0,10,21},{33}.
    vals = np.array([0, 10, 21, 33])
    labs = _hclust_complete_cutree_1d(vals, 2)
    assert labs.tolist() == [1, 1, 2, 2]


def test_cutree_first_appearance_numbering():
    # R cutree numbers clusters by first appearance in the data order.
    vals = np.array([100, 101, 1, 2, 50, 51])
    labs = _hclust_complete_cutree_1d(vals, 3)
    assert labs.tolist() == [1, 1, 2, 2, 3, 3]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("k", [2, 3, 5])
def test_cutree_matches_scipy_complete(seed, k):
    scipy_h = pytest.importorskip("scipy.cluster.hierarchy")
    rng = np.random.default_rng(seed)
    vals = rng.uniform(0, 1e6, size=40)  # distinct floats: no tie ambiguity
    labs = _hclust_complete_cutree_1d(vals, k)
    Z = scipy_h.linkage(vals.reshape(-1, 1), method="complete")
    ref = scipy_h.fcluster(Z, t=k, criterion="maxclust")
    # compare partitions up to relabeling
    part = lambda a: {frozenset(np.where(a == lab)[0]) for lab in np.unique(a)}
    assert part(labs) == part(ref)


def test_segment_links_relabel_quirk():
    # first-appearance clusters: c1={100,101} (min 100), c2={1,2} (min 1),
    # c3={50,51} (min 50).  order(mins) = (2,3,1) — a 3-cycle, NOT an
    # involution — and the reference applies it directly
    # (R/createTanglegram.R:45), giving 1->2, 2->3, 3->1.
    pos1 = np.array([100, 101, 1, 2, 50, 51])
    segs = _segment_links(pos1, 3)
    assert segs.tolist() == [2, 2, 3, 3, 1, 1]


def test_segment_links_involution_sorted():
    # when order(mins) is an involution the labels DO come out
    # position-sorted: swap case.
    pos1 = np.array([50, 51, 1, 2])
    segs = _segment_links(pos1, 2)
    assert segs.tolist() == [2, 2, 1, 1]


def test_locus_name_non_cds_features():
    """A tophit inside a gene that has NO CDS (rRNA/tRNA spans) must label
    by that gene, and named features win by the reference's slot
    precedence genes > cds > other (R/createTanglegram.R:88-137;
    VERDICT r2 missing-#3)."""
    from ldweaver_tpu.io.genbank import Feature
    from ldweaver_tpu.tanglegram import _locus_name

    def feat(type_, s, e, **quals):
        return Feature(type=type_, start=s, end=e, strand=1,
                       segments=[(s, e)], qualifiers=quals)

    features = [
        feat("source", 1, 10000),  # unnamed whole-genome span: never wins
        feat("gene", 100, 200, gene="rrnA"),  # rRNA gene without a CDS
        feat("rRNA", 100, 200, locus_tag="R1"),
        feat("gene", 300, 400, gene="gX", locus_tag="T1"),
        feat("CDS", 300, 400, locus_tag="T1"),
        feat("CDS", 500, 600, locus_tag="T2"),  # CDS without a gene feature
    ]
    assert _locus_name(150, features) == "rrnA"  # gene wins over rRNA
    assert _locus_name(350, features) == "gX"  # gene wins over CDS
    assert _locus_name(550, features) == "T2"  # CDS when no gene span
    assert _locus_name(250, features) == "pos250"  # intergenic fallback
    # CDS-only list (the old pipeline wiring) missed the rRNA gene
    assert _locus_name(150, [f for f in features if f.type == "CDS"]) == "pos150"


def test_create_tanglegram_outputs(tmp_path):
    tophits = pd.DataFrame(
        dict(
            pos1=[100, 101, 1, 2, 50, 51],
            pos2=[500, 510, 400, 410, 450, 460],
            MI=[0.5, 0.4, 0.3, 0.6, 0.2, 0.1],
        )
    )
    create_tanglegram(tophits, [], str(tmp_path), break_segments=3)
    tsv = pd.read_csv(tmp_path / "tanglegram_segments.tsv", sep="\t")
    assert tsv["segment"].tolist() == [2, 2, 3, 3, 1, 1]
    for s in (1, 2, 3):
        assert (tmp_path / f"segment_{s}.png").exists()
