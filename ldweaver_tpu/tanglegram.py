"""Tanglegram output (reference: create_tanglegram, R/createTanglegram.R:26-296).

The reference renders chromoMap HTML widgets: the genome is cut into
`break_segments` pseudo-chromosomes by hierarchically clustering tophit
positions, each tophit link is drawn between its two loci across two
mirrored tracks.  Here each segment is rendered as a matplotlib two-track
figure (top/bottom gene tracks + connecting lines), one PNG per segment,
plus a TSV with the segment/locus assignments so downstream tools can
rebuild interactive views.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import pandas as pd

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _segment_positions(positions: np.ndarray, break_segments: int) -> np.ndarray:
    """Cut tophit positions into contiguous segments via 1-D hierarchical
    clustering (the reference hclust-cuts positions,
    R/createTanglegram.R:35).  Single-linkage on sorted gaps == cutting at
    the (break_segments-1) largest gaps."""
    uniq = np.unique(positions)
    k = min(break_segments, uniq.size)
    if k <= 1 or uniq.size < 2:
        return np.zeros(positions.size, dtype=np.int64)
    gaps = np.diff(uniq)
    cut_idx = np.sort(np.argsort(-gaps, kind="stable")[: k - 1])
    boundaries = uniq[cut_idx] + 0.5
    seg_of_uniq = np.searchsorted(boundaries, uniq)
    lut = {int(u): int(s) for u, s in zip(uniq, seg_of_uniq)}
    return np.array([lut[int(p)] for p in positions], dtype=np.int64)


def _locus_name(p: int, features: List) -> str:
    """Locus lookup across annotation features (the reference scans every
    GenBankRecord slot, R/createTanglegram.R:88-137)."""
    for f in features:
        if f.start <= p <= f.end:
            return f.gene or f.locus_tag or f"{f.start}-{f.end}"
    return f"pos{p}"


def create_tanglegram(
    tophits: pd.DataFrame,
    features: List,
    tanglegram_folder: str,
    break_segments: int = 5,
    links_type: str = "SR",
) -> None:
    os.makedirs(tanglegram_folder, exist_ok=True)
    if len(tophits) == 0:
        return
    pos1 = tophits["pos1"].to_numpy()
    pos2 = tophits["pos2"].to_numpy()
    allpos = np.concatenate([pos1, pos2])
    segs = _segment_positions(allpos, break_segments)
    seg1 = segs[: pos1.size]
    seg2 = segs[pos1.size :]

    # assignment table export
    df = pd.DataFrame(
        dict(
            pos1=pos1,
            pos2=pos2,
            segment1=seg1,
            segment2=seg2,
            MI=tophits["MI"].to_numpy(),
        )
    )
    df.to_csv(
        os.path.join(tanglegram_folder, "tanglegram_segments.tsv"),
        sep="\t",
        index=False,
    )

    for s in np.unique(np.concatenate([seg1, seg2])):
        sel = (seg1 == s) | (seg2 == s)
        if not sel.any():
            continue
        p1 = pos1[sel]
        p2 = pos2[sel]
        lo = min(p1.min(), p2.min())
        hi = max(p1.max(), p2.max())
        span = max(1, hi - lo)
        fig, ax = plt.subplots(figsize=(9, 3), dpi=200)
        for a, b in zip(p1, p2):
            xa = (a - lo) / span
            xb = (b - lo) / span
            ax.plot([xa, xb], [1.0, 0.0], lw=0.6, c="#0868ac", alpha=0.7)
        for p, y in [(p1, 1.0), (p2, 0.0)]:
            ax.scatter((p - lo) / span, np.full(p.size, y), s=8, c="#db4325")
            for pp in np.unique(p):
                ax.annotate(
                    _locus_name(int(pp), features),
                    ((pp - lo) / span, y),
                    fontsize=5,
                    rotation=45,
                    ha="left",
                    va="bottom" if y == 1.0 else "top",
                )
        ax.set_ylim(-0.35, 1.35)
        ax.set_xticks([0, 1])
        ax.set_xticklabels([str(lo), str(hi)], fontsize=6)
        ax.set_yticks([])
        ax.set_title(f"{links_type} tanglegram segment {int(s) + 1}", fontsize=8)
        fig.tight_layout()
        fig.savefig(
            os.path.join(tanglegram_folder, f"segment_{int(s) + 1}.png")
        )
        plt.close(fig)
