"""Independent exact-arithmetic anchor for the MI statistic.

VERDICT r2 weak #6: the golden files in tests/golden/ were produced by the
repo's own f64 oracle, so oracle bugs would be self-consistently frozen.
This module breaks that loop: it re-derives the statistic for a tiny
hand-written dataset STRAIGHT from the published formula (SURVEY.md
section 2.3; reference R/computePairwiseMI.R:238-263,390-397 +
src/computeMI.cpp:11-21) using exact rational arithmetic
(fractions.Fraction) for every rational subexpression, sharing NO code
with ldweaver_tpu.core.mi.  Only the final transcendental (natural log)
is evaluated in float64, on an exactly-computed rational argument, so the
pin is correct to a few ulps.

Covered independently here:
  * weighted contingency counts n_XY, marginals n_X / n_Y (own-site r
    pseudocount quirk, R/computePairwiseMI.R:262-263,393-394)
  * den = neff + 0.5*r_f*r_t
  * the RXY linear-aliasing quirk of .fastHadamard: the [T,F] matrix
    t(tcrossprod(rf,rt))*0.25 is indexed LINEARLY (column-major) against
    the [F,T] tile (src/computeMI.cpp:19).  Re-derived here with explicit
    index arithmetic - pair (f,t) at column-major position k = f + t*F
    reads 0.25 * r_f[k // T] * r_t[k % T] - NOT via core.mi.rxy_term.
  * uq gating of allele pairs that occur at each site

Weights are exact dyadic rationals so the float64 inputs the oracle sees
are bit-identical to the Fractions used here.
"""

import math
from fractions import Fraction

import numpy as np

from ldweaver_tpu.core.mi import mi_tile_numpy

# --- tiny hand-written dataset (7 sequences x 6 sites) ---------------------
# allele codes: 0=A 1=C 2=G 3=T 4=N.  Sites span r=2, r=3 (with N), r=4,
# and include allele pairs that never co-occur (n_XY = 0 under uq = 1).
CODES = np.array(
    [  # seq x site
        [0, 1, 0, 2, 3, 0],
        [0, 1, 0, 2, 3, 1],
        [1, 1, 4, 3, 3, 2],
        [1, 3, 0, 3, 0, 3],
        [0, 3, 4, 2, 0, 0],
        [1, 1, 2, 3, 3, 1],
        [0, 3, 0, 2, 3, 2],
    ],
    dtype=np.uint8,
)
# exact dyadic weights (denominator 16): float64 representation is exact
W_FRAC = [
    Fraction(3, 16),
    Fraction(5, 8),
    Fraction(1, 2),
    Fraction(15, 16),
    Fraction(1, 4),
    Fraction(7, 8),
    Fraction(11, 16),
]


def _site_stats(site):
    """uq (occurrence flags) and r (distinct-allele count) for one site."""
    col = CODES[:, site]
    uq = [1 if np.any(col == a) else 0 for a in range(5)]
    return uq, sum(uq)


def _n_x(site, allele):
    """Weighted marginal count n_X(site) as an exact Fraction."""
    col = CODES[:, site]
    return sum(
        (w for s, w in enumerate(W_FRAC) if col[s] == allele),
        Fraction(0),
    )


def _n_xy(f, t, x, y):
    """Weighted joint count n_XY(f,t) as an exact Fraction."""
    cf, ct = CODES[:, f], CODES[:, t]
    return sum(
        (w for s, w in enumerate(W_FRAC) if cf[s] == x and ct[s] == y),
        Fraction(0),
    )


def _mi_exact(f_sites, t_sites):
    """MI tile [F,T] from the published formula, exact rationals + one
    float64 log per (X,Y) term.  Independent of ldweaver_tpu.core.mi."""
    F, T = len(f_sites), len(t_sites)
    neff = sum(W_FRAC, Fraction(0))
    half = Fraction(1, 2)
    quarter = Fraction(1, 4)

    uq_r = {s: _site_stats(s) for s in set(f_sites) | set(t_sites)}
    out = np.zeros((F, T), dtype=np.float64)
    for fi, f in enumerate(f_sites):
        uq_f, r_f = uq_r[f]
        for ti, t in enumerate(t_sites):
            uq_t, r_t = uq_r[t]
            den = neff + half * r_f * r_t
            # .fastHadamard linear-aliasing of the [T,F] rft matrix
            # against the [F,T] tile (src/computeMI.cpp:19): column-major
            # position k = fi + ti*F reads rft element (k % T, k // T),
            # whose value is 0.25 * r_f[k // T] * r_t[k % T].
            k = fi + ti * F
            r_f_alias = uq_r[f_sites[k // T]][1]
            r_t_alias = uq_r[t_sites[k % T]][1]
            rxy = quarter * r_f_alias * r_t_alias
            mi = 0.0
            for x in range(5):
                if not uq_f[x]:
                    continue
                nx = _n_x(f, x)
                for y in range(5):
                    if not uq_t[y]:
                        continue
                    ny = _n_x(t, y)
                    nxy = _n_xy(f, t, x, y) + half
                    denom = nx * ny + rxy + half * nx * r_f + half * ny * r_t
                    coeff = nxy / den
                    arg = nxy * den / denom
                    mi += float(coeff) * math.log(float(arg))
            out[fi, ti] = mi
    return out


def _oracle_inputs(sites):
    codes = np.ascontiguousarray(CODES[:, sites].T)
    uq = np.zeros((len(sites), 5), dtype=np.uint8)
    r = np.zeros(len(sites), dtype=np.int32)
    for i, s in enumerate(sites):
        u, rr = _site_stats(s)
        uq[i] = u
        r[i] = rr
    return codes, uq, r


W64 = np.array([float(w) for w in W_FRAC])
NEFF = float(sum(W_FRAC, Fraction(0)))


def test_weights_exact_in_f64():
    # the dyadic weights and their sum are exactly representable, so the
    # oracle and the Fraction computation see identical inputs
    for w, wf in zip(W64, W_FRAC):
        assert Fraction(w) == wf
    assert Fraction(NEFF) == sum(W_FRAC, Fraction(0))


def test_oracle_matches_exact_formula_square():
    sites = [0, 1, 2, 3, 4, 5]
    codes, uq, r = _oracle_inputs(sites)
    got = mi_tile_numpy(codes, codes, W64, r, r, uq, uq, NEFF)
    want = _mi_exact(sites, sites)
    assert np.allclose(got, want, rtol=1e-10, atol=1e-13), (
        np.abs(got - want).max()
    )


def test_oracle_matches_exact_formula_ragged():
    # ragged [4,2] tile: the RXY column-major aliasing WRAPS (k//T exceeds
    # row count patterns differ from the square case) - this is the case
    # where an incorrect rxy implementation diverges
    f_sites, t_sites = [0, 2, 3, 5], [1, 4]
    codes_f, uq_f, r_f = _oracle_inputs(f_sites)
    codes_t, uq_t, r_t = _oracle_inputs(t_sites)
    got = mi_tile_numpy(codes_f, codes_t, W64, r_f, r_t, uq_f, uq_t, NEFF)
    want = _mi_exact(f_sites, t_sites)
    assert np.allclose(got, want, rtol=1e-10, atol=1e-13), (
        np.abs(got - want).max()
    )


def test_aliasing_quirk_is_exercised():
    # sanity: on the ragged tile the aliased RXY actually differs from the
    # mathematically-intended outer product for at least one pair, so the
    # tests above genuinely pin the quirk
    f_sites, t_sites = [0, 2, 3, 5], [1, 4]
    F, T = len(f_sites), len(t_sites)
    differs = False
    for fi in range(F):
        r_f = _site_stats(f_sites[fi])[1]
        for ti in range(T):
            r_t = _site_stats(t_sites[ti])[1]
            k = fi + ti * F
            alias = (
                _site_stats(f_sites[k // T])[1]
                * _site_stats(t_sites[k % T])[1]
            )
            if alias != r_f * r_t:
                differs = True
    assert differs
