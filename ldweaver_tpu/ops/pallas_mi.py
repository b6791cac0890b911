"""Fused Pallas TPU kernel for the MI contingency sweep.

Replaces the reference's hot path - 25 BLAS tcrossprods + 25 OpenMP
`.fastHadamard` elementwise passes per block-pair
(R/computePairwiseMI.R:270-298, src/computeMI.cpp:11-21) - with ONE kernel
per [TF, TT] output tile that:

  * streams S-chunks of the uint8 allele-code slabs through VMEM,
  * expands one-hot operands in-register (bf16; the weight vector is
    pre-split into bf16 terms for near-f32 exact counts - see
    parallel/sweep._split_bf16),
  * accumulates all 25 allele-pair contingency count matrices in VMEM
    scratch across the S-grid dimension (MXU dots), and
  * applies the full MI log-epilogue on the final S-step (VPU), so the 25
    count matrices never touch HBM.

Grid: (F/TF, T/TT, S/SK) with the S axis innermost (sequential
accumulation, standard Pallas matmul reduction pattern).
"""

from __future__ import annotations

import functools

import numpy as np


def _kernel_body(TF, TT, SK, n_terms):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(
        codes_f_ref,  # [TF, SK] uint8
        codes_t_ref,  # [TT, SK] uint8
        wparts_ref,  # [n_terms, SK] bf16
        px_ref,  # [5, TF] f32   (marginals n_X, precomputed)
        py_ref,  # [5, TT] f32
        r_f_ref,  # [1, TF] f32
        r_t_ref,  # [1, TT] f32
        uq_f_ref,  # [5, TF] f32
        uq_t_ref,  # [5, TT] f32
        neff_ref,  # [1, 1] f32
        rxy_ref,  # [TF, TT] f32 (compat-aliased pseudocount tile)
        out_ref,  # [TF, TT] f32
        counts_ref,  # scratch [25, TF, TT] f32
    ):
        ks = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(ks == 0)
        def _():
            counts_ref[...] = jnp.zeros_like(counts_ref)

        cf = codes_f_ref[...]
        ct = codes_t_ref[...]
        # one-hot expand in-register; rhs slabs reused across x
        rhs = [
            (ct == y).astype(jnp.bfloat16) for y in range(5)
        ]  # 5 x [TT, SK]
        for x in range(5):
            onehot_f = cf == x
            lhs_terms = [
                jnp.where(onehot_f, wparts_ref[t, :][None, :], jnp.bfloat16(0))
                for t in range(n_terms)
            ]
            for y in range(5):
                acc = counts_ref[x * 5 + y]
                for t in range(n_terms):
                    acc = acc + jax.lax.dot_general(
                        lhs_terms[t],
                        rhs[y],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                counts_ref[x * 5 + y] = acc

        @pl.when(ks == nk - 1)
        def _():
            neff = neff_ref[0, 0]
            r_f = r_f_ref[0, :]
            r_t = r_t_ref[0, :]
            den = neff + 0.5 * r_f[:, None] * r_t[None, :]
            rxy = rxy_ref[...]
            mi = jnp.zeros((TF, TT), jnp.float32)
            for x in range(5):
                px = px_ref[x, :]
                pxr = px * (0.5 * r_f)
                for y in range(5):
                    py = py_ref[y, :]
                    pxy = counts_ref[x * 5 + y] + 0.5
                    denom = (
                        px[:, None] * py[None, :]
                        + rxy
                        + pxr[:, None]
                        + (py * (0.5 * r_t))[None, :]
                    )
                    uq = uq_f_ref[x, :][:, None] * uq_t_ref[y, :][None, :]
                    mi = mi + uq * pxy / den * jnp.log(pxy / denom * den)
            out_ref[...] = mi

    return kernel


@functools.lru_cache(maxsize=None)
def _build_pallas_tile(F, T, S, TF, TT, SK, n_terms, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (F // TF, T // TT, S // SK)
    kernel = _kernel_body(TF, TT, SK, n_terms)

    def fn(codes_f, codes_t, wparts, px, py, r_f, r_t, uq_f, uq_t, neff, rxy):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TF, SK), lambda i, j, k: (i, k)),
                pl.BlockSpec((TT, SK), lambda i, j, k: (j, k)),
                pl.BlockSpec((n_terms, SK), lambda i, j, k: (0, k)),
                pl.BlockSpec((5, TF), lambda i, j, k: (0, i)),
                pl.BlockSpec((5, TT), lambda i, j, k: (0, j)),
                pl.BlockSpec((1, TF), lambda i, j, k: (0, i)),
                pl.BlockSpec((1, TT), lambda i, j, k: (0, j)),
                pl.BlockSpec((5, TF), lambda i, j, k: (0, i)),
                pl.BlockSpec((5, TT), lambda i, j, k: (0, j)),
                pl.BlockSpec((1, 1), lambda i, j, k: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((TF, TT), lambda i, j, k: (i, j)),
            ],
            out_specs=pl.BlockSpec((TF, TT), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((F, T), jnp.float32),
            scratch_shapes=[pltpu.VMEM((25, TF, TT), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(codes_f, codes_t, wparts, px, py, r_f, r_t, uq_f, uq_t, neff, rxy)

    return jax.jit(fn)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def mi_tile_pallas(
    codes_f: np.ndarray,
    codes_t: np.ndarray,
    w: np.ndarray,
    r_f: np.ndarray,
    r_t: np.ndarray,
    uq_f: np.ndarray,
    uq_t: np.ndarray,
    neff: float,
    rxy_compat: bool = True,
    n_terms: int = 3,
    tile_f: int = 256,
    tile_t: int = 256,
    chunk_s: int = 512,
    device_get: bool = True,
):
    """Host-facing wrapper matching core.mi.mi_tile_jax's signature.

    Pads F/T/S to tile multiples (padded sites carry code 5 and uq=0, so
    their MI contributions are gated to zero; padded rows are sliced off
    the output).
    """
    import jax
    import jax.numpy as jnp

    from ldweaver_tpu.core.mi import rxy_term

    F, S = codes_f.shape
    T = codes_t.shape[0]
    TF = min(tile_f, _round_up(F, 128))
    TT = min(tile_t, _round_up(T, 128))
    SK = min(chunk_s, _round_up(S, 128))
    Fp, Tp, Sp = _round_up(F, TF), _round_up(T, TT), _round_up(S, SK)

    def pad2(a, n0, n1, fill):
        out = np.full((n0, n1), fill, dtype=a.dtype)
        out[: a.shape[0], : a.shape[1]] = a
        return out

    cf = pad2(codes_f, Fp, Sp, 5)
    ct = pad2(codes_t, Tp, Sp, 5)
    wf = np.zeros(Sp, np.float32)
    wf[:S] = w
    # bf16 split of the weight vector (host side, exact residuals)
    parts = []
    resid = wf.astype(np.float32)
    for _ in range(n_terms):
        p = resid.astype(jnp.bfloat16)
        parts.append(np.asarray(p))
        resid = resid - np.asarray(p, np.float32)
    wparts = np.stack(parts)

    pxf = np.zeros((5, Fp), np.float32)
    pyf = np.zeros((5, Tp), np.float32)
    for a in range(5):
        pxf[a, :F] = ((codes_f == a) * w).sum(axis=1)
        pyf[a, :T] = ((codes_t == a) * w).sum(axis=1)
    rf = np.zeros((1, Fp), np.float32)
    rf[0, :F] = r_f
    rt = np.zeros((1, Tp), np.float32)
    rt[0, :T] = r_t
    uf = np.zeros((5, Fp), np.float32)
    uf[:, :F] = uq_f.T
    ut = np.zeros((5, Tp), np.float32)
    ut[:, :T] = uq_t.T
    rxy = np.zeros((Fp, Tp), np.float32)
    rxy[:F, :T] = rxy_term(r_f, r_t, compat=rxy_compat)

    import jax as _jax

    interpret = _jax.devices()[0].platform != "tpu"
    fn = _build_pallas_tile(Fp, Tp, Sp, TF, TT, SK, n_terms, interpret)
    out = fn(
        jnp.asarray(cf),
        jnp.asarray(ct),
        jnp.asarray(wparts),
        jnp.asarray(pxf),
        jnp.asarray(pyf),
        jnp.asarray(rf),
        jnp.asarray(rt),
        jnp.asarray(uf),
        jnp.asarray(ut),
        jnp.asarray(np.float32(neff)).reshape(1, 1),
        jnp.asarray(rxy),
    )
    if device_get:
        res = np.asarray(jax.device_get(out), dtype=np.float64)
        return res[:F, :T]
    return out[:F, :T]
