"""Fused Pallas kernel for the RANK-COMPACTED MI tile.

Combines the two big structural wins (see parallel/fast_sweep.py) with
full fusion: for a bucket with static (Rf, Rt), each [TF, TT] output tile
  * streams S-chunks of the rank-code slabs through VMEM,
  * computes only the (Rf-1)(Rt-1) contingency dots (bf16 weight-split
    terms, f32 accumulation) in VMEM scratch,
  * derives the last rank row/column from the precomputed marginals
    (marginal closure) in the epilogue,
  * applies the Rf*Rt-term MI log epilogue on the final S-step.

For the dominant biallelic x biallelic bucket this is 3 small dots + 4
log terms per tile-chunk, with no intermediate ever leaving VMEM.
"""

from __future__ import annotations

import functools

import numpy as np


def _kernel_body(TF, TT, SK, Rf, Rt, n_terms):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    nmm_x = max(Rf - 1, 1) if not (Rf == 1) else 0
    nmm_y = max(Rt - 1, 1) if not (Rt == 1) else 0
    n_counts = max(nmm_x, 1) * max(nmm_y, 1)

    def kernel(
        codes_f_ref,  # [TF, SK] uint8 rank codes
        codes_t_ref,  # [TT, SK]
        wparts_ref,  # [n_terms, SK] bf16
        px_ref,  # [Rf, TF] f32 marginals
        py_ref,  # [Rt, TT] f32
        r_f_ref,  # [1, TF] f32
        r_t_ref,  # [1, TT] f32
        neff_ref,  # [1, 1] f32 (SMEM)
        out_ref,  # [TF, TT] f32
        counts_ref,  # scratch [n_counts, TF, TT] f32
    ):
        ks = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(ks == 0)
        def _():
            counts_ref[...] = jnp.zeros_like(counts_ref)

        if Rf >= 2 and Rt >= 2:
            # Mosaic-supported op sequence only: u8 -> i32 -> f32 loads,
            # f32 compares (native (8,128) i1), i1 -> f32 one-hot, f32
            # multiply, f32 -> bf16 downcast.  NOT where-with-[1,SK]-
            # broadcast (i1 relayout to replicated (16,128) is
            # unsupported: "Invalid relayout ... vector<TFxSKxi1>") and
            # NOT u8 -> bf16 ("Unsupported cast: uint8 -> bfloat16").
            # wparts are bf16-representable, so the f32 product with a
            # 0/1 one-hot downcasts to bf16 exactly.
            cf = codes_f_ref[...].astype(jnp.int32).astype(jnp.float32)
            ct = codes_t_ref[...].astype(jnp.int32).astype(jnp.float32)
            rhs = [
                (ct == jnp.float32(y)).astype(jnp.bfloat16)
                for y in range(Rt - 1)
            ]
            wrow = [
                jnp.broadcast_to(
                    wparts_ref[t, :][None, :].astype(jnp.float32), (TF, SK)
                )
                for t in range(n_terms)
            ]
            for x in range(Rf - 1):
                onehot_f = (cf == jnp.float32(x)).astype(jnp.float32)
                lhs_terms = [
                    (onehot_f * wrow[t]).astype(jnp.bfloat16)
                    for t in range(n_terms)
                ]
                for y in range(Rt - 1):
                    acc = counts_ref[x * (Rt - 1) + y]
                    for t in range(n_terms):
                        acc = acc + jax.lax.dot_general(
                            lhs_terms[t],
                            rhs[y],
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    counts_ref[x * (Rt - 1) + y] = acc

        @pl.when(ks == nk - 1)
        def _():
            neff = neff_ref[0, 0]
            r_f = r_f_ref[0, :]
            r_t = r_t_ref[0, :]
            den = neff + 0.5 * r_f[:, None] * r_t[None, :]
            rxy = 0.25 * r_f[:, None] * r_t[None, :]
            pX = [px_ref[x, :] for x in range(Rf)]
            pY = [py_ref[y, :] for y in range(Rt)]

            # assemble all Rf x Rt counts via marginal closure
            cnt = {}
            if Rf == 1:
                for y in range(Rt):
                    cnt[(0, y)] = jnp.broadcast_to(pY[y][None, :], (TF, TT))
            elif Rt == 1:
                for x in range(Rf):
                    cnt[(x, 0)] = jnp.broadcast_to(pX[x][:, None], (TF, TT))
            else:
                for x in range(Rf - 1):
                    for y in range(Rt - 1):
                        cnt[(x, y)] = counts_ref[x * (Rt - 1) + y]
                for x in range(Rf - 1):
                    s = None
                    for y in range(Rt - 1):
                        s = cnt[(x, y)] if s is None else s + cnt[(x, y)]
                    cnt[(x, Rt - 1)] = pX[x][:, None] - s
                for y in range(Rt):
                    s = None
                    for x in range(Rf - 1):
                        s = cnt[(x, y)] if s is None else s + cnt[(x, y)]
                    cnt[(Rf - 1, y)] = pY[y][None, :] - s

            mi = jnp.zeros((TF, TT), jnp.float32)
            for x in range(Rf):
                gate_x = (x < r_f).astype(jnp.float32)
                pxr = pX[x] * (0.5 * r_f)
                for y in range(Rt):
                    pxy = cnt[(x, y)] + 0.5
                    denom = (
                        pX[x][:, None] * pY[y][None, :]
                        + rxy
                        + pxr[:, None]
                        + (pY[y] * (0.5 * r_t))[None, :]
                    )
                    uq = gate_x[:, None] * (y < r_t).astype(jnp.float32)[None, :]
                    mi = mi + uq * pxy / den * jnp.log(pxy / denom * den)
            out_ref[...] = mi

    return kernel


@functools.lru_cache(maxsize=None)
def _build(F, T, S, TF, TT, SK, Rf, Rt, n_terms, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (F // TF, T // TT, S // SK)
    nmm = max(Rf - 1, 1) * max(Rt - 1, 1)
    kernel = _kernel_body(TF, TT, SK, Rf, Rt, n_terms)

    def fn(codes_f, codes_t, wparts, px, py, r_f, r_t, neff):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TF, SK), lambda i, j, k: (i, k)),
                pl.BlockSpec((TT, SK), lambda i, j, k: (j, k)),
                pl.BlockSpec((n_terms, SK), lambda i, j, k: (0, k)),
                pl.BlockSpec((Rf, TF), lambda i, j, k: (0, i)),
                pl.BlockSpec((Rt, TT), lambda i, j, k: (0, j)),
                pl.BlockSpec((1, TF), lambda i, j, k: (0, i)),
                pl.BlockSpec((1, TT), lambda i, j, k: (0, j)),
                pl.BlockSpec((1, 1), lambda i, j, k: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((TF, TT), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((F, T), jnp.float32),
            scratch_shapes=[pltpu.VMEM((nmm, TF, TT), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(codes_f, codes_t, wparts, px, py, r_f, r_t, neff)

    return jax.jit(fn)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def mi_tile_rank_pallas(
    rank_codes_f: np.ndarray,
    rank_codes_t: np.ndarray,
    w: np.ndarray,
    r_f: np.ndarray,
    r_t: np.ndarray,
    neff: float,
    n_terms: int = 3,
    tile_f: int = 256,
    tile_t: int = 256,
    chunk_s: int = 1024,
    device_get: bool = True,
):
    """Host-facing wrapper matching fast_sweep.mi_tile_rank's signature."""
    import jax
    import jax.numpy as jnp

    F, S = rank_codes_f.shape
    T = rank_codes_t.shape[0]
    Rf = int(np.asarray(r_f).max())
    Rt = int(np.asarray(r_t).max())
    TF = min(tile_f, _round_up(F, 128))
    TT = min(tile_t, _round_up(T, 128))
    SK = min(chunk_s, _round_up(S, 128))
    Fp, Tp, Sp = _round_up(F, TF), _round_up(T, TT), _round_up(S, SK)

    def pad2(a, n0, n1, fill):
        out = np.full((n0, n1), fill, dtype=a.dtype)
        out[: a.shape[0], : a.shape[1]] = a
        return out

    # padded sites: rank code 255 matches nothing; r=0 so gates kill terms
    cf = pad2(rank_codes_f, Fp, Sp, 255)
    ct = pad2(rank_codes_t, Tp, Sp, 255)
    # padded sequence positions get weight 0 (no count contribution)
    from ldweaver_tpu.parallel.fast_sweep import _wparts

    w_full = np.zeros(Sp, np.float64)
    w_full[:S] = w
    w32, wparts = _wparts(w_full, n_terms)

    px = np.zeros((Rf, Fp), np.float32)
    py = np.zeros((Rt, Tp), np.float32)
    for x in range(Rf):
        px[x, :F] = ((rank_codes_f == x) * w).sum(axis=1)
    for y in range(Rt):
        py[y, :T] = ((rank_codes_t == y) * w).sum(axis=1)
    rf = np.zeros((1, Fp), np.float32)
    rf[0, :F] = r_f
    rt = np.zeros((1, Tp), np.float32)
    rt[0, :T] = r_t

    interpret = jax.devices()[0].platform != "tpu"
    fn = _build(Fp, Tp, Sp, TF, TT, SK, Rf, Rt, n_terms, interpret)
    out = fn(
        jnp.asarray(cf),
        jnp.asarray(ct),
        jnp.asarray(wparts),
        jnp.asarray(px),
        jnp.asarray(py),
        jnp.asarray(rf),
        jnp.asarray(rt),
        jnp.asarray(np.float32(neff)).reshape(1, 1),
    )
    if device_get:
        return np.asarray(jax.device_get(out), np.float64)[:F, :T]
    return out[:F, :T]
