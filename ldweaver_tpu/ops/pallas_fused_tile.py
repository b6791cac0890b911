"""Fully-fused Pallas sweep tile: contingency dot + pure-biallelic
telescoped MI epilogue + LR mask + stage-1 chunked max/argmax, in VMEM.

The XLA fast path materializes the [B, B] f32 MI tile in HBM between the
matmul, epilogue, and reduction kernels (several x 64 MB of traffic per
tile at B=4096).  This kernel keeps every intermediate in VMEM and emits
only the stage-1 candidates - [B, B/C] (value, global-column) pairs - so
the only HBM tile writes are ~2 MB.  Stage 2 (the flat top-k over
candidates) stays in XLA.

Scope: r-PURE biallelic block pairs (Rf == Rt == 2) - the dominant
bucket by far in real data.  Higher-R pure buckets would need
(Rf-1)(Rt-1) count planes of [TF, B] f32 scratch and exceed the ~16 MB
VMEM budget; they stay on the XLA path.  Semantics mirror the XLA scan
body in parallel/fast_sweep._build_bucket_sweep: same closure cell
order, same telescoped epilogue (see _rank_tile_mi pure=True), same
branchless circular distance, same first-index tie-breaking.

Layout: grid (i over F/TF, k over S/SK); each i-row block sees the FULL
T columns (so the output block [TF, T/C] has a full final dimension -
Mosaic requires output block last-dims divisible by (8,128) or equal to
the array dims).  The count plane accumulates in a [TF, T] f32 scratch
across k; the epilogue runs at the last k step in SEC-wide column
sections to bound live VMEM, concatenating per-section candidates
in-register before the single full-width store.

Mosaic constraints honoured (learned the hard way, see pallas_rank_mi):
no u8->bf16 casts (route u8->i32->f32), no where-with-[1,SK]-broadcast
masks (scalar broadcasts and lane-broadcasts of f32 compares are fine).

Reference: R/computePairwiseMI.R:270-298 + src/computeMI.cpp:11-21 (the
25-matmul + fastHadamard per-block-pair computation this collapses).
"""

from __future__ import annotations

import functools

import numpy as np


def _kernel_body(TF, T, SK, C, SEC, n_terms, g, sr_dist):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    nsec = T // SEC
    csec = SEC // C  # candidate columns per section

    def kernel(
        codes_f_ref,   # [SK, TF] u8 rank codes (row block, seq-major)
        codes_t_ref,   # [SK, T] u8 (ALL columns, seq-major)
        wparts_ref,    # [SK, n_terms] bf16 (seq-major weight terms)
        px_ref,        # [2, TF] f32 weighted marginals (row block)
        py_ref,        # [2, T] f32
        pos_f_ref,     # [1, TF] i32
        pos_t_ref,     # [1, T] i32
        val_f_ref,     # [1, TF] f32 0/1
        val_t_ref,     # [1, T] f32 0/1
        neff_ref,      # [1, 1] f32 (SMEM)
        same_ref,      # [1, 1] i32 (SMEM): 1 if diagonal block pair
        vals_ref,      # out [TF, T//C] f32
        cols_ref,      # out [TF, T//C] i32 (in-tile column index)
        counts_ref,    # scratch [TF, T] f32 (the single c00 plane)
    ):
        i = pl.program_id(0)
        ks = pl.program_id(1)
        nk = pl.num_programs(1)

        @pl.when(ks == 0)
        def _():
            counts_ref[...] = jnp.zeros_like(counts_ref)

        # --- c00 accumulation (every k step) ---
        # seq-major ("TN") layout: both operands are [K, .] with K on
        # the sublane axis, so the MXU contracts without any transpose
        # relayout of the big rhs, and the column-broadcast of the
        # per-sequence weight is the supported lane-replication
        cf = codes_f_ref[...].astype(jnp.int32).astype(jnp.float32)
        ct = codes_t_ref[...].astype(jnp.int32).astype(jnp.float32)
        rhs0 = (ct == jnp.float32(0)).astype(jnp.bfloat16)
        onehot_f = (cf == jnp.float32(0)).astype(jnp.float32)
        acc = counts_ref[...]
        for t in range(n_terms):
            wcol = wparts_ref[:, t].astype(jnp.float32)[:, None]
            lhs_t = (onehot_f * wcol).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                lhs_t,
                rhs0,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        counts_ref[...] = acc

        # --- epilogue + mask + stage-1 (last k step, per SEC section) ---
        @pl.when(ks == nk - 1)
        def _():
            f32 = jnp.float32
            neff = neff_ref[0, 0]
            den_s = neff + f32(2.0)
            logden = jnp.log(den_s)
            invden = 1.0 / den_s
            pX0 = px_ref[0, :]
            pX1 = px_ref[1, :]
            px0_s = pX0 + 1.0
            px1_s = pX1 + 1.0
            lx = jnp.log(px0_s) * px0_s + jnp.log(px1_s) * px1_s
            pos_f = pos_f_ref[0, :]
            row_g = i * TF + jax.lax.broadcasted_iota(
                jnp.int32, (TF, SEC), 0
            )
            vf = val_f_ref[0, :][:, None] > 0.5
            same = same_ref[0, 0]

            sec_v = []
            sec_c = []
            for s in range(nsec):
                sl = slice(s * SEC, (s + 1) * SEC)
                c00 = counts_ref[:, sl]
                pY0 = py_ref[0, sl]
                pY1 = py_ref[1, sl]
                # closure, same cell order as _rank_tile_mi
                c01 = pX0[:, None] - c00
                c10 = pY0[None, :] - c00
                c11 = pY1[None, :] - c01
                p00 = c00 + 0.5
                p01 = c01 + 0.5
                p10 = c10 + 0.5
                p11 = c11 + 0.5
                ent = (
                    p00 * jnp.log(p00)
                    + p01 * jnp.log(p01)
                    + p10 * jnp.log(p10)
                    + p11 * jnp.log(p11)
                )
                py0_s = pY0 + 1.0
                py1_s = pY1 + 1.0
                ly = jnp.log(py0_s) * py0_s + jnp.log(py1_s) * py1_s
                mi = (ent - lx[:, None] - ly[None, :] + den_s * logden) \
                    * invden

                col_g = s * SEC + jax.lax.broadcasted_iota(
                    jnp.int32, (TF, SEC), 1
                )
                tri = (row_g > col_g) | (same == 0)
                ok = tri & vf & (val_t_ref[0, sl][None, :] > 0.5)
                diff = pos_t_ref[0, sl][None, :] - pos_f[:, None]
                d = diff + jnp.where(diff < 0, jnp.int32(g), jnp.int32(0))
                lens = f32(0.5 * g) - jnp.abs(d.astype(f32) - f32(0.5 * g))
                lr_ok = ok & (lens > f32(sr_dist))
                masked = jnp.where(lr_ok, mi, f32(-jnp.inf))

                for c in range(csec):
                    ch = masked[:, c * C : (c + 1) * C]
                    m = jnp.max(ch, axis=1)
                    eq = ch == m[:, None]
                    iota_c = jax.lax.broadcasted_iota(jnp.int32, (TF, C), 1)
                    am = jnp.min(
                        jnp.where(eq, iota_c, jnp.int32(C)), axis=1
                    )
                    sec_v.append(m[:, None])
                    sec_c.append((s * SEC + c * C + am)[:, None])
            vals_ref[...] = jnp.concatenate(sec_v, axis=1)
            cols_ref[...] = jnp.concatenate(sec_c, axis=1)

    return kernel


@functools.lru_cache(maxsize=None)
def _build(F, T, S, TF, SK, C, SEC, n_terms, g, sr_dist, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert F % TF == 0 and S % SK == 0 and T % SEC == 0 and SEC % C == 0
    grid = (F // TF, S // SK)
    kernel = _kernel_body(TF, T, SK, C, SEC, n_terms, g, sr_dist)

    def fn(codes_f, codes_t, wparts, px, py, pos_f, pos_t, val_f, val_t,
           neff, same_block):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((SK, TF), lambda i, k: (k, i)),
                pl.BlockSpec((SK, T), lambda i, k: (k, 0)),
                pl.BlockSpec((SK, n_terms), lambda i, k: (k, 0)),
                pl.BlockSpec((2, TF), lambda i, k: (0, i)),
                pl.BlockSpec((2, T), lambda i, k: (0, 0)),
                pl.BlockSpec((1, TF), lambda i, k: (0, i)),
                pl.BlockSpec((1, T), lambda i, k: (0, 0)),
                pl.BlockSpec((1, TF), lambda i, k: (0, i)),
                pl.BlockSpec((1, T), lambda i, k: (0, 0)),
                pl.BlockSpec((1, 1), lambda i, k: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i, k: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((TF, T // C), lambda i, k: (i, 0)),
                pl.BlockSpec((TF, T // C), lambda i, k: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((F, T // C), jnp.float32),
                jax.ShapeDtypeStruct((F, T // C), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((TF, T), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                # the 16 MB scoped-vmem default is a compiler headroom
                # heuristic, not the physical limit; this kernel's live
                # set (count plane + streamed operands + section temps)
                # measures ~17.2 MB at TF=256
                vmem_limit_bytes=48 * 1024 * 1024,
            ),
            interpret=interpret,
        )(codes_f, codes_t, wparts, px, py, pos_f, pos_t, val_f, val_t,
          neff, same_block)

    return fn


def fused_tile_stage1(
    codes_f, codes_t, wparts, px, py, pos_f, pos_t, val_f, val_t,
    neff, same_block, *, g: int, sr_dist: int,
    n_terms: int = 3, tile_f: int = 256, chunk_s: int = 512,
    chunk_c: int = 128, section: int = 512, interpret: bool = False,
):
    """Traceable wrapper: SEQ-MAJOR [S, B] u8 biallelic rank-code tiles
    (the natural resident layout - no transpose needed) -> stage-1
    candidates (vals [B, B/C] f32, in-tile cols [B, B/C] i32).

    `wparts` is the seq-major [S, n_terms] bf16 weight-term matrix
    (i.e. fast_sweep._wparts(...)[1].T).  Operands must already be
    padded (B multiple of tile_f and section, S multiple of chunk_s -
    pad sequences with weight 0).  `same_block` is a traced i32 scalar
    (1 on diagonal block pairs).  Slots into the lax.scan body of
    parallel/fast_sweep._build_bucket_sweep in place of _rank_tile_mi +
    mask + the chunked-max stage 1."""
    import jax.numpy as jnp

    S, F = codes_f.shape
    T = codes_t.shape[1]
    fn = _build(F, T, S, tile_f, chunk_s, chunk_c, section,
                n_terms, int(g), int(sr_dist), interpret)
    return fn(
        codes_f, codes_t, wparts, px, py,
        pos_f.reshape(1, F).astype(jnp.int32),
        pos_t.reshape(1, T).astype(jnp.int32),
        val_f.reshape(1, F).astype(jnp.float32),
        val_t.reshape(1, T).astype(jnp.float32),
        neff.reshape(1, 1).astype(jnp.float32),
        jnp.asarray(same_block, jnp.int32).reshape(1, 1),
    )
