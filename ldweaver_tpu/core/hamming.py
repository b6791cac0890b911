"""Hamming-distance sequence weights (population-structure correction).

Reference: `estimate_Hamming_distance_weights`
(R/performPopulationStuctureCorrection.R:20-81):

  shared[s,t] = sum_allele crossprod(M_allele)[s,t]   (shared-SNP counts)
  hdw[s] = 1 / ( #{t : nsnp - shared[s,t] < int(nsnp*threshold)} + 1 )

Notes replicated exactly:
  * thresh = as.integer(nsnp*threshold) - truncation (line 23);
  * strict '<' (line 76);
  * the count includes t == s (the diagonal of `shared` is nsnp because
    every site maps to exactly one of the five allele classes), so every
    sequence counts itself once and the +1 makes the self-weight 1/2 at
    minimum.

TPU mapping: the five sparse crossprods collapse into a single one-hot
contingency einsum on the MXU.  Since sum_x 1[code_s=x]*1[code_t=x] is just
an equality count, shared[s,t] = #sites where codes agree - computed as
five [nseq, nsnp] @ [nsnp, nseq] matmuls (one per allele) accumulated on
device, blocked over SNPs so the one-hot slab stays HBM-friendly.
"""

from __future__ import annotations

import numpy as np


def hamming_weights_numpy(codes: np.ndarray, threshold: float = 0.1) -> np.ndarray:
    """float64 oracle; exact integer shared-SNP counts."""
    nseq, nsnp = codes.shape
    shared = np.zeros((nseq, nseq), dtype=np.int64)
    # blocked over SNPs to bound memory
    blk = 16384
    for s in range(0, nsnp, blk):
        cb = codes[:, s : s + blk]
        for a in range(5):
            m = (cb == a).astype(np.int64)
            shared += m @ m.T
    thresh = int(nsnp * threshold)
    neigh = ((nsnp - shared) < thresh).sum(axis=0)
    return 1.0 / (neigh + 1.0)


def hamming_weights_jax(
    codes: np.ndarray, threshold: float = 0.1, seq_block: int = 8192
) -> np.ndarray:
    """Device path: equality counts via f32 matmuls (exact: nsnp < 2^24).

    Blocked over sequence-pair tiles with the neighbour-count reduction
    fused on device, so the nseq x nseq shared-SNP matrix never
    materialises (10 GB at 50k genomes).  Matmuls use bf16 inputs (0/1
    one-hots are exact in bf16) with f32 accumulation - exact integer
    counts at bf16 MXU rate."""
    import functools

    import jax
    import jax.numpy as jnp

    nseq, nsnp = codes.shape
    thresh = int(nsnp * threshold)
    Bs = min(seq_block, _next_pow2(nseq))
    npad = (-nseq) % Bs
    # pad code 15 (not 255): it still matches no allele class 0..4, and
    # it fits a NIBBLE, so blocks cross the bandwidth-limited relay
    # packed two-codes-per-byte (same trick as parallel/slabs.py)
    codes_p = (
        np.concatenate(
            [codes, np.full((npad, nsnp), 15, np.uint8)], axis=0
        )
        if npad
        else codes
    )
    nseq_p = codes_p.shape[0]
    nb = nseq_p // Bs

    @functools.partial(jax.jit, static_argnames=())
    def tile_counts(ci, cj):
        # padded rows (code 15) match nothing -> shared 0 -> distance
        # nsnp >= thresh -> contribute 0 to the count
        acc = jnp.zeros((Bs, Bs), dtype=jnp.float32)
        for a in range(5):
            mi_ = (ci == a).astype(jnp.bfloat16)
            mj_ = (cj == a).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot(
                mi_, mj_.T, preferred_element_type=jnp.float32
            )
        near = (nsnp - acc) < thresh  # strict <, R/perform...R:76
        return near.sum(axis=1).astype(jnp.int32)

    from ldweaver_tpu.parallel.slabs import _unpack_nibbles, pack_nibbles

    def _packed_block(k):
        h = codes_p[k * Bs : (k + 1) * Bs]
        return _unpack_nibbles(jnp.asarray(pack_nibbles(h, pad=15)), nsnp)

    neigh = np.zeros(nseq_p, dtype=np.int64)
    pack_ok = int(codes.max(initial=0)) <= 15  # ACGTN codes are 0..4
    dev_blocks = [
        _packed_block(k) if pack_ok
        else jnp.asarray(codes_p[k * Bs : (k + 1) * Bs])
        for k in range(nb)
    ]
    for i in range(nb):
        for j in range(nb):
            neigh[i * Bs : (i + 1) * Bs] += np.asarray(
                tile_counts(dev_blocks[i], dev_blocks[j]), dtype=np.int64
            )
    neigh = neigh[:nseq]
    return 1.0 / (neigh + 1.0)


def _next_pow2(n: int) -> int:
    return 1 << int(np.ceil(np.log2(max(n, 1))))


def estimate_hamming_distance_weights(
    snp_data, threshold: float = 0.1, backend: str = "jax",
    max_blk_sz: int = 10000, n_devices=None,
) -> np.ndarray:
    if backend == "numpy":
        return hamming_weights_numpy(snp_data.codes, threshold)
    if backend == "spmd":
        # compute from the stratified rank-code tensor BLK5 is about to
        # upload anyway (equality counts are invariant to its per-site
        # relabelling + column permutation): one shared transfer, one
        # dispatch, one [nseq] pull — instead of BLK4's own ~40 MB
        # upload + program + pull through the relay
        from ldweaver_tpu.parallel.spmd_sweep import hamming_weights_spmd

        out = hamming_weights_spmd(
            snp_data, threshold, max_blk_sz=max_blk_sz,
            n_devices=n_devices,
        )
        if out is not None:
            return out
    return hamming_weights_jax(snp_data.codes, threshold)
