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


def hamming_weights_jax(codes: np.ndarray, threshold: float = 0.1) -> np.ndarray:
    """Device path: same counts via f32 matmuls (exact for nsnp < 2^24)."""
    import jax
    import jax.numpy as jnp

    nseq, nsnp = codes.shape

    @jax.jit
    def _shared(codes_dev):
        acc = jnp.zeros((nseq, nseq), dtype=jnp.float32)
        for a in range(5):
            m = (codes_dev == a).astype(jnp.float32)
            acc = acc + jax.lax.dot(
                m, m.T, precision=jax.lax.Precision.HIGHEST
            )
        return acc

    shared = np.asarray(jax.device_get(_shared(jnp.asarray(codes))))
    shared = np.rint(shared).astype(np.int64)
    thresh = int(nsnp * threshold)
    neigh = ((nsnp - shared) < thresh).sum(axis=0)
    return 1.0 / (neigh + 1.0)


def estimate_hamming_distance_weights(
    snp_data, threshold: float = 0.1, backend: str = "jax"
) -> np.ndarray:
    if backend == "numpy":
        return hamming_weights_numpy(snp_data.codes, threshold)
    return hamming_weights_jax(snp_data.codes, threshold)
