"""Multi-host (pod-slice) execution helpers.

The sharded sweeps (parallel/sweep.py, parallel/fast_sweep.py) are written
against a 1-D `Mesh` over ALL addressable devices, so scaling across hosts
only needs the standard JAX multi-controller bring-up: every host runs the
same program, `jax.distributed.initialize` wires the coordination service,
and `jax.devices()` then spans the whole slice (ICI within a slice, DCN
across slices).  Collectives in the sweeps (all_gather/top_k merges, psum
histograms) are XLA collectives and run over the global mesh unchanged.

Host-side responsibilities under multi-host:
  * inputs: every host loads/replicates the same SNP tensor (or its
    process-local shard of the block-pair list via `process_pairs`),
  * outputs: the merged top-k / histograms are replicated on every host;
    only process_index 0 writes TSVs (`is_writer`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed bring-up.  MUST run before anything touches the
    JAX backend (jax.devices(), any array op): `jax.distributed.initialize`
    raises if the backend is already live, and on a real pod a
    backend-first ordering silently degrades to single-process.  On TPU
    pods the arguments are auto-detected from the metadata environment;
    pass them explicitly elsewhere.  Errors propagate — a failed bring-up
    on a pod must abort, not limp along single-process."""
    import jax

    if jax.distributed.is_initialized():
        return
    if coordinator_address is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def is_writer() -> bool:
    import jax

    return jax.process_index() == 0


def process_pairs(pairs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Split a global block-pair list into (this process's shard, its
    global slot indices).  With `shard_map` over the global mesh, each
    process feeds its addressable shard of the P('b')-sharded argument;
    slots stay global so link decoding works on any host."""
    import jax

    n = jax.process_count()
    i = jax.process_index()
    per = -(-len(pairs) // n)
    lo = i * per
    hi = min(len(pairs), lo + per)
    return pairs[lo:hi], np.arange(lo, hi, dtype=np.int32)
