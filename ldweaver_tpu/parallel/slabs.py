"""Device-slab LRU cache + cache-aware pair traversal for SNP tensors
that exceed device HBM.

The reference never faces this problem: its 10k x 10k blocks are sliced
out of host RAM per block-pair (R/computePairwiseMI.R:238-257) and the
BLAS runs in-place on the host.  On TPU the code tensor lives in HBM and
a 50k-seq x 500k-SNP alignment (25 GB of rank codes) cannot be resident
on a 16 GB v5e chip.  The fix is classic cache blocking over the
upper-triangular block-pair sweep:

  * rank-code slabs [block, nseq] are uploaded on demand and kept in an
    LRU cache with a byte budget,
  * the pair list is traversed in row PANELS: all pairs (i, j) with
    i in [i0, i0+P) are visited before moving to the next panel, with the
    P row slabs pinned for the panel's duration so each column slab is
    uploaded exactly once per panel,
  * total uploads drop from 2 per tile (naive) to ~nb + nb^2/(2P) for
    nb x nb blocks - a ~P-fold cut in host->device traffic.

Eviction drops our reference only; buffers consumed by still-queued
computations stay alive until XLA retires them (JAX holds the reference).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Iterator, Optional, Set, Tuple

import numpy as np


def pack_nibbles(host: np.ndarray, pad: int = 0) -> np.ndarray:
    """Host-side nibble pack: [B, n] u8 (values <= 0xF) -> [B, ceil(n/2)]
    u8 with `pad` filling an odd final column.  The single pack
    implementation shared by slab uploads, the SPMD code-tensor upload
    and the Hamming block upload; `_unpack_nibbles` is its exact device
    inverse."""
    if host.shape[1] % 2:
        host = np.concatenate(
            [host, np.full((host.shape[0], 1), pad, np.uint8)], axis=1
        )
    return host[:, 0::2] | (host[:, 1::2] << 4)


_UNPACK_FN = None


def _unpack_nibbles(packed, n: int):
    """Device-side inverse of the nibble pack: [B, ceil(n/2)] u8 ->
    [B, n] u8 with columns (lo_0, hi_0, lo_1, hi_1, ...).  One jit
    object (traces cached per shape, served from the persistent compile
    cache); runs on whatever device `packed` is committed to."""
    global _UNPACK_FN
    if _UNPACK_FN is None:
        import functools

        import jax
        import jax.numpy as jnp

        @functools.partial(jax.jit, static_argnums=1)
        def fn(p, n_):
            lo = p & jnp.uint8(0xF)
            hi = p >> jnp.uint8(4)
            out = jnp.stack([lo, hi], axis=2).reshape(p.shape[0], -1)
            return out[:, :n_]

        _UNPACK_FN = fn
    return _UNPACK_FN(packed, n)


class SlabCache:
    """LRU cache of device-resident rank-code slabs.

    Slabs are [block, nseq] uint8 arrays (the per-tile operand layout of
    the rank-compacted MI kernel).  `get(bi)` uploads on miss; `pin`
    protects a working set from eviction (panel rows)."""

    def __init__(self, rank_codes: np.ndarray, block: int,
                 max_slabs: Optional[int] = None, device=None,
                 pack: Optional[bool] = None):
        self.rank_codes = rank_codes  # [nseq, nsnp_padded] host
        self.block = block
        self.nb = rank_codes.shape[1] // block
        self.max_slabs = max_slabs  # None = unbounded (full residency)
        self.device = device  # None = default device
        self._cache: "OrderedDict[int, object]" = OrderedDict()
        self._pinned: Set[int] = set()
        self._pending: dict = {}  # bi -> Future from prefetch()
        self.uploads = 0
        self.hits = 0
        self.upload_s = 0.0  # wall spent inside device_put (+ready wait)
        # rank codes are 0..R-1 with R <= 5, so two fit a byte: uploads
        # cross the (bandwidth-limited) relay nibble-PACKED and a trivial
        # device op unpacks them — byte-identical slabs at half the
        # host->device traffic.  Callers who know the value range by
        # construction (rank_encode emits 0..4) pass `pack=True` so a
        # 25 GB tensor is not re-scanned once per device cache; None
        # falls back to the sound full scan.
        if pack is None:
            pack = int(rank_codes.max(initial=0)) <= 0xF
        self.pack = bool(pack)

    def _upload(self, bi: int, wait: bool = False):
        import time as _time

        import jax

        t0 = _time.time()
        sl = slice(bi * self.block, (bi + 1) * self.block)
        host = np.ascontiguousarray(self.rank_codes[:, sl].T)
        self.uploads += 1
        if self.pack:
            n = host.shape[1]
            buf = _unpack_nibbles(
                jax.device_put(pack_nibbles(host), self.device), n
            )
        else:
            buf = jax.device_put(host, self.device)
        if wait:
            # block the PREFETCH worker until the transfer lands so
            # upload_s measures true host->device wall; the main thread's
            # miss path stays async (device_put only enqueues)
            try:
                buf.block_until_ready()
            except AttributeError:
                pass
        self.upload_s += _time.time() - t0
        return buf

    def prefetch(self, bi: int, pool) -> None:
        """Start uploading slab `bi` on `pool` (a ThreadPoolExecutor) so
        the transfer overlaps device compute; `get` joins it later.
        device_put releases the GIL during the copy, so a 1-worker pool
        double-buffers host->device traffic behind the dispatch loop."""
        if bi in self._cache or bi in self._pending:
            return
        self._pending[bi] = pool.submit(self._upload, bi, True)

    def get(self, bi: int):
        if bi in self._cache:
            self._cache.move_to_end(bi)
            self.hits += 1
            return self._cache[bi]
        fut = self._pending.pop(bi, None)
        if fut is not None and fut.cancelled():
            fut = None  # a pool shutdown cancelled it: treat as a miss
        buf = fut.result() if fut is not None else self._upload(bi)
        self._cache[bi] = buf
        self._evict()
        return buf

    def _evict(self):
        if self.max_slabs is None:
            return
        while len(self._cache) > self.max_slabs:
            for key in self._cache:  # oldest-first
                if key not in self._pinned:
                    del self._cache[key]
                    break
            else:  # everything pinned: allow temporary overshoot
                return

    def pin(self, blocks) -> None:
        self._pinned.update(int(b) for b in blocks)

    def unpin(self, blocks=None) -> None:
        if blocks is None:
            self._pinned.clear()
        else:
            self._pinned.difference_update(int(b) for b in blocks)
        self._evict()

    def purge_dead_pending(self) -> None:
        """Drop cancelled/errored prefetch futures so a later get() on a
        reused cache re-uploads as a plain miss (called by the streaming
        sweep's cleanup after shutting down its prefetch pool)."""
        self._pending = {
            bi: f for bi, f in self._pending.items()
            if not (f.cancelled() or (f.done() and f.exception()))
        }

    def clear(self) -> None:
        self._cache.clear()
        self._pinned.clear()


def panel_pair_order(nb: int, panel: int) -> Iterator[Tuple[int, int]]:
    """Upper-triangular block pairs (i <= j) in row-panel order.

    Visits the diagonal sub-triangle of each panel first, then sweeps the
    trailing columns one at a time so a cache holding `panel + 1` slabs
    (rows pinned) services every tile with one column upload each."""
    for i0 in range(0, nb, panel):
        i1 = min(i0 + panel, nb)
        for i in range(i0, i1):
            for j in range(i, i1):
                yield i, j
        for j in range(i1, nb):
            for i in range(i0, i1):
                yield i, j


def auto_budget(device=None) -> Optional[int]:
    """The device's HBM capacity, when the runtime exposes it (TPU PJRT
    reports bytes_limit; CPU backends usually don't).  Used as the default
    slab budget so >HBM alignments stream instead of OOMing."""
    import jax

    d = device if device is not None else jax.devices()[0]
    try:
        ms = d.memory_stats()
    except Exception:
        return None
    if ms and "bytes_limit" in ms:
        return int(ms["bytes_limit"])
    return None


def plan_budget(nseq: int, block: int, nb: int,
                budget_bytes: Optional[int]) -> Tuple[bool, Optional[int], int]:
    """(streaming?, max_slabs, panel) for a given HBM byte budget.

    Reserves ~40% of the budget for tile workspace (contingency matmuls,
    top-k buffers); the rest holds slabs."""
    if budget_bytes is None:
        return False, None, nb
    slab_bytes = nseq * block  # uint8
    total = slab_bytes * nb
    usable = int(budget_bytes * 0.6)
    if total <= usable:
        return False, None, nb
    max_slabs = max(4, usable // slab_bytes)
    # panel rows stay pinned; keep TWO unpinned slots so the next column
    # slab can prefetch (overlapping its host->device transfer with the
    # current column's compute) without evicting the column in use
    panel = max(1, max_slabs - 2)
    return True, max_slabs, panel
