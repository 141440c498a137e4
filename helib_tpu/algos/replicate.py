"""Slot replication (reference src/replicate.cpp: replicate/replicateAll)."""

from __future__ import annotations

import numpy as np

from .sums import total_sums


def replicate(ea, ctxt, pos: int, sk):
    """Broadcast slot `pos` to all slots (reference replicate,
    replicate.cpp:26): mask to the single slot, then log-depth rotate+add."""
    mask = np.zeros(ea.nslots, dtype=np.int64)
    mask[pos] = 1
    out = ctxt.copy()
    out.mul_constant_poly(ea.encode(list(mask)))
    return total_sums(ea, out, sk)


def replicate_all(ea, ctxt, sk):
    """List of nslots ciphertexts, i-th has slot i replicated everywhere
    (role of reference replicateAll's recursive algorithm; this is the simple
    O(n log n) version)."""
    return [replicate(ea, ctxt, i, sk) for i in range(ea.nslots)]
