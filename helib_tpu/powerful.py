"""Powerful-basis representation for composite m = prod m_t (pairwise
coprime).

TPU-native equivalent of reference powerful.cpp/powerful.h
(/root/reference/src/powerful.cpp: PowerfulTranslationIndexes,
PowerfulConversion, PowerfulDCRT) — but dramatically simpler here: because
ring elements live mod X^m - 1 (see ops/ntt.py design note), the powerful
basis is EXACTLY the tensor decomposition

    Z[X]/(X^m - 1)  ~=  (x) Z[X_t]/(X_t^{m_t} - 1),     X -> prod X_t

realized by the CRT index bijection j <-> (j mod m_1, ..., j mod m_k).
Conversions are pure index permutations (gathers), and the m-point DFT
factors into per-axis m_t-point DFTs — the structural fact behind the
factor-tree EvalMap (reference EvalMap.cpp).
"""

from __future__ import annotations

import math
from functools import reduce

import numpy as np

from .nt.numbth import inv_mod


class PowerfulBasis:
    def __init__(self, m: int, mvec: list[int]):
        assert reduce(lambda a, b: a * b, mvec, 1) == m
        for i in range(len(mvec)):
            for j in range(i + 1, len(mvec)):
                assert math.gcd(mvec[i], mvec[j]) == 1
        self.m = m
        self.mvec = list(mvec)
        # CRT bijection: j  <->  tuple(j mod m_t); linear index of the tuple
        # in row-major order over mvec.
        k = len(mvec)
        js = np.arange(m, dtype=np.int64)
        coords = [(js % mt) for mt in mvec]
        lin = np.zeros(m, dtype=np.int64)
        for t in range(k):
            stride = int(np.prod(mvec[t + 1:], dtype=np.int64))
            lin = lin + coords[t] * stride
        # poly coefficient j goes to powerful position lin[j]
        self.to_powerful_perm = np.empty(m, dtype=np.int64)
        self.to_powerful_perm[lin] = js       # powerful[pos] = poly[j]
        self.from_powerful_perm = lin         # poly[j] = powerful[lin[j]]
        # crt unit factors: X = prod_t X_t^{u_t} with u_t = (m/m_t)^{-1} mod m_t
        self.crt_units = [(m // mt) * inv_mod((m // mt) % mt, mt) % m
                          for mt in mvec]

    # -- conversions (host or device; pure gathers) -----------------------
    def poly_to_powerful(self, coeffs):
        """coeffs indexed by X-power j -> tensor [m_1, ..., m_k]."""
        arr = coeffs[..., self.to_powerful_perm]
        return arr.reshape(*coeffs.shape[:-1], *self.mvec)

    def powerful_to_poly(self, tensor):
        flat = tensor.reshape(*tensor.shape[:-len(self.mvec)], self.m)
        return flat[..., self.from_powerful_perm]

    def __repr__(self):
        return f"PowerfulBasis(m={self.m}, mvec={self.mvec})"


def factor_mvec(m: int) -> list[int]:
    """Default mvec: prime-power factorization of m (reference mvec choice)."""
    from .nt.numbth import factorize
    return [p**e for p, e in factorize(m)]
