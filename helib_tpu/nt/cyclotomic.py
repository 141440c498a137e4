"""Cyclotomic polynomial Phi_m(X) over Z, host-side, exact.

Role equivalent: the Phi_m computation inside reference PAlgebra
(/root/reference/src/PAlgebra.cpp).  Computed by iterated exact polynomial
division of X^m - 1 by Phi_d for proper divisors d | m, with Python ints.
"""

from __future__ import annotations

from functools import lru_cache

from .numbth import divisors


def _polydiv_exact(num: list[int], den: list[int]) -> list[int]:
    """Exact division of integer polynomials (num = q * den). Coeff lists low->high."""
    num = list(num)
    dn = len(den) - 1
    qn = len(num) - 1 - dn
    q = [0] * (qn + 1)
    lead = den[-1]
    assert lead in (1, -1)
    for i in range(qn, -1, -1):
        c = num[i + dn] // lead
        q[i] = c
        if c:
            for j, dj in enumerate(den):
                num[i + j] -= c * dj
    assert all(v == 0 for v in num[: dn + 1]) or all(v == 0 for v in num), num[:8]
    return q


@lru_cache(maxsize=256)
def cyclotomic_poly(m: int) -> tuple[int, ...]:
    """Coefficients of Phi_m(X), low->high, exact integers."""
    if m == 1:
        return (-1, 1)
    # X^m - 1 = prod_{d|m} Phi_d
    num = [0] * (m + 1)
    num[0], num[m] = -1, 1
    for d in divisors(m):
        if d == m:
            continue
        num = _polydiv_exact(num, list(cyclotomic_poly(d)))
    return tuple(num)
