"""Homomorphic base-p digit extraction (the bootstrap nonlinear core).

TPU-native equivalent of reference extractDigits
(/root/reference/src/extractDigits.cpp:28-130): iterated "digit polynomial"
maps.  digits[j] ends up holding the j-th base-p digit of each slot integer;
its plaintext space is p^{r-j}.
"""

from __future__ import annotations

import numpy as np

from ..nt.numbth import inv_mod
from .polyeval import poly_eval


def build_digit_polynomial(p: int, e: int) -> list[int]:
    """Degree-p poly F with: z = z0 + p^t*z1 (0<=z0<p, t<e) =>
    F(z) ≡ z0 (mod p^{t+1}).  F(x) = x^p + poly'(x) with poly' interpolating
    z - z^p at the balanced digits (reference buildDigitPolynomial)."""
    pe = p**e
    xs = [j - p // 2 for j in range(p)]
    ys = []
    for z in xs:
        v = (z - pow(z % pe, p, pe)) % pe
        if v > pe // 2:
            v -= pe
        ys.append(v)
    # Lagrange interpolation mod p^e (pairwise differences < p, invertible)
    coeffs = [0] * p
    for i, (xi, yi) in enumerate(zip(xs, ys)):
        num = [1]
        den = 1
        for j, xj in enumerate(xs):
            if j == i:
                continue
            num = _poly_mul(num, [(-xj) % pe, 1], pe)
            den = den * (xi - xj) % pe
        f = yi % pe * inv_mod(den % pe, pe) % pe
        for k2, c in enumerate(num):
            coeffs[k2] = (coeffs[k2] + f * c) % pe
    out = coeffs + [0] * (p + 1 - len(coeffs))
    out = out[:p] + [1]          # + x^p
    return out


def _poly_mul(a, b, m):
    out = [0] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            out[i + j] = (out[i + j] + ai * bj) % m
    return out


def extract_digits(ctxt, sk, r: int | None = None) -> list:
    """Returns digits[0..r-1]; slot i of digits[j] = j-th base-p digit of the
    integer in slot i of ctxt (reference extractDigits, extractDigits.cpp:70)."""
    ctx = ctxt.ctx
    p = ctx.p
    rr = _int_log(ctxt.ptxt_space, p)
    r = rr if (r is None or r <= 0 or r > rr) else r
    x2p = build_digit_polynomial(p, r) if p > 3 else None

    digits = [None] * r
    for i in range(r):
        tmp = ctxt.copy()
        for j in range(i):
            if p == 2:
                digits[j] = digits[j].square(sk)
            elif p == 3:
                digits[j] = digits[j].multiply(digits[j], sk).multiply(
                    digits[j], sk)
            else:
                digits[j] = poly_eval(x2p, digits[j], sk)
            tmp = tmp.sub(digits[j])
            tmp.divide_by_p()
        digits[i] = tmp
    return digits


def _int_log(v: int, p: int) -> int:
    r = 0
    while v > 1:
        assert v % p == 0
        v //= p
        r += 1
    return r
