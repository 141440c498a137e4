"""Equality testing helpers (reference src/eqtesting.cpp).

mapTo01: x -> x^{p^d - 1}, which is 0 for x=0 and 1 otherwise in each slot
(Fermat in GF(p^d)); computed with Frobenius maps so only ~log(p)+d ctxt
mults are needed (reference eqtesting.cpp:48)."""

from __future__ import annotations

from .polyeval import ctxt_power


def map_to_01(ea, ctxt, sk):
    ctx = ea.ctx
    p, d = ctx.p, ea.d
    assert ctx.r == 1, "mapTo01 requires plaintext space p (r=1)"
    out = ctxt
    if p > 2:
        out = ctxt_power(out, p - 1, sk)     # x^{p-1}
    # now out = x^{p-1}; compute norm: prod_{i<d} sigma_{p^i}(out)
    # = x^{(p-1)(1+p+...+p^{d-1})} = x^{p^d-1}
    if d > 1:
        acc = out
        frob = out
        for i in range(1, d):
            frob = frob.copy().frobenius(1, sk)
            acc = acc.multiply(frob, sk)
        out = acc
    return out
