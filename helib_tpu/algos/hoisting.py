"""Hoisted automorphisms: decompose once, rotate many times.

TPU-native equivalent of reference BasicAutomorphPrecon
(/root/reference/src/matmul.cpp:48-183): the expensive part of a rotation is
the key-switch digit decomposition of the c1 part; for a batch of rotations
of the SAME ciphertext (e.g. BSGS baby steps) the decomposition is shared —
each automorphism then costs only a permutation plus the matrix MACs.

Valid because digit decomposition is coefficient-wise and balanced, so it
commutes with Galois automorphisms: digits(sigma_k(c)) = sigma_k(digits(c)).
"""

from __future__ import annotations

from ..context import log2_add
from ..keys import SKHandle
from ..ctxt import Ctxt
from ..dcrt import (rt_break_into_digits, rt_add_special_and_scale,
                    rt_add, rt_automorph)


class AutomorphPrecon:
    def __init__(self, ctxt: Ctxt, key):
        """key: PubKey or SecKey (evaluation needs only `.matrices`)."""
        ctxt = ctxt.copy()
        ctxt.relinearize(key)
        ctxt.drop_special_primes()
        self.base = ctxt
        self.sk = key   # historical attribute name; any evaluation key
        ctx = ctxt.ctx
        parts = dict((h.powS, d) for h, d in ctxt.parts)
        self.c0 = parts[0]
        self.digits, self.digit_noise = rt_break_into_digits(
            ctx, parts[1], ctxt.k)
        import jax.numpy as jnp
        self._stacked_digits = jnp.stack(self.digits)   # [nd, R, N]

    def automorph(self, kexp: int) -> Ctxt:
        """One rotation at ~MAC cost (reference automorph(), matmul.cpp:120)."""
        from ..ctxt import ks_stacked_W
        from ..ops.modops import mul_mod, add_mod
        base = self.base
        ctx = base.ctx
        k = base.k
        kexp %= ctx.m
        if kexp == 1:
            return base.copy()
        from ..keys import get_ks_matrix
        W = get_ks_matrix(self.sk, SKHandle(1, kexp, 0))
        q, mu = ctx.dev_q(k, True)
        rows = ctx.rows_of(k, True)
        acc0 = rt_add_special_and_scale(ctx, rt_automorph(ctx, self.c0, kexp),
                                        k)
        # one gather permutes ALL digits, then two stacked MAC kernels
        Dk = rt_automorph(ctx, self._stacked_digits, kexp)
        nd = len(self.digits)
        Wb, Wa = ks_stacked_W(W, (k, True), rows)
        pb = mul_mod(Dk, Wb[:nd], q, mu)
        pa = mul_mod(Dk, Wa[:nd], q, mu)
        sb, sa = pb[0], pa[0]
        for j in range(1, nd):
            sb = add_mod(sb, pb[j], q)
            sa = add_mod(sa, pa[j], q)
        acc0 = rt_add(ctx, acc0, sb, k, True)
        acc1 = sa
        noise = log2_add(base.noise + ctx.log2_special(),
                         self.digit_noise + W.noise)
        out = Ctxt(ctx, base.pubkey,
                   [(SKHandle(0, 1, 0), acc0), (SKHandle(1, 1, 0), acc1)],
                   k, True, base.ptxt_space, noise, base.intFactor)
        out.ratFactor = base.ratFactor
        out.ptxtMag = base.ptxtMag
        if out.is_ckks:
            from fractions import Fraction
            out.ratFactor = Fraction(base.ratFactor) * ctx.prod_special()
        return out
