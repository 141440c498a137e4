"""Encoded plaintexts: scheme-tagged host encodings and device-resident
("fat") constants.

TPU-native equivalent of reference EncodedPtxt / FatEncodedPtxt
(/root/reference/include/helib/EncodedPtxt.h:20-355) and the matmul constant
cache (`ConstMultiplierCache` + `upgrade()`, matmul.h:251-264): an encoded
constant that will be multiplied into ciphertexts repeatedly is converted to
the evaluation (NTT) domain ONCE over the full prime chain and afterwards
served by row slicing — no per-use host encode or device NTT.

Row slicing is exact because the NTT is independent per prime row and a
(prefix-k, specials?) prime set is always a subset of the full row set
(context.py design note).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .context import Context


class EncodedPtxt:
    """Scheme-tagged encoded plaintext (reference EncodedPtxt.h:20-160):
    a coefficient vector plus (BGV) the plaintext space or (CKKS) the
    magnitude/scale pair."""

    def __init__(self, coeffs: np.ndarray, *, space: int | None = None,
                 mag: float | None = None, scale: float | None = None):
        self.coeffs = np.asarray(coeffs)
        self.space = space          # BGV: p^r
        self.mag = mag              # CKKS
        self.scale = scale          # CKKS

    @property
    def is_bgv(self) -> bool:
        return self.space is not None

    def fat(self, ctx: Context) -> "FatEncodedPtxt":
        return FatEncodedPtxt(ctx, self.coeffs,
                              space=self.space, scale=self.scale)


class FatEncodedPtxt:
    """Device-resident encoded constant (reference FatEncodedPtxt,
    EncodedPtxt.h:200-355).

    For BGV, coefficients are balanced-lifted mod `space` before the lift to
    RNS residues (matching Ctxt::mul_constant_poly).  For CKKS the
    coefficients are already scaled integers.  The full-row eval tensor is
    built lazily on first use and sliced per (k, special) thereafter.
    """

    def __init__(self, ctx: Context, coeffs: np.ndarray, *,
                 space: int | None = None, scale: float | None = None):
        self.ctx = ctx
        self.space = space
        self.scale = scale
        c = np.asarray(coeffs, dtype=np.int64)
        if space is not None and space > 1:
            c = c % space
            c = c - (c > space // 2) * space
        self.coeffs = c
        self._full = None       # [L+S, N] eval tensor over ALL rows

    def _build(self):
        ctx = self.ctx
        all_rows = tuple(range(ctx.L + ctx.S))
        qs = ctx.all_q.astype(np.int64)
        buf = np.zeros(ctx.n_eval, dtype=np.int64)
        buf[:len(self.coeffs)] = self.coeffs
        res = (buf[None, :] % qs[:, None]).astype(np.uint32)
        with jax.ensure_compile_time_eval():
            self._full = ctx.fwd_ntt(jnp.asarray(res), all_rows)

    def rt(self, k: int, special: bool):
        """Eval-domain tensor on the (k, special) prime set."""
        if self._full is None:
            self._build()
        if special:
            ctx = self.ctx
            if k == ctx.L:
                return self._full
            idx = np.concatenate([np.arange(k),
                                  np.arange(ctx.L, ctx.L + ctx.S)])
            return self._full[jnp.asarray(idx)]
        return self._full[:k]
