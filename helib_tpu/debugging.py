"""Debug hooks: actual-vs-estimated noise checks, decrypt-and-print.

TPU-native equivalent of reference debugging (src/debugging.cpp,
include/helib/debugging.h:36-91: dbgKey/dbgEa globals, decryptAndPrint,
checkNoise)."""

from __future__ import annotations

import sys

from .log import warning
from .exceptions import assert_true

dbg_key = None
dbg_ea = None


def setup_debug_globals(sk, ea=None):
    """Install snoop pointers (reference setupDebugGlobals)."""
    global dbg_key, dbg_ea
    dbg_key = sk
    dbg_ea = ea


def check_noise(ctxt, msg: str = "", tolerance_bits: float = 0.5) -> bool:
    """Compare actual noise (via the debug secret key) against the tracked
    estimate (reference checkNoise, debugging.h:81).  Returns True if the
    estimate dominates the actual noise."""
    assert_true(dbg_key is not None, "setup_debug_globals first")
    actual = dbg_key.noise_of(ctxt)
    ok = actual <= ctxt.noise + tolerance_bits
    if not ok:
        warning(f"checkNoise{': ' + msg if msg else ''}: actual 2^{actual:.1f}"
                f" > estimate 2^{ctxt.noise:.1f}")
    return ok


def decrypt_and_print(ctxt, msg: str = "", file=None):
    file = file or sys.stderr
    assert_true(dbg_key is not None, 'invariant: dbg_key is not None')
    print(f"[{msg}] cap={ctxt.capacity():.1f} noise=2^{ctxt.noise:.1f} "
          f"k={ctxt.k} special={ctxt.special}", file=file)
    if dbg_ea is not None and ctxt.ctx.scheme == "bgv":
        vals = dbg_ea.decrypt_ints(ctxt, dbg_key)
        print(f"  slots={list(vals[:16])}...", file=file)


def check_ctxt(ctxt, msg: str = "", file=None):
    """Reference CheckCtxt (Ctxt.h:1550): print capacity/level summary."""
    file = file or sys.stderr
    print(f"  [{msg}] k={ctxt.k}+{'S' if ctxt.special else ''} "
          f"cap={ctxt.capacity():.1f} logQ={ctxt.log2_modulus():.1f}",
          file=file)


class PtSim:
    """Plaintext-level Ctxt stand-in: carries a coefficient vector mod p^r
    and implements the method surface used by the linear-map machinery
    (MatMul1D, EncryptedArray.rotate_1d, trace_map) with EXACT plaintext
    semantics — automorphisms, constant mults, adds — and no encryption.
    Used to validate linear-map constructions (evalmap) fast, mirroring the
    reference's debugging decryptAndPrint workflow."""

    def __init__(self, poly, ea):
        import numpy as np
        from .nt.cyclotomic import cyclotomic_poly
        self._np = np
        self.poly = np.asarray(poly, dtype=np.int64) % ea.pr
        self.ea = ea
        self._phim = [int(c) % ea.pr for c in cyclotomic_poly(ea.m)]

    def copy(self):
        return PtSim(self.poly.copy(), self.ea)

    def _set(self, red):
        out = self._np.zeros(len(self.poly), dtype=self._np.int64)
        out[:len(red)] = red
        self.poly = out

    def smart_automorph(self, k, sk=None):
        from .nt import polymod as pm
        m, pr = self.ea.m, self.ea.pr
        acc = self._np.zeros(m, dtype=self._np.int64)
        for j, c in enumerate(self.poly):
            if c:
                acc[(j * k) % m] = (acc[(j * k) % m] + int(c)) % pr
        self._set(pm.pmod(list(acc), self._phim, pr))
        return self

    def frobenius(self, j, sk=None):
        return self.smart_automorph(pow(self.ea.p, j, self.ea.m), sk)

    def mul_constant_poly(self, coeffs, mag=None):
        from .nt import polymod as pm
        pr = self.ea.pr
        prod = pm.pmul([int(c) % pr for c in self.poly],
                       [int(c) % pr for c in coeffs], pr)
        self._set(pm.pmod(prod, self._phim, pr))

    def mul_constant_fat(self, fat, mag=None):
        # device-resident constants carry their balanced coefficients
        self.mul_constant_poly(fat.coeffs, mag)

    def add(self, other):
        return PtSim((self.poly + other.poly) % self.ea.pr, self.ea)

    def trace_map(self, sk=None):
        acc = self
        frob = self
        for _ in range(1, self.ea.d):
            frob = frob.copy().frobenius(1, sk)
            acc = acc.copy().add(frob)
        self.poly = acc.poly
        return self
