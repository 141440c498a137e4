"""Debug hooks: actual-vs-estimated noise checks, decrypt-and-print.

TPU-native equivalent of reference debugging (src/debugging.cpp,
include/helib/debugging.h:36-91: dbgKey/dbgEa globals, decryptAndPrint,
checkNoise)."""

from __future__ import annotations

import sys

from .log import warning

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
    assert dbg_key is not None, "setup_debug_globals first"
    actual = dbg_key.noise_of(ctxt)
    ok = actual <= ctxt.noise + tolerance_bits
    if not ok:
        warning(f"checkNoise{': ' + msg if msg else ''}: actual 2^{actual:.1f}"
                f" > estimate 2^{ctxt.noise:.1f}")
    return ok


def decrypt_and_print(ctxt, msg: str = "", file=None):
    file = file or sys.stderr
    assert dbg_key is not None
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
