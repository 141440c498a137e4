"""Context: the frozen parameter set + device-resident constant tables.

TPU-native equivalent of reference Context/ContextBuilder/primeChain
(/root/reference/src/Context.cpp, include/helib/Context.h:100-1369):
owns the PAlgebra, the RNS modulus chain with its ctxt/special partition and
key-switching digits, the NTT tables, and the noise-model constants.

Departures from the reference (deliberate, TPU-first):
  * All device primes are uniform ~30-bit (see nt/primegen.py).  Because
    every ctxt prime has (nearly) the same size, modulus switching always
    drops a SUFFIX of the chain — the "prime set" of a ciphertext is just a
    prefix length k (+ a specials flag).  This replaces HElib's dynamic
    IndexSet/ModuliSizes machinery (reference src/primeChain.cpp) with static
    shapes that XLA can compile per-k.
  * No "small primes": with uniform primes, mod-switch resolution is one
    30-bit limb.  (HElib uses small primes for finer resolution,
    Context.cpp:728; the noise head-room cost of coarser resolution is <1
    limb.)
  * Noise bounds are tracked host-side in log2 domain (Python floats)
    following the reference formulas (Context.h:475-638) exactly in
    structure; see `noise` helpers below.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from .palgebra import PAlgebra
from .exceptions import InvalidArgument
from .nt.primegen import gen_primes, PRIME_BITS
from .nt.numbth import inv_mod
from .ops.ntt import Pow2NTT, BluesteinTables
from .ops import modops


# ---------------------------------------------------------------------------
# log2-domain magnitude helpers (role of NTL::xdouble noise bounds)
# ---------------------------------------------------------------------------

NEG_INF = float("-inf")


def log2_add(a: float, b: float) -> float:
    """log2(2^a + 2^b), numerically stable."""
    if a == NEG_INF:
        return b
    if b == NEG_INF:
        return a
    hi, lo = (a, b) if a >= b else (b, a)
    return hi + math.log2(1.0 + 2.0 ** (lo - hi))


def log2_sum(vals) -> float:
    acc = NEG_INF
    for v in vals:
        acc = log2_add(acc, v)
    return acc


# ---------------------------------------------------------------------------

@dataclass
class Context:
    m: int
    p: int                  # plaintext prime (BGV); -1 for CKKS
    r: int = 1              # plaintext space p^r (BGV); CKKS: log2 precision
    bits: int = 300         # target log2 of the full ctxt-prime product
    c: int = 3              # number of key-switching digits/columns
    scheme: str = "bgv"     # "bgv" | "ckks"
    stdev: float = 3.2      # fresh-noise Gaussian stdev (reference Context.h:148)
    scale: float = 10.0     # high-probability bound multiplier (Context.h:151)
    mvec: tuple | None = None  # factor-aligned hypercube (bootstrappable ctx)

    pal: PAlgebra = field(init=False)
    qs: np.ndarray = field(init=False)       # ctxt primes, [L] uint32
    sp: np.ndarray = field(init=False)       # special primes, [S] uint32
    all_q: np.ndarray = field(init=False)    # concat [L+S]
    digits: list = field(init=False)         # list of (start, end) over ctxt primes
    ntt_fwd: object = field(init=False)
    ntt_inv: object = field(init=False)

    def __post_init__(self):
        if self.scheme not in ("bgv", "ckks"):
            raise InvalidArgument(f"unknown scheme {self.scheme!r}")
        self.pal = PAlgebra(self.m, self.p if self.scheme == "bgv" else -1,
                            mvec=tuple(self.mvec) if self.mvec else None)
        n_ctxt = max(2, math.ceil(self.bits / (PRIME_BITS - 0.1)))
        # digits partition: c contiguous groups, as equal as possible
        base, rem = divmod(n_ctxt, self.c)
        sizes = [base + (1 if i < rem else 0) for i in range(self.c)]
        sizes = [s for s in sizes if s > 0]
        bounds, acc = [], 0
        for s in sizes:
            bounds.append((acc, acc + s))
            acc += s
        self.digits = bounds
        max_digit = max(e - s for s, e in bounds)
        n_special = max_digit  # P >= max digit product => KS noise stays bounded
        excl = () if self.scheme == "ckks" else (self.p,)
        primes = gen_primes(self.m if self.m % 2 == 1 else self.m,
                            n_ctxt + n_special, exclude=frozenset(excl))
        # descending size: put the largest at the chain bottom (dropped last)
        self.qs = np.array(primes[:n_ctxt], dtype=np.uint32)
        self.sp = np.array(primes[n_ctxt:], dtype=np.uint32)
        self.all_q = np.concatenate([self.qs, self.sp])
        if self.pal.pow2:
            ntt = Pow2NTT(self.all_q, self.pal.n_eval, negacyclic=True)
            self.pal.eval_exponents = ntt.eval_exponents
            self.ntt_fwd = ntt
            self.ntt_inv = ntt
        else:
            self.ntt_fwd = BluesteinTables(self.all_q, self.m, inverse=False)
            self.ntt_inv = BluesteinTables(self.all_q, self.m, inverse=True)
        self._dev_cache: dict = {}

    # -- basic getters -----------------------------------------------------
    @property
    def L(self) -> int:
        return len(self.qs)

    @property
    def S(self) -> int:
        return len(self.sp)

    @property
    def ptxt_space(self) -> int:
        return self.p ** self.r

    @property
    def phi_m(self) -> int:
        return self.pal.phi_m

    @property
    def n_eval(self) -> int:
        return self.pal.n_eval

    def log2_q(self, k: int) -> float:
        """log2 of the product of the first k ctxt primes."""
        return float(np.sum(np.log2(self.qs[:k].astype(np.float64))))

    def log2_special(self) -> float:
        return float(np.sum(np.log2(self.sp.astype(np.float64))))

    def prod_qs(self, k: int) -> int:
        v = 1
        for q in self.qs[:k]:
            v *= int(q)
        return v

    def prod_special(self) -> int:
        v = 1
        for q in self.sp:
            v *= int(q)
        return v

    def primes_of(self, k: int, special: bool) -> np.ndarray:
        """Primes of a (prefix-k, specials?) prime set, in data-row order."""
        return np.concatenate([self.qs[:k], self.sp]) if special else self.qs[:k]

    def digit_ranges(self, k: int) -> list[tuple[int, int]]:
        """Digit partition restricted to the live prefix [0, k)."""
        out = []
        for s, e in self.digits:
            s2, e2 = s, min(e, k)
            if s2 < e2:
                out.append((s2, e2))
        return out

    # -- noise model (reference Context.h:475-638, log2 domain) ------------
    def noise_uniform(self, log2_mag: float, deg: int | None = None) -> float:
        deg = self.phi_m if deg is None else deg
        return math.log2(self.scale * math.sqrt(deg / 3.0)) + log2_mag

    def noise_mod(self, modulus: int, deg: int | None = None) -> float:
        deg = self.phi_m if deg is None else deg
        var = modulus * modulus / 12.0
        if modulus % 2 == 0:
            var += 1.0 / 6.0
        return math.log2(self.scale * math.sqrt(deg * var))

    def noise_gaussian(self, sigma: float | None = None,
                       deg: int | None = None) -> float:
        deg = self.phi_m if deg is None else deg
        sigma = self.eff_stdev() if sigma is None else sigma
        return math.log2(self.scale * math.sqrt(deg) * sigma)

    def noise_small(self, prob: float = 0.5, deg: int | None = None) -> float:
        deg = self.phi_m if deg is None else deg
        return math.log2(self.scale * math.sqrt(deg * prob))

    def noise_hwt(self, hwt: int) -> float:
        return math.log2(self.scale * math.sqrt(hwt))

    def eff_stdev(self) -> float:
        """Fresh-error stdev; scaled by sqrt(m) for non-pow2 m (mirrors
        reference keys.cpp:702-704)."""
        s = self.stdev
        if not self.pal.pow2:
            s *= math.sqrt(self.m)
        return s

    # -- device constant tables -------------------------------------------
    def dev_q(self, k: int, special: bool):
        import jax
        key = ("q", k, special)
        if key not in self._dev_cache:
            with jax.ensure_compile_time_eval():
                qs = self.primes_of(k, special)
                self._dev_cache[key] = (
                    jnp.asarray(qs[:, None]),
                    jnp.asarray(modops.barrett_mu(qs)[:, None]))
        return self._dev_cache[key]

    def ntt_tree(self, rows: tuple):
        """NTT table pytree restricted to the given prime rows (indices into
        all_q; ctxt primes are rows [0, L), special primes [L, L+S)).

        Tables are HOST numpy (ops/ntt._host): subsetting is plain numpy
        fancy-indexing, so a cache miss inside a jit trace costs no eager
        device ops (round-3 setup was dominated by per-slice XLA gather
        compiles under ensure_compile_time_eval)."""
        key = ("ntt", rows)
        if key in self._dev_cache:
            return self._dev_cache[key]
        idx = np.array(rows, dtype=np.int64)
        if self.pal.pow2:
            full = self.ntt_fwd.tree()
            sub = {kk: ([a[idx] for a in v] if isinstance(v, list)
                        else v[idx]) for kk, v in full.items()}
            tree = {"fwd": sub, "inv": sub}
        else:
            tree = {"fwd": _bluestein_rows(self.ntt_fwd.dev, idx),
                    "inv": _bluestein_rows(self.ntt_inv.dev, idx)}
        self._dev_cache[key] = tree
        return tree

    def rows_of(self, k: int, special: bool) -> tuple:
        rows = list(range(k))
        if special:
            rows += list(range(self.L, self.L + self.S))
        return tuple(rows)

    def enable_sharded_transforms(self, A: int, mesh=None):
        """Route every odd-m NTT through the phi(m)-axis-sharded four-step
        Bluestein pipeline (parallel.sharded_ntt): the B-point convolution
        block axis is sharded A-ways over the ambient mesh axis "shard",
        with ONE cross-shard exchange per transform direction (the coarse
        matmul; volume = 1x the [3, P, B] conv tensor).  Elementwise ring
        ops stay replicated — at bootstrap scale ~95% of device time is in
        these convolutions (round-2 profile), so this is the axis worth
        scaling.  Call AFTER setup/keygen; affects subsequent jit builds
        (enablement is part of the dispatch cache key)."""
        from .parallel.sharded_ntt import ShardedNTT
        from .nt.primegen import gen_aux_primes
        B = self.ntt_fwd.B
        sntt = ShardedNTT(
            np.array(gen_aux_primes(3), dtype=np.uint32), B,
            negacyclic=False, A=A)
        if mesh is not None:
            sntt.set_mesh(mesh)
        self._sharded_ntt = sntt

    def disable_sharded_transforms(self):
        self._sharded_ntt = None

    def _ntt_impl(self, x, rows: tuple, inverse: bool):
        t = self.ntt_tree(rows)
        if self.pal.pow2:
            from .ops.ntt import ntt_pow2_fwd, ntt_pow2_inv
            return (ntt_pow2_inv(x, t["inv"]) if inverse
                    else ntt_pow2_fwd(x, t["fwd"]))
        tab = self.ntt_inv if inverse else self.ntt_fwd
        sntt = getattr(self, "_sharded_ntt", None)
        if sntt is not None:
            from .parallel.sharded_ntt import bluestein_apply_sharded
            return bluestein_apply_sharded(x, t["inv" if inverse else "fwd"],
                                           self.m, tab.B, sntt)
        from .ops.ntt import bluestein_apply
        return bluestein_apply(x, t["inv" if inverse else "fwd"],
                               self.m, tab.B)

    def _ntt_call(self, x, rows: tuple, inverse: bool):
        """Dispatch one jit-compiled program per (rows, shape) instead of
        the ~25 eager primitives of a staged/Bluestein transform — eager
        per-op dispatch dominates wall time on the hot paths otherwise.
        Falls through to the eager composition inside an outer trace."""
        import jax
        import jax.core
        if isinstance(x, jax.core.Tracer):
            return self._ntt_impl(x, rows, inverse)
        key = ("nttjit", rows, inverse, jnp.shape(x),
               getattr(self, "_sharded_ntt", None) is not None)
        fn = self._dev_cache.get(key)
        if fn is None:
            from .jitutil import lifted_jit
            fn = lifted_jit(lambda v: self._ntt_impl(v, rows, inverse), x)
            self._dev_cache[key] = fn
        return fn(x)

    def fwd_ntt(self, coeffs, rows: tuple):
        """coeffs [..., P, N] residues (natural order) -> eval domain."""
        return self._ntt_call(coeffs, rows, inverse=False)

    def inv_ntt(self, evals, rows: tuple):
        return self._ntt_call(evals, rows, inverse=True)

    def __repr__(self):
        return (f"Context(scheme={self.scheme}, m={self.m}, p={self.p}, "
                f"r={self.r}, L={self.L}, S={self.S}, c={self.c}, "
                f"log2Q={self.log2_q(self.L):.1f}, {self.pal!r})")

    def printout(self, file=None):
        """Human-readable parameter dump (reference Context::printout,
        Context.cpp:637)."""
        import sys
        from .security import context_security
        f = file or sys.stdout
        pal = self.pal
        print(f"m = {self.m}, p = {self.p}, phi(m) = {self.phi_m}", file=f)
        print(f"  ord(p) = {pal.d}, nslots = {pal.nslots}", file=f)
        print(f"  gens = {pal.gens}, orders = {pal.orders}, "
              f"native = {pal.native}", file=f)
        print(f"  ctxt primes: {self.L} x ~{PRIME_BITS}b "
              f"(log2 Q = {self.log2_q(self.L):.1f})", file=f)
        print(f"  special primes: {self.S} (log2 P = "
              f"{self.log2_special():.1f})", file=f)
        print(f"  digits: {self.digits}", file=f)
        print(f"  security ~= {context_security(self):.1f}", file=f)


def _bluestein_rows(dev: dict, idx: np.ndarray) -> dict:
    """Restrict Bluestein device tables to a subset of prime rows."""
    out = dict(dev)
    for k in ("q", "u_in", "u_in_sh", "u_out", "u_out_sh", "negR", "negR_sh"):
        out[k] = dev[k][idx]
    for k in ("khat", "khat_sh", "khat_f", "khat_f_sh",
              "Rt_mod_q", "Rt_mod_q_sh"):
        if k in dev:
            out[k] = dev[k][:, idx]
    return out


# ---------------------------------------------------------------------------
# builder façade (reference ContextBuilder, Context.h:1047-1369)
# ---------------------------------------------------------------------------

def build_context(m: int, p: int = 2, r: int = 1, bits: int = 300, c: int = 3,
                  scheme: str = "bgv", **kw) -> Context:
    return Context(m=m, p=p, r=r, bits=bits, c=c, scheme=scheme, **kw)
