"""Ciphertext with noise bookkeeping.

TPU-native equivalent of reference Ctxt (/root/reference/src/Ctxt.cpp,
include/helib/Ctxt.h:397-1608).  The noise-tracking state machine follows the
reference's formulas; prime-set management is simplified to (prefix k,
specials?) thanks to uniform prime sizes (see context.py design note, which
replaces the ModuliSizes subset search of reference src/primeChain.cpp).

All magnitudes are log2-domain Python floats (role of NTL::xdouble).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from .context import Context, log2_add, log2_sum, NEG_INF
from . import dcrt
from .dcrt import (rt_add, rt_sub, rt_mul, rt_neg, rt_mul_scalar,
                   rt_automorph, rt_scale_down, rt_add_special_and_scale,
                   rt_break_into_digits)
from .keys import SKHandle, SecKey, PubKey, KSMatrix, balanced_int
from .nt.numbth import inv_mod
from .exceptions import LogicError, InvalidArgument, OutOfRangeError

SAFETY_BITS = 1.0   # reference `safety` margin (log 2) in interval selection
SLACK_BITS = 4.0


def ks_stacked_W(W, rows_key: tuple, rows):
    """KS matrix columns restricted to the live rows and stacked over the
    digit axis, cached per prime set on the matrix object."""
    cache = getattr(W, "_stacked", None)
    if cache is None:
        cache = W._stacked = {}
    ent = cache.get(rows_key)
    if ent is None:
        # Evaluate OUTSIDE any active trace: the result is cached, and a
        # device value created while tracing would be a leaked tracer.
        with jax.ensure_compile_time_eval():
            idx = jnp.asarray(np.array(rows))
            ent = (jnp.stack([b[idx] for b in W.b]),
                   jnp.stack([a[idx] for a in W.a]))
        cache[rows_key] = ent
    return ent


def ks_digit_mac(ctx, digits, W, k: int):
    """sum_j digit_j * (b_j, a_j) as TWO stacked modular multiplies + a fold
    (the KS MAC hot loop, reference Ctxt.cpp:191-230, batched over digits
    for one big kernel instead of per-digit dispatches)."""
    from .ops.modops import mul_mod, add_mod
    nd = len(digits)
    rows = ctx.rows_of(k, True)
    Wb, Wa = ks_stacked_W(W, (k, True), rows)
    q, mu = ctx.dev_q(k, True)
    D = jnp.stack(digits)                      # [nd, R, N]
    pb = mul_mod(D, Wb[:nd], q, mu)
    pa = mul_mod(D, Wa[:nd], q, mu)
    sb, sa = pb[0], pa[0]
    for j in range(1, nd):
        sb = add_mod(sb, pb[j], q)
        sa = add_mod(sa, pa[j], q)
    return sb, sa


def frac_log2(f) -> float:
    """log2 of a positive Fraction/int without float overflow."""
    from fractions import Fraction
    f = Fraction(f)
    n, d = f.numerator, f.denominator
    return ((n.bit_length() - 1) + math.log2(n / (1 << (n.bit_length() - 1)))
            - ((d.bit_length() - 1)
               + math.log2(d / (1 << (d.bit_length() - 1)))))


@dataclass
class Ctxt:
    ctx: Context
    pubkey: PubKey
    parts: list                 # [(SKHandle, jnp [P, N])]
    k: int                      # live ctxt-prime prefix length
    special: bool               # special primes included?
    ptxt_space: int
    noise: float                # log2 canonical-embedding noise bound
    intFactor: int = 1
    ratFactor: object = 1       # CKKS scale (exact Fraction/int)
    ptxtMag: float = 1.0        # CKKS bound on |plaintext| (linear)

    # ------------------------------------------------------------------ utils
    def copy(self) -> "Ctxt":
        return Ctxt(self.ctx, self.pubkey, list(self.parts), self.k,
                    self.special, self.ptxt_space, self.noise, self.intFactor,
                    self.ratFactor, self.ptxtMag)

    @property
    def is_ckks(self) -> bool:
        return self.ctx.scheme == "ckks"

    def log2_modulus(self) -> float:
        v = self.ctx.log2_q(self.k)
        if self.special:
            v += self.ctx.log2_special()
        return v

    def capacity(self) -> float:
        """log2(Q/noise) (reference Ctxt.h:1314)."""
        return self.log2_modulus() - self.noise

    def is_correct(self) -> bool:
        return self.capacity() > 1.0

    def error_bound(self) -> float:
        """CKKS: bound on |decrypted - plaintext| in plaintext units
        = noiseBound / ratFactor, linear domain (reference
        Ctxt::errorBound)."""
        return 2.0 ** (self.noise - frac_log2(self.ratFactor))

    def _find_part(self, handle: SKHandle) -> int:
        for i, (h, _) in enumerate(self.parts):
            if h == handle:
                return i
        return -1

    def mod_switch_added_noise(self) -> float:
        """Reference Ctxt::modSwitchAddedNoiseBound (Ctxt.cpp:2558)."""
        ctx = self.ctx
        acc = NEG_INF
        for h, _ in self.parts:
            if h.is_one:
                acc = log2_add(acc, 0.0)
            else:
                acc = log2_add(acc, h.powS * self.pubkey.sk_bound)
        ps = 1 if self.is_ckks else self.ptxt_space
        rounding = ctx.noise_uniform(math.log2(ps / 2.0))
        return acc + rounding

    # ------------------------------------------------------- mod switching
    def mod_down_to(self, new_k: int, new_special: bool):
        """Real modulus switching down (reference Ctxt::modDownToSet)."""
        if new_k > self.k:
            raise OutOfRangeError(f"mod_down_to: target level {new_k} above current {self.k}")
        if new_k == self.k and new_special == self.special:
            return
        added = self.mod_switch_added_noise()
        drop_bits = self.log2_modulus()
        ps = self.ptxt_space if self.ctx.scheme == "bgv" else 1
        import os
        flag = os.environ.get("HELIB_EXACT_MODSWITCH", "")
        # Measured mod-switch noise (reference Ctxt.cpp:491-503, where it
        # is unconditional).  The balanced delta/D remainder is a free
        # byproduct of the scale-down kernel (dcrt.rt_scale_down
        # want_frac=True: the kernel already computes it), so measuring
        # costs one [N]-float transfer + one host FFT per part — ON by
        # default for all eager BGV paths since round 5.
        # HELIB_EXACT_MODSWITCH=0 falls back to the worst-case bound;
        # inside jit traces the measurement is skipped (noise bookkeeping
        # is host-side float math).
        enabled = not self.is_ckks and flag != "0"
        if enabled:
            import jax.core
            enabled = not any(isinstance(d, jax.core.Tracer)
                              for _, d in self.parts)
        new_parts = []
        fracs = []
        for h, data in self.parts:
            if enabled:
                nd, frac = rt_scale_down(
                    self.ctx, data, self.k, self.special, new_k, new_special,
                    ps, want_frac=True)
                new_parts.append((h, nd))
                fracs.append((h, frac))
            else:
                new_parts.append((h, rt_scale_down(
                    self.ctx, data, self.k, self.special, new_k,
                    new_special, ps)))
        if enabled:
            import numpy as np
            from .norms import embedding_largest_float_log2
            measured = NEG_INF
            for h, frac in fracs:
                fr = np.asarray(frac)
                if fr.ndim > 1:
                    fr = fr.reshape(-1, fr.shape[-1])[0]
                if not np.any(fr):
                    continue
                norm = embedding_largest_float_log2(fr, self.ctx.m,
                                                    self.ctx.pal.pow2)
                bound = norm + (h.powS * self.pubkey.sk_bound
                                if not h.is_one else 0.0)
                measured = log2_add(measured, bound)
            if measured > NEG_INF:
                added = min(added, measured)
        k_before, special_before = self.k, self.special
        self.parts = new_parts
        self.k, self.special = new_k, new_special
        drop_bits -= self.log2_modulus()
        self.noise = log2_add(self.noise - drop_bits, added)
        if self.is_ckks:
            from fractions import Fraction
            old_rows = set(self.ctx.rows_of(k_before, special_before))
            new_rows = set(self.ctx.rows_of(new_k, new_special))
            D = 1
            for ridx in old_rows - new_rows:
                D *= int(self.ctx.all_q[ridx])
            self.ratFactor = Fraction(self.ratFactor) / D

    def drop_special_primes(self):
        if self.special:
            self.mod_down_to(self.k, False)

    def bring_to_k(self, new_k: int):
        self.drop_special_primes()
        if new_k < self.k:
            self.mod_down_to(new_k, False)

    def natural_k(self) -> int:
        """Prefix k' targeting log2(q') ≈ capacity + modswitch-added-noise
        (role of reference naturalPrimeSet/computeIntervalForMul): for BGV
        round down (slack below), for CKKS round up (keep accuracy)."""
        target = (self.capacity() + self.mod_switch_added_noise()
                  + (self.ctx.log2_special() if self.special else 0.0))
        if self.is_ckks:
            target += SAFETY_BITS
            k = self.k
            while k > 1 and self.ctx.log2_q(k - 1) >= target:
                k -= 1
            return k
        target -= SAFETY_BITS
        k = self.k
        while k > 1 and self.ctx.log2_q(k) > target:
            k -= 1
        return k

    # ------------------------------------------------------------- addition
    def _match_factors(self, other: "Ctxt"):
        """Equalize intFactor by scaling the smaller-noise ctxt (reference
        addCtxt intFactor logic)."""
        if (self.is_ckks or self.ptxt_space <= 2
                or self.intFactor == other.intFactor):
            return other
        pr = self.ptxt_space
        lam = balanced_int(other.intFactor * inv_mod(self.intFactor, pr), pr)
        # scale self by lam so factors match other's... wait: scaling self by
        # lam multiplies its factor by lam: F1*lam ≡ F2 (mod pr).
        scaled = [(h, rt_mul_scalar(self.ctx, d, lam % pr, self.k, self.special))
                  for h, d in self.parts]
        self.parts = scaled
        self.noise += math.log2(max(abs(lam), 1))
        self.intFactor = other.intFactor
        return other

    def add(self, other: "Ctxt", sub: bool = False):
        a, b = self, other.copy()
        # equalize prime sets (drop to the smaller)
        tk = min(a.k, b.k)
        tsp = a.special and b.special
        if (a.k, a.special) != (tk, tsp):
            a.mod_down_to(tk, tsp)
        if (b.k, b.special) != (tk, tsp):
            b.mod_down_to(tk, tsp)
        if a.is_ckks:
            _align_ckks_factors(a, b)
        elif a.ptxt_space != b.ptxt_space:
            g = math.gcd(a.ptxt_space, b.ptxt_space)
            a.ptxt_space = b.ptxt_space = g
        a._match_factors(b)
        for h, d in b.parts:
            if sub:
                d = rt_neg(a.ctx, d, a.k, a.special)
            i = a._find_part(h)
            if i >= 0:
                a.parts[i] = (h, rt_add(a.ctx, a.parts[i][1], d, a.k, a.special))
            else:
                a.parts.append((h, d))
        a.noise = log2_add(a.noise, b.noise)
        return a

    def sub(self, other: "Ctxt"):
        return self.add(other, sub=True)

    def mul_by_constant(self, c, mag: float | None = None):
        """Unified constant multiply (reference Ctxt::multByConstant
        overload set, Ctxt.h:973-1010): accepts an EncodedPtxt (host
        encoding), a FatEncodedPtxt (device-resident, sliced per prime
        set), or a bare coefficient vector."""
        from .encoded import EncodedPtxt, FatEncodedPtxt
        if isinstance(c, FatEncodedPtxt):
            return self.mul_constant_fat(c, mag)
        if isinstance(c, EncodedPtxt):
            return self.mul_constant_poly(c.coeffs, mag)
        return self.mul_constant_poly(c, mag)

    def add_constant(self, c):
        """Unified constant add (reference Ctxt::addConstant overloads)."""
        from .encoded import EncodedPtxt, FatEncodedPtxt
        if isinstance(c, FatEncodedPtxt):
            return self.add_constant_fat(c)
        if isinstance(c, EncodedPtxt):
            return self.add_constant_poly(c.coeffs)
        return self.add_constant_poly(c)

    def add_constant_poly(self, coeffs: np.ndarray):
        """Add an encoded plaintext polynomial (BGV; reference
        Ctxt::addConstant).  coeffs: int vector mod p^r, deg < phi(m)."""
        ctx, pr = self.ctx, self.ptxt_space
        Q = 1
        for q in ctx.primes_of(self.k, self.special):
            Q *= int(q)
        f = (Q % pr) * self.intFactor % pr
        fixed = (np.asarray(coeffs, dtype=np.int64) * f) % pr
        fixed -= (fixed > pr // 2) * pr
        pt = dcrt.small_coeffs_to_rt(ctx, fixed, self.k, self.special)
        i = self._find_part(SKHandle(0, 1, 0))
        self.parts[i] = (self.parts[i][0],
                         rt_add(ctx, self.parts[i][1], pt, self.k, self.special))
        self.noise = log2_add(self.noise, ctx.noise_mod(pr))

    def mul_constant_poly(self, coeffs: np.ndarray, mag: float | None = None):
        """Multiply by an encoded plaintext poly (balanced lift mod p^r)."""
        ctx, pr = self.ctx, self.ptxt_space
        fixed = np.asarray(coeffs, dtype=np.int64) % pr
        fixed -= (fixed > pr // 2) * pr
        pt = dcrt.small_coeffs_to_rt(ctx, fixed, self.k, self.special)
        self.parts = [(h, rt_mul(ctx, d, pt, self.k, self.special))
                      for h, d in self.parts]
        bound = mag if mag is not None else ctx.noise_mod(pr)
        self.noise += bound

    def mul_constant_fat(self, fat, mag: float | None = None):
        """Multiply by a device-resident encoded constant (reference
        Ctxt::multByConstant(FatEncodedPtxt), Ctxt.cpp:1832+): no host encode
        or NTT on the hot path — the eval tensor is sliced from the fat
        constant's cached full-row transform (encoded.FatEncodedPtxt)."""
        ctx = self.ctx
        pt = fat.rt(self.k, self.special)
        self.parts = [(h, rt_mul(ctx, d, pt, self.k, self.special))
                      for h, d in self.parts]
        space = fat.space if fat.space is not None else self.ptxt_space
        self.noise += mag if mag is not None else ctx.noise_mod(space)

    def add_constant_fat(self, fat, factor_fixed: bool = False):
        """Add a device-resident encoded constant (BGV).  The Q·intFactor
        correction of add_constant_poly depends on the live prime set, so it
        is applied as a cheap scalar multiply of the sliced constant."""
        ctx, pr = self.ctx, self.ptxt_space
        pt = fat.rt(self.k, self.special)
        if not factor_fixed:
            Q = 1
            for q in ctx.primes_of(self.k, self.special):
                Q *= int(q)
            f = (Q % pr) * self.intFactor % pr
            f = f - pr if f > pr // 2 else f
            if f != 1:
                # scalar multiply in eval domain: no rebalance mod p^r, so
                # charge the |f| growth to the noise (f == 1 for p = 2)
                pt = rt_mul_scalar(ctx, pt, f % pr, self.k, self.special)
        else:
            f = 1
        i = self._find_part(SKHandle(0, 1, 0))
        self.parts[i] = (self.parts[i][0],
                         rt_add(ctx, self.parts[i][1], pt, self.k,
                                self.special))
        self.noise = log2_add(self.noise,
                              ctx.noise_mod(pr) + math.log2(max(abs(f), 1)))

    # -------------------------------------------------------- multiplication
    def tensor(self, other: "Ctxt"):
        """Tensor product (reference Ctxt::tensorProduct, Ctxt.cpp:1563)."""
        ctx = self.ctx
        if (self.k, self.special) != (other.k, other.special):
            raise LogicError("tensor: operands on different prime sets; bring_to_k first")
        k, sp = self.k, self.special
        pr = math.gcd(self.ptxt_space, other.ptxt_space)
        out_parts: list = []

        def add_part(h, d):
            for i, (h2, d2) in enumerate(out_parts):
                if h2 == h:
                    out_parts[i] = (h2, rt_add(ctx, d2, d, k, sp))
                    return
            out_parts.append((h, d))

        for h1, d1 in self.parts:
            for h2, d2 in other.parts:
                h = h1.mul(h2)
                if h is None:
                    raise LogicError("incompatible part handles in tensor")
                add_part(h, rt_mul(ctx, d1, d2, k, sp))
        intF = 1
        if self.is_ckks:
            # reference Ctxt.cpp:1599-1606
            from fractions import Fraction
            f1, f2 = Fraction(self.ratFactor), Fraction(other.ratFactor)
            m1, m2 = self.ptxtMag, other.ptxtMag
            noise = log2_sum([
                self.noise + math.log2(m2) + frac_log2(f2) if m2 > 0 else NEG_INF,
                other.noise + math.log2(m1) + frac_log2(f1) if m1 > 0 else NEG_INF,
                self.noise + other.noise])
            out = Ctxt(ctx, self.pubkey, out_parts, k, sp, 1, noise, 1)
            out.ratFactor = f1 * f2
            out.ptxtMag = m1 * m2
            return out
        if pr > 2:
            Q = 1
            for q in ctx.primes_of(k, sp):
                Q *= int(q)
            intF = self.intFactor * other.intFactor % pr
            intF = intF * (Q % pr) % pr
        return Ctxt(ctx, self.pubkey, out_parts, k, sp, pr,
                    self.noise + other.noise, intF)

    def mul_low_level(self, other: "Ctxt") -> "Ctxt":
        """multLowLvl: equalize prime sets near the natural level, tensor.

        Interval rule follows reference computeIntervalForMul
        (Ctxt.cpp:1610-1657): BGV takes the MIN of the two natural levels
        (save capacity); CKKS takes the MAX, clamped by feasibility (the
        common set cannot exceed either operand's current set) — dropping
        a high-precision operand to the other's natural level costs
        accuracy the reference deliberately keeps."""
        a, b = self.copy(), other.copy()
        a.drop_special_primes()
        b.drop_special_primes()
        if self.is_ckks:
            tk = min(a.k, b.k, max(a.natural_k(), b.natural_k()))
        else:
            tk = min(a.natural_k(), b.natural_k())
        a.bring_to_k(tk)
        b.bring_to_k(tk)
        return a.tensor(b)

    def multiply(self, other: "Ctxt", key) -> "Ctxt":
        """key: any evaluation key holding the needed KS matrices — a PubKey
        for sk-free server-side evaluation, or a SecKey (dev convenience,
        mints missing matrices with a warning; see keys.get_ks_matrix)."""
        out = self.mul_low_level(other)
        out.relinearize(key)
        return out

    def square(self, key) -> "Ctxt":
        return self.multiply(self, key)

    # ------------------------------------------------------- key switching
    def relinearize(self, key, to_key: int = 0):
        """Reference Ctxt::reLinearize (Ctxt.cpp:718-786): mod-up by special
        primes, key-switch all non-canonical parts, leave specials in.
        `to_key` selects the target secret (reference reLinearize(keyID) —
        used to switch onto the sparse recryption key, recryption.cpp:431).
        `key`: PubKey or SecKey; only its `.matrices` are consulted."""
        ctx = self.ctx
        if all(h.is_one or h.is_base(to_key) for h, _ in self.parts):
            return self
        self.drop_special_primes()
        k = self.k
        logP = ctx.log2_special()
        new_noise = self.noise + logP
        acc: dict = {}

        def add_acc(h, d):
            if h in acc:
                acc[h] = rt_add(ctx, acc[h], d, k, True)
            else:
                acc[h] = d

        ks_noise = NEG_INF
        for h, d in self.parts:
            if h.is_one or h.is_base(to_key):
                add_acc(h, rt_add_special_and_scale(ctx, d, k))
                continue
            from .keys import get_ks_matrix
            W = get_ks_matrix(key, h, to_key=to_key)
            if W.ptxt_space > 1 and self.ptxt_space > 1:
                g = math.gcd(W.ptxt_space, self.ptxt_space)
                self.ptxt_space = g
            digits, digit_noise = rt_break_into_digits(ctx, d, k)
            sb, sa = ks_digit_mac(ctx, digits, W, k)
            add_acc(SKHandle(0, 1, 0), sb)
            add_acc(SKHandle(1, 1, to_key), sa)
            ks_noise = log2_add(ks_noise, digit_noise + W.noise)
        self.parts = [(h, d) for h, d in acc.items()]
        self.k, self.special = k, True
        from .timing import stats_update
        if ks_noise > new_noise:
            from .log import warning
            warning(f"KS-noise-ratio={2.0**(ks_noise - new_noise):.2f}",
                    once=True)
        stats_update("KS-noise-ratio", 2.0 ** min(ks_noise - new_noise, 64.0))
        self.noise = log2_add(new_noise, ks_noise)
        if self.is_ckks:
            from fractions import Fraction
            self.ratFactor = Fraction(self.ratFactor) * ctx.prod_special()
        return self

    # -------------------------------------------------------- automorphism
    def automorph(self, kexp: int):
        """X -> X^kexp on every part (reference Ctxt::automorph)."""
        ctx = self.ctx
        ordm = 2 * ctx.n_eval if ctx.pal.pow2 else ctx.m
        kexp %= ordm
        new_parts = []
        for h, d in self.parts:
            nh = h if h.is_one else SKHandle(h.powS, h.powX * kexp % ordm,
                                             h.keyID)
            new_parts.append((nh, rt_automorph(ctx, d, kexp)))
        self.parts = new_parts
        return self

    def smart_automorph(self, kexp: int, key):
        """automorph + key switch back to (1, s); if no exact matrix is
        available, chain hops through available matrices (reference
        Ctxt::smartAutomorph + keySwitchMap, Ctxt.cpp:2462-2515).  `key`:
        PubKey or SecKey — the hop search runs over `key.matrices` first,
        so a strategy-configured PubKey never needs secret material."""
        self.relinearize(key)   # ensure canonical (1, s) form first
        kexp %= self.ctx.m
        if kexp == 1:
            return self
        from .dryrun import note_automorph
        note_automorph(kexp)   # planning mode: record required automorphisms
        if (1, kexp) not in key.matrices:
            from .ksstrategy import hop_path
            path = hop_path(key, kexp)
            if path:
                for a in path:
                    self.automorph(a)
                    self.relinearize(key)
                return self
        self.automorph(kexp)
        self.relinearize(key)
        return self

    def frobenius(self, j: int, key):
        """X -> X^{p^j} (reference Ctxt::frobeniusAutomorph)."""
        val = pow(self.ctx.p, j, self.ctx.m)
        return self.smart_automorph(val, key)

    def conjugate(self, key):
        """CKKS complex conjugation = X -> X^{-1} (m-1)."""
        return self.smart_automorph(self.ctx.m - 1, key)

    def trace_map(self, sk: SecKey):
        """Trace over the slot extension: sum_{i<d} sigma_{p^i} — leaves a
        CONSTANT in every slot (reference Ctxt traceMap, used by
        ThinEvalMap::apply, EvalMap.cpp:658).

        For d > 3 the d-1 Frobenius maps share ONE key-switch digit
        decomposition (hoisting, reference BasicAutomorphPrecon), so the
        cost is one decomposition + (d-1) MAC sets instead of (d-1) full
        relinearizations."""
        d = self.ctx.pal.d
        p, m = self.ctx.p, self.ctx.m
        if d > 3:
            from .algos.hoisting import AutomorphPrecon
            precon = AutomorphPrecon(self, sk)
            acc = None
            for i in range(1, d):
                t = precon.automorph(pow(p, i, m))
                acc = t if acc is None else acc.add(t)
            acc = acc.add(precon.base)
        else:
            acc = self
            frob = self
            for _ in range(1, d):
                frob = frob.copy().frobenius(1, sk)
                acc = acc.copy().add(frob)
        if acc is not self:
            self.parts = acc.parts
            self.k, self.special = acc.k, acc.special
            self.noise = acc.noise
            self.ptxt_space = acc.ptxt_space
            self.intFactor = acc.intFactor
        return self

    def divide_by_p(self):
        """Divide the plaintext by p (requires it divisible); plaintext space
        p^r -> p^{r-1} (reference Ctxt::divideByP, Ctxt.h:1212)."""
        ctx = self.ctx
        p = ctx.p
        if self.ptxt_space % p or self.ptxt_space <= p:
            raise InvalidArgument(f"divide_by_p: plaintext space {self.ptxt_space} not a proper multiple of p={p}")
        rows = ctx.rows_of(self.k, self.special)
        qs = ctx.all_q[np.array(rows)]
        inv = np.array([pow(p, -1, int(q)) for q in qs], dtype=np.uint32)[:, None]
        from .ops import modops as _m
        ish = jnp.asarray(_m.shoup(inv, qs[:, None].astype(np.uint64)))
        q_d, _ = ctx.dev_q(self.k, self.special)
        from .ops.modops import mul_mod_shoup
        self.parts = [(h, mul_mod_shoup(d, jnp.asarray(inv), ish, q_d))
                      for h, d in self.parts]
        self.ptxt_space //= p
        self.noise -= math.log2(p)
        self.intFactor %= self.ptxt_space

    def mult_by_p(self, count: int = 1):
        """Multiply plaintext by p^count (reference multByP)."""
        p = self.ctx.p ** count
        self.parts = [(h, rt_mul_scalar(self.ctx, d, p, self.k, self.special))
                      for h, d in self.parts]
        self.ptxt_space *= p
        self.noise += math.log2(p)

    def negate(self):
        self.parts = [(h, rt_neg(self.ctx, d, self.k, self.special))
                      for h, d in self.parts]
        return self

    def extract_bits(self, sk, n_bits: int = 0) -> list:
        """Bit decomposition: returns ciphertexts encrypting the base-p
        digits (bits when p=2) of the slot values (reference
        Ctxt::extractBits, Ctxt.h:1225,1586 — an alias of extractDigits).

        For odd composite m (including prime powers p'^k, where the
        cofactor (X^m-1)/Phi_m = X^{m/p'}-1 has degree > 1) the input is
        first multiplied by the Phi_m CRT idempotent: the device
        representation is mod X^m - 1, and the extraction ladder's
        divide_by_p is exact only when the cofactor ("junk") components of
        the plaintext are zero (see nt.numbth.phim_idempotent).  For prime
        m the single junk component (evaluation at X=1) is an integer and
        follows the same digit arithmetic, so no projection is needed;
        power-of-2 m has no cofactor at all."""
        from .algos.extract import extract_digits
        from .nt.numbth import is_prime, phim_idempotent
        src = self
        if not self.ctx.pal.pow2 and not is_prime(self.ctx.m):
            src = self.copy()
            src.mul_constant_poly(
                phim_idempotent(self.ctx.m, self.ptxt_space))
        return extract_digits(src, sk, n_bits if n_bits > 0 else None)

    def reduce_ptxt_space(self, new_space: int):
        """Reduce plaintext space to gcd (reference reducePtxtSpace)."""
        g = math.gcd(self.ptxt_space, new_space)
        if g <= 1:
            raise InvalidArgument(f"reduce_ptxt_space: gcd({self.ptxt_space}, {new_space}) is trivial")
        self.ptxt_space = g
        self.intFactor %= g
        return self


def _align_ckks_factors(a: Ctxt, b: Ctxt):
    """Equalize CKKS rational factors before addition (role of reference
    Ctxt.cpp:1212-1358).  Scales the smaller-factor ciphertext by the nearest
    integer ratio; the residual factor mismatch is charged to the noise."""
    from fractions import Fraction
    fa, fb = Fraction(a.ratFactor), Fraction(b.ratFactor)
    if fa == fb:
        return
    if fa < fb:
        _align_ckks_factors(b, a)
        # after recursion factors are equal; mirror into a
        return
    # fa > fb: scale b by n = round(fa/fb)
    ratio = fa / fb
    n = int(ratio + Fraction(1, 2))
    if n > 1:
        b.parts = [(h, rt_mul_scalar(b.ctx, d, n, b.k, b.special))
                   for h, d in b.parts]
        b.noise += math.log2(n)
        fb = fb * n
    # residual mismatch -> extra noise on b: value m*(fa - fb)
    gap = abs(fa - fb)
    if gap > 0 and b.ptxtMag > 0:
        b.noise = log2_add(b.noise, math.log2(b.ptxtMag) + frac_log2(gap))
    b.ratFactor = fa
    a.ratFactor = fa
