"""Secret/public keys, RLWE encryption, key-switching matrices.

TPU-native equivalent of reference keys.cpp / keySwitching.cpp
(/root/reference/src/keys.cpp:633-1422, src/keySwitching.cpp):

  * SecKey: small secret s; decrypt = sum parts[i] * s^{r_i}(X^{t_i}),
    host CRT + balanced reduction at the boundary (keys.cpp:1327-1422).
  * PubKey: an encryption of zero (c0, c1) = (-a*s + p*e, a) plus hybrid
    key-switching matrices: column j of W[s'->s] is
        b_j = -a_j*s + p*e_j + P*B_j*s',   a_j uniform,
    with P = prod(special primes), B_j = prod of full digit products < j
    (design comment keySwitching.h:33-88).
  * BGV plaintext invariant: [<c, s>]_Q = p*e + m*intFactor*[Q]_p; fresh
    encryption embeds ptxt * [Q mod p^r] balanced (keys.cpp:726-729), and the
    invariant is preserved by mod-switching without intFactor updates.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from .context import Context, log2_add, log2_sum
from . import dcrt
from .dcrt import (rt_add, rt_sub, rt_mul, rt_neg, rt_mul_scalar,
                   sample_small, sample_gaussian, sample_hwt,
                   sample_small_bounded, sample_gaussian_bounded,
                   sample_hwt_bounded,
                   sample_uniform_residues, small_coeffs_to_rt,
                   rt_automorph)
from .nt.numbth import inv_mod
from .nt.cyclotomic import cyclotomic_poly


@dataclass(frozen=True)
class SKHandle:
    """Which secret-key monomial s^powS(X^powX) a part multiplies
    (reference Ctxt.h:82-141)."""
    powS: int = 0
    powX: int = 1
    keyID: int = 0

    @property
    def is_one(self) -> bool:
        return self.powS == 0

    def is_base(self, keyID: int = 0) -> bool:
        return self.powS == 1 and self.powX == 1 and self.keyID == keyID

    def mul(self, other: "SKHandle"):
        """Product handle or None if incompatible (reference Ctxt.h:155-186)."""
        if self.is_one:
            return other
        if other.is_one:
            return self
        if self.keyID != other.keyID or self.powX != other.powX:
            return None
        return SKHandle(self.powS + other.powS, self.powX, self.keyID)


@dataclass
class KSMatrix:
    """Hybrid key-switch matrix W[s'(X^powX)^powS -> s].

    Only the b columns carry key material; the a columns are uniform and are
    regenerated deterministically from `prg_seed` (reference keySwitching.h:
    67-108 stores a PRG seed instead of the random halves to halve the
    serialized size).  They stay materialized in memory for speed."""
    from_handle: SKHandle
    ptxt_space: int
    b: list            # per column: [L+S, N] eval tensors
    a: list
    noise: float       # log2 bound on |p*e_j| per column
    prg_seed: int | None = None
    to_key: int = 0    # target secret (reference KeySwitch::toKeyID)


def regen_ks_a(ctx: Context, prg_seed: int, ncols: int) -> list:
    """Regenerate the uniform a-columns of a KS matrix from its PRG seed."""
    prg = np.random.default_rng(prg_seed)
    return [sample_uniform_residues(ctx, prg, ctx.L, True)
            for _ in range(ncols)]


class SecKey:
    """Secret key(s).  Multi-key: `skeys` is a list of secrets (reference
    SecKey::sKeys, keys.h:314; GenSecKey appends and returns the keyID,
    keys.cpp:1139); keyID 0 is the main key and the aliases
    s_coeffs/sk_bound/s_full refer to it."""

    def __init__(self, ctx: Context, seed: int = 0, hwt: int = 0):
        self.ctx = ctx
        self.rng = np.random.default_rng(seed)
        self.skeys: list[dict] = []
        self.matrices: dict = {}
        self.pubkey: "PubKey" | None = None
        self.gen_key(hwt)

    def gen_key(self, hwt: int = 0) -> int:
        """Sample and append an additional secret key; returns its keyID
        (reference SecKey::GenSecKey / ImportSecKey, keys.cpp:1099-1157)."""
        ctx = self.ctx
        if hwt > 0:
            coeffs, bound = sample_hwt_bounded(ctx, self.rng, hwt)
        else:
            coeffs, bound = sample_small_bounded(ctx, self.rng)
        # secret key resident on ALL rows (ctxt + special)
        full = small_coeffs_to_rt(ctx, coeffs, ctx.L, True)
        self.skeys.append({"coeffs": coeffs, "bound": bound, "full": full})
        return len(self.skeys) - 1

    # key-0 aliases (the common single-key surface)
    @property
    def s_coeffs(self):
        return self.skeys[0]["coeffs"]

    @property
    def sk_bound(self):
        return self.skeys[0]["bound"]

    @property
    def s_full(self):
        return self.skeys[0]["full"]

    def key_full(self, keyID: int):
        return self.skeys[keyID]["full"]

    def key_bound(self, keyID: int) -> float:
        return self.skeys[keyID]["bound"]

    # -- raw RLWE instance over all rows ----------------------------------
    def _rlwe_all_rows(self, p_mult: int, a_rng=None, to_key: int = 0):
        """(b, a, log2 noise of p*e) with b = -a*s_{to_key} + p*e over all
        primes.  `a_rng` lets KS-matrix generation draw the uniform half from
        a dedicated seeded PRG so it can be regenerated at load time."""
        ctx = self.ctx
        a = sample_uniform_residues(ctx, a_rng or self.rng, ctx.L, True)
        e_coeffs, _ = sample_gaussian_bounded(ctx, self.rng)
        e = small_coeffs_to_rt(ctx, e_coeffs, ctx.L, True)
        pe = rt_mul_scalar(ctx, e, p_mult, ctx.L, True) if p_mult != 1 else e
        b = rt_sub(ctx, pe,
                   rt_mul(ctx, a, self.key_full(to_key), ctx.L, True),
                   ctx.L, True)
        noise = math.log2(max(p_mult, 1)) + ctx.noise_gaussian()
        return b, a, noise

    # -- key-switching matrix generation (reference keys.cpp:1159-1246) ---
    def gen_ks_matrix(self, from_handle: SKHandle,
                      ptxt_space: int | None = None,
                      to_key: int = 0) -> KSMatrix:
        if from_handle.keyID == 0 and to_key == 0:
            key = (from_handle.powS, from_handle.powX)
        else:
            key = (from_handle.powS, from_handle.powX,
                   from_handle.keyID, to_key)
        if key in self.matrices:
            return self.matrices[key]
        ctx = self.ctx
        # bootstrappable contexts use the larger recryption plaintext space
        # for every matrix (reference GenKeySWmatrix, keys.cpp:1212-1222)
        default_space = getattr(ctx, "boot_ptxt_space", 0) or ctx.ptxt_space
        p = 1 if ctx.scheme == "ckks" else (ptxt_space or default_space)
        # fromKey = s_{keyID}^powS(X^powX) on all rows
        fk = self.key_full(from_handle.keyID)
        if from_handle.powX != 1:
            fk = rt_automorph(ctx, fk, from_handle.powX)
        if from_handle.powS > 1:
            acc = fk
            for _ in range(from_handle.powS - 1):
                acc = rt_mul(ctx, acc, fk, ctx.L, True)
            fk = acc
        P = ctx.prod_special()
        Bj = 1
        prg_seed = int(self.rng.integers(1 << 62))
        prg = np.random.default_rng(prg_seed)
        bs, as_, noise = [], [], 0.0
        for (s, e) in ctx.digits:
            b, a, col_noise = self._rlwe_all_rows(p, a_rng=prg,
                                                  to_key=to_key)
            add = rt_mul_scalar(ctx, fk, P * Bj, ctx.L, True)
            b = rt_add(ctx, b, add, ctx.L, True)
            bs.append(b)
            as_.append(a)
            noise = col_noise  # same bound every column
            Dfull = 1
            for q in ctx.qs[s:e]:
                Dfull *= int(q)
            Bj *= Dfull
        W = KSMatrix(from_handle, p, bs, as_, noise, prg_seed, to_key)
        self.matrices[key] = W
        return W

    # -- decryption (reference keys.cpp:1327-1422) ------------------------
    def _inner_product_residues(self, ctxt):
        """<c, s-monomials> as per-prime coefficient residues [(P, N), rows]
        — the exact RNS value before the bignum CRT boundary.

        The whole inner product INCLUDING the per-prime inverse NTT runs as
        ONE jit program per (k, special, handle-structure); only the final
        residue matrix crosses to host.  The previous eager per-op version
        paid a ~10 ms dispatch round-trip per primitive over the remote-TPU
        tunnel, making decrypt 50-75 ms where the reference's host decrypt
        (keys.cpp:1327-1422) is single-digit ms."""
        ctx = self.ctx
        k, special = ctxt.k, ctxt.special
        rows = ctx.rows_of(k, special)
        idx = np.array(rows)
        sig = (k, special,
               tuple((h.keyID, h.powX, h.powS) for h, _ in ctxt.parts))
        cache = getattr(self, "_dec_cache", None)
        if cache is None:
            cache = self._dec_cache = {}
        entry = cache.get(sig)
        if entry is None:
            handles = [h for h, _ in ctxt.parts]
            key_rows = {}
            for h in handles:
                if not h.is_one and h.keyID not in key_rows:
                    key_rows[h.keyID] = jnp.asarray(
                        self.key_full(h.keyID))[idx, :]
            kids = sorted(key_rows)

            def fn(*tensors):
                datas = tensors[:len(handles)]
                keys = dict(zip(kids, tensors[len(handles):]))
                acc = None
                for h, data in zip(handles, datas):
                    term = data
                    if not h.is_one:
                        s = keys[h.keyID]
                        if h.powX != 1:
                            s = rt_automorph(ctx, s, h.powX)
                        pw = s
                        for _ in range(h.powS - 1):
                            pw = rt_mul(ctx, pw, s, k, special)
                        term = rt_mul(ctx, data, pw, k, special)
                    acc = (term if acc is None
                           else rt_add(ctx, acc, term, k, special))
                return ctx.inv_ntt(acc, rows)

            from .jitutil import lifted_jit
            ex = [d for _, d in ctxt.parts] + [key_rows[i] for i in kids]
            entry = (lifted_jit(fn, *ex), [key_rows[i] for i in kids])
            cache[sig] = entry
        jfn, keyargs = entry
        res = jfn(*[d for _, d in ctxt.parts], *keyargs)
        return np.asarray(res), rows

    def decrypt_raw(self, ctxt) -> np.ndarray:
        """<c, s-monomials> -> balanced integer coefficient vector (host)."""
        coeff_res, rows = self._inner_product_residues(ctxt)
        return dcrt.crt_reconstruct(self.ctx, coeff_res, rows, balanced=True)

    def decrypt_bgv(self, ctxt) -> np.ndarray:
        """Full BGV decrypt -> plaintext poly coeffs mod the ciphertext's
        plaintext space, degree < phi(m)."""
        ctx = self.ctx
        pr = ctxt.ptxt_space
        coeff_res, rows = self._inner_product_residues(ctxt)
        from .nt.native import combiner_for
        comb = combiner_for([int(q) for q in ctx.all_q[np.array(rows)]])
        if comb is not None:
            # native fast path: balanced value mod p^r without object ints
            vals_pr = comb.balanced_mod(coeff_res, pr)
        else:
            vals = dcrt.crt_reconstruct(ctx, coeff_res, rows, balanced=True)
            vals_pr = np.array([int(v) % pr for v in vals], dtype=np.int64)
        red = reduce_mod_phim(vals_pr, ctx, pr)
        Q = 1
        for q in ctx.primes_of(ctxt.k, ctxt.special):
            Q *= int(q)
        f = (Q % pr) * ctxt.intFactor % pr
        finv = inv_mod(f, pr)
        return (red * finv) % pr

    def noise_of(self, ctxt) -> float:
        """log2 of the actual canonical-embedding L-infinity norm of <c, s>
        (reference embeddingLargestCoeff, norms.h:85 — the quantity the
        noiseBound estimates track)."""
        ctx = self.ctx
        coeff_res, rows = self._inner_product_residues(ctxt)
        from .nt.native import combiner_for
        comb = combiner_for([int(q) for q in ctx.all_q[np.array(rows)]])
        if comb is not None:
            from .norms import embedding_norm_log2_scaled
            mant, ex = comb.balanced_float_log2(coeff_res)
            return embedding_norm_log2_scaled(mant, ex, ctx.m, ctx.pal.pow2)
        vals = dcrt.crt_reconstruct(ctx, coeff_res, rows, balanced=True)
        return canonical_embedding_norm_log2(vals, self.ctx)


def canonical_embedding_norm_log2(coeffs, ctx) -> float:
    """max_j |f(zeta^j)| over primitive m-th roots, from balanced integer
    coefficients (host, complex FFT; reference src/norms.cpp)."""
    from .norms import embedding_largest_coeff_log2
    return embedding_largest_coeff_log2(coeffs, ctx.m, ctx.pal.pow2)


def reduce_mod_phim(coeffs: np.ndarray, ctx: Context, modulus: int) -> np.ndarray:
    """Reduce a poly of degree < N mod Phi_m(X) mod `modulus` (host).

    For pow2 m the representation is already mod Phi_m = X^N+1.  For odd m
    the mod-(X^m-1) representative is divided by Phi_m here — the one place
    the X^m-1 embedding is projected back (see ops/ntt.py design note)."""
    if ctx.pal.pow2:
        return coeffs % modulus
    m, phi = ctx.m, ctx.phi_m
    phim = np.array([int(c) % modulus for c in cyclotomic_poly(m)],
                    dtype=np.int64)
    work = coeffs.astype(np.int64) % modulus
    work = work.copy()
    # synthetic division: leading coeff of Phi_m is 1
    for i in range(len(work) - 1, phi - 1, -1):
        c = work[i] % modulus
        if c:
            work[i - phi:i + 1] = (work[i - phi:i + 1]
                                   - c * phim) % modulus
    return work[:phi] % modulus


class PubKey:
    """Public evaluation key: an encryption of zero + the key-switching
    matrices (reference keys.h:48-318 — PubKey owns `keySwitching` and
    `keySwitchMap`, so a server holding only the PubKey can relinearize,
    rotate, and bootstrap).  Holds NO reference to the secret key.

    `matrices` is SHARED with the generating SecKey's dict (the reference
    expresses the same sharing by inheritance: SecKey IS-A PubKey, and
    GenKeySWmatrix pushes onto the PubKey half, keys.cpp:1159-1246), so
    matrices added by ksstrategy.add_* after PubKey construction are
    visible here too.  A deserialized PubKey owns its own dict."""

    def __init__(self, sk: SecKey):
        self.ctx = ctx = sk.ctx
        sk.pubkey = self
        self.matrices = sk.matrices   # shared (see class docstring)
        p = ctx.ptxt_space if ctx.scheme == "bgv" else 1
        # encryption of zero over ctxt primes only (reference keys.cpp:667)
        b, a, noise = sk._rlwe_all_rows(p)
        idx = np.arange(ctx.L)
        self.enc_key = [(SKHandle(0, 1, 0), b[idx, :]),
                        (SKHandle(1, 1, 0), a[idx, :])]
        self.enc_noise = noise
        self.sk_bound = sk.sk_bound

    def encrypt_bgv(self, ptxt_coeffs: np.ndarray, rng: np.random.Generator):
        """Public-key BGV encryption (reference keys.cpp:633-761).
        ptxt_coeffs: int coeffs (deg < phi(m)) mod p^r.  Returns a Ctxt."""
        from .ctxt import Ctxt
        ctx = self.ctx
        pr = ctx.ptxt_space
        k, special = ctx.L, False
        r_coeffs, r_bound = sample_small_bounded(ctx, rng)
        r = small_coeffs_to_rt(ctx, r_coeffs, k, special)
        noise = r_bound + self.enc_noise   # r_bound * pubkey noise (log2 mult)
        parts = []
        for i, (handle, data) in enumerate(self.enc_key):
            part = rt_mul(ctx, data, r, k, special)
            e_coeffs, _ = sample_gaussian_bounded(ctx, rng)
            pe = small_coeffs_to_rt(ctx, e_coeffs * pr, k, special)
            part = rt_add(ctx, part, pe, k, special)
            e_bound = math.log2(pr) + ctx.noise_gaussian()
            if i == 1:
                e_bound += self.sk_bound
            noise = log2_add(noise, e_bound)
            parts.append((handle, part))
        # ptxt * [Q]_p, balanced mod p^r
        Q = ctx.prod_qs(k)
        qmodp = Q % pr
        fixed = (np.asarray(ptxt_coeffs, dtype=np.int64) * qmodp) % pr
        fixed -= (fixed > pr // 2) * pr
        pt = small_coeffs_to_rt(ctx, fixed, k, special)
        parts[0] = (parts[0][0], rt_add(ctx, parts[0][1], pt, k, special))
        noise = log2_add(noise, ctx.noise_mod(pr))
        return Ctxt(ctx=ctx, pubkey=self, parts=parts, k=k, special=special,
                    ptxt_space=pr, noise=noise, intFactor=1)


def balanced_int(v: int, m: int) -> int:
    v %= m
    return v - m if v > m // 2 else v


# ---------------------------------------------------------------------------
# evaluation-key lookup (reference PubKey::getKeySWmatrix, keys.cpp:336-404)
# ---------------------------------------------------------------------------

def matrix_key(handle: SKHandle, to_key: int = 0):
    if handle.keyID == 0 and to_key == 0:
        return (handle.powS, handle.powX)
    return (handle.powS, handle.powX, handle.keyID, to_key)


def find_ks_matrix(key, handle: SKHandle, to_key: int = 0):
    """W[handle -> s_{to_key}] from an evaluation key (PubKey or SecKey),
    or None.  Every evaluation-time consumer goes through here — only
    `key.matrices` is touched, never secret material."""
    return key.matrices.get(matrix_key(handle, to_key))


def get_ks_matrix(key, handle: SKHandle, to_key: int = 0) -> KSMatrix:
    """Fetch a key-switching matrix for evaluation, with the miss policy:

      * present -> return it (the only case a PubKey can serve);
      * absent + key is a SecKey -> generate on demand, with a ONE-TIME
        warning that the ksstrategy configuration missed it (dev
        convenience; reference GenKeySWmatrix is always an explicit
        keygen-time call).  HELIB_STRICT_KS=1 disables this fallback;
      * absent + key is a PubKey -> LogicError (reference
        assertTrue(map[...] != -1, "...") in smartAutomorph's
        keySwitchMap, Ctxt.cpp:2462-2515)."""
    W = find_ks_matrix(key, handle, to_key)
    if W is not None:
        return W
    import os
    if isinstance(key, SecKey) and not os.environ.get("HELIB_STRICT_KS"):
        from .log import warning
        warning(f"KS matrix for {handle} (to_key={to_key}) missing — "
                "generating from the secret key on demand; configure "
                "ksstrategy.add_*_matrices at keygen time for "
                "PubKey-only evaluation", once=True)
        return key.gen_ks_matrix(handle, to_key=to_key)
    from .exceptions import LogicError
    raise LogicError(
        f"no key-switching matrix for {handle} (to_key={to_key}) on this "
        "evaluation key; generate it at keygen time via "
        "ksstrategy.add_*_matrices / SecKey.gen_ks_matrix")
