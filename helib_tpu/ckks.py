"""CKKS approximate-numbers scheme: encoding, encryption, slot view.

TPU-native equivalent of reference EaCx/Ptxt<CKKS>
(/root/reference/src/EaCx.cpp, EncryptedArray.h:879+): complex slots via the
canonical embedding on power-of-2 cyclotomics, explicit scaling factors, and
rotations as automorphisms by powers of the slot generator.

Slot ordering: slot j <-> evaluation at zeta^{5^j mod m}, j = 0..nslots-1
(nslots = phi(m)/2); the conjugate evaluations at -5^j carry conj(z_j) so the
coefficient vector is real.  Rotation by one slot = automorphism X -> X^{5^-1}.
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np

from .context import Context, log2_add
from .exceptions import InvalidArgument
from .keys import SecKey, PubKey, SKHandle
from .ctxt import Ctxt, frac_log2
from . import dcrt
from .dcrt import rt_mul, rt_add, sample_small, sample_gaussian, \
    small_coeffs_to_rt
from .nt.numbth import inv_mod


class EncryptedArrayCKKS:
    def __init__(self, ctx: Context, scale_bits: int | None = None):
        if ctx.scheme != "ckks" or not ctx.pal.pow2:
            raise InvalidArgument("EncryptedArrayCKKS requires a power-of-2-m CKKS context")
        self.ctx = ctx
        self.N = ctx.n_eval                       # phi(m)
        self.m = ctx.m
        self.nslots = self.N // 2
        self.scale_bits = scale_bits if scale_bits is not None else ctx.r
        # slot j <-> exponent e_j = 5^j mod m (odd); DFT index t_j=(e_j-1)/2
        e = 1
        exps = []
        for _ in range(self.nslots):
            e = e * 5 % self.m
            exps.append(e)
        # start at 5^0 = 1
        self.slot_exp = np.array([1] + exps[:-1], dtype=np.int64)
        self.dft_idx = (self.slot_exp - 1) // 2

    # ---------------------------------------------------------- embedding
    def embed(self, coeffs: np.ndarray) -> np.ndarray:
        """Real coeff vector [N] -> complex slot values [nslots]
        (evaluate at zeta^{e_j}, zeta = exp(i*pi/N))."""
        N = self.N
        zeta = np.exp(1j * np.pi / N)
        b = coeffs.astype(np.complex128) * zeta ** np.arange(N)
        # a(zeta^{2t+1}) = sum_l b_l e^{2pi i t l / N} = iDFT-style
        F = np.fft.ifft(b) * N          # F[t] = sum_l b_l e^{+2pi i tl/N}
        return F[self.dft_idx]

    def unembed(self, slots: np.ndarray) -> np.ndarray:
        """Complex slots [nslots] -> real coeff vector [N] (exact inverse of
        embed on the conjugate-symmetric subspace)."""
        N = self.N
        F = np.zeros(N, dtype=np.complex128)
        F[self.dft_idx] = np.asarray(slots, dtype=np.complex128)
        conj_idx = (N - 1) - self.dft_idx      # exponent m - e_j = (2t'+1)
        F[conj_idx] = np.conj(slots)
        b = np.fft.fft(F) / N                  # inverse of embed's transform
        zeta = np.exp(1j * np.pi / N)
        coeffs = b * zeta ** (-np.arange(N))
        return np.real(coeffs)

    # ------------------------------------------------------------ encode
    def encode(self, slots, scale: int | None = None):
        """-> (int coeffs [N], scale, mag, rounding-noise log2)."""
        z = np.zeros(self.nslots, dtype=np.complex128)
        s = np.asarray(slots, dtype=np.complex128).ravel()
        z[:len(s)] = s
        scale = scale if scale is not None else (1 << self.scale_bits)
        coeffs = self.unembed(z) * scale
        rounded = np.round(coeffs).astype(object)
        mag = float(np.max(np.abs(z))) if len(s) else 0.0
        # rounding error <= 1/2 per coeff -> canonical bound
        err = self.ctx.noise_uniform(math.log2(0.5))
        from . import timing
        if timing.fhe_stats:
            # noise-model validation: actual decode error of the rounded
            # encoding vs the bound just charged (reference
            # HELIB_STATS_UPDATE("CKKS_encode_ratio"), EaCx.cpp:265-277)
            back = self.decode(rounded, Fraction(scale))[:self.nslots]
            dist = float(np.max(np.abs(back - z))) if len(z) else 0.0
            scaled_err = (2.0 ** err) / scale
            ratio = dist / scaled_err if scaled_err > 0 else 0.0
            if ratio > 1:
                from .log import warning
                warning("CKKS encode: error exceeds bound")
            timing.stats_update("CKKS_encode_ratio", ratio)
        return rounded, scale, max(mag, 2.0 ** -40), err

    def encode_ptxt(self, slots, scale: int | None = None):
        """First-class scheme-tagged CKKS encoding (reference
        EncryptedArrayCx::encode -> EncodedPtxt with mag/scale,
        EncodedPtxt.h:142,312)."""
        from .encoded import EncodedPtxt
        coeffs, scale_v, mag, _ = self.encode(slots, scale)
        return EncodedPtxt(np.array([int(c) for c in coeffs]),
                           mag=mag, scale=float(scale_v))

    def decode(self, coeffs, scale: Fraction) -> np.ndarray:
        vals = np.array([float(Fraction(int(c)) / scale) for c in coeffs],
                        dtype=np.float64)
        return self.embed(vals)

    # ----------------------------------------------------------- encrypt
    def encrypt(self, slots, pubkey: PubKey, rng, scale: int | None = None):
        ctx = self.ctx
        coeffs, scale_v, mag, enc_err = self.encode(slots, scale)
        k, special = ctx.L, False
        r_coeffs, r_bound = sample_small(ctx, rng)
        r = small_coeffs_to_rt(ctx, r_coeffs, k, special)
        noise = r_bound + pubkey.enc_noise
        parts = []
        for i, (handle, data) in enumerate(pubkey.enc_key):
            part = rt_mul(ctx, data, r, k, special)
            e_coeffs, e_bound = sample_gaussian(ctx, rng)
            pe = small_coeffs_to_rt(ctx, e_coeffs, k, special)
            part = rt_add(ctx, part, pe, k, special)
            if i == 1:
                e_bound += pubkey.sk_bound
            noise = log2_add(noise, e_bound)
            parts.append((handle, part))
        pt = dcrt.small_coeffs_to_rt(ctx, np.array([int(c) for c in coeffs],
                                                   dtype=np.int64), k, special)
        parts[0] = (parts[0][0], rt_add(ctx, parts[0][1], pt, k, special))
        noise = log2_add(noise, enc_err)
        ct = Ctxt(ctx=ctx, pubkey=pubkey, parts=parts, k=k, special=special,
                  ptxt_space=1, noise=noise, intFactor=1)
        ct.ratFactor = Fraction(scale_v)
        ct.ptxtMag = mag
        return ct

    def raw_decrypt(self, ctxt: Ctxt, sk: SecKey) -> np.ndarray:
        """Decrypt WITHOUT the Li-Micciancio mitigation (reference
        EncryptedArrayCx::rawDecrypt, EaCx.cpp:62) — debug/test use only."""
        vals = sk.decrypt_raw(ctxt)          # balanced ints
        return self.decode(vals, Fraction(ctxt.ratFactor))

    def decrypt(self, ctxt: Ctxt, sk: SecKey,
                prec: int | None = None) -> np.ndarray:
        """Decrypt with the Li-Micciancio decryption-noise mitigation
        ("On the Security of Homomorphic Encryption on Approximate Numbers"):
        adds key/ciphertext-derived Gaussian noise so the released value's
        error grows by at most eps = ctxt.errorBound() (or 2^-prec), hiding
        the exact RLWE error (reference EaCx.cpp:88-131,
        Ctxt::addedNoiseForCKKSDecryption, Ctxt.cpp:3051)."""
        ctx = self.ctx
        eps = ctxt.error_bound()
        if prec is not None:
            eps1 = 2.0 ** (-prec)
            if eps1 < eps:
                from .log import warning
                warning("CKKS decryption: 2^-prec < errorBound: "
                        "potential security risk", once=True)
            eps = eps1
        from . import dcrt as _dcrt
        coeff_res, rows = sk._inner_product_residues(ctxt)
        vals = _dcrt.crt_reconstruct(ctx, coeff_res, rows,
                                     balanced=True).astype(object)
        # sigma chosen so sigma*B/ratFactor = eps, floored at 2*stdev for
        # security (reference Ctxt.cpp:3057-3079)
        phim = ctx.phi_m
        B = math.sqrt(phim * math.log(phim))
        sigma_min = ctx.stdev * 2
        sigma = float(Fraction(ctxt.ratFactor) * Fraction(eps)) / B
        if sigma < sigma_min:
            sigma = sigma_min
            from .log import warning
            warning("CKKS decryption: sigma set to sigma_min, "
                    "accuracy may be affected", once=True)
        # noise PRG seeded from a hash of (sk, ctxt) — random-oracle-style
        # derandomization as in the reference (Ctxt.cpp:3083-3100).  The
        # reference hashes the serialized (sk, full ctxt); we hash the
        # sk coefficients + the <c,s> residues (already on host from the
        # fused inner product) + the scaling factor: still a deterministic
        # function of (sk, ctxt) under the same random-oracle argument,
        # without re-fetching every ciphertext part from the device (the
        # per-part pulls made decrypt ~46-66 ms over the remote-TPU tunnel).
        import hashlib
        h = hashlib.sha256()
        h.update(np.asarray(sk.s_coeffs).tobytes())
        h.update(np.ascontiguousarray(coeff_res).tobytes())
        h.update(str(ctxt.ratFactor).encode())
        prg = np.random.default_rng(
            np.frombuffer(h.digest(), dtype=np.uint64))
        g = prg.normal(0.0, 1.0, self.N)
        mant, ex = math.frexp(sigma)
        if ex > 52:
            # sigma exceeds int64: exact object-int scaling (52-bit Gaussian
            # mantissa is far beyond the needed statistical precision)
            scaled = np.round(g * mant * (1 << 52)).astype(np.int64)
            noise = scaled.astype(object) * (1 << (ex - 52))
        else:
            noise = np.round(g * sigma).astype(np.int64)
        vals = vals + noise
        return self.decode(vals, Fraction(ctxt.ratFactor))

    # ---------------------------------------------------------- rotations
    def rotate(self, ctxt: Ctxt, amt: int, key: SecKey):
        """Rotate slots by amt (slot j content -> slot j+amt)."""
        amt %= self.nslots
        if amt == 0:
            return ctxt
        k = pow(inv_mod(5, self.m), amt, self.m)
        return ctxt.smart_automorph(k, key)

    def mul_const(self, ctxt: Ctxt, values, scale: int | None = None):
        """Multiply by encoded constant slots (reference MatMul_CKKS const
        path)."""
        coeffs, scale_v, mag, err = self.encode(values, scale)
        pt = dcrt.small_coeffs_to_rt(
            self.ctx, np.array([int(c) for c in coeffs], dtype=np.int64),
            ctxt.k, ctxt.special)
        out = ctxt.copy()
        out.parts = [(h, rt_mul(self.ctx, d, pt, out.k, out.special))
                     for h, d in out.parts]
        # ctxt*(enc+eps) = ctxt*enc + ctxt*eps:
        #   noise_c*|enc| + (mag_c*f_c + noise_c)*eps
        cbound = math.log2(mag) + math.log2(scale_v)
        val_bound = log2_add(math.log2(max(ctxt.ptxtMag, 2.0 ** -40))
                             + frac_log2(Fraction(ctxt.ratFactor)), ctxt.noise)
        out.noise = log2_add(ctxt.noise + cbound, err + val_bound)
        out.ratFactor = Fraction(ctxt.ratFactor) * scale_v
        out.ptxtMag = ctxt.ptxtMag * mag
        return out

    def rescale(self, ctxt: Ctxt):
        """Drop to the natural level (divides the scale)."""
        ctxt.drop_special_primes()
        nk = ctxt.natural_k()
        if nk < ctxt.k:
            ctxt.mod_down_to(nk, False)
        return ctxt

    def shift(self, ctxt: Ctxt, amt: int, key: SecKey):
        """Non-cyclic shift with zero fill (reference EncryptedArrayCx::
        shift, EaCx.cpp:142-235): mask out the slots that would wrap, then
        rotate."""
        n = self.nslots
        if amt == 0:
            return ctxt
        mask = np.zeros(n)
        if amt > 0:
            mask[: n - amt] = 1.0
        else:
            mask[-amt:] = 1.0
        out = self.mul_const(ctxt, mask)
        return self.rotate(out, amt % n, key)

    def extract_real_part(self, ctxt: Ctxt, key: SecKey):
        """Re(x) = (x + conj(x)) / 2 (reference extractRealPart,
        EncryptedArray.h:1122); the division by 2 is free — it only scales
        ratFactor."""
        out = ctxt.copy().add(ctxt.copy().conjugate(key))
        out.ratFactor = Fraction(out.ratFactor) * 2
        return out

    def extract_imaginary_part(self, ctxt: Ctxt, key: SecKey):
        """Im(x) = (x - conj(x)) / (2i) (reference extractImPart)."""
        diff = ctxt.copy().sub(ctxt.copy().conjugate(key))   # 2i * Im(x)
        return self.mul_const(diff, np.full(self.nslots, -0.5j))
