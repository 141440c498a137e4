"""Batched number-theoretic transforms over the RNS limb axis.

TPU-native replacement for reference CModulus/bluestein/PGFFT
(/root/reference/src/CModulus.cpp, src/bluestein.cpp):

  * power-of-2 m  : negacyclic radix-2 NTT of size N = m/2 over Z_q[X]/(X^N+1)
  * odd m         : full m-point cyclic DFT via Bluestein, with the length-B
                    (B = 2^ceil(lg(2m-1))) convolutions done EXACTLY over three
                    global 30-bit auxiliary primes ≡ 1 mod 2^18 and CRT'd back
                    mod q.  (The reference does the same trick through NTL's
                    fftRep FFT primes.)

Design notes:
  * Stage twiddle tables are built by symbolic recursion on root exponents —
    the output ("evaluation") ordering is *generated* as `eval_exponents`,
    and every downstream table (automorphism permutations, encode maps) is
    built against that ordering.  No bit-reversal passes on device.
  * For odd m, ring elements are represented mod X^m - 1 (evaluations at ALL
    m-th roots of unity), not mod Phi_m: this removes on-device polynomial
    division entirely (reference iFFT divides by Phi_m, CModulus.h:89) and
    makes automorphisms clean index permutations.  Reduction mod Phi_m happens
    once, on the host, at the decrypt/decode boundary.
  * Data layout: [..., L, N] uint32 residues; per-limb primes broadcast [L, 1].

All transforms are pure jnp (jit-traceable); Pallas fusions replace the hot
loops without changing these semantics.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from ..nt.numbth import root_of_unity, inv_mod
from ..nt.primegen import gen_aux_primes, AUX_POW2
from .modops import (add_mod, sub_mod, mul_mod_shoup, shoup, reduce_u32, U32)
from ..exceptions import assert_true


def _host(a):
    """Tables stay HOST-resident numpy.  Slicing/subsetting them (per prime
    rows, per shard) is then pure host work — no per-slice XLA gather
    compiles, which at round 3 cost ~640 tiny remote compilations per
    Context over the TPU tunnel.  The jit const-lifting layer
    (jitutil.lifted_jit) uploads each table to the device exactly once, the
    first time a compiled program takes it as an argument."""
    return np.ascontiguousarray(a)


# ---------------------------------------------------------------------------
# table construction (host, exact ints / uint64 numpy)
# ---------------------------------------------------------------------------

def _spectral_fine(kh: np.ndarray) -> np.ndarray:
    """Host-side spectral_fine_layout (numpy): [..., n] -> [..., 128, n/128]."""
    from .pallas_ntt import spectral_fine_layout
    return spectral_fine_layout(kh)


def power_table(r: int, q: int, length: int) -> np.ndarray:
    """[1, r, r^2, ..., r^(length-1)] mod q, vectorized (q < 2^31)."""
    pw = np.array([1], dtype=np.uint64)
    q64 = np.uint64(q)
    while len(pw) < length:
        step = pow(r, len(pw), q)
        pw = np.concatenate([pw, pw * np.uint64(step) % q64])
    return pw[:length].astype(np.uint32)


def _np_barrett(x: np.ndarray, q: np.ndarray, mu: np.ndarray) -> np.ndarray:
    """x < 2^60 mod q (q in (2^29,2^30)) without u64 division (numpy u64
    division is scalar-slow; this is ~10x faster at table-build time)."""
    t = ((x >> np.uint64(29)) * mu) >> np.uint64(32)
    r = x - t * q
    r = np.where(r >= q, r - q, r)
    return np.where(r >= q, r - q, r)


def ntt_np(x: np.ndarray, stage_tw: list[np.ndarray], qs: np.ndarray):
    """Host numpy forward NTT (same stage structure as the device kernel);
    x [..., P, n] uint64, stage_tw[s] [P, 2^s] uint64, qs [P] uint64.
    Used only at table-build time."""
    n = x.shape[-1]
    q = qs[:, None, None].astype(np.uint64)
    mu = ((np.uint64(1) << np.uint64(61)) // q)
    x = x.astype(np.uint64)
    for s, w in enumerate(stage_tw):
        m = 1 << s
        half = n // (2 * m)
        xr = x.reshape(*x.shape[:-1], m, 2, half)
        u, v = xr[..., 0, :], xr[..., 1, :]
        wv = _np_barrett(v * w[..., :, None].astype(np.uint64), q, mu)
        s1 = u + wv
        s1 = np.where(s1 >= q, s1 - q, s1)
        s2 = u + q - wv
        s2 = np.where(s2 >= q, s2 - q, s2)
        x = np.stack([s1, s2], axis=-2).reshape(*x.shape[:-1], n)
    return x


def _stage_exponents(n: int, e0: int, ord_root: int):
    """Symbolic DIT splitting.  Block i at stage s represents reduction mod
    (X^(n/2^s) - r^E[i]) for a root r of order `ord_root`.  Returns
    (per-stage twiddle exponent lists, final evaluation exponents)."""
    stages = []
    E = [e0]
    while len(E) < n:
        tw = [e // 2 for e in E]
        stages.append(tw)
        E = [x for e in tw for x in (e, e + ord_root // 2)]
    return stages, E


@dataclass
class Pow2NTT:
    """Tables for batched radix-2 NTT over primes qs, transform size n.

    negacyclic=True : ring Z_q[X]/(X^n+1), root psi of order 2n.
    negacyclic=False: cyclic DFT of size n, root omega of order n.
    """
    qs: np.ndarray            # [P] uint32
    n: int
    negacyclic: bool
    q_d: jnp.ndarray = field(init=False)            # [P, 1]
    tw: list = field(init=False)                    # stage s: [P, 2^s]
    tw_sh: list = field(init=False)
    itw: list = field(init=False)
    itw_sh: list = field(init=False)
    ninv: jnp.ndarray = field(init=False)           # [P, 1]
    ninv_sh: jnp.ndarray = field(init=False)
    eval_exponents: np.ndarray = field(init=False)  # [n] exponents of the root
    roots: list = field(init=False)

    def __post_init__(self):
        n = self.n
        qs = np.asarray(self.qs, dtype=np.uint64)
        assert_true(n & (n - 1) == 0, 'invariant: n & (n - 1) == 0')
        ordr = 2 * n if self.negacyclic else n
        e0 = n if self.negacyclic else 0
        stage_exps, eval_exps = _stage_exponents(n, e0, ordr)
        self.eval_exponents = np.array(eval_exps, dtype=np.int64)
        self.roots = [root_of_unity(ordr, int(q)) for q in qs]
        # full power tables per prime: [P, ordr]
        pw = np.stack([power_table(r, int(q), ordr)
                       for r, q in zip(self.roots, qs)])
        # Build ALL tables host-side in numpy first, then ship to device in
        # one pass: mixing jnp/np here costs a device round trip PER TABLE
        # (~2s each over a remote-TPU tunnel; was ~190s of Context setup).
        np_tw, np_tw_sh, np_itw, np_itw_sh = [], [], [], []
        for exps in stage_exps:
            e = np.array(exps, dtype=np.int64) % ordr
            wt = pw[:, e]
            iwt = pw[:, (-e) % ordr]
            np_tw.append(wt.astype(np.uint32))
            np_tw_sh.append(shoup(wt, qs[:, None]))
            np_itw.append(iwt.astype(np.uint32))
            np_itw_sh.append(shoup(iwt, qs[:, None]))
        self.tw = [_host(a) for a in np_tw]
        self.tw_sh = [_host(a) for a in np_tw_sh]
        self.itw = [_host(a) for a in np_itw]
        self.itw_sh = [_host(a) for a in np_itw_sh]
        self.np_tw = [a.astype(np.uint64) for a in np_tw]
        ninv = np.array([inv_mod(n, int(q)) for q in qs], dtype=np.uint32)[:, None]
        ninv_sh = shoup(ninv, qs[:, None])
        self.ninv = _host(ninv)
        self.ninv_sh = _host(ninv_sh)
        self.q_d = _host(qs.astype(np.uint32)[:, None])
        # concatenated "br-layout" tables for the fused Pallas kernel:
        # stage s occupies entries [2^s, 2^(s+1)); entry 0 = n^{-1} (inverse).
        # Stages consumed as the SECOND member of a radix-4 composite pair
        # (pallas_ntt._schedule) are stored even/odd-deinterleaved:
        # [2m:3m] = blocks 2i, [3m:4m] = blocks 2i+1 — so the kernel only
        # ever does plain slices + trailing broadcasts (no in-kernel
        # lane-splitting table reshapes, which Mosaic rejects).
        def _eo(seg):
            return np.concatenate([seg[:, 0::2], seg[:, 1::2]], axis=1)

        cat = np.concatenate([np.zeros((len(qs), 1), np.uint32)] + np_tw,
                             axis=1)
        icat = np.concatenate([ninv] + np_itw, axis=1)
        cat_sh = np.concatenate([np.zeros((len(qs), 1), np.uint32)]
                                + np_tw_sh, axis=1)
        icat_sh = np.concatenate([ninv_sh] + np_itw_sh, axis=1)
        stages = n.bit_length() - 1
        if n >= 256:
            from .pallas_ntt import fine_layout, _schedule
            coarse = stages - 7
            _, coarse_pairs = _schedule(0, coarse)
            for _, s1 in coarse_pairs:
                m1 = 1 << s1
                cat[:, m1:2 * m1] = _eo(np_tw[s1])
                cat_sh[:, m1:2 * m1] = _eo(np_tw_sh[s1])
                icat[:, m1:2 * m1] = _eo(np_itw[s1])
                icat_sh[:, m1:2 * m1] = _eo(np_itw_sh[s1])
            # fine-phase (transposed) tables for the fused Pallas kernel
            fine_single, fine_pairs = _schedule(max(coarse, 0), stages)
            fine = np.zeros_like(cat)
            fine_sh = np.zeros_like(cat)
            ifine = np.zeros_like(cat)
            ifine_sh = np.zeros_like(cat)

            def put(dst, s, seg, second):
                m = 1 << s
                if second:
                    h = m // 2
                    dst[:, m:m + h] = fine_layout(seg[:, 0::2], n)
                    dst[:, m + h:2 * m] = fine_layout(seg[:, 1::2], n)
                else:
                    dst[:, m:2 * m] = fine_layout(seg, n)

            roles = ([(fine_single, False)] if fine_single is not None
                     else [])
            for s0, s1 in fine_pairs:
                roles += [(s0, False), (s1, True)]
            for s, second in roles:
                put(fine, s, np_tw[s], second)
                put(fine_sh, s, np_tw_sh[s], second)
                put(ifine, s, np_itw[s], second)
                put(ifine_sh, s, np_itw_sh[s], second)
            self.tw_fine = _host(fine)
            self.tw_fine_sh = _host(fine_sh)
            self.itw_fine = _host(ifine)
            self.itw_fine_sh = _host(ifine_sh)
            # lane-pre-expanded coarse tables for the sublane-butterfly
            # coarse phase: [P, A, 1, LANE]
            from .pallas_ntt import coarse3_layout
            self.tw_cat3 = _host(coarse3_layout(cat, n))
            self.tw_cat3_sh = _host(coarse3_layout(cat_sh, n))
            self.itw_cat3 = _host(coarse3_layout(icat, n))
            self.itw_cat3_sh = _host(coarse3_layout(icat_sh, n))
        else:
            self.tw_fine = self.tw_fine_sh = None
            self.itw_fine = self.itw_fine_sh = None
            self.tw_cat3 = self.tw_cat3_sh = None
            self.itw_cat3 = self.itw_cat3_sh = None
        self.tw_cat = _host(cat)
        self.tw_cat_sh = _host(cat_sh)
        self.itw_cat = _host(icat)
        self.itw_cat_sh = _host(icat_sh)

    def tree(self):
        """Pytree of device tables (passed through jit boundaries)."""
        out = {"q": self.q_d, "tw": self.tw, "tw_sh": self.tw_sh,
               "itw": self.itw, "itw_sh": self.itw_sh,
               "ninv": self.ninv, "ninv_sh": self.ninv_sh}
        if self.tw_fine is not None:
            out.update({"tw_cat": self.tw_cat, "tw_cat_sh": self.tw_cat_sh,
                        "itw_cat": self.itw_cat,
                        "itw_cat_sh": self.itw_cat_sh,
                        "tw_cat3": self.tw_cat3,
                        "tw_cat3_sh": self.tw_cat3_sh,
                        "itw_cat3": self.itw_cat3,
                        "itw_cat3_sh": self.itw_cat3_sh,
                        "tw_fine": self.tw_fine,
                        "tw_fine_sh": self.tw_fine_sh,
                        "itw_fine": self.itw_fine,
                        "itw_fine_sh": self.itw_fine_sh})
        return out


def _broadcast_tree(t, k: int):
    """Insert an axis after the prime axis in every table so the NTT can run
    with extra batch dims between P and the transform axis."""
    def exp(a):
        return a.reshape(a.shape[0], *([1] * k), *a.shape[1:])
    out = {"q": exp(t["q"]), "ninv": exp(t["ninv"]),
           "ninv_sh": exp(t["ninv_sh"]),
           "tw": [exp(a) for a in t["tw"]],
           "tw_sh": [exp(a) for a in t["tw_sh"]],
           "itw": [exp(a) for a in t["itw"]],
           "itw_sh": [exp(a) for a in t["itw_sh"]]}
    for key in ("tw_cat", "tw_cat_sh", "itw_cat", "itw_cat_sh",
                "tw_cat3", "tw_cat3_sh", "itw_cat3", "itw_cat3_sh",
                "tw_fine", "tw_fine_sh", "itw_fine", "itw_fine_sh"):
        if key in t:
            out[key] = exp(t[key])
    return out


USE_PALLAS: bool | None = None   # None = auto (fused kernel on TPU backends)


def _ntt_v2():
    """(enabled, max_k) for the v2 block-list kernels (pallas_ntt2).
    HELIB_NTT_V2=1 enables, HELIB_NTT_V2_K caps the composite size
    (empty/0 = whole-phase).  Off by default until the TPU A/B
    (benchmarks/kernel_v2_bench.py) picks the winner."""
    import os
    v = os.environ.get("HELIB_NTT_V2", "")
    if v not in ("1", "true"):
        return False, None
    k = os.environ.get("HELIB_NTT_V2_K", "")
    return True, (int(k) if k and k != "0" else None)


def _aux_shared(B: int) -> bool:
    """Shared-twiddle conv dispatch (pallas_conv_shared): one table block
    per AUX prime instead of per data row — ~8x less twiddle DMA per row
    block and ~3.5x less VMEM.  Default is the measured v5e A/B
    (results_r5.log kernel_aux_fixed, value-checked per size):

        B=4096  : 6.06 -> 5.03 us/row  (1.20x)  -> shared
        B=16384 : headline end-to-end 350 -> 330 ops/s (0.94x) -> per-row
        B=65536 : 41.4 -> 29.6 us/row  (1.40x)  -> shared

    HELIB_NTT_AUXSHARED=1/0 forces it on/off for every size."""
    import os
    v = os.environ.get("HELIB_NTT_AUXSHARED", "")
    if v in ("1", "true"):
        return True
    if v in ("0", "false"):
        return False
    return B != 16384


def _pallas_enabled() -> bool:
    if USE_PALLAS is not None:
        return USE_PALLAS
    try:
        import jax
        dd = jax.config.jax_default_device
        platform = dd.platform if dd is not None else jax.default_backend()
        return platform not in ("cpu", "gpu")
    except Exception:
        return False


# ---------------------------------------------------------------------------
# device transforms
# ---------------------------------------------------------------------------

def ntt_pow2_fwd(x, t):
    """x: [..., P, n] coefficients -> evaluations in `eval_exponents` order."""
    n = x.shape[-1]
    if (_pallas_enabled() and "tw_cat3" in t):
        from .pallas_ntt import apply_ntt, MIN_PALLAS_N, MAX_PALLAS_N
        if MIN_PALLAS_N <= n <= MAX_PALLAS_N:
            v2, max_k = _ntt_v2()
            if v2:
                from .pallas_ntt2 import apply_ntt2
                return apply_ntt2(x, t, t["q"], inverse=False, max_k=max_k)
            return apply_ntt(x, t, t["q"], inverse=False)
    q = t["q"][..., None]  # [.., P, 1, 1]
    for s, (w, ws) in enumerate(zip(t["tw"], t["tw_sh"])):
        m = 1 << s
        half = n // (2 * m)
        xr = x.reshape(*x.shape[:-1], m, 2, half)
        u, v = xr[..., 0, :], xr[..., 1, :]
        wv = mul_mod_shoup(v, w[..., :, None], ws[..., :, None], q)
        y = jnp.stack([add_mod(u, wv, q), sub_mod(u, wv, q)], axis=-2)
        x = y.reshape(*y.shape[:-3], n)
    return x


def ntt_pow2_inv(x, t):
    """Inverse of ntt_pow2_fwd (output: natural coefficient order)."""
    n = x.shape[-1]
    if (_pallas_enabled() and "itw_cat3" in t):
        from .pallas_ntt import apply_ntt, MIN_PALLAS_N, MAX_PALLAS_N
        if MIN_PALLAS_N <= n <= MAX_PALLAS_N:
            v2, max_k = _ntt_v2()
            if v2:
                from .pallas_ntt2 import apply_ntt2
                return apply_ntt2(x, t, t["q"], inverse=True, max_k=max_k)
            return apply_ntt(x, t, t["q"], inverse=True)
    q = t["q"][..., None]
    for s in reversed(range(len(t["itw"]))):
        w, ws = t["itw"][s], t["itw_sh"][s]
        m = 1 << s
        half = n // (2 * m)
        xr = x.reshape(*x.shape[:-1], m, 2, half)
        a, b = xr[..., 0, :], xr[..., 1, :]
        u = add_mod(a, b, q)
        d = sub_mod(a, b, q)
        v = mul_mod_shoup(d, w[..., :, None], ws[..., :, None], q)
        y = jnp.stack([u, v], axis=-2)
        x = y.reshape(*y.shape[:-3], n)
    return mul_mod_shoup(x, t["ninv"], t["ninv_sh"], t["q"])


# ---------------------------------------------------------------------------
# Bluestein general-m DFT
# ---------------------------------------------------------------------------

_AUX_CACHE: dict = {}


def aux_primes() -> np.ndarray:
    if "qs" not in _AUX_CACHE:
        _AUX_CACHE["qs"] = np.array(gen_aux_primes(3), dtype=np.uint32)
    return _AUX_CACHE["qs"]


def aux_ntt(B: int) -> Pow2NTT:
    key = ("ntt", B)
    if key not in _AUX_CACHE:
        _AUX_CACHE[key] = Pow2NTT(aux_primes(), B, negacyclic=False)
    return _AUX_CACHE[key]


@dataclass
class BluesteinTables:
    """Per-(prime set, m) tables for the full-m DFT mod each q in qs."""
    qs: np.ndarray                      # [P]
    m: int
    inverse: bool
    B: int = field(init=False)
    dev: dict = field(init=False)

    def __post_init__(self):
        m = self.m
        qs = np.asarray(self.qs, dtype=np.uint64)
        assert_true(m % 2 == 1, "Bluestein path expects odd m")
        B = 1 << int(np.ceil(np.log2(2 * m - 1)))
        assert_true(B <= (1 << AUX_POW2), 'invariant: B <= (1 << AUX_POW2)')
        self.B = B
        P = len(qs)
        raux = aux_primes().astype(np.uint64)
        nttB = aux_ntt(B)

        u_in = np.empty((P, m), dtype=np.uint32)
        u_out = np.empty((P, m), dtype=np.uint32)
        khat = np.empty((3, P, B), dtype=np.uint32)
        inv2 = (m + 1) // 2
        isq = (np.arange(m, dtype=np.int64) ** 2) % m
        for k, q in enumerate(qs):
            q = int(q)
            w = root_of_unity(m, q)
            if self.inverse:
                w = inv_mod(w, q)
            u = pow(w, inv2, q)
            upw = power_table(u, q, m)
            uipw = power_table(inv_mod(u, q), q, m)
            u_in[k] = upw[isq]
            if self.inverse:
                minv = np.uint64(inv_mod(m, q))
                u_out[k] = (u_in[k].astype(np.uint64) * minv % np.uint64(q)
                            ).astype(np.uint32)
            else:
                u_out[k] = u_in[k]
            # kernel bb[d] = u^{-d^2}, wrapped negative indices
            usq_inv = uipw[isq]
            bb = np.zeros(B, dtype=np.uint32)
            bb[:m] = usq_inv
            bb[B - m + 1:] = usq_inv[1:][::-1]
            b3 = bb[None, :].astype(np.uint64) % raux[:, None]
            khat[:, k, :] = ntt_np(b3, nttB.np_tw, raux).astype(np.uint32)

        R = int(raux[0]) * int(raux[1]) * int(raux[2])
        Rt = [R // int(r) for r in raux]
        yt_inv = np.array([inv_mod(Rt[t] % int(raux[t]), int(raux[t]))
                           for t in range(3)], dtype=np.uint32)
        Rt_mod_q = np.array([[Rt[t] % int(q) for q in qs] for t in range(3)],
                            dtype=np.uint32)           # [3, P]
        negR_mod_q = np.array([(-R) % int(q) for q in qs], dtype=np.uint32)

        qs32 = qs.astype(np.uint32)
        self.dev = {
            "q": _host(qs32[:, None]),                       # [P,1]
            "aux_q": _host(aux_primes()[:, None, None]),     # [3,1,1]
            "u_in": _host(u_in),
            "u_in_sh": _host(shoup(u_in, qs[:, None])),
            "u_out": _host(u_out),
            "u_out_sh": _host(shoup(u_out, qs[:, None])),
            "khat": _host(khat),                             # [3,P,B]
            "khat_sh": _host(shoup(khat, raux[:, None, None])),
            "yt_inv": _host(yt_inv[:, None, None]),
            "yt_inv_sh": _host(shoup(yt_inv, raux)[:, None, None]),
            "Rt_mod_q": _host(Rt_mod_q[:, :, None]),         # [3,P,1]
            "Rt_mod_q_sh": _host(shoup(Rt_mod_q, qs[None, :])[:, :, None]),
            "negR": _host(negR_mod_q[:, None]),              # [P,1]
            "negR_sh": _host(shoup(negR_mod_q, qs)[:, None]),
            "inv_r_f32": _host((1.0 / raux.astype(np.float64))
                                     .astype(np.float32)[:, None, None]),
            "aux": _broadcast_tree(nttB.tree(), 1),                # P-broadcast
        }
        if B >= 256:
            # pre-relayouted for the fused conv kernel's transposed-domain
            # pointwise multiply: [3, P, LANE, B/LANE]
            khat_sh_np = shoup(khat, raux[:, None, None])
            self.dev["khat_f"] = _host(_spectral_fine(khat))
            self.dev["khat_f_sh"] = _host(_spectral_fine(khat_sh_np))


def bluestein_apply(x, t, m: int, B: int):
    """Full-m DFT (per table direction) of x: [..., P, m] -> [..., P, m]."""
    from .pallas_ntt import MIN_PALLAS_N, MAX_PALLAS_N
    q = t["q"]
    a = mul_mod_shoup(x, t["u_in"], t["u_in_sh"], q)           # [..., P, m]
    if (_pallas_enabled() and _aux_shared(B)
            and MIN_PALLAS_N <= B <= MAX_PALLAS_N and "tw_cat" in t["aux"]):
        # AUX-MAJOR shared-table path: build [3, ..., P, B] directly (no
        # transpose) and let each kernel grid step share ONE twiddle block
        # per aux prime (pallas_conv_shared)
        from .pallas_ntt import apply_conv_aux
        aux_q3 = t["aux_q"].reshape((3,) + (1,) * a.ndim)
        a3 = reduce_u32(a[None], aux_q3)                       # [3, ..., P, m]
        ap = jnp.pad(a3, [(0, 0)] * (a3.ndim - 1) + [(0, B - m)])
        p = apply_conv_aux(ap, t["aux"], t["khat_f"], t["khat_f_sh"],
                           t["aux_q"])
        ins = (1,) * (p.ndim - 3)
        y = mul_mod_shoup(p, t["yt_inv"].reshape((3,) + ins + (1, 1)),
                          t["yt_inv_sh"].reshape((3,) + ins + (1, 1)),
                          t["aux_q"].reshape((3,) + ins + (1, 1)))
        alpha = jnp.floor(
            jnp.sum(y.astype(jnp.float32)
                    * t["inv_r_f32"].reshape((3,) + ins + (1, 1)), axis=0)
            + jnp.float32(0.25)).astype(U32)                   # [..., P, B]
        Rt = t["Rt_mod_q"].reshape((3,) + ins + t["Rt_mod_q"].shape[1:])
        Rts = t["Rt_mod_q_sh"].reshape((3,) + ins
                                       + t["Rt_mod_q_sh"].shape[1:])
        terms = mul_mod_shoup(y, Rt, Rts, q[None])
        acc = add_mod(add_mod(terms[0], terms[1], q), terms[2], q)
        corr = mul_mod_shoup(alpha, t["negR"], t["negR_sh"], q)
        V = add_mod(acc, corr, q)[..., :m]
        return mul_mod_shoup(V, t["u_out"], t["u_out_sh"], q)
    a3 = reduce_u32(a[..., None, :, :], t["aux_q"])            # [..., 3, P, m]
    pad = [(0, 0)] * (a3.ndim - 1) + [(0, B - m)]
    ap = jnp.pad(a3, pad)
    if (_pallas_enabled() and MIN_PALLAS_N <= B <= MAX_PALLAS_N
            and "tw_cat" in t["aux"]):
        # fully fused NTT -> pointwise khat -> iNTT in one VMEM kernel
        v2, max_k = _ntt_v2()
        if v2:
            from .pallas_ntt2 import apply_conv2
            p = apply_conv2(ap, t["aux"], t["khat_f"], t["khat_f_sh"],
                            t["aux_q"], kh_layout="fine", max_k=max_k)
        else:
            from .pallas_ntt import apply_conv
            p = apply_conv(ap, t["aux"], t["khat_f"], t["khat_f_sh"],
                           t["aux_q"], kh_layout="fine")
    else:
        A = ntt_pow2_fwd(ap, t["aux"])
        Pr = mul_mod_shoup(A, t["khat"], t["khat_sh"], t["aux_q"])
        p = ntt_pow2_inv(Pr, t["aux"])                         # [..., 3, P, B]
    y = mul_mod_shoup(p, t["yt_inv"], t["yt_inv_sh"], t["aux_q"])
    alpha = jnp.floor(jnp.sum(y.astype(jnp.float32) * t["inv_r_f32"], axis=-3)
                      + jnp.float32(0.25)).astype(U32)         # [..., P, B]
    terms = mul_mod_shoup(y, t["Rt_mod_q"], t["Rt_mod_q_sh"], q[None])
    acc = add_mod(add_mod(terms[..., 0, :, :], terms[..., 1, :, :], q),
                  terms[..., 2, :, :], q)
    corr = mul_mod_shoup(alpha, t["negR"], t["negR_sh"], q)
    V = add_mod(acc, corr, q)[..., :m]
    return mul_mod_shoup(V, t["u_out"], t["u_out_sh"], q)
