"""RNS ring-element data plane ("DoubleCRT").

TPU-native equivalent of reference DoubleCRT (/root/reference/src/DoubleCRT.cpp):
a ring element is a uint32 residue tensor [P, N] kept permanently in the
evaluation (NTT) domain; P rows = live primes (prefix of ctxt chain +
optionally the special primes), N = evaluation width (phi(m) for pow2 m / m
for odd m, see ops/ntt.py).

Key TPU-first departures from the reference:
  * `scaleDownToSet` (reference DoubleCRT.cpp:1464, via bignum toPoly) is
    replaced by a pure-RNS scaled mod-down: the dropped block is basis-
    extended onto the surviving primes with a float-corrected CRT lift, and
    the BGV "delta ≡ 0 (mod p^r)" fix-up is computed in RNS as well.  No
    arbitrary-precision arithmetic on the hot path.
  * `addPrimesAndScale` (DoubleCRT.cpp:603) is the trivial scale-by-P with
    zero-filled new rows (value*P ≡ 0 mod new primes) — same as reference.
  * `breakIntoDigits` (DoubleCRT.cpp:479) becomes mixed-radix digit
    decomposition with balanced RNS basis extension per digit.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from .context import Context
from .ops import modops
from .ops.modops import (add_mod, sub_mod, neg_mod, mul_mod, mul_mod_shoup,
                         U32, U64)
from .exceptions import assert_true


# ---------------------------------------------------------------------------
# elementwise ring ops (eval domain; shapes [..., P, N])
# ---------------------------------------------------------------------------

def rt_add(ctx: Context, a, b, k: int, special: bool):
    q, _ = ctx.dev_q(k, special)
    return add_mod(a, b, q)


def rt_sub(ctx: Context, a, b, k: int, special: bool):
    q, _ = ctx.dev_q(k, special)
    return sub_mod(a, b, q)


def rt_neg(ctx: Context, a, k: int, special: bool):
    q, _ = ctx.dev_q(k, special)
    return neg_mod(a, q)


def rt_mul(ctx: Context, a, b, k: int, special: bool):
    q, mu = ctx.dev_q(k, special)
    return mul_mod(a, b, q, mu)


def rt_mul_scalar(ctx: Context, a, value: int, k: int, special: bool):
    """Multiply by an integer constant (reduced per limb, Shoup)."""
    w, wsh, q = _scalar_consts(ctx, value, k, special)
    return mul_mod_shoup(a, w, wsh, q)


@lru_cache(maxsize=4096)
def _scalar_consts_np(ctx_id, value, k, special):
    ctx = _CTX_REGISTRY[ctx_id]
    qs = ctx.primes_of(k, special).astype(np.uint64)
    # exact for |value| beyond 64 bits via the python-int path
    w = np.array([value % int(q) for q in qs], dtype=np.uint32)[:, None]
    return w, modops.shoup(w, qs[:, None]).astype(np.uint32)


def _scalar_consts(ctx: Context, value: int, k: int, special: bool):
    w, wsh = _scalar_consts_np(_ctx_id(ctx), value, k, special)
    q, _ = ctx.dev_q(k, special)
    with jax.ensure_compile_time_eval():
        return jnp.asarray(w), jnp.asarray(wsh), q


def rt_automorph(ctx: Context, a, kexp: int):
    """f(X) -> f(X^kexp): pure index permutation along the eval axis
    (reference DoubleCRT.cpp:1160)."""
    perm = ctx.pal.automorph_perm(kexp)
    return a[..., jnp.asarray(perm)]


# ---------------------------------------------------------------------------
# context registry (lets lru_cache key on a context identity)
# ---------------------------------------------------------------------------

_CTX_REGISTRY: dict = {}


def _ctx_id(ctx: Context) -> int:
    i = id(ctx)
    _CTX_REGISTRY[i] = ctx
    return i


# ---------------------------------------------------------------------------
# coefficient <-> evaluation domain, integer I/O
# ---------------------------------------------------------------------------

def coeffs_to_residues(ctx: Context, coeffs, rows: tuple) -> np.ndarray:
    """Integer (possibly signed / bignum) coefficient vector -> residue matrix
    [len(rows), N] (host)."""
    qs = ctx.all_q[np.array(rows)]
    N = ctx.n_eval
    out = np.zeros((len(rows), N), dtype=np.uint32)
    arr = np.asarray(coeffs, dtype=object)
    assert_true(len(arr) <= N, (len(arr), N))
    for i, q in enumerate(qs):
        qi = int(q)
        out[i, :len(arr)] = np.array([int(v) % qi for v in arr],
                                     dtype=np.uint32)
    return out


def rt_from_coeffs(ctx: Context, coeffs, k: int, special: bool):
    """Host integer coefficients -> device eval-domain tensor."""
    rows = ctx.rows_of(k, special)
    res = coeffs_to_residues(ctx, coeffs, rows)
    return ctx.fwd_ntt(jnp.asarray(res), rows)


def rt_to_coeff_residues(ctx: Context, a, k: int, special: bool):
    """Device eval tensor -> coefficient-domain residues (device)."""
    return ctx.inv_ntt(a, ctx.rows_of(k, special))


def crt_reconstruct(ctx: Context, coeff_residues: np.ndarray, rows: tuple,
                    balanced: bool = True) -> np.ndarray:
    """Host: CRT-combine per-limb coefficient residues into (balanced)
    integers (object dtype).  The reference's toPoly bignum boundary
    (DoubleCRT.cpp:925-1110) — used only at decrypt/IO time.  Served by the
    native C++ limb kernels (native/crt_kernels.cpp) when built; pure-Python
    object-int fallback otherwise."""
    qs = [int(q) for q in ctx.all_q[np.array(rows)]]
    if balanced:
        from .nt.native import combiner_for
        comb = combiner_for(qs)
        if comb is not None:
            return comb.balanced_ints(coeff_residues)
    Q = 1
    for q in qs:
        Q *= q
    acc = np.zeros(coeff_residues.shape[-1], dtype=object)
    for i, qi in enumerate(qs):
        Qi = Q // qi
        ci = (Qi * pow(Qi % qi, -1, qi)) % Q
        acc = (acc + coeff_residues[i].astype(object) * ci) % Q
    if balanced:
        acc = np.where(acc > Q // 2, acc - Q, acc)
    return acc


# ---------------------------------------------------------------------------
# sampling (host RNG -> device NTT;  reference src/sample.cpp)
# ---------------------------------------------------------------------------

def sample_small(ctx: Context, rng: np.random.Generator):
    """Coefficients in {-1,0,1}: 0 w.p. 1/2, ±1 w.p. 1/4 each.
    Returns (coeffs int8 [N], log2 canonical bound)."""
    N = ctx.n_eval
    u = rng.integers(0, 4, N)
    coeffs = np.where(u == 0, -1, np.where(u == 1, 1, 0)).astype(np.int64)
    return coeffs, ctx.noise_small(0.5)


def sample_gaussian(ctx: Context, rng: np.random.Generator):
    sigma = ctx.eff_stdev()
    coeffs = np.round(rng.normal(0.0, sigma, ctx.n_eval)).astype(np.int64)
    return coeffs, ctx.noise_gaussian(sigma)


def sample_hwt(ctx: Context, rng: np.random.Generator, hwt: int):
    N = ctx.n_eval
    coeffs = np.zeros(N, dtype=np.int64)
    idx = rng.choice(N, size=min(hwt, N), replace=False)
    coeffs[idx] = rng.choice([-1, 1], size=len(idx))
    return coeffs, ctx.noise_hwt(hwt)


def _bounded(sampler, ctx: Context, rng, *args, tries: int = 1000):
    """Rejection wrapper: resample until the actual canonical-embedding norm
    is below the sampler's high-probability bound (reference sample.cpp
    sampleSmallBounded / sampleGaussianBounded / sampleHWtBounded, which
    retry up to 1000 times and warn on failure)."""
    from .norms import embedding_largest_coeff_log2
    coeffs = bound = None
    for _ in range(tries):
        coeffs, bound = sampler(ctx, rng, *args)
        actual = embedding_largest_coeff_log2(coeffs, ctx.m, ctx.pal.pow2)
        if actual <= bound:
            return coeffs, bound
    from .log import warning
    warning("bounded sampler: no sample within bound after retries", once=True)
    return coeffs, bound


def sample_small_bounded(ctx: Context, rng: np.random.Generator):
    return _bounded(sample_small, ctx, rng)


def sample_gaussian_bounded(ctx: Context, rng: np.random.Generator):
    return _bounded(sample_gaussian, ctx, rng)


def sample_hwt_bounded(ctx: Context, rng: np.random.Generator, hwt: int):
    return _bounded(sample_hwt, ctx, rng, hwt)


def sample_uniform_residues(ctx: Context, rng: np.random.Generator,
                            k: int, special: bool):
    """Uniform element of R_Q directly in the eval domain (valid because the
    eval map is a bijection on residues)."""
    qs = ctx.primes_of(k, special)
    return jnp.asarray(rng.integers(
        0, qs[:, None].astype(np.int64), (len(qs), ctx.n_eval)
    ).astype(np.uint32))


def sample_small_rt_dev(ctx: Context, key, k: int, special: bool):
    """Device-side sampleSmall: coeffs in {-1,0,1} (p=1/4,1/2,1/4) sampled
    with the jax PRNG, lifted to residues and NTT'd — the jit-able encryption
    hot path (host RNG remains the keygen path)."""
    import jax
    rows = ctx.rows_of(k, special)
    qs = jnp.asarray(ctx.all_q[np.array(rows)].astype(np.uint32)[:, None])
    u = jax.random.randint(key, (ctx.n_eval,), 0, 4)
    res = jnp.where(u == 0, qs - 1, jnp.where(u == 1, jnp.uint32(1),
                                              jnp.uint32(0)).astype(jnp.uint32))
    return ctx.fwd_ntt(res.astype(jnp.uint32), rows), ctx.noise_small(0.5)


def sample_gaussian_rt_dev(ctx: Context, key, k: int, special: bool,
                           mult: int = 1):
    """Device-side rounded-Gaussian sampler, optionally scaled by `mult`."""
    import jax
    rows = ctx.rows_of(k, special)
    qs = ctx.all_q[np.array(rows)].astype(np.int64)
    sigma = ctx.eff_stdev()
    g = jnp.round(jax.random.normal(key, (ctx.n_eval,)) * sigma
                  ).astype(jnp.int64) * mult
    res = (g[None, :] % jnp.asarray(qs)[:, None]).astype(jnp.uint32)
    return (ctx.fwd_ntt(res, rows),
            math.log2(max(mult, 1)) + ctx.noise_gaussian(sigma))


def small_coeffs_to_rt(ctx: Context, coeffs: np.ndarray, k: int, special: bool):
    """Signed small integer coefficients (len <= N, zero-padded) -> device
    eval tensor."""
    rows = ctx.rows_of(k, special)
    qs = ctx.all_q[np.array(rows)].astype(np.int64)
    c = np.zeros(ctx.n_eval, dtype=np.int64)
    c[:len(coeffs)] = coeffs
    res = (c[None, :] % qs[:, None]).astype(np.uint32)
    return ctx.fwd_ntt(jnp.asarray(res), rows)


# ---------------------------------------------------------------------------
# RNS basis extension + scaled mod-down
# ---------------------------------------------------------------------------

@lru_cache(maxsize=2048)
def _drop_consts(ctx_id, drop_rows: tuple, target_rows: tuple, ptxt_space: int):
    """Host constants for scaled mod-down dropping `drop_rows`.

    Returns numpy dict; see rt_scale_down for the algorithm."""
    ctx = _CTX_REGISTRY[ctx_id]
    d = ctx.all_q[np.array(drop_rows)].astype(np.uint64)
    t = ctx.all_q[np.array(target_rows)].astype(np.uint64)
    D = 1
    for x in d:
        D *= int(x)
    kd, T = len(d), len(t)
    c_i = np.array([pow((D // int(di)) % int(di), -1, int(di)) for di in d],
                   dtype=np.uint32)                       # (D/d_i)^{-1} mod d_i
    M = np.array([[(D // int(di)) % int(tj) for tj in t] for di in d],
                 dtype=np.uint32)                         # [kd, T]
    D_mod_t = np.array([D % int(tj) for tj in t], dtype=np.uint32)
    Dinv_mod_t = np.array([pow(D % int(tj), -1, int(tj)) for tj in t],
                          dtype=np.uint32)
    out = {
        "c": c_i[:, None], "c_sh": modops.shoup(c_i, d)[:, None],
        "M": M, "M_sh": modops.shoup(M, t[None, :]),
        "D_mod_t": D_mod_t[:, None],
        "D_mod_t_sh": modops.shoup(D_mod_t, t)[:, None],
        "Dinv_mod_t": Dinv_mod_t[:, None],
        "Dinv_mod_t_sh": modops.shoup(Dinv_mod_t, t)[:, None],
        "inv_d": (1.0 / d.astype(np.float64))[:, None],
    }
    if ptxt_space > 1:
        pr = ptxt_space
        assert_true(pr < (1 << 30), "ptxt space too large for RNS mod-down")
        out["M_pr"] = np.array([(D // int(di)) % pr for di in d],
                               dtype=np.uint64)[:, None]
        out["D_pr"] = np.uint64(D % pr)
        out["Dinv_pr"] = np.uint64(pow(D % pr, -1, pr) if pr > 1 else 0)
        out["pr"] = np.uint64(pr)
        prD = np.array([(pr * D) % int(tj) for tj in t], dtype=np.uint32)
        out["pr_D_mod_t"] = prD[:, None]
        out["pr_D_mod_t_sh"] = modops.shoup(prD, t)[:, None]
    # Convert OUTSIDE any active trace: these are lru_cached, and a device
    # array created while tracing is a tracer that would poison later traces.
    with jax.ensure_compile_time_eval():
        return {k2: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
                for k2, v in out.items()}


_JIT_CACHE: dict = {}


def _jit_call(key, builder, *args):
    """Dispatch a cached jit-compiled program for a pure tensor op keyed by
    its static configuration; falls back to eager composition when already
    inside a trace (hot compound ops otherwise pay per-primitive dispatch).

    Compiled via jitutil.lifted_jit so closed-over tables (NTT twiddles,
    digit/mod-down constants) become arguments instead of HLO constants —
    see jitutil for why (compile-payload size over the remote tunnel)."""
    import jax
    import jax.core
    if any(isinstance(a, jax.core.Tracer) for a in args):
        return builder()(*args)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        from .jitutil import lifted_jit
        fn = _JIT_CACHE[key] = lifted_jit(builder(), *args)
    return fn(*args)


def rt_scale_down(ctx: Context, data, k: int, special: bool,
                  new_k: int, new_special: bool, ptxt_space: int,
                  want_frac: bool = False):
    """Jit-cached wrapper of the scaled mod-down (see _rt_scale_down_impl).

    want_frac=True additionally returns the balanced delta/D fraction
    [..., N] (float32) — the exact mod-switch rounding remainder per
    coefficient, used by the measured-noise path (reference
    Ctxt.cpp:491-503).  It is a byproduct of values the kernel already
    computes, so requesting it costs only the [N]-float transfer."""
    key = ("scale_down", _ctx_id(ctx), k, special, new_k, new_special,
           ptxt_space, want_frac, jnp.shape(data))
    return _jit_call(key,
                     lambda: (lambda v: _rt_scale_down_impl(
                         ctx, v, k, special, new_k, new_special, ptxt_space,
                         want_frac)),
                     data)


def _rt_scale_down_impl(ctx: Context, data, k: int, special: bool,
                        new_k: int, new_special: bool, ptxt_space: int,
                        want_frac: bool = False):
    """Scaled mod-down (reference Ctxt::modDownToSet real-switching branch,
    Ctxt.cpp:465-516, in pure RNS).

    data: [P, N] eval tensor on prime set (k, special).  Returns data' on
    (new_k, new_special) with data' = (data - delta)/D where D is the product
    of dropped primes, delta ≡ data (mod D), delta ≡ 0 (mod ptxt_space), and
    delta balanced-small.
    """
    assert_true(new_k <= k and (special or not new_special), 'invariant: new_k <= k and (special or not new_special)')
    old_rows = ctx.rows_of(k, special)
    new_rows = ctx.rows_of(new_k, new_special)
    drop_rows = tuple(r for r in old_rows if r not in new_rows)
    assert_true(drop_rows, "nothing to drop")
    keep_pos = [old_rows.index(r) for r in new_rows]
    drop_pos = [old_rows.index(r) for r in drop_rows]

    with jax.ensure_compile_time_eval():
        cst = _drop_consts(_ctx_id(ctx), drop_rows, tuple(new_rows),
                           ptxt_space)
        d_q = jnp.asarray(
            ctx.all_q[np.array(drop_rows)].astype(np.uint32)[:, None])
    t_q, t_mu = ctx.dev_q(new_k, new_special)

    x_eval = data[..., jnp.asarray(np.array(drop_pos)), :]
    x_coeff = ctx.inv_ntt(x_eval, drop_rows)               # [kd, N]

    # balanced CRT lift of the dropped block
    y = mul_mod_shoup(x_coeff, cst["c"], cst["c_sh"], d_q)  # [kd, N]
    z = jnp.sum(y.astype(jnp.float64) * cst["inv_d"], axis=-2)
    alpha = jnp.floor(z)
    frac = z - alpha
    alpha_bf = alpha + (frac >= 0.5)
    # NOTE: the want_frac additions are strictly conditional so the
    # want_frac=False trace emits byte-identical HLO to rounds 2-4 (the
    # persistent compile cache hashes UNOPTIMIZED HLO — dead code would
    # miss the cache and recompile every big-ring scale-down shape).
    frac_bal = (z - alpha_bf) if want_frac else None  # delta0/D in [-1/2,1/2)
    alpha_b = alpha_bf.astype(U32)                          # balanced lift

    # delta0 mod each target prime
    kd = len(drop_rows)
    acc = None
    for i in range(kd):
        term = mul_mod_shoup(y[..., i:i + 1, :], cst["M"][i][:, None],
                             cst["M_sh"][i][:, None], t_q)
        acc = term if acc is None else add_mod(acc, term, t_q)
    corr = mul_mod_shoup(alpha_b[..., None, :], cst["D_mod_t"],
                         cst["D_mod_t_sh"], t_q)
    delta = sub_mod(acc, corr, t_q)                          # [T, N]

    if ptxt_space > 1:
        # v' mod p^r  (exact, u64 ops on small modulus)
        pr = cst["pr"]
        accp = jnp.zeros(x_coeff.shape[:-2] + (x_coeff.shape[-1],), dtype=U64)
        for i in range(kd):
            accp = accp + (y[..., i, :].astype(U64) * cst["M_pr"][i]) % pr
        accp = (accp + pr - (alpha_b.astype(U64) * cst["D_pr"]) % pr) % pr
        # eps = -v' * D^{-1} mod p^r
        eps = ((pr - accp) * cst["Dinv_pr"]) % pr            # [N] in [0, pr)
        half = pr // jnp.uint64(2)
        eps_hi = eps > half                                   # balanced lift
        if want_frac:
            # balanced eps joins the measured remainder: delta/D =
            # delta0/D + eps (both balanced)
            frac_bal = frac_bal + (eps.astype(jnp.float64)
                                   - eps_hi * jnp.float64(pr))
        eps32 = eps.astype(U32)
        contrib = mul_mod_shoup(eps32[..., None, :], cst["D_mod_t"],
                                cst["D_mod_t_sh"], t_q)
        wrap = jnp.where(eps_hi[..., None, :], cst["pr_D_mod_t"],
                         jnp.uint32(0))
        contrib = sub_mod(contrib, wrap, t_q)
        delta = add_mod(delta, contrib, t_q)

    delta_eval = ctx.fwd_ntt(delta, tuple(new_rows))
    kept = data[..., jnp.asarray(np.array(keep_pos)), :]
    out = sub_mod(kept, delta_eval, t_q)
    out = mul_mod_shoup(out, cst["Dinv_mod_t"], cst["Dinv_mod_t_sh"], t_q)
    if want_frac:
        return out, frac_bal.astype(jnp.float32)
    return out


def rt_add_special_and_scale(ctx: Context, data, k: int):
    """modUpToSet(specials): multiply by P = prod(special primes); new rows
    are zero (reference DoubleCRT::addPrimesAndScale, DoubleCRT.cpp:603)."""
    P = ctx.prod_special()
    scaled = rt_mul_scalar(ctx, data, P, k, False)
    zeros = jnp.zeros(data.shape[:-2] + (ctx.S, data.shape[-1]), dtype=U32)
    return jnp.concatenate([scaled, zeros], axis=-2)


# ---------------------------------------------------------------------------
# key-switching digit decomposition
# ---------------------------------------------------------------------------

@lru_cache(maxsize=1024)
def _digit_consts(ctx_id, k: int):
    """Constants for breakIntoDigits at live prefix k: per digit j, the
    balanced extension of the digit block onto ALL rows (k ctxt + specials),
    and the running division by the FULL digit product (mod live rows)."""
    ctx = _CTX_REGISTRY[ctx_id]
    all_rows = ctx.rows_of(k, True)
    t = ctx.all_q[np.array(all_rows)].astype(np.uint64)
    consts = []
    for (s, e) in ctx.digit_ranges(k):
        drows = tuple(range(s, e))
        d = ctx.all_q[np.array(drows)].astype(np.uint64)
        Dl = 1                                # live digit product
        for x in d:
            Dl *= int(x)
        c_i = np.array([pow((Dl // int(di)) % int(di), -1, int(di))
                        for di in d], dtype=np.uint32)
        M = np.array([[(Dl // int(di)) % int(tj) for tj in t] for di in d],
                     dtype=np.uint32)
        Dl_mod_t = np.array([Dl % int(tj) for tj in t], dtype=np.uint32)
        # FULL digit product (for the division matching W's B_j factors)
        fs, fe = ctx.digits[len(consts)]
        Df = 1
        for x in ctx.qs[fs:fe]:
            Df *= int(x)
        # inverse undefined on the digit's own primes; those rows of the
        # running value are never read after this digit — use 1 there.
        Dfinv_mod_t = np.array(
            [pow(Df % int(tj), -1, int(tj)) if Df % int(tj) != 0 else 1
             for tj in t], dtype=np.uint32)
        np_consts = {
            "c": c_i[:, None],
            "c_sh": modops.shoup(c_i, d)[:, None],
            "d_q": d.astype(np.uint32)[:, None],
            "M": M,
            "M_sh": modops.shoup(M, t[None, :]),
            "D_mod_t": Dl_mod_t[:, None],
            "D_mod_t_sh": modops.shoup(Dl_mod_t, t)[:, None],
            "Dfinv_mod_t": Dfinv_mod_t[:, None],
            "Dfinv_mod_t_sh": modops.shoup(Dfinv_mod_t, t)[:, None],
            "inv_d": (1.0 / d.astype(np.float64))[:, None],
        }
        # Convert OUTSIDE any active trace (lru_cached — see _drop_consts).
        with jax.ensure_compile_time_eval():
            entry = {k2: jnp.asarray(v) for k2, v in np_consts.items()}
        entry["rows"] = drows
        entry["log2_D"] = float(np.sum(np.log2(d.astype(np.float64))))
        consts.append(entry)
    return consts


def rt_break_into_digits(ctx: Context, data, k: int):
    """Jit-cached wrapper of the digit decomposition (see
    _rt_break_into_digits_impl); the noise bound is a pure function of the
    static constants and is computed host-side either way."""
    from .context import log2_sum
    consts = _digit_consts(_ctx_id(ctx), k)
    noise = log2_sum([ctx.noise_uniform(cst["log2_D"] - 1.0)
                      for cst in consts])
    key = ("digits", _ctx_id(ctx), k, jnp.shape(data))
    digits = _jit_call(key,
                       lambda: (lambda v: tuple(
                           _rt_break_into_digits_impl(ctx, v, k)[0])),
                       data)
    from . import timing
    if timing.fhe_stats:
        # noise-model validation: measured canonical-embedding norm of each
        # digit vs the bound charged to the noise estimate (reference
        # HELIB_STATS_UPDATE("break-into-digits-ratio"), DoubleCRT.cpp:548)
        from .norms import embedding_largest_coeff_log2
        all_rows = ctx.rows_of(k, True)
        for dj, cst in zip(digits, consts):
            res = np.asarray(rt_to_coeff_residues(ctx, dj, k, True))
            if res.ndim > 2:          # batched: measure the first element
                res = res.reshape(-1, *res.shape[-2:])[0]
            coeffs = crt_reconstruct(ctx, res, all_rows)
            norm_log2 = embedding_largest_coeff_log2(coeffs, ctx.m,
                                                     ctx.pal.pow2)
            bound_log2 = ctx.noise_uniform(cst["log2_D"] - 1.0)
            timing.stats_update("break-into-digits-ratio",
                                2.0 ** (norm_log2 - bound_log2))
    return list(digits), noise


def _rt_break_into_digits_impl(ctx: Context, data, k: int):
    """Mixed-radix digit decomposition (reference DoubleCRT::breakIntoDigits,
    DoubleCRT.cpp:479): data [k, N] on ctxt prefix (no specials) ->
    (digits, log2 noise) where digits is a list of [k+S, N] eval tensors
    R_j with data ≡ sum_j B_j R_j (mod Q_k), B_j = full digit products.

    The whole decomposition is per-coefficient, so it runs in the
    COEFFICIENT domain end to end: one inverse NTT of the live rows up
    front, the sequential digit recursion as cheap elementwise ops, and a
    single batched forward NTT of all digits at the end (vs one [k+S]-row
    transform per digit — 1/c the launches and c× the rows per launch,
    which is where the fused kernel's throughput is).
    """
    from .context import log2_sum
    with jax.ensure_compile_time_eval():
        consts = _digit_consts(_ctx_id(ctx), k)
    all_rows = ctx.rows_of(k, True)
    t_q, _ = ctx.dev_q(k, True)
    live_q = ctx.dev_q(k, False)[0]
    live_rows = ctx.rows_of(k, False)
    cur = ctx.inv_ntt(data, live_rows)          # [k, N] coefficients
    cur_eval = data                              # same value, eval domain
    digits = []
    noise_terms = []
    for j, cst in enumerate(consts):
        s, e = cst["rows"][0], cst["rows"][-1] + 1
        y = mul_mod_shoup(cur[..., s:e, :], cst["c"], cst["c_sh"],
                          cst["d_q"])
        z = jnp.sum(y.astype(jnp.float64) * cst["inv_d"], axis=-2)
        alpha = jnp.floor(z)
        alpha_b = (alpha + ((z - alpha) >= 0.5)).astype(U32)
        acc = None
        for i in range(e - s):
            term = mul_mod_shoup(y[..., i:i + 1, :], cst["M"][i][:, None],
                                 cst["M_sh"][i][:, None], t_q)
            acc = term if acc is None else add_mod(acc, term, t_q)
        corr = mul_mod_shoup(alpha_b[..., None, :], cst["D_mod_t"],
                             cst["D_mod_t_sh"], t_q)
        digit_coeff = sub_mod(acc, corr, t_q)          # [k+S, N] coefficients
        # R_j ≡ cur (mod each of its own primes), so the digit's own-prime
        # eval rows are the running value's eval rows, for free; only the
        # extension rows go through the forward NTT (k fewer transform rows
        # per decomposition than transforming every digit on every row).
        ext_rows = all_rows[:s] + all_rows[e:]
        ext_coeff = jnp.concatenate(
            [digit_coeff[..., :s, :], digit_coeff[..., e:, :]], axis=-2)
        ext_eval = ctx.fwd_ntt(ext_coeff, ext_rows)
        own_eval = cur_eval[..., s:e, :]
        digit_eval = jnp.concatenate(
            [ext_eval[..., :s, :], own_eval, ext_eval[..., s:, :]], axis=-2)
        digits.append(digit_eval)
        noise_terms.append(ctx.noise_uniform(cst["log2_D"] - 1.0))
        if j + 1 < len(consts):
            # cur <- (cur - R_j) / B_{digit j}, in both domains (the eval
            # update is pointwise, so the two stay consistent)
            sub = sub_mod(cur, digit_coeff[..., :k, :], live_q)
            cur = mul_mod_shoup(sub, cst["Dfinv_mod_t"][:k],
                                cst["Dfinv_mod_t_sh"][:k], live_q)
            sub_e = sub_mod(cur_eval, digit_eval[..., :k, :], live_q)
            cur_eval = mul_mod_shoup(sub_e, cst["Dfinv_mod_t"][:k],
                                     cst["Dfinv_mod_t_sh"][:k], live_q)
    return digits, log2_sum(noise_terms)
