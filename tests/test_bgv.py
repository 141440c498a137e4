"""End-to-end BGV tests against a host plaintext-polynomial oracle.

Mirrors reference tests/TestBGV.cpp: encrypted op vs the same op on plaintext
polys mod (Phi_m, p^r), exact equality (SURVEY.md §4 oracle pattern)."""

import math

import numpy as np
import pytest

from helib_tpu.context import Context
from helib_tpu.keys import SecKey, PubKey, reduce_mod_phim
from helib_tpu import dcrt


def poly_mul_mod(a, b, ctx, pr):
    """Oracle: product mod (Phi_m, pr) — via mod X^m-1 (odd) / X^N+1 (pow2)."""
    if ctx.pal.pow2:
        n = ctx.n_eval
        full = np.zeros(2 * n, dtype=np.int64)
        for i, ai in enumerate(a):
            if ai:
                full[i:i + n] = (full[i:i + n] + int(ai) * np.asarray(b)) % pr
        return (full[:n] - full[n:]) % pr
    m = ctx.m
    full = np.zeros(m, dtype=np.int64)
    for i, ai in enumerate(a):
        if ai:
            for j, bj in enumerate(b):
                full[(i + j) % m] = (full[(i + j) % m] + int(ai) * int(bj)) % pr
    return reduce_mod_phim(full, ctx, pr)


def poly_automorph(a, kexp, ctx, pr):
    """Oracle: f(X) -> f(X^kexp) mod (Phi_m, pr)."""
    if ctx.pal.pow2:
        n = ctx.n_eval
        out = np.zeros(n, dtype=np.int64)
        for i, ai in enumerate(a):
            if ai:
                e = (i * kexp) % (2 * n)
                sgn = 1 if e < n else -1
                out[e % n] = (out[e % n] + sgn * int(ai)) % pr
        return out % pr
    m = ctx.m
    out = np.zeros(m, dtype=np.int64)
    for i, ai in enumerate(a):
        out[(i * kexp) % m] = (out[(i * kexp) % m] + int(ai)) % pr
    return reduce_mod_phim(out, ctx, pr)


def pad_phim(x, ctx):
    out = np.zeros(ctx.phi_m, dtype=np.int64)
    out[:len(x)] = x
    return out


@pytest.fixture(scope="module", params=[
    dict(m=45, p=2, r=1, bits=150, c=3),
    dict(m=45, p=19, r=1, bits=150, c=3),
    dict(m=64, p=17, r=1, bits=120, c=2),   # pow2 m
    dict(m=45, p=2, r=3, bits=150, c=3),    # p^r plaintext space
])
def setup(request):
    ctx = Context(scheme="bgv", **request.param)
    sk = SecKey(ctx, seed=42)
    pk = PubKey(sk)
    rng = np.random.default_rng(7)
    return ctx, sk, pk, rng


def rand_ptxt(ctx, rng):
    return rng.integers(0, ctx.ptxt_space, ctx.phi_m).astype(np.int64)


def test_encrypt_decrypt(setup):
    ctx, sk, pk, rng = setup
    pt = rand_ptxt(ctx, rng)
    ct = pk.encrypt_bgv(pt, rng)
    assert ct.is_correct(), ct.capacity()
    dec = sk.decrypt_bgv(ct)
    np.testing.assert_array_equal(dec, pt % ctx.ptxt_space)


def test_noise_estimate_sane(setup):
    ctx, sk, pk, rng = setup
    ct = pk.encrypt_bgv(rand_ptxt(ctx, rng), rng)
    actual = sk.noise_of(ct)
    # estimated bound must dominate actual noise but not be absurdly loose
    assert actual <= ct.noise + 0.5, (actual, ct.noise)
    assert ct.noise - actual < 25, (actual, ct.noise)


def test_add_sub(setup):
    ctx, sk, pk, rng = setup
    p1, p2 = rand_ptxt(ctx, rng), rand_ptxt(ctx, rng)
    c1, c2 = pk.encrypt_bgv(p1, rng), pk.encrypt_bgv(p2, rng)
    c3 = c1.copy().add(c2)
    np.testing.assert_array_equal(sk.decrypt_bgv(c3),
                                  (p1 + p2) % ctx.ptxt_space)
    c4 = c1.copy().sub(c2)
    np.testing.assert_array_equal(sk.decrypt_bgv(c4),
                                  (p1 - p2) % ctx.ptxt_space)


def test_add_constant(setup):
    ctx, sk, pk, rng = setup
    p1, p2 = rand_ptxt(ctx, rng), rand_ptxt(ctx, rng)
    c1 = pk.encrypt_bgv(p1, rng)
    c1.add_constant_poly(p2)
    np.testing.assert_array_equal(sk.decrypt_bgv(c1),
                                  (p1 + p2) % ctx.ptxt_space)


def test_mul_constant(setup):
    ctx, sk, pk, rng = setup
    p1, p2 = rand_ptxt(ctx, rng), rand_ptxt(ctx, rng)
    c1 = pk.encrypt_bgv(p1, rng)
    c1.mul_constant_poly(p2)
    np.testing.assert_array_equal(sk.decrypt_bgv(c1),
                                  pad_phim(poly_mul_mod(p1, p2, ctx,
                                                        ctx.ptxt_space), ctx))


def test_fat_constants(setup):
    """FatEncodedPtxt (device-resident constant, reference EncodedPtxt.h:
    200-355): mul/add via the cached full-row eval tensor must agree with
    the per-use host encode path, including after a mod-down."""
    from helib_tpu.encoded import EncodedPtxt, FatEncodedPtxt
    ctx, sk, pk, rng = setup
    p1, p2 = rand_ptxt(ctx, rng), rand_ptxt(ctx, rng)
    ep = EncodedPtxt(p2, space=ctx.ptxt_space)
    fat = ep.fat(ctx)
    c1 = pk.encrypt_bgv(p1, rng)
    c1.bring_to_k(max(2, ctx.L - 2))    # exercise row slicing at k < L
    ca, cb = c1.copy(), c1.copy()
    ca.mul_constant_poly(p2)
    cb.mul_constant_fat(fat)
    np.testing.assert_array_equal(sk.decrypt_bgv(ca), sk.decrypt_bgv(cb))
    cc, cd = c1.copy(), c1.copy()
    cc.add_constant_poly(p2)
    cd.add_constant_fat(fat)
    np.testing.assert_array_equal(sk.decrypt_bgv(cc), sk.decrypt_bgv(cd))


def test_encode_ptxt_api(setup):
    """First-class EncodedPtxt surface (reference EncryptedArray::encode +
    Ctxt::multByConstant/addConstant overloads, EncodedPtxt.h:142): the
    slot-level encode_ptxt object routes through mul_by_constant /
    add_constant in both host and fat form and matches the slotwise
    oracle."""
    from helib_tpu.ea import EncryptedArray
    ctx, sk, pk, rng = setup
    ea = EncryptedArray(ctx)
    vals = rng.integers(0, ctx.ptxt_space, ea.nslots)
    mult = rng.integers(0, ctx.ptxt_space, ea.nslots)
    ct = ea.encrypt(list(vals), pk, rng)
    ep = ea.encode_ptxt(list(mult))
    assert ep.is_bgv and ep.space == ctx.ptxt_space
    ca, cb = ct.copy(), ct.copy()
    ca.mul_by_constant(ep)
    cb.mul_by_constant(ep.fat(ctx))
    expect = (vals * mult) % ctx.ptxt_space
    np.testing.assert_array_equal(ea.decrypt_ints(ca, sk), expect)
    np.testing.assert_array_equal(ea.decrypt_ints(cb, sk), expect)
    cc = ct.copy()
    cc.add_constant(ep)
    np.testing.assert_array_equal(ea.decrypt_ints(cc, sk),
                                  (vals + mult) % ctx.ptxt_space)


def test_multiply_relin(setup):
    ctx, sk, pk, rng = setup
    p1, p2 = rand_ptxt(ctx, rng), rand_ptxt(ctx, rng)
    c1, c2 = pk.encrypt_bgv(p1, rng), pk.encrypt_bgv(p2, rng)
    c3 = c1.multiply(c2, sk)
    assert c3.is_correct(), c3.capacity()
    expect = pad_phim(poly_mul_mod(p1, p2, ctx, ctx.ptxt_space), ctx)
    np.testing.assert_array_equal(sk.decrypt_bgv(c3), expect)


def test_multiply_chain(setup):
    ctx, sk, pk, rng = setup
    pt = rand_ptxt(ctx, rng)
    ct = pk.encrypt_bgv(pt, rng)
    expect = pt.copy()
    for _ in range(3):
        ct = ct.square(sk)
        expect = pad_phim(poly_mul_mod(expect, expect, ctx, ctx.ptxt_space),
                          ctx)
        assert ct.is_correct(), (ct.capacity(), ct.k)
    np.testing.assert_array_equal(sk.decrypt_bgv(ct), expect)


def test_automorph(setup):
    ctx, sk, pk, rng = setup
    pt = rand_ptxt(ctx, rng)
    # pick a unit kexp
    kexp = next(x for x in range(2, ctx.m) if math.gcd(x, ctx.m) == 1)
    ct = pk.encrypt_bgv(pt, rng)
    ct.smart_automorph(kexp, sk)
    assert ct.is_correct()
    expect = pad_phim(poly_automorph(pt, kexp, ctx, ctx.ptxt_space), ctx)
    np.testing.assert_array_equal(sk.decrypt_bgv(ct), expect)


def test_mod_down_explicit(setup):
    ctx, sk, pk, rng = setup
    pt = rand_ptxt(ctx, rng)
    ct = pk.encrypt_bgv(pt, rng)
    ct.bring_to_k(max(2, ctx.L - 2))
    np.testing.assert_array_equal(sk.decrypt_bgv(ct), pt % ctx.ptxt_space)
    ct.bring_to_k(2)
    np.testing.assert_array_equal(sk.decrypt_bgv(ct), pt % ctx.ptxt_space)
