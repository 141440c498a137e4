"""EncryptedArray slot layer tests (oracle: numpy slot vectors).

Mirrors reference TestBGV.cpp slot tests + rotate/shift suites: encrypted
rotate/shift vs the same op on the plaintext slot vector, exact equality."""

import numpy as np
import pytest

from helib_tpu.context import Context
from helib_tpu.keys import SecKey, PubKey
from helib_tpu.ea import EncryptedArray


CASES = [
    dict(m=45, p=2, r=1, bits=180, c=3),    # nslots=3? d=ord_45(2)=12, phi=24 -> 2 slots
    dict(m=31, p=2, r=1, bits=180, c=3),    # d=5, 6 slots, 1 dim
    dict(m=45, p=19, r=1, bits=180, c=3),
    dict(m=257, p=2, r=1, bits=200, c=3),   # d=16, 16 slots
]


@pytest.fixture(scope="module", params=CASES)
def setup(request):
    ctx = Context(scheme="bgv", **request.param)
    sk = SecKey(ctx, seed=5)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rng = np.random.default_rng(11)
    return ctx, sk, pk, ea, rng


def test_encode_decode_roundtrip(setup):
    ctx, sk, pk, ea, rng = setup
    slots = rng.integers(0, ctx.ptxt_space, ea.nslots)
    poly = ea.encode(list(slots))
    dec = ea.decode_ints(poly)
    np.testing.assert_array_equal(dec, slots)


def test_encode_decode_full_slots(setup):
    ctx, sk, pk, ea, rng = setup
    slots = [rng.integers(0, ctx.ptxt_space, ea.d) for _ in range(ea.nslots)]
    poly = ea.encode(slots)
    dec = ea.decode(poly)
    for a, b in zip(dec, slots):
        np.testing.assert_array_equal(a, b)


def test_encrypt_roundtrip(setup):
    ctx, sk, pk, ea, rng = setup
    slots = rng.integers(0, ctx.ptxt_space, ea.nslots)
    ct = ea.encrypt(list(slots), pk, rng)
    np.testing.assert_array_equal(ea.decrypt_ints(ct, sk), slots)


def test_slotwise_mul(setup):
    ctx, sk, pk, ea, rng = setup
    s1 = rng.integers(0, ctx.ptxt_space, ea.nslots)
    s2 = rng.integers(0, ctx.ptxt_space, ea.nslots)
    c1 = ea.encrypt(list(s1), pk, rng)
    c2 = ea.encrypt(list(s2), pk, rng)
    c3 = c1.multiply(c2, sk)
    np.testing.assert_array_equal(ea.decrypt_ints(c3, sk),
                                  (s1 * s2) % ctx.ptxt_space)


def test_rotate_1d(setup):
    ctx, sk, pk, ea, rng = setup
    pal = ctx.pal
    slots = rng.integers(0, ctx.ptxt_space, ea.nslots)
    for dim in range(len(pal.orders)):
        D = pal.orders[dim]
        for amt in {1, D - 1, D // 2} - {0}:
            ct = ea.encrypt(list(slots), pk, rng)
            out = ea.rotate_1d(ct, dim, amt, sk)
            got = ea.decrypt_ints(out, sk)
            # oracle: rotate coordinates along dim
            expect = np.zeros(ea.nslots, dtype=np.int64)
            for s in range(ea.nslots):
                cs = list(pal.coords(s))
                cs[dim] = (cs[dim] + amt) % D
                expect[pal.slot_index(cs)] = slots[s]
            np.testing.assert_array_equal(got, expect), (dim, amt)


def test_rotate_global(setup):
    ctx, sk, pk, ea, rng = setup
    slots = rng.integers(0, ctx.ptxt_space, ea.nslots)
    for amt in {1, ea.nslots - 1, ea.nslots // 2} - {0}:
        ct = ea.encrypt(list(slots), pk, rng)
        out = ea.rotate(ct, amt, sk)
        got = ea.decrypt_ints(out, sk)
        np.testing.assert_array_equal(got, np.roll(slots, amt), err_msg=str(amt))


def test_shift_1d(setup):
    ctx, sk, pk, ea, rng = setup
    pal = ctx.pal
    slots = rng.integers(0, ctx.ptxt_space, ea.nslots)
    dim = 0
    D = pal.orders[dim]
    amt = 1
    ct = ea.encrypt(list(slots), pk, rng)
    out = ea.shift_1d(ct, dim, amt, sk)
    got = ea.decrypt_ints(out, sk)
    expect = np.zeros(ea.nslots, dtype=np.int64)
    for s in range(ea.nslots):
        cs = list(pal.coords(s))
        if cs[dim] + amt < D:
            cs[dim] += amt
            expect[pal.slot_index(cs)] = slots[s]
    np.testing.assert_array_equal(got, expect)


def test_frobenius_slotwise(setup):
    """Frobenius x -> x^p acts within each slot."""
    ctx, sk, pk, ea, rng = setup
    if ea.d == 1:
        pytest.skip("trivial for d=1")
    slots = rng.integers(0, ctx.ptxt_space, ea.nslots)
    ct = ea.encrypt(list(slots), pk, rng)
    ct.frobenius(1, sk)
    got = ea.decrypt_ints(ct, sk)
    # constants are fixed by Frobenius (they live in Z_p^r... only for r=1
    # and integer slots: c^p = c in the prime field)
    if ctx.r == 1:
        np.testing.assert_array_equal(got, (slots.astype(object) ** ctx.p)
                                      % ctx.p)
