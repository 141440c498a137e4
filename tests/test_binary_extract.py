"""Binary arithmetic + digit extraction tests
(mirrors reference GTestBinaryArith / GTestBinaryCompare / GTestExtractDigits)."""

import numpy as np
import pytest

from helib_tpu.context import Context
from helib_tpu.keys import SecKey, PubKey
from helib_tpu.ea import EncryptedArray
from helib_tpu.algos.binary import (add_two_numbers, add_many_numbers,
                                    mult_two_numbers, compare_two_numbers,
                                    encrypt_number, decrypt_number)
from helib_tpu.algos.extract import extract_digits, build_digit_polynomial


@pytest.fixture(scope="module")
def setup_p2():
    ctx = Context(m=31, p=2, r=1, bits=500, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=31)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rng = np.random.default_rng(37)
    return ctx, sk, pk, ea, rng


def test_add_two(setup_p2):
    ctx, sk, pk, ea, rng = setup_p2
    W = 4
    a = rng.integers(0, 1 << W, ea.nslots)
    b = rng.integers(0, 1 << W, ea.nslots)
    ca = encrypt_number(ea, pk, rng, a, W)
    cb = encrypt_number(ea, pk, rng, b, W)
    out = add_two_numbers(ea, ca, cb, sk)
    got = decrypt_number(ea, sk, out)
    np.testing.assert_array_equal(got, a + b)


def test_add_many(setup_p2):
    ctx, sk, pk, ea, rng = setup_p2
    W = 3
    vals = [rng.integers(0, 1 << W, ea.nslots) for _ in range(4)]
    encs = [encrypt_number(ea, pk, rng, v, W) for v in vals]
    out = add_many_numbers(ea, encs, sk)
    got = decrypt_number(ea, sk, out)
    np.testing.assert_array_equal(got, sum(vals))


def test_mult_two(setup_p2):
    ctx, sk, pk, ea, rng = setup_p2
    W = 3
    a = rng.integers(0, 1 << W, ea.nslots)
    b = rng.integers(0, 1 << W, ea.nslots)
    ca = encrypt_number(ea, pk, rng, a, W)
    cb = encrypt_number(ea, pk, rng, b, W)
    out = mult_two_numbers(ea, ca, cb, sk)
    got = decrypt_number(ea, sk, out)
    np.testing.assert_array_equal(got, a * b)


def test_compare(setup_p2):
    ctx, sk, pk, ea, rng = setup_p2
    W = 4
    a = rng.integers(0, 1 << W, ea.nslots)
    b = rng.integers(0, 1 << W, ea.nslots)
    b[0] = a[0]  # force an equal pair
    ca = encrypt_number(ea, pk, rng, a, W)
    cb = encrypt_number(ea, pk, rng, b, W)
    gt, eq = compare_two_numbers(ea, ca, cb, sk)
    np.testing.assert_array_equal(ea.decrypt_ints(gt, sk),
                                  (a > b).astype(np.int64))
    np.testing.assert_array_equal(ea.decrypt_ints(eq, sk),
                                  (a == b).astype(np.int64))


def test_digit_polynomial():
    for p, e in [(5, 3), (7, 2), (11, 2)]:
        F = build_digit_polynomial(p, e)
        pe = p**e
        for t in range(1, e):
            for z0 in range(-(p // 2), p // 2 + 1):
                for z1 in [0, 1, 7]:
                    z = (z0 + p**t * z1) % pe
                    val = sum(c * pow(z, i, pe) for i, c in enumerate(F))
                    assert val % p**(t + 1) == z0 % p**(t + 1), (p, e, t, z0)


@pytest.mark.parametrize("p,r", [(2, 3), (5, 2)])
def test_extract_digits(p, r):
    ctx = Context(m=31, p=p, r=r, bits=700, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=41)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rng = np.random.default_rng(43)
    vals = rng.integers(0, p**r, ea.nslots)
    ct = ea.encrypt(list(vals), pk, rng)
    digits = extract_digits(ct, sk)
    assert len(digits) == r
    # oracle: BALANCED base-p expansion (the digit polynomial interpolates
    # balanced residues, mirroring reference buildDigitPolynomial)
    rem = vals.astype(np.int64).copy()
    for j, dj in enumerate(digits):
        assert dj.is_correct(), (j, dj.capacity())
        got = ea.decrypt_ints(dj, sk) % p
        bal = ((rem + (p - 1) // 2) % p) - (p - 1) // 2
        np.testing.assert_array_equal(got, bal % p, err_msg=str(j))
        rem = (rem - bal) // p


@pytest.mark.parametrize("p,r,e", [(2, 2, 2), (5, 2, 1)])
def test_extend_extract_digits_chen_han(p, r, e):
    """Chen-Han extended digit extraction: digits[j] of integers mod p^{r+e}
    with plaintext space p^{e+r-j} (reference extendExtractDigits,
    extractDigits.cpp:225)."""
    from helib_tpu.algos.extract import extend_extract_digits
    ctx = Context(m=31, p=p, r=r + e, bits=900, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=47)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rng = np.random.default_rng(53)
    pe = p ** (r + e)
    vals = rng.integers(0, pe, ea.nslots)
    ct = ea.encrypt(list(vals), pk, rng)
    digits = extend_extract_digits(ct, sk, r, e)
    assert len(digits) == r
    rem = vals.astype(np.int64).copy()
    for j, dj in enumerate(digits):
        assert dj.is_correct(), (j, dj.capacity())
        got = ea.decrypt_ints(dj, sk) % p
        bal = ((rem + (p - 1) // 2) % p) - (p - 1) // 2
        # the magic poly returns the digit in [0,1] for p=2, balanced else
        want = (rem % p) if p == 2 else bal % p
        np.testing.assert_array_equal(got % p, want % p, err_msg=str(j))
        rem = (rem - (rem % p if p == 2 else bal)) // p


def test_chen_han_cost_heuristic():
    from helib_tpu import recryption as rc
    # p=2, r=1: basic squaring, never chen-han
    assert not rc._use_chen_han(2, 1, 5)
    # large p, moderate r: chen-han degree (p-1)r << p^r
    assert rc._use_chen_han(17, 3, 5)
    # force flags override
    old = rc.fhe_force_chen_han
    try:
        rc.fhe_force_chen_han = 1
        assert rc._use_chen_han(2, 1, 5)
        rc.fhe_force_chen_han = -1
        assert not rc._use_chen_han(17, 3, 5)
    finally:
        rc.fhe_force_chen_han = old


def test_bitwise_rotate_shift_concat_split(setup_p2):
    """bitwiseRotate / right shift / concat / split (reference
    binaryArith.cpp:535-582)."""
    from helib_tpu.algos.binary import (bitwise_rotate, right_bitwise_shift,
                                        left_shift, concat_binary_nums,
                                        split_binary_nums)
    ctx, sk, pk, ea, rng = setup_p2
    W = 5
    a = rng.integers(0, 1 << W, ea.nslots)
    ca = encrypt_number(ea, pk, rng, a, W)

    rot = bitwise_rotate(ea, ca, 2)
    want = ((a << 2) | (a >> (W - 2))) & ((1 << W) - 1)
    np.testing.assert_array_equal(decrypt_number(ea, sk, rot), want)
    # negative amount rotates the other way
    rot = bitwise_rotate(ea, ca, -1)
    want = ((a >> 1) | (a << (W - 1))) & ((1 << W) - 1)
    np.testing.assert_array_equal(decrypt_number(ea, sk, rot), want)

    rs = right_bitwise_shift(ea, ca, 2)
    assert len(rs) == W
    np.testing.assert_array_equal(decrypt_number(ea, sk, rs), a >> 2)

    ls = left_shift(ea, ca, 2, W)
    np.testing.assert_array_equal(decrypt_number(ea, sk, ls),
                                  (a << 2) & ((1 << W) - 1))

    b = rng.integers(0, 1 << 3, ea.nslots)
    cb = encrypt_number(ea, pk, rng, b, 3)
    cc = concat_binary_nums(ca, cb)
    np.testing.assert_array_equal(decrypt_number(ea, sk, cc),
                                  a + (b << W))
    lo, hi = split_binary_nums(cc, W)
    np.testing.assert_array_equal(decrypt_number(ea, sk, lo), a)
    np.testing.assert_array_equal(decrypt_number(ea, sk, hi), b)


@pytest.mark.parametrize("nbits", [2, 3, 5, 7, 11, 15])
def test_fifteen_or_less_4_four(setup_p2, nbits):
    """Compression adders: up to 15 same-significance bits -> counter
    (reference fifteenOrLess4Four, binaryArith.cpp:1317)."""
    from helib_tpu.algos.binary import fifteen_or_less_4_four
    ctx, sk, pk, ea, rng = setup_p2
    vals = [rng.integers(0, 2, ea.nslots) for _ in range(nbits)]
    bits = [ea.encrypt(list(v), pk, rng) for v in vals]
    # sprinkle in a None (null pointer in the reference API)
    if len(bits) < 15:
        bits.insert(min(1, len(bits)), None)
    out, nout = fifteen_or_less_4_four(ea, bits, sk)
    got = decrypt_number(ea, sk, out)
    np.testing.assert_array_equal(got, sum(vals))
    assert nout >= 1


def test_extract_bits(setup_p2):
    """Ctxt.extract_bits (reference Ctxt::extractBits, Ctxt.h:1225)."""
    ctx = Context(m=31, p=2, r=3, bits=700, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=61)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rng = np.random.default_rng(67)
    vals = rng.integers(0, 8, ea.nslots)
    ct = ea.encrypt(list(vals), pk, rng)
    bits = ct.extract_bits(sk)
    assert len(bits) == 3
    for j, bj in enumerate(bits):
        got = ea.decrypt_ints(bj, sk) % 2
        np.testing.assert_array_equal(got, (vals >> j) & 1, err_msg=str(j))


def test_phim_idempotent():
    """Pi == 1 mod Phi_m, idempotent mod X^m-1, zero in the Phi_1 component
    (the projector behind composite-m extractBits / recryption constants)."""
    import numpy as np
    from helib_tpu.nt.numbth import phim_idempotent
    from helib_tpu.nt.cyclotomic import cyclotomic_poly
    from helib_tpu.nt import polymod as pm
    for m, mod in [(45, 128), (255, 128), (15, 32)]:
        Pi = phim_idempotent(m, mod)
        assert pm.pmod([int(x) for x in Pi],
                       list(cyclotomic_poly(m)), mod) == [1]
        conv = np.zeros(m, dtype=np.int64)
        for i in range(m):
            if Pi[i]:
                conv[(i + np.arange(m)) % m] += int(Pi[i]) * Pi
        assert ((conv - Pi) % mod == 0).all()
        assert int(Pi.sum()) % mod == 0


def test_extract_bits_composite_m():
    """extractBits at odd COMPOSITE m: regression for the mod-X^m-1
    divisibility bug — without the Phi_m projection the divide_by_p ladder
    corrupts the junk components and decrypts garbage."""
    import numpy as np
    from helib_tpu.context import Context
    from helib_tpu.keys import SecKey, PubKey
    from helib_tpu.ea import EncryptedArray
    ctx = Context(m=45, p=2, r=3, bits=700, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=41)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rng = np.random.default_rng(43)
    vals = rng.integers(0, 8, ea.nslots)
    ct = pk.encrypt_bgv(ea.encode([np.array([v]) for v in vals]), rng)
    bits = ct.extract_bits(sk)
    assert len(bits) == 3
    for j, bj in enumerate(bits):
        got = np.array([int(np.asarray(s)[0]) % 2
                        for s in ea.decrypt(bj, sk)])
        np.testing.assert_array_equal(got, (vals >> j) & 1)


def test_extract_bits_prime_power_m():
    """extractBits at odd PRIME-POWER m (m=27): the cofactor
    (X^27-1)/Phi_27 = X^9-1 has degree 9 > 1, so the Phi_m projection is
    required just like for multi-prime composite m (round-3 advisor
    finding: the old guard `len(factorize(m)) > 1` skipped this class)."""
    import numpy as np
    from helib_tpu.context import Context
    from helib_tpu.keys import SecKey, PubKey
    from helib_tpu.ea import EncryptedArray
    ctx = Context(m=27, p=2, r=3, bits=700, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=47)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rng = np.random.default_rng(53)
    vals = rng.integers(0, 8, ea.nslots)
    ct = pk.encrypt_bgv(ea.encode([np.array([v]) for v in vals]), rng)
    bits = ct.extract_bits(sk)
    assert len(bits) == 3
    for j, bj in enumerate(bits):
        got = np.array([int(np.asarray(s)[0]) % 2
                        for s in ea.decrypt(bj, sk)])
        np.testing.assert_array_equal(got, (vals >> j) & 1)
