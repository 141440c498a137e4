"""Native C++ host-math kernels vs the pure-Python bignum oracle
(role of reference NTL/GMP at the DoubleCRT::toPoly boundary)."""

import math

import numpy as np
import pytest

from helib_tpu.nt.native import available, combiner_for


pytestmark = pytest.mark.skipif(not available(),
                                reason="native library not built")


def _primes(n, start=1 << 29):
    out, x = [], start + 1
    while len(out) < n:
        for i in range(3, int(x ** 0.5) + 1, 2):
            if x % i == 0:
                break
        else:
            if x % 2:
                out.append(x)
        x += 2
    return out


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(5)
    qs = _primes(17)
    N = 512
    res = np.stack([rng.integers(0, q, N).astype(np.uint32) for q in qs])
    Q = 1
    for q in qs:
        Q *= q
    acc = np.zeros(N, dtype=object)
    for i, qi in enumerate(qs):
        Qi = Q // qi
        ci = (Qi * pow(Qi % qi, -1, qi)) % Q
        acc = (acc + res[i].astype(object) * ci) % Q
    bal = np.where(acc > Q // 2, acc - Q, acc)
    return qs, res, Q, bal


def test_balanced_ints(data):
    qs, res, Q, bal = data
    comb = combiner_for(qs)
    got = comb.balanced_ints(res)
    assert all(int(a) == int(b) for a, b in zip(bal, got))


def test_balanced_mod(data):
    qs, res, Q, bal = data
    comb = combiner_for(qs)
    for mod in (2, 8, 3**4, 2**16):
        got = comb.balanced_mod(res, mod)
        want = np.array([int(b) % mod for b in bal])
        np.testing.assert_array_equal(got, want)


def test_balanced_float(data):
    qs, res, Q, bal = data
    comb = combiner_for(qs)
    mant, ex = comb.balanced_float_log2(res)
    for j in range(len(bal)):
        b = int(bal[j])
        if b == 0:
            assert mant[j] == 0.0
            continue
        lg = math.log2(abs(float(mant[j]))) + int(ex[j])
        assert abs(lg - math.log2(abs(b))) < 1e-9
        assert (mant[j] < 0) == (b < 0)


def test_mod_switch(data):
    qs, res, Q, bal = data
    comb = combiner_for(qs)
    for q, p2r in ((2**8 + 1, 2), (2**10 + 1, 4), (3**6 + 1, 9)):
        Qinv = pow(Q % p2r, -1, p2r)
        want = []
        for j in range(len(bal)):
            c = int(bal[j])
            X, Y = divmod(c * q, Q)
            if Y > Q // 2:
                Y -= Q
                X += 1
            delta = (Y % p2r) * Qinv % p2r
            if delta > p2r // 2:
                delta -= p2r
            x = X + delta
            if abs(x) > q // 2:
                x %= q
                if x > q // 2:
                    x -= q
            want.append(x)
        got = comb.mod_switch(res, q, p2r)
        np.testing.assert_array_equal(got, np.array(want))


def test_edge_residues():
    """All-zero, all-(q-1), and single-prime sets."""
    qs = _primes(1)
    comb = combiner_for(qs)
    N = 16
    zero = np.zeros((1, N), dtype=np.uint32)
    assert all(int(v) == 0 for v in comb.balanced_ints(zero))
    top = np.full((1, N), qs[0] - 1, dtype=np.uint32)
    assert all(int(v) == -1 for v in comb.balanced_ints(top))  # balanced


def test_norm_scaled_matches_exact():
    from helib_tpu.norms import (embedding_largest_coeff_log2,
                                 embedding_norm_log2_scaled)
    rng = np.random.default_rng(11)
    qs = _primes(9)
    N = 64
    res = np.stack([rng.integers(0, q, N).astype(np.uint32) for q in qs])
    comb = combiner_for(qs)
    exact = comb.balanced_ints(res)
    mant, ex = comb.balanced_float_log2(res)
    # pow2-style ring of size N (m = 2N)
    a = embedding_largest_coeff_log2(exact, 2 * N, True)
    b = embedding_norm_log2_scaled(mant, ex, 2 * N, True)
    assert abs(a - b) < 1e-6
