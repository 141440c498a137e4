"""Unit tests for host number theory (oracle: sympy-free exact checks).

Reference-parity targets: factorize/phi_N/multOrd/findGenerators
(reference include/helib/NumbTh.h:152-266) and Phi_m computation
(reference src/PAlgebra.cpp)."""

import math

import pytest

from helib_tpu.nt.numbth import (factorize, phi_n, mult_order, is_prime,
                                 find_generators, primitive_root,
                                 root_of_unity, inv_mod, crt_combine)
from helib_tpu.nt.cyclotomic import cyclotomic_poly
from helib_tpu.nt.primegen import gen_primes, gen_aux_primes, PRIME_BITS


def test_factorize():
    assert factorize(1) == ()
    assert factorize(12) == ((2, 2), (3, 1))
    assert factorize(4095) == ((3, 2), (5, 1), (7, 1), (13, 1))
    assert factorize(31775) == ((5, 2), (31, 1), (41, 1))
    assert factorize(35113) == ((13, 1), (37, 1), (73, 1))
    assert factorize(32003) == ((32003, 1),)


def test_phi():
    assert phi_n(1) == 1
    assert phi_n(4095) == sum(1 for x in range(1, 4095) if math.gcd(x, 4095) == 1)
    assert phi_n(256) == 128
    assert phi_n(257) == 256


def test_mult_order():
    assert mult_order(2, 7) == 3
    assert mult_order(3, 7) == 6
    assert mult_order(2, 4095) == 12
    assert mult_order(2, 257) == 16


def test_generators_cover_group():
    for m, p in [(45, 2), (257, 2), (4095, 2), (255, 2), (1024, 65537)]:
        if math.gcd(m, p) != 1:
            continue
        gens, orders, native = find_generators(m, p)
        phi = phi_n(m)
        d = mult_order(p, m)
        n_slots = phi // d
        prod = 1
        for o in orders:
            prod *= o
        assert prod == n_slots, (m, p, gens, orders)


def test_roots_of_unity():
    for q in gen_primes(45, 3):
        w = root_of_unity(45, q)
        assert pow(w, 45, q) == 1
        assert pow(w, 9, q) != 1 and pow(w, 15, q) != 1


def test_primegen():
    qs = gen_primes(4095, 5)
    for q in qs:
        assert is_prime(q)
        assert q % 4095 == 1
        assert (1 << (PRIME_BITS - 1)) < q < (1 << PRIME_BITS)
    assert len(set(qs)) == 5
    aux = gen_aux_primes(3)
    for r in aux:
        assert is_prime(r) and r % (1 << 18) == 1


def test_cyclotomic():
    assert list(cyclotomic_poly(1)) == [-1, 1]
    assert list(cyclotomic_poly(2)) == [1, 1]
    assert list(cyclotomic_poly(4)) == [1, 0, 1]
    assert list(cyclotomic_poly(3)) == [1, 1, 1]
    assert list(cyclotomic_poly(6)) == [1, -1, 1]
    # degree = phi(m); Phi_m(1) = p for prime powers, 1 otherwise (m>1)
    for m in [45, 105, 257, 255]:
        c = cyclotomic_poly(m)
        assert len(c) - 1 == phi_n(m)
        val1 = sum(c)
        fac = factorize(m)
        assert val1 == (fac[0][0] if len(fac) == 1 else 1)


def test_crt():
    assert crt_combine([1, 2], [3, 5]) == 7
    v = crt_combine([10, 20, 30], [101, 103, 107])
    assert v % 101 == 10 and v % 103 == 20 and v % 107 == 30


def test_inv_mod():
    assert inv_mod(3, 7) * 3 % 7 == 1
    with pytest.raises(ValueError):
        inv_mod(2, 4)
