"""Tests for the small reference-parity helpers: incrementalProduct,
multiplyBy2 (Ctxt.h:1488-1526, Ctxt.cpp:1776) and the randomMatrices.h-style
generators."""

import numpy as np
import pytest

from helib_tpu.context import Context
from helib_tpu.keys import SecKey, PubKey
from helib_tpu.ea import EncryptedArray
from helib_tpu.utils import incremental_product, multiply_by2
from helib_tpu.algos.random_matrices import (
    random_matmul1d, random_matmul_full)


@pytest.fixture(scope="module")
def setup():
    ctx = Context(m=31, p=2, r=2, bits=500, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=31)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rng = np.random.default_rng(37)
    return ctx, sk, pk, ea, rng


def test_incremental_product(setup):
    ctx, sk, pk, ea, rng = setup
    vals = [rng.integers(0, ctx.ptxt_space, ea.nslots) for _ in range(5)]
    cts = [ea.encrypt(list(v), pk, rng) for v in vals]
    incremental_product(cts, sk)
    run = np.ones(ea.nslots, dtype=np.int64)
    for v, ct in zip(vals, cts):
        run = run * v % ctx.ptxt_space
        np.testing.assert_array_equal(ea.decrypt_ints(ct, sk), run)


def test_multiply_by2(setup):
    ctx, sk, pk, ea, rng = setup
    vals = [rng.integers(0, ctx.ptxt_space, ea.nslots) for _ in range(3)]
    cts = [ea.encrypt(list(v), pk, rng) for v in vals]
    # give them different capacities
    cts[1] = cts[1].multiply(cts[1], sk)
    vals[1] = vals[1] ** 2 % ctx.ptxt_space
    out = multiply_by2(cts[0], cts[1], cts[2], sk)
    expect = vals[0] * vals[1] % ctx.ptxt_space * vals[2] % ctx.ptxt_space
    np.testing.assert_array_equal(ea.decrypt_ints(out, sk), expect)


def test_random_matmul1d(setup):
    ctx, sk, pk, ea, rng = setup
    mat, M = random_matmul1d(ea, 0, rng, zero_frac=0.3)
    s = rng.integers(0, ctx.ptxt_space, ea.nslots)
    ct = mat.apply(ea.encrypt(list(s), pk, rng), sk)
    # oracle: slot vector (one per dim-0 coordinate) times the matrix
    D = ea.ctx.pal.orders[0]
    assert D == ea.nslots  # m=31 has a single dim
    expect = np.array([sum(int(M[i, j]) * int(s[j]) for j in range(D))
                       % ctx.ptxt_space for i in range(D)])
    np.testing.assert_array_equal(ea.decrypt_ints(ct, sk), expect)


def test_random_matmul_full(setup):
    ctx, sk, pk, ea, rng = setup
    mat, M = random_matmul_full(ea, rng)
    s = rng.integers(0, ctx.ptxt_space, ea.nslots)
    ct = mat.apply(ea.encrypt(list(s), pk, rng), sk)
    n = ea.nslots
    expect = np.array([sum(int(M[i, j]) * int(s[j]) for j in range(n))
                       % ctx.ptxt_space for i in range(n)])
    np.testing.assert_array_equal(ea.decrypt_ints(ct, sk), expect)
