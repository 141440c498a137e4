"""Algorithm-layer tests (oracle: numpy slot vectors), mirroring reference
GTestMatmul / polyEval / replicate / eqtesting suites."""

import numpy as np
import pytest

from helib_tpu.context import Context
from helib_tpu.keys import SecKey, PubKey
from helib_tpu.ea import EncryptedArray
from helib_tpu.algos.sums import total_sums, running_sums
from helib_tpu.algos.replicate import replicate
from helib_tpu.algos.polyeval import poly_eval, ctxt_power
from helib_tpu.algos.matmul import MatMul1D, MatMulFull
from helib_tpu.algos.eqtesting import map_to_01


@pytest.fixture(scope="module", params=[
    dict(m=31, p=2, r=1, bits=400, c=3),    # 6 slots, d=5, one dim
    dict(m=45, p=19, r=1, bits=400, c=3),
])
def setup(request):
    ctx = Context(scheme="bgv", **request.param)
    sk = SecKey(ctx, seed=21)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rng = np.random.default_rng(23)
    return ctx, sk, pk, ea, rng


def enc(ea, pk, rng, slots):
    return ea.encrypt(list(slots), pk, rng)


def test_total_sums(setup):
    ctx, sk, pk, ea, rng = setup
    s = rng.integers(0, ctx.ptxt_space, ea.nslots)
    ct = total_sums(ea, enc(ea, pk, rng, s), sk)
    np.testing.assert_array_equal(ea.decrypt_ints(ct, sk),
                                  np.full(ea.nslots, s.sum() % ctx.ptxt_space))


def test_running_sums(setup):
    ctx, sk, pk, ea, rng = setup
    s = rng.integers(0, ctx.ptxt_space, ea.nslots)
    ct = running_sums(ea, enc(ea, pk, rng, s), sk)
    np.testing.assert_array_equal(ea.decrypt_ints(ct, sk),
                                  np.cumsum(s) % ctx.ptxt_space)


def test_replicate(setup):
    ctx, sk, pk, ea, rng = setup
    s = rng.integers(0, ctx.ptxt_space, ea.nslots)
    pos = ea.nslots // 2
    ct = replicate(ea, enc(ea, pk, rng, s), pos, sk)
    np.testing.assert_array_equal(ea.decrypt_ints(ct, sk),
                                  np.full(ea.nslots, s[pos]))


def test_replicate_all(setup):
    """Recursive replicateAll (reference replicateAll, replicate.cpp:716):
    every output ciphertext has one slot broadcast everywhere."""
    from helib_tpu.algos.replicate import replicate_all, ReplicateHandler
    ctx, sk, pk, ea, rng = setup
    s = rng.integers(0, ctx.ptxt_space, ea.nslots)
    outs = replicate_all(ea, enc(ea, pk, rng, s), sk)
    assert len(outs) == ea.nslots
    for i, ct in enumerate(outs):
        np.testing.assert_array_equal(ea.decrypt_ints(ct, sk),
                                      np.full(ea.nslots, s[i]))

    class Stop2(ReplicateHandler):
        def __init__(self):
            self.got = {}

        def handle(self, pos, ctxt):
            self.got[pos] = ctxt

        def early_stop(self):
            return len(self.got) >= 2

    h = Stop2()
    replicate_all(ea, enc(ea, pk, rng, s), sk, handler=h)
    assert len(h.got) == 2
    for pos, ct in h.got.items():
        np.testing.assert_array_equal(ea.decrypt_ints(ct, sk),
                                      np.full(ea.nslots, s[pos]))


def test_poly_eval(setup):
    ctx, sk, pk, ea, rng = setup
    pr = ctx.ptxt_space
    s = rng.integers(0, pr, ea.nslots)
    coeffs = rng.integers(0, pr, 8)
    ct = poly_eval(coeffs, enc(ea, pk, rng, s), sk)
    assert ct.is_correct(), ct.capacity()
    expect = np.zeros(ea.nslots, dtype=np.int64)
    for c in reversed(coeffs):
        expect = (expect * s + int(c)) % pr
    np.testing.assert_array_equal(ea.decrypt_ints(ct, sk), expect)


def test_ctxt_power(setup):
    ctx, sk, pk, ea, rng = setup
    pr = ctx.ptxt_space
    s = rng.integers(0, pr, ea.nslots)
    ct = ctxt_power(enc(ea, pk, rng, s), 5, sk)
    expect = np.array([pow(int(v), 5, pr) for v in s])
    np.testing.assert_array_equal(ea.decrypt_ints(ct, sk), expect)


@pytest.mark.parametrize("bsgs", [False, True])
def test_matmul_1d(setup, bsgs):
    ctx, sk, pk, ea, rng = setup
    pr = ctx.ptxt_space
    dim = 0
    D = ctx.pal.orders[dim]
    M = rng.integers(0, pr, (D, D))
    mm = MatMul1D(ea, dim, lambda i, j: int(M[i, j]))
    s = rng.integers(0, pr, ea.nslots)
    ct = mm.apply(enc(ea, pk, rng, s), sk, bsgs=bsgs)
    assert ct.is_correct(), ct.capacity()
    got = ea.decrypt_ints(ct, sk)
    # oracle: along dim, y[e] = sum_j M[e][j] x[j] for each line
    pal = ctx.pal
    expect = np.zeros(ea.nslots, dtype=np.int64)
    for sidx in range(ea.nslots):
        e = pal.coords(sidx)[dim]
        acc = 0
        for j in range(D):
            cs = list(pal.coords(sidx))
            cs[dim] = j
            acc += int(M[e, j]) * int(s[pal.slot_index(cs)])
        expect[sidx] = acc % pr
    np.testing.assert_array_equal(got, expect)


def test_block_matmul_1d(setup):
    """BlockMatMul1D: d x d blocks over the slot extension field
    (reference GTestMatmul block variants)."""
    from helib_tpu.algos.matmul import BlockMatMul1D
    ctx, sk, pk, ea, rng = setup
    pr, d = ctx.ptxt_space, ea.d
    dim = 0
    D = ctx.pal.orders[dim]
    blocks = rng.integers(0, pr, (D, D, d, d))
    bm = BlockMatMul1D(ea, dim, lambda i, j: blocks[i, j])
    slots = [rng.integers(0, pr, d) for _ in range(ea.nslots)]
    ct = ea.encrypt(slots, pk, rng)
    out = bm.apply(ct, sk)
    assert out.is_correct(), out.capacity()
    got = ea.decrypt(out, sk)
    pal = ctx.pal
    for s in range(ea.nslots):
        e = pal.coords(s)[dim]
        expect = np.zeros(d, dtype=np.int64)
        for j in range(D):
            cs = list(pal.coords(s))
            cs[dim] = j
            src = np.asarray(slots[pal.slot_index(cs)])
            expect = (expect + blocks[e, j] @ src) % pr
        np.testing.assert_array_equal(got[s] % pr, expect, err_msg=str(s))


def test_matmul_full(setup):
    ctx, sk, pk, ea, rng = setup
    pr = ctx.ptxt_space
    n = ea.nslots
    M = rng.integers(0, pr, (n, n))
    mm = MatMulFull(ea, lambda i, j: int(M[i, j]))
    s = rng.integers(0, pr, n)
    ct = mm.apply(enc(ea, pk, rng, s), sk)
    got = ea.decrypt_ints(ct, sk)
    np.testing.assert_array_equal(got, (M @ s) % pr)


def test_block_matmul_full(setup):
    """BlockMatMulFull: n x n matrix of d x d blocks over ALL slots
    (reference BlockMatMulFull, matmul.h:186-247)."""
    from helib_tpu.algos.matmul import BlockMatMulFull
    ctx, sk, pk, ea, rng = setup
    pr, d, n = ctx.ptxt_space, ea.d, ea.nslots
    blocks = rng.integers(0, pr, (n, n, d, d))
    bm = BlockMatMulFull(ea, lambda i, j: blocks[i, j])
    slots = [rng.integers(0, pr, d) for _ in range(n)]
    ct = ea.encrypt(slots, pk, rng)
    out = bm.apply(ct, sk)
    assert out.is_correct(), out.capacity()
    got = ea.decrypt(out, sk)
    for s in range(n):
        expect = np.zeros(d, dtype=np.int64)
        for j in range(n):
            expect = (expect + blocks[s, j] @ np.asarray(slots[j])) % pr
        np.testing.assert_array_equal(got[s] % pr, expect, err_msg=str(s))


def test_map_to_01(setup):
    ctx, sk, pk, ea, rng = setup
    if ctx.r != 1:
        pytest.skip("r=1 only")
    s = rng.integers(0, ctx.ptxt_space, ea.nslots)
    s[0] = 0
    ct = map_to_01(ea, enc(ea, pk, rng, s), sk)
    assert ct.is_correct(), ct.capacity()
    expect = (s != 0).astype(np.int64)
    np.testing.assert_array_equal(ea.decrypt_ints(ct, sk), expect)
