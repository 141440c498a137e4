"""Vectorized slot-algebra fast path (helib_tpu/nt/slotalg.py): the
direct minimal-polynomial construction must produce a valid CRT slot
structure — encode/decode roundtrip, ring-multiplication = slotwise
multiplication, and agreement of the factor set with the slow
(Cantor-Zassenhaus) path."""

import os

import numpy as np
import pytest

from helib_tpu.context import Context
from helib_tpu.ea import EncryptedArray
from helib_tpu.nt import polymod as pm
from helib_tpu.nt.cyclotomic import cyclotomic_poly


@pytest.fixture
def fast_env():
    os.environ["HELIB_FAST_EA"] = "1"
    yield
    del os.environ["HELIB_FAST_EA"]


@pytest.mark.parametrize("m,p,r", [(45, 19, 1), (255, 2, 1), (31, 2, 2),
                                   (45, 2, 3)])
def test_fast_ea_roundtrip_and_ring(fast_env, m, p, r):
    ctx = Context(m=m, p=p, r=r, bits=120, c=2, scheme="bgv")
    ea = EncryptedArray(ctx)
    assert ea._fast
    rng = np.random.default_rng(17)
    a = [rng.integers(0, ea.pr, ea.d) for _ in range(ea.nslots)]
    b = [rng.integers(0, ea.pr, ea.d) for _ in range(ea.nslots)]
    pa, pb = ea.encode(a), ea.encode(b)
    for x, px in ((a, pa), (b, pb)):
        dec = ea.decode(px)
        for got, want in zip(dec, x):
            np.testing.assert_array_equal(got % ea.pr, want % ea.pr)
    # ring mult mod (Phi_m, p^r) == slotwise mult mod (G, p^r)
    phim = [int(c) % ea.pr for c in cyclotomic_poly(m)]
    prod = pm.pmod(pm.pmul([int(v) for v in pa], [int(v) for v in pb],
                           ea.pr), phim, ea.pr)
    dec = ea.decode(np.array(prod + [0] * (ctx.phi_m - len(prod))))
    for si in range(ea.nslots):
        want = pm.pmulmod([int(v) for v in a[si]], [int(v) for v in b[si]],
                          ea.G, ea.pr)
        got = [int(v) for v in dec[si]]
        assert pm.trim([v % ea.pr for v in got]) == pm.trim(want), si


@pytest.mark.parametrize("m,p,r", [(255, 2, 1), (45, 19, 1)])
def test_fast_factors_match_slow_set(fast_env, m, p, r):
    """The factor SET mod p^r must equal the slow path's (as polynomials,
    regardless of slot assignment or G choice)."""
    ctx = Context(m=m, p=p, r=r, bits=120, c=2, scheme="bgv")
    fast = EncryptedArray(ctx)
    del os.environ["HELIB_FAST_EA"]
    try:
        slow = EncryptedArray(ctx)
    finally:
        os.environ["HELIB_FAST_EA"] = "1"
    assert not slow._fast
    fset = {tuple(int(v) for v in row) for row in fast.factors}
    sset = {tuple(list(f) + [0] * (fast.d + 1 - len(f))) for f in slow.factors}
    assert fset == sset


def test_fast_ea_encrypted_rotate(fast_env):
    """End-to-end: encrypt, rotate, decrypt with the fast tables."""
    from helib_tpu.keys import SecKey, PubKey
    ctx = Context(m=255, p=2, r=1, bits=300, c=3, scheme="bgv",
                  mvec=(3, 5, 17))
    sk = SecKey(ctx, seed=5)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    assert ea._fast
    rng = np.random.default_rng(7)
    slots = rng.integers(0, 2, ea.nslots)
    ct = ea.encrypt(list(slots), pk, rng)
    out = ea.rotate(ct, 3, sk)
    np.testing.assert_array_equal(ea.decrypt_ints(out, sk),
                                  np.roll(slots, 3))


@pytest.mark.parametrize("rows,n,d,q", [(5, 97, 4, 2**30 - 35),
                                        (3, 40, 7, 8191),
                                        (2, 6, 7, 257),    # n < d: pure pad
                                        (4, 64, 8, 2**30 - 35)])
def test_batched_divmod_fold_matches_schoolbook(rows, n, d, q):
    """Blocked synthetic division (quotient+remainder) agrees with the
    per-coefficient batched_divmod on random monic divisors."""
    from helib_tpu.nt.slotalg import (batched_divmod, batched_divmod_fold)
    rng = np.random.default_rng(123)
    A = rng.integers(0, q, (rows, n)).astype(np.int64)
    F = rng.integers(0, q, (rows, d + 1)).astype(np.int64)
    F[:, d] = 1  # monic
    Qf, Rf = batched_divmod_fold(A, F, q)
    Qs, Rs = batched_divmod(A.copy(), F, q)
    np.testing.assert_array_equal(Rf % q, Rs % q)
    if Qf.shape[1]:
        np.testing.assert_array_equal(Qf % q, Qs % q)
