"""Factor-tree ThinEvalMap tests (mirrors reference GTestThinEvalMap):
slotToCoeff then coeffToSlot must be the identity on thin ciphertexts, with
O(sum D_t) rotations instead of the dense sigma-span construction."""

import numpy as np
import pytest

from helib_tpu.context import Context
from helib_tpu.keys import SecKey, PubKey
from helib_tpu.ea import EncryptedArray
from helib_tpu.evalmap import ThinEvalMapTree


@pytest.fixture(scope="module")
def setup():
    # m = 255 = 3*5*17, p=2: d=8, dims (2,4,2), 16 slots — factor-aligned
    ctx = Context(m=255, p=2, r=1, bits=600, c=3, scheme="bgv",
                  mvec=(3, 5, 17))
    sk = SecKey(ctx, seed=111)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rng = np.random.default_rng(113)
    return ctx, sk, pk, ea, rng


def test_aligned_hypercube(setup):
    ctx, sk, pk, ea, rng = setup
    assert ctx.pal.aligned is not None
    assert np.prod(ctx.pal.orders) == ea.nslots
    # rotations still work with factor-aligned generators
    s = rng.integers(0, 2, ea.nslots)
    ct = ea.encrypt(list(s), pk, rng)
    out = ea.rotate_1d(ct, 0, 1, sk)
    got = ea.decrypt_ints(out, sk)
    pal = ctx.pal
    expect = np.zeros(ea.nslots, dtype=np.int64)
    D = pal.orders[0]
    for sidx in range(ea.nslots):
        cs = list(pal.coords(sidx))
        cs[0] = (cs[0] + 1) % D
        expect[pal.slot_index(cs)] = s[sidx]
    np.testing.assert_array_equal(got, expect)


def test_thin_evalmap_roundtrip(setup):
    ctx, sk, pk, ea, rng = setup
    s2c = ThinEvalMapTree(ea, invert=False)
    c2s = ThinEvalMapTree(ea, invert=True)
    v = rng.integers(0, ctx.ptxt_space, ea.nslots)
    ct = ea.encrypt(list(v), pk, rng)
    mid = s2c.apply(ct, sk)
    assert mid.is_correct(), mid.capacity()
    out = c2s.apply(mid, sk)
    assert out.is_correct(), out.capacity()
    got = ea.decrypt_ints(out, sk)
    np.testing.assert_array_equal(got, v)
