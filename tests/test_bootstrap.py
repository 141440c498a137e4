"""Thin bootstrapping end-to-end (mirrors reference GTestThinboot):
encrypt -> consume capacity -> thinReCrypt -> verify plaintext preserved and
capacity restored -> keep computing."""

import numpy as np
import pytest

from helib_tpu.context import Context
from helib_tpu.keys import SecKey, PubKey
from helib_tpu.ea import EncryptedArray
from helib_tpu.recryption import RecryptData, thin_recrypt, set_ae


@pytest.fixture(scope="module")
def setup():
    ctx = Context(m=31, p=2, r=1, bits=800, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=61, hwt=16)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rc = RecryptData(ctx, sk, ea, hwt=16)
    rng = np.random.default_rng(67)
    return ctx, sk, pk, ea, rc, rng


def test_set_ae(setup):
    ctx, sk, pk, ea, rc, rng = setup
    e, ep = set_ae(ctx, 16)
    assert e > ep >= 0
    assert ctx.p**e + 1 < (1 << 30)


def test_linear_maps_roundtrip(setup):
    """slotToCoeff then coeffToSlot is the identity on thin ciphertexts."""
    ctx, sk, pk, ea, rc, rng = setup
    slots = rng.integers(0, ctx.ptxt_space, ea.nslots)
    ct = ea.encrypt(list(slots), pk, rng)
    ct2 = rc.slot_to_coeff.apply(ct, sk)
    # coefficients 0..n-1 of the plaintext now hold the slot constants
    dec = sk.decrypt_bgv(ct2)
    np.testing.assert_array_equal(dec[:ea.nslots], slots)
    ct3 = rc.coeff_to_slot.apply(ct2, sk)
    np.testing.assert_array_equal(ea.decrypt_ints(ct3, sk), slots)


@pytest.mark.slow
def test_thin_recrypt_composite_m():
    """Thin bootstrap at composite m=45 (two hypercube dims; mirrors the
    reference bootstrappable composite-m parameter family)."""
    from helib_tpu.recryption import RecryptData, thin_recrypt
    ctx = Context(m=45, p=2, r=1, bits=800, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=91, hwt=20)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rc = RecryptData(ctx, sk, ea, hwt=20)
    rng = np.random.default_rng(93)
    slots = rng.integers(0, ctx.ptxt_space, ea.nslots)
    ct = ea.encrypt(list(slots), pk, rng)
    ct.bring_to_k(3)
    out = thin_recrypt(ct, rc, sk)
    assert out.is_correct(), out.capacity()
    np.testing.assert_array_equal(ea.decrypt_ints(out, sk), slots)


@pytest.mark.slow
@pytest.mark.big_mem
def test_thin_recrypt_tree_maps():
    """Thin bootstrap at m=255 with the scalable factor-tree ThinEvalMap
    (3 coprime factors, d=8, 16 slots) — the reference ThinEvalMap route."""
    from helib_tpu.recryption import RecryptData, thin_recrypt
    from helib_tpu.evalmap import ThinEvalMapTree
    ctx = Context(m=255, p=2, r=1, bits=950, c=3, scheme="bgv",
                  mvec=(3, 5, 17))
    sk = SecKey(ctx, seed=121, hwt=24)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rc = RecryptData(ctx, sk, ea, hwt=24)
    assert isinstance(rc.slot_to_coeff, ThinEvalMapTree)
    rng = np.random.default_rng(123)
    slots = rng.integers(0, ctx.ptxt_space, ea.nslots)
    ct = ea.encrypt(list(slots), pk, rng)
    ct.bring_to_k(3)
    out = thin_recrypt(ct, rc, sk)
    assert out.is_correct(), out.capacity()
    np.testing.assert_array_equal(ea.decrypt_ints(out, sk), slots)


@pytest.mark.slow
@pytest.mark.big_mem
def test_thin_recrypt_pr_space():
    """Thin bootstrap with plaintext space p^r = 4 (r=2): exercises the
    bottom-digit correction branch of extractDigitsThin."""
    from helib_tpu.recryption import RecryptData, thin_recrypt
    ctx = Context(m=31, p=2, r=2, bits=900, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=101, hwt=16)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rc = RecryptData(ctx, sk, ea, hwt=16)
    rng = np.random.default_rng(103)
    slots = rng.integers(0, 4, ea.nslots)
    ct = ea.encrypt(list(slots), pk, rng)
    ct.bring_to_k(3)
    out = thin_recrypt(ct, rc, sk)
    assert out.is_correct(), out.capacity()
    np.testing.assert_array_equal(ea.decrypt_ints(out, sk), slots)


@pytest.mark.slow
@pytest.mark.big_mem
def test_fat_recrypt_tree_maps():
    """Fat bootstrap at m=255 with the scalable factor-tree EvalMap
    (BlockMatMul1D last-factor stage + powerful-basis rounding) — the
    reference EvalMap/reCrypt route for composite m."""
    from helib_tpu.recryption import FatRecryptData, fat_recrypt
    from helib_tpu.evalmap import ThinEvalMapTree
    ctx = Context(m=255, p=2, r=1, bits=950, c=3, scheme="bgv",
                  mvec=(3, 5, 17))
    sk = SecKey(ctx, seed=131, hwt=24)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    frc = FatRecryptData(ctx, sk, ea, hwt=24)
    assert isinstance(frc.first_map, ThinEvalMapTree)
    assert frc.first_map._fat_stages
    rng = np.random.default_rng(133)
    slots = [rng.integers(0, ctx.ptxt_space, ea.d) for _ in range(ea.nslots)]
    ct = pk.encrypt_bgv(ea.encode(slots), rng)
    ct.bring_to_k(3)
    out = fat_recrypt(ct, frc, sk)
    assert out.is_correct(), out.capacity()
    got = ea.decrypt(out, sk)
    for sl in range(ea.nslots):
        np.testing.assert_array_equal(np.asarray(got[sl]) % ea.pr,
                                      np.asarray(slots[sl]) % ea.pr)


@pytest.mark.slow
def test_fat_recrypt(setup):
    """Reference GTestFatboot: bootstrap with FULLY PACKED slots."""
    from helib_tpu.recryption import FatRecryptData, fat_recrypt
    ctx, sk, pk, ea, rc, rng = setup
    frc = FatRecryptData(ctx, sk, ea, hwt=16)
    slots = [rng.integers(0, ctx.ptxt_space, ea.d) for _ in range(ea.nslots)]
    ct = pk.encrypt_bgv(ea.encode(slots), rng)
    low = ct.copy()
    low.bring_to_k(3)
    out = fat_recrypt(low, frc, sk)
    assert out.is_correct(), out.capacity()
    dec = ea.decode(sk.decrypt_bgv(out))
    for a, b in zip(dec, slots):
        np.testing.assert_array_equal(a, np.asarray(b) % ctx.ptxt_space)
    assert out.capacity() > low.capacity() + 30


def test_thin_recrypt(setup):
    ctx, sk, pk, ea, rc, rng = setup
    slots = rng.integers(0, ctx.ptxt_space, ea.nslots)
    ct = ea.encrypt(list(slots), pk, rng)
    # burn capacity with a few squarings of a companion and adds
    low = ct.copy()
    low.bring_to_k(3)
    cap_before = low.capacity()
    out = thin_recrypt(low, rc, sk)
    assert out.is_correct(), out.capacity()
    np.testing.assert_array_equal(ea.decrypt_ints(out, sk), slots)
    assert out.capacity() > cap_before + 30, (cap_before, out.capacity())
    # keep computing after recryption
    sq = out.multiply(out, sk)
    np.testing.assert_array_equal(ea.decrypt_ints(sq, sk),
                                  (slots * slots) % ctx.ptxt_space)


@pytest.mark.skipif(not __import__("os").environ.get("HELIB_RUN_BIG"),
                    reason="m=31775 thin boot is very slow; HELIB_RUN_BIG=1")
def test_thin_recrypt_big_bench_param():
    """Thin bootstrap at m=31775 = 5^2*31*41 — the reference's SMALL
    thinboot benchmark parameter (benchmarks/bgv_thinboot.cpp:104-145:
    m=31775, p=2, bits=600, c=3, skHwt=64; mvec there {41,775}, here the
    equivalent prime-power split)."""
    from helib_tpu.recryption import RecryptData, thin_recrypt
    from helib_tpu.evalmap import ThinEvalMapTree
    ctx = Context(m=31775, p=2, r=1, bits=600, c=3, scheme="bgv",
                  mvec=(31, 25, 41))
    sk = SecKey(ctx, seed=141, hwt=64)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rc = RecryptData(ctx, sk, ea, hwt=64)
    assert isinstance(rc.slot_to_coeff, ThinEvalMapTree)
    rng = np.random.default_rng(143)
    slots = rng.integers(0, ctx.ptxt_space, ea.nslots)
    ct = ea.encrypt(list(slots), pk, rng)
    ct.bring_to_k(3)
    out = thin_recrypt(ct, rc, sk)
    assert out.is_correct(), out.capacity()
    np.testing.assert_array_equal(ea.decrypt_ints(out, sk), slots)


@pytest.mark.skipif(not __import__("os").environ.get("HELIB_RUN_SLOW"),
                    reason="m=1271 thin boot is slow; HELIB_RUN_SLOW=1")
def test_thin_recrypt_bench_param():
    """Thin bootstrap at m=1271 = 31*41 — the reference's SMALL thinboot
    benchmark parameter (benchmarks/bgv_thinboot.cpp:104, skHwt=64)."""
    from helib_tpu.recryption import RecryptData, thin_recrypt
    from helib_tpu.evalmap import ThinEvalMapTree
    ctx = Context(m=1271, p=2, r=1, bits=1000, c=3, scheme="bgv",
                  mvec=(31, 41))
    sk = SecKey(ctx, seed=131, hwt=64)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rc = RecryptData(ctx, sk, ea, hwt=64)
    assert isinstance(rc.slot_to_coeff, ThinEvalMapTree)
    rng = np.random.default_rng(133)
    slots = rng.integers(0, ctx.ptxt_space, ea.nslots)
    ct = ea.encrypt(list(slots), pk, rng)
    ct.bring_to_k(3)
    out = thin_recrypt(ct, rc, sk)
    assert out.is_correct(), out.capacity()
    np.testing.assert_array_equal(ea.decrypt_ints(out, sk), slots)


def test_thin_recrypt_pubkey_only(setup):
    """Server-side bootstrap with the PubKey alone (the reference's
    thinReCrypt is a PubKey method, recryption.cpp:417) — after keygen
    has populated the matrices, the recryption itself must touch no
    secret material.  The first sk-driven run mints any strategy gaps;
    the second runs under HELIB_STRICT_KS with the PubKey and must
    match."""
    import os
    ctx, sk, pk, ea, rc, rng = setup
    slots = rng.integers(0, ctx.ptxt_space, ea.nslots)
    ct = ea.encrypt(list(slots), pk, rng)
    low = ct.copy()
    low.bring_to_k(3)
    thin_recrypt(low.copy(), rc, sk)      # mints all needed matrices
    os.environ["HELIB_STRICT_KS"] = "1"   # any further minting -> error
    try:
        out = thin_recrypt(low, rc, pk)   # PubKey only
    finally:
        del os.environ["HELIB_STRICT_KS"]
    assert out.is_correct(), out.capacity()
    np.testing.assert_array_equal(ea.decrypt_ints(out, sk), slots)
