"""CKKS tests: precision-bounded equality vs numpy complex oracle
(mirrors reference tests/TestCKKS.cpp / GTestApproxNums)."""

import numpy as np
import pytest

from helib_tpu.context import Context
from helib_tpu.keys import SecKey, PubKey
from helib_tpu.ckks import EncryptedArrayCKKS


@pytest.fixture(scope="module", params=[
    dict(m=256, r=30, bits=240, c=3),
    dict(m=1024, r=35, bits=300, c=3),
])
def setup(request):
    p = request.param
    ctx = Context(m=p["m"], p=-1, r=p["r"], bits=p["bits"], c=p["c"],
                  scheme="ckks")
    sk = SecKey(ctx, seed=9)
    pk = PubKey(sk)
    ea = EncryptedArrayCKKS(ctx)
    rng = np.random.default_rng(13)
    return ctx, sk, pk, ea, rng


def rand_slots(ea, rng):
    return (rng.uniform(-1, 1, ea.nslots) + 1j * rng.uniform(-1, 1, ea.nslots))


def dist(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def test_embed_roundtrip(setup):
    ctx, sk, pk, ea, rng = setup
    z = rand_slots(ea, rng)
    c = ea.unembed(z)
    z2 = ea.embed(c)
    assert dist(z, z2) < 1e-9


def test_encrypt_decrypt(setup):
    ctx, sk, pk, ea, rng = setup
    z = rand_slots(ea, rng)
    ct = ea.encrypt(z, pk, rng)
    assert ct.is_correct()
    z2 = ea.decrypt(ct, sk)
    assert dist(z, z2) < 1e-4, dist(z, z2)


def test_add(setup):
    ctx, sk, pk, ea, rng = setup
    z1, z2 = rand_slots(ea, rng), rand_slots(ea, rng)
    c1, c2 = ea.encrypt(z1, pk, rng), ea.encrypt(z2, pk, rng)
    c3 = c1.copy().add(c2)
    # two fresh errors + the Li-Micciancio release noise (~errorBound again)
    assert dist(ea.decrypt(c3, sk), z1 + z2) < 5e-4


def test_mul(setup):
    ctx, sk, pk, ea, rng = setup
    z1, z2 = rand_slots(ea, rng), rand_slots(ea, rng)
    c1, c2 = ea.encrypt(z1, pk, rng), ea.encrypt(z2, pk, rng)
    c3 = c1.multiply(c2, sk)
    assert c3.is_correct()
    got = ea.decrypt(c3, sk)
    assert dist(got, z1 * z2) < 1e-3, dist(got, z1 * z2)


def test_mul_chain_with_rescale(setup):
    ctx, sk, pk, ea, rng = setup
    z = rand_slots(ea, rng) * 0.5
    ct = ea.encrypt(z, pk, rng)
    expect = z.copy()
    for _ in range(3):
        ct = ct.square(sk)
        ea.rescale(ct)
        expect = expect * expect
        assert ct.is_correct(), ct.capacity()
    assert dist(ea.decrypt(ct, sk), expect) < 1e-2


def test_mul_const(setup):
    ctx, sk, pk, ea, rng = setup
    z1, z2 = rand_slots(ea, rng), rand_slots(ea, rng)
    c1 = ea.encrypt(z1, pk, rng)
    c2 = ea.mul_const(c1, z2)
    assert dist(ea.decrypt(c2, sk), z1 * z2) < 1e-3


def test_rotate(setup):
    ctx, sk, pk, ea, rng = setup
    z = rand_slots(ea, rng)
    ct = ea.encrypt(z, pk, rng)
    out = ea.rotate(ct, 1, sk)
    got = ea.decrypt(out, sk)
    assert dist(got, np.roll(z, 1)) < 1e-3


def test_conjugate(setup):
    ctx, sk, pk, ea, rng = setup
    z = rand_slots(ea, rng)
    ct = ea.encrypt(z, pk, rng)
    ct.conjugate(sk)
    assert dist(ea.decrypt(ct, sk), np.conj(z)) < 1e-3


def test_shift(setup):
    ctx, sk, pk, ea, rng = setup
    z = rand_slots(ea, rng)
    ct = ea.encrypt(z, pk, rng)
    out = ea.shift(ct, 1, sk)
    exp = np.roll(z, 1)
    exp[0] = 0
    assert dist(ea.decrypt(out, sk), exp) < 1e-2


def test_extract_real_imaginary(setup):
    """extractRealPart / extractImPart (reference EncryptedArray.h:1122)."""
    ctx, sk, pk, ea, rng = setup
    z = rand_slots(ea, rng)
    ct = ea.encrypt(z, pk, rng)
    re = ea.extract_real_part(ct, sk)
    im = ea.extract_imaginary_part(ct, sk)
    assert dist(ea.decrypt(re, sk), np.real(z).astype(np.complex128)) < 1e-2
    assert dist(ea.decrypt(im, sk), np.imag(z).astype(np.complex128)) < 1e-2


def test_matmul_ckks():
    """MatMul_CKKS diagonal method (reference TestMatmulCKKS)."""
    from helib_tpu.algos.matmul_ckks import MatMulCKKS
    ctx = Context(m=64, p=-1, r=30, bits=240, c=3, scheme="ckks")
    sk = SecKey(ctx, seed=29)
    pk = PubKey(sk)
    ea = EncryptedArrayCKKS(ctx)
    rng = np.random.default_rng(31)
    n = ea.nslots
    M = rng.uniform(-1, 1, (n, n))
    mm = MatMulCKKS(ea, lambda i, j: M[i, j])
    z = rand_slots(ea, rng)
    ct = ea.encrypt(z, pk, rng)
    out = mm.apply(ct, sk)
    got = ea.decrypt(out, sk)
    assert dist(got, M @ z) < 1e-2, dist(got, M @ z)


def test_li_micciancio_decrypt_noise(setup):
    """Mitigated decrypt adds key/ctxt-derived noise: deterministic per
    (sk, ctxt), different from rawDecrypt, within ~2x the error bound
    (reference EaCx.cpp:88-131, Ctxt.cpp:3051)."""
    ctx, sk, pk, ea, rng = setup
    z = rand_slots(ea, rng)
    ct = ea.encrypt(z, pk, rng)
    d1 = ea.decrypt(ct, sk)
    d2 = ea.decrypt(ct, sk)
    assert dist(d1, d2) == 0.0            # derandomized via hash(sk, ctxt)
    raw = ea.raw_decrypt(ct, sk)
    assert dist(d1, raw) > 0.0            # noise actually added
    # total error stays bounded: |dec - z| <= errorBound + added eps (plus
    # the sigma_min floor); allow a generous constant factor
    assert dist(d1, z) < 16 * max(ct.error_bound(), 1e-6) + 1e-4
