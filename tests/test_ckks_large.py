"""CKKS at production parameter sizes (reference ckks_basic.cpp:239-263 and
TestCKKS.cpp run m=16384/65536; round-1 only tested m<=1024).

Checks at m=16384 (default suite, ~minutes on CPU):
  - encrypt/decrypt precision at qbits=360
  - deep mult chain precision with rescaling (the uniform-30-bit rescale
    granularity's accumulated error, documented in context.py design notes)
  - rotation precision
m=65536/qbits=440 (the reference's largest config) is gated HELIB_RUN_BIG;
the TPU benchmark queue (benchmarks/run_all_r2.sh) exercises it every round.
"""

import os

import numpy as np
import pytest

from helib_tpu.context import Context
from helib_tpu.keys import SecKey, PubKey
from helib_tpu.ckks import EncryptedArrayCKKS


@pytest.fixture(scope="module")
def setup16k():
    ctx = Context(m=16384, p=-1, r=35, bits=360, c=3, scheme="ckks")
    sk = SecKey(ctx, seed=21)
    pk = PubKey(sk)
    ea = EncryptedArrayCKKS(ctx)
    rng = np.random.default_rng(23)
    return ctx, sk, pk, ea, rng


def dist(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


@pytest.mark.slow
def test_encrypt_decrypt_16k(setup16k):
    ctx, sk, pk, ea, rng = setup16k
    z = rng.uniform(-1, 1, ea.nslots) + 1j * rng.uniform(-1, 1, ea.nslots)
    ct = ea.encrypt(z, pk, rng)
    assert ct.is_correct()
    got = ea.decrypt(ct, sk)
    d = dist(got, z)
    # reference precision expectation at this size: |err| << 1e-3; the
    # decrypt error bound itself must also cover the actual error
    assert d < 1e-3, d
    assert d <= max(ct.error_bound() * 4, 1e-6), (d, ct.error_bound())


@pytest.mark.slow
@pytest.mark.big_mem
def test_mult_chain_precision_16k(setup16k):
    """Depth-4 squaring chain with rescales: accumulated precision loss of
    the uniform-30-bit prime chain stays within the tracked error bound."""
    ctx, sk, pk, ea, rng = setup16k
    z = rng.uniform(-1, 1, ea.nslots) * 0.9
    ct = ea.encrypt(z, pk, rng)
    want = z.astype(np.complex128)
    for _ in range(4):
        ct = ct.multiply(ct, sk)
        ea.rescale(ct)
        want = want * want
        assert ct.is_correct(), ct.capacity()
    got = ea.decrypt(ct, sk)
    d = dist(got, want)
    assert d < 1e-2, d
    # the error estimate must remain an upper bound (x4 slack for the
    # high-probability canonical-embedding factors)
    assert d <= max(ct.error_bound() * 4, 1e-6), (d, ct.error_bound())


@pytest.mark.slow
def test_rotate_16k(setup16k):
    ctx, sk, pk, ea, rng = setup16k
    z = rng.uniform(-1, 1, ea.nslots) + 1j * rng.uniform(-1, 1, ea.nslots)
    ct = ea.encrypt(z, pk, rng)
    ct2 = ea.rotate(ct, 5, sk)
    got = ea.decrypt(ct2, sk)
    assert dist(got, np.roll(z, 5)) < 1e-3


@pytest.mark.skipif(not os.environ.get("HELIB_RUN_BIG"),
                    reason="m=65536 CKKS on CPU is very slow; HELIB_RUN_BIG=1"
                           " (the TPU bench queue runs this config)")
def test_encrypt_decrypt_64k():
    ctx = Context(m=65536, p=-1, r=35, bits=440, c=3, scheme="ckks")
    sk = SecKey(ctx, seed=31)
    pk = PubKey(sk)
    ea = EncryptedArrayCKKS(ctx)
    rng = np.random.default_rng(33)
    z = rng.uniform(-1, 1, ea.nslots) + 1j * rng.uniform(-1, 1, ea.nslots)
    ct = ea.encrypt(z, pk, rng)
    ct = ct.multiply(ct, sk)
    ea.rescale(ct)
    got = ea.decrypt(ct, sk)
    assert dist(got, z * z) < 1e-2
