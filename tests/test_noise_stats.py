"""Noise-model validation counters (reference fhe_stats methodology,
fhe_stats.h:38-53): run circuits with fhe_stats enabled and assert the
measured/estimated noise ratios stay below 1 — the estimates are
high-probability upper bounds, so measured/bound > 1 means the noise
machine is wrong (reference validates the same three ratios:
KS-noise-ratio Ctxt.cpp:835, break-into-digits-ratio DoubleCRT.cpp:548,
CKKS_encode_ratio EaCx.cpp:277)."""

import numpy as np
import pytest

import helib_tpu.timing as timing
from helib_tpu.context import Context
from helib_tpu.keys import SecKey, PubKey
from helib_tpu.ea import EncryptedArray


@pytest.fixture
def stats_on():
    timing.reset_stats()
    timing.fhe_stats = True
    yield
    timing.fhe_stats = False
    timing.reset_stats()


def _get(name):
    s = timing._stats.get(name)
    assert s is not None, f"stat {name} never updated"
    return s


def test_break_into_digits_ratio(stats_on):
    """Digit norms stay below the uniform bound charged to the estimate."""
    ctx = Context(m=31, p=2, r=1, bits=500, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=211)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rng = np.random.default_rng(223)
    a = ea.encrypt(list(rng.integers(0, 2, ea.nslots)), pk, rng)
    b = ea.encrypt(list(rng.integers(0, 2, ea.nslots)), pk, rng)
    out = a.multiply(b, sk)          # relin -> breakIntoDigits
    out = out.multiply(out, sk)
    s = _get("break-into-digits-ratio")
    assert s.count >= 2
    assert s.max <= 1.0, f"digit norm exceeded bound: {s.max}"


def test_ckks_encode_ratio(stats_on):
    from helib_tpu.ckks import EncryptedArrayCKKS
    ctx = Context(m=256, p=-1, r=20, bits=240, c=3, scheme="ckks")
    eac = EncryptedArrayCKKS(ctx)
    rng = np.random.default_rng(227)
    for _ in range(4):
        vals = rng.normal(size=eac.nslots) + 1j * rng.normal(size=eac.nslots)
        eac.encode(vals)
    s = _get("CKKS_encode_ratio")
    assert s.count >= 4
    assert s.max <= 1.0, f"encode error exceeded bound: {s.max}"


def test_deep_circuit_estimate_tracks_measured(stats_on):
    """Estimated noiseBound stays an upper bound on the measured
    canonical-embedding noise through a deep mult/rotate chain (the
    reference's checkNoise methodology, debugging.h:81)."""
    ctx = Context(m=31, p=2, r=1, bits=500, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=229)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rng = np.random.default_rng(233)
    vals = rng.integers(0, 2, ea.nslots)
    ct = ea.encrypt(list(vals), pk, rng)
    headroom = []
    for i in range(4):
        ct = ct.multiply(ct, sk)
        ct = ea.rotate(ct, 1 + (i % 2), sk)
        measured = sk.noise_of(ct)
        estimated = ct.noise
        headroom.append(estimated - measured)
        assert measured <= estimated + 0.5, \
            f"step {i}: measured {measured:.1f} > estimate {estimated:.1f}"
    assert ct.is_correct()
    # the estimate must not be vacuous either: within ~40 bits of measured
    assert min(headroom) < 40, headroom


def test_exact_modswitch_noise_tightens_estimate(monkeypatch):
    """HELIB_EXACT_MODSWITCH=1 (reference Ctxt.cpp:491-503 behavior:
    measure the actual mod-switch delta norm instead of the worst-case
    bound): the measured ciphertext must decrypt identically and report
    noise <= the estimate-only ciphertext, i.e. MORE capacity."""
    import os
    ctx = Context(m=31, p=2, r=1, bits=400, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=11)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rng = np.random.default_rng(13)
    vals = rng.integers(0, 2, ea.nslots)

    def run(exact):
        if exact:
            monkeypatch.setenv("HELIB_EXACT_MODSWITCH", "1")
        else:
            # "0" = worst-case bound only (the measurement is ON by
            # default since round 5, so the baseline must opt out)
            monkeypatch.setenv("HELIB_EXACT_MODSWITCH", "0")
        r2 = np.random.default_rng(13)
        ct = ea.encrypt(list(vals), pk, r2)
        ct = ct.square(sk)
        ct = ct.square(sk)
        got = ea.decrypt_ints(ct, sk)
        return ct, got

    ct_b, got_b = run(False)
    ct_e, got_e = run(True)
    np.testing.assert_array_equal(got_b, vals)
    np.testing.assert_array_equal(got_e, vals)
    # the measured-noise ciphertext never reports MORE noise, and after a
    # couple of squarings it should be strictly tighter
    assert ct_e.noise <= ct_b.noise + 1e-9, (ct_e.noise, ct_b.noise)
    assert ct_e.capacity() >= ct_b.capacity() - 1e-9
