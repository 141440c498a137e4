"""Tests: intraSlot, tableLookup, permutations, linpoly, io, argmap, security
(mirrors reference GTestIntraSlot/GTestTableLookup/TestPermutations/
TestBinIO/TestArgMap)."""

import io as _io

import numpy as np
import pytest

from helib_tpu.context import Context
from helib_tpu.keys import SecKey, PubKey
from helib_tpu.ea import EncryptedArray
from helib_tpu.algos.intraslot import (build_unpack_slot_encoding, unpack,
                                       repack)
from helib_tpu.algos.linpoly import lin_poly_coeffs, apply_linearized
from helib_tpu.algos.tablelookup import table_lookup, compute_all_products
from helib_tpu.algos.permutations import apply_permutation
from helib_tpu import io as hio
from helib_tpu.argmap import ArgMap, ArgMapError
from helib_tpu.security import lwe_estimate_security, context_security


@pytest.fixture(scope="module")
def setup():
    ctx = Context(m=31, p=2, r=1, bits=400, c=3, scheme="bgv")   # d=5, 6 slots
    sk = SecKey(ctx, seed=51)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rng = np.random.default_rng(53)
    return ctx, sk, pk, ea, rng


def test_linpoly_identity(setup):
    ctx, sk, pk, ea, rng = setup
    d = ea.d
    # identity map: images = basis itself
    images = [np.eye(d, dtype=np.int64)[k] for k in range(d)]
    cs = lin_poly_coeffs(ea, images)
    slots = [rng.integers(0, 2, d) for _ in range(ea.nslots)]
    ct = ea.encrypt(slots, pk, rng)
    out = apply_linearized(ea, ct, cs, sk)
    dec = ea.decrypt(out, sk)
    for a, b in zip(dec, slots):
        np.testing.assert_array_equal(a, np.asarray(b) % 2)


def test_unpack_repack(setup):
    ctx, sk, pk, ea, rng = setup
    d = ea.d
    slots = [rng.integers(0, 2, d) for _ in range(ea.nslots)]
    ct = ea.encrypt(slots, pk, rng)
    enc = build_unpack_slot_encoding(ea)
    parts = unpack(ea, ct, sk, enc)
    assert len(parts) == d
    mat = np.array(slots)
    for j, pj in enumerate(parts):
        np.testing.assert_array_equal(ea.decrypt_ints(pj, sk), mat[:, j],
                                      err_msg=f"coeff {j}")
    back = repack(ea, parts)
    dec = ea.decrypt(back, sk)
    for a, b in zip(dec, slots):
        np.testing.assert_array_equal(a, np.asarray(b) % 2)


def test_table_lookup(setup):
    ctx, sk, pk, ea, rng = setup
    k = 3
    idx = rng.integers(0, 1 << k, ea.nslots)
    bits = [ea.encrypt(list((idx >> i) & 1), pk, rng) for i in range(k)]
    sel = compute_all_products(ea, bits, sk)
    for v in range(1 << k):
        np.testing.assert_array_equal(ea.decrypt_ints(sel[v], sk),
                                      (idx == v).astype(np.int64))
    table = [(3 * v + 1) % 2 for v in range(1 << k)]
    out = table_lookup(ea, bits, table, sk)
    expect = np.array([table[v] for v in idx])
    np.testing.assert_array_equal(ea.decrypt_ints(out, sk), expect)


def test_permutation(setup):
    ctx, sk, pk, ea, rng = setup
    n = ea.nslots
    perm = rng.permutation(n)
    s = rng.integers(0, 2, n)
    ct = ea.encrypt(list(s), pk, rng)
    out = apply_permutation(ea, ct, perm, sk)
    np.testing.assert_array_equal(ea.decrypt_ints(out, sk), s[perm])


def test_benes_network(setup):
    """Benes swap-network routing, cleartext and homomorphic
    (reference GeneralBenesNetwork / PermNetwork)."""
    from helib_tpu.algos.benes import BenesNetwork
    ctx, sk, pk, ea, rng = setup
    n = ea.nslots
    for _ in range(20):          # cleartext construction sweep
        p = rng.permutation(n)
        bn = BenesNetwork(p)
        v = rng.integers(0, 100, n)
        np.testing.assert_array_equal(bn.apply_vector(v), v[p])
    perm = rng.permutation(n)
    bn = BenesNetwork(perm)
    s = rng.integers(0, 2, n)
    ct = ea.encrypt(list(s), pk, rng)
    out = bn.apply(ea, ct, sk)
    assert out.is_correct(), out.capacity()
    np.testing.assert_array_equal(ea.decrypt_ints(out, sk), s[perm])


def test_io_roundtrip(setup):
    ctx, sk, pk, ea, rng = setup
    s = rng.integers(0, 2, ea.nslots)
    ct = ea.encrypt(list(s), pk, rng)
    data = hio.to_bytes(hio.write_ctxt, ct)
    ct2 = hio.from_bytes(hio.read_ctxt, data, ctx, pk)
    np.testing.assert_array_equal(ea.decrypt_ints(ct2, sk), s)
    # context json + binary
    js = hio.context_to_json(ctx)
    ctx2 = hio.context_from_json(js)
    assert ctx2.m == ctx.m and ctx2.L == ctx.L
    data = hio.to_bytes(hio.write_context, ctx)
    ctx3 = hio.from_bytes(hio.read_context, data)
    assert np.array_equal(ctx3.qs, ctx.qs)
    # secret key
    data = hio.to_bytes(hio.write_seckey, sk)
    sk2 = hio.from_bytes(hio.read_seckey, data, ctx)
    np.testing.assert_array_equal(sk2.s_coeffs, sk.s_coeffs)
    dec = sk2.decrypt_bgv(ct)
    np.testing.assert_array_equal(ea.decode_ints(dec), s)


def test_pubkey_io(setup):
    ctx, sk, pk, ea, rng = setup
    data = hio.to_bytes(hio.write_pubkey, pk, True)
    sk2 = hio.from_bytes(hio.read_seckey,
                         hio.to_bytes(hio.write_seckey, sk), ctx)
    pk2 = hio.from_bytes(hio.read_pubkey, data, ctx, sk2)
    s = rng.integers(0, 2, ea.nslots)
    ct = ea.encrypt(list(s), pk2, rng)
    np.testing.assert_array_equal(ea.decrypt_ints(ct, sk2), s)


def test_pubkey_io_prg_seeded_matrices(setup):
    """KS matrices serialize only their b-columns + PRG seed; the uniform
    a-columns are regenerated at load (reference keySwitching.h:67-108)."""
    ctx, sk, pk, ea, rng = setup
    from helib_tpu.keys import SKHandle
    sk.gen_ks_matrix(SKHandle(2, 1, 0))     # relin matrix
    W = sk.matrices[(2, 1)]
    assert W.prg_seed is not None
    data = hio.to_bytes(hio.write_pubkey, pk, True)
    # seeded format must be smaller than one that stores the a-columns too
    a_bytes = sum(np.asarray(a).nbytes for a in W.a)
    sk2 = hio.from_bytes(hio.read_seckey,
                         hio.to_bytes(hio.write_seckey, sk), ctx)
    pk2 = hio.from_bytes(hio.read_pubkey, data, ctx, sk2)
    assert len(data) <= a_bytes * 2 + sum(
        np.asarray(b).nbytes for b in W.b) + 65536
    W2 = sk2.matrices[(2, 1)]
    for a1, a2 in zip(W.a, W2.a):
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    # a mult+relin using the RELOADED matrices decrypts correctly
    s = rng.integers(0, 2, ea.nslots)
    ct = ea.encrypt(list(s), pk2, rng)
    ct2 = ct.multiply(ct, sk2)
    np.testing.assert_array_equal(ea.decrypt_ints(ct2, sk2), s * s)


def test_bounded_samplers():
    """Bounded rejection samplers return samples whose actual canonical
    norm is within the stated bound (reference sample.cpp *Bounded)."""
    from helib_tpu.context import Context
    from helib_tpu import dcrt
    from helib_tpu.norms import embedding_largest_coeff_log2
    ctx = Context(m=45, p=2, r=1, bits=120, c=2, scheme="bgv")
    rng = np.random.default_rng(7)
    for fn, args in [(dcrt.sample_small_bounded, ()),
                     (dcrt.sample_gaussian_bounded, ()),
                     (dcrt.sample_hwt_bounded, (8,))]:
        coeffs, bound = fn(ctx, rng, *args)
        actual = embedding_largest_coeff_log2(coeffs, ctx.m, ctx.pal.pow2)
        assert actual <= bound, (fn.__name__, actual, bound)


def test_argmap():
    am = (ArgMap().arg("m", 45, "cyclotomic").arg("p", 2).required()
          .toggle("verbose"))
    out = am.parse(["m=31", "p", "5", "verbose"])
    assert out == {"m": 31, "p": 5, "verbose": True}
    with pytest.raises(ArgMapError):
        am.parse(["m=31"])   # missing required p
    with pytest.raises(ArgMapError):
        am.parse(["bogus=1", "p=2"])


def test_automorph_recording(setup):
    """dryRun analog: record automorphism exponents during a planning run,
    pre-generate exactly those KS matrices (reference setAutomorphVals)."""
    from helib_tpu.dryrun import record_automorphs, add_these_matrices
    ctx, sk, pk, ea, rng = setup
    s = rng.integers(0, 2, ea.nslots)
    ct = ea.encrypt(list(s), pk, rng)
    with record_automorphs() as vals:
        ea.rotate(ct.copy(), 1, sk)
    assert vals, "no automorphisms recorded"
    sk2 = SecKey(ctx, seed=99)
    add_these_matrices(sk2, vals)
    for k in vals:
        assert (1, k) in sk2.matrices


def test_security_estimator(setup):
    ctx = setup[0]
    # affine fit sanity: dense keys, n=phi(m)
    s = lwe_estimate_security(4096, 100, 0)
    assert abs(s - (3.8 * 40.96 - 20)) < 1e-6
    assert lwe_estimate_security(4096, 100, 60) == 0.0   # below-min sparse
    assert context_security(ctx) >= 0.0


def test_frb_matrix_strategies():
    """addSomeFrbMatrices / addMinimalFrbMatrices (reference
    keySwitching.cpp:599,660): BSGS subset vs single-hop minimal set."""
    from helib_tpu.context import Context
    from helib_tpu.keys import SecKey
    from helib_tpu.ksstrategy import (add_some_frb_matrices,
                                      add_minimal_frb_matrices,
                                      add_frb_matrices, ks_giant_step_size)
    # m=127, p=2: ord(2) mod 127 = 7 -> d=7
    ctx = Context(m=127, p=2, r=1, bits=300, c=3, scheme="bgv")
    d = ctx.pal.d
    assert d == 7

    sk = SecKey(ctx, seed=89)
    base = len(sk.matrices)
    add_frb_matrices(sk)
    assert len(sk.matrices) - base == d - 1   # all powers 1..d-1

    sk = SecKey(ctx, seed=89)
    base = len(sk.matrices)
    add_some_frb_matrices(sk, bound=0)        # force BSGS
    g = ks_giant_step_size(d)
    expect = len(set(list(range(1, g)) + list(range(g, d, g))))
    assert len(sk.matrices) - base == expect

    sk = SecKey(ctx, seed=89)
    base = len(sk.matrices)
    add_minimal_frb_matrices(sk)
    # d=7 <= MIN_THRESH: only s(X^p)
    assert len(sk.matrices) - base == 1
    # frobenius still reachable via hop chains
    from helib_tpu.ksstrategy import hop_path
    for j in range(1, d):
        path = hop_path(sk, pow(2, j, 127))
        assert path is not None and len(path) == j
