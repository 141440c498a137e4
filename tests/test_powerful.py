"""Powerful-basis tests (mirrors reference GTestPowerful): roundtrip and the
tensor-DFT identity that underlies the factor-tree EvalMap."""

import numpy as np

from helib_tpu.powerful import PowerfulBasis, factor_mvec
from helib_tpu.nt.numbth import root_of_unity
from helib_tpu.nt.primegen import gen_primes
from helib_tpu.ops.ntt import power_table


def test_factor_mvec():
    assert factor_mvec(45) == [9, 5]
    assert factor_mvec(4095) == [9, 5, 7, 13]


def test_roundtrip():
    m = 45
    pb = PowerfulBasis(m, [9, 5])
    rng = np.random.default_rng(2)
    c = rng.integers(0, 100, m)
    t = pb.poly_to_powerful(c)
    assert t.shape == (9, 5)
    back = pb.powerful_to_poly(t)
    np.testing.assert_array_equal(back, c)
    # batched
    cb = rng.integers(0, 100, (3, m))
    tb = pb.poly_to_powerful(cb)
    assert tb.shape == (3, 9, 5)
    np.testing.assert_array_equal(pb.powerful_to_poly(tb), cb)


def test_tensor_dft_identity():
    """f(w^a) equals the multi-dim DFT of the powerful tensor at
    (a mod m_1, ..., a mod m_k) with axis roots w^{crt_t}."""
    m, mvec = 15, [3, 5]
    q = gen_primes(m, 1)[0]
    pb = PowerfulBasis(m, mvec)
    w = root_of_unity(m, q)
    pw = power_table(w, q, m).astype(np.int64)
    rng = np.random.default_rng(3)
    c = rng.integers(0, q, m).astype(np.int64)
    t = pb.poly_to_powerful(c)
    # multi-dim DFT mod q, axis by axis
    roots = [pow(w, u, q) for u in pb.crt_units]
    cur = t.astype(object)
    for ax, (mt, rt) in enumerate(zip(mvec, roots)):
        D = np.array([[pow(rt, (i * j) % mt, q) for j in range(mt)]
                      for i in range(mt)], dtype=object)
        cur = np.tensordot(D, cur.swapaxes(0, ax), axes=([1], [0])) \
            .swapaxes(0, ax) % q
    for a in range(m):
        direct = sum(int(ci) * int(pw[(a * j) % m]) for j, ci in enumerate(c)) % q
        assert int(cur[a % 3, a % 5]) == direct, a


def test_w_powerful_mod_phim_roundtrip():
    """Mod-Phi_m powerful basis (W_t = X^{m/m_t} convention): poly ->
    powerful -> poly is the identity mod (Phi_m, N)."""
    from helib_tpu.nt.cyclotomic import cyclotomic_poly
    from helib_tpu.nt import polymod as pm
    m, mvec, N = 255, [3, 5, 17], 2**9
    pb = PowerfulBasis(m, mvec)
    rng = np.random.default_rng(5)
    c = rng.integers(0, N, m)
    pw = pb.poly_to_w_powerful(c, N)
    assert len(pw) == 128
    back = pb.w_powerful_to_poly([int(x) % N for x in pw])
    phim = [int(x) % N for x in cyclotomic_poly(m)]
    a = pm.pmod([int(x) % N for x in c], phim, N)
    b = pm.pmod([int(x) % N for x in back], phim, N)
    assert a == b
