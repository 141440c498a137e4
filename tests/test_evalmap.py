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


def _slot_positions(ctx, tmap, phis):
    """Flat powerful index that each slot's value is placed on / read from."""
    pal = ctx.pal
    s = pal.aligned
    fac_to_dim = {f: i for i, f in enumerate(s["dims_factor"])}
    pos = []
    for sl in range(pal.nslots):
        cs = pal.coords(sl)
        flat = 0
        for t in range(len(phis)):
            j_t = cs[fac_to_dim[t]] * tmap.steps[t] if t in fac_to_dim else 0
            flat = flat * phis[t] + j_t
        pos.append(flat)
    return pos


def test_exactness_cleartext(setup):
    """The properties digit extraction relies on, checked at the plaintext
    level through the real MatMul1D/rotate/trace code paths:
      * slotToCoeff places the slot constants on powerful coordinates;
      * coeffToSlot extracts powerful coordinates EXACTLY mod p^{r'} for
        ARBITRARY (non-thin) inputs — at the recryption space r' > r."""
    from helib_tpu.debugging import PtSim
    from helib_tpu.powerful import PowerfulBasis
    from helib_tpu.nt.numbth import phi_n
    ctx, sk, pk, ea, rng = setup
    m, mvec = ctx.m, list(ctx.pal.mvec)
    pwb = PowerfulBasis(m, mvec)
    phis = [phi_n(mt) for mt in mvec]
    fwd = ThinEvalMapTree(ea, invert=False)
    pos = _slot_positions(ctx, fwd, phis)
    assert len(set(pos)) == len(pos)

    def pad_m(poly):
        out = np.zeros(m, dtype=np.int64)
        out[:len(poly)] = poly
        return out

    v = rng.integers(0, ctx.ptxt_space, ea.nslots)
    y = fwd.apply(PtSim(ea.encode(list(v)), ea), None).poly
    pw = np.array([int(x) % ctx.ptxt_space
                   for x in pwb.poly_to_w_powerful(pad_m(y), ctx.ptxt_space)])
    np.testing.assert_array_equal(pw[pos], v)
    assert not np.delete(pw, pos).any()

    big_r = 9
    ea_big = EncryptedArray(ctx, r_override=big_r)
    inv = ThinEvalMapTree(ea_big, invert=True)
    N = ctx.p ** big_r
    u = rng.integers(0, N, ctx.phi_m)
    pw_u = np.array([int(x) % N for x in pwb.poly_to_w_powerful(pad_m(u), N)])
    out = inv.apply(PtSim(u, ea_big), None).poly
    for sl, val in enumerate(ea_big.decode(out)):
        assert not np.any(val[1:]), f"slot {sl} not constant"
        assert int(val[0]) % N == int(pw_u[pos[sl]]), sl


def _fat_positions(ctx, phis, d):
    """Flat powerful index for (slot, packed offset i): prefix dims map
    coordinate -> coordinate, the last factor packs d coefficients per
    slot (evalmap packing convention)."""
    pal = ctx.pal
    s = pal.aligned
    fac_to_dim = {f: i for i, f in enumerate(s["dims_factor"])}
    nf = len(phis)
    pos = {}
    for sl in range(pal.nslots):
        cs = pal.coords(sl)
        for i in range(d):
            flat = 0
            for t in range(nf):
                c_t = cs[fac_to_dim[t]] if t in fac_to_dim else 0
                j_t = c_t * d + i if t == nf - 1 else c_t
                flat = flat * phis[t] + j_t
            pos[(sl, i)] = flat
    return pos


def test_fat_evalmap_cleartext(setup):
    """Fat (packed) factor-tree EvalMap (reference EvalMap, not Thin):
    forward places ALL d coefficients of every slot on powerful
    coordinates; inverse extracts ALL powerful coordinates as packed slots,
    exactly, for arbitrary inputs."""
    from helib_tpu.debugging import PtSim
    from helib_tpu.powerful import PowerfulBasis
    from helib_tpu.nt.numbth import phi_n
    ctx, sk, pk, ea, rng = setup
    m, mvec, d, pr = ctx.m, list(ctx.pal.mvec), ea.d, ea.pr
    pwb = PowerfulBasis(m, mvec)
    phis = [phi_n(mt) for mt in mvec]
    pos = _fat_positions(ctx, phis, d)
    assert len(set(pos.values())) == ctx.phi_m  # bijection onto powerful

    def pad_m(poly):
        out = np.zeros(m, dtype=np.int64)
        out[:len(poly)] = poly
        return out

    # forward: packed slots -> ring element with those powerful coeffs
    fwd = ThinEvalMapTree(ea, invert=False, fat=True)
    w = [rng.integers(0, pr, d) for _ in range(ea.nslots)]
    y = fwd.apply(PtSim(ea.encode(w), ea), None).poly
    pw = np.array([int(x) % pr
                   for x in pwb.poly_to_w_powerful(pad_m(y), pr)])
    for sl in range(ea.nslots):
        for i in range(d):
            assert pw[pos[(sl, i)]] == int(w[sl][i]) % pr, (sl, i)

    # inverse: arbitrary ring element -> packed powerful coeffs, exact at
    # the big recryption space
    big_r = 9
    ea_big = EncryptedArray(ctx, r_override=big_r)
    inv = ThinEvalMapTree(ea_big, invert=True, fat=True)
    N = ctx.p ** big_r
    u = rng.integers(0, N, ctx.phi_m)
    pw_u = np.array([int(x) % N for x in pwb.poly_to_w_powerful(pad_m(u), N)])
    out = inv.apply(PtSim(u, ea_big), None).poly
    for sl, val in enumerate(ea_big.decode(out)):
        for i in range(d):
            assert int(val[i]) % N == int(pw_u[pos[(sl, i)]]), (sl, i)


def test_fat_evalmap_lin_branch():
    """Last factor with a single slot along its dim (D_last = 1): the fat
    stage degenerates to one uniform linearized polynomial ("lin")."""
    from helib_tpu.debugging import PtSim
    from helib_tpu.powerful import PowerfulBasis
    from helib_tpu.nt.numbth import phi_n
    ctx = Context(m=15, p=2, r=1, bits=300, c=3, scheme="bgv", mvec=(3, 5))
    ea = EncryptedArray(ctx)
    rng = np.random.default_rng(17)
    d, pr = ea.d, ea.pr
    assert d == 4 and ea.nslots == 2
    pwb = PowerfulBasis(15, [3, 5])
    phis = [phi_n(3), phi_n(5)]
    pos = _fat_positions(ctx, phis, d)
    fwd = ThinEvalMapTree(ea, invert=False, fat=True)
    inv = ThinEvalMapTree(ea, invert=True, fat=True)
    assert any(st[0] == "lin" for st in fwd.stages)
    w = [rng.integers(0, pr, d) for _ in range(ea.nslots)]
    y = fwd.apply(PtSim(ea.encode(w), ea), None).poly
    pad = np.zeros(15, dtype=np.int64)
    pad[:len(y)] = y
    pw = np.array([int(x) % pr for x in pwb.poly_to_w_powerful(pad, pr)])
    for (sl, i), f in pos.items():
        assert pw[f] == int(w[sl][i]) % pr, (sl, i)
    back = inv.apply(PtSim(y, ea), None).poly
    for sl, val in enumerate(ea.decode(back)):
        np.testing.assert_array_equal(np.asarray(val) % pr,
                                      np.asarray(w[sl]) % pr)


def test_fat_evalmap_roundtrip(setup):
    """Homomorphic: inverse then forward fat tree is the identity on packed
    ciphertexts (exercises BlockMatMul1D through real rotations/KS)."""
    ctx, sk, pk, ea, rng = setup
    inv = ThinEvalMapTree(ea, invert=True, fat=True)
    fwd = ThinEvalMapTree(ea, invert=False, fat=True)
    w = [rng.integers(0, ctx.ptxt_space, ea.d) for _ in range(ea.nslots)]
    ct = ea.encrypt(w, pk, rng)
    mid = inv.apply(ct, sk)
    assert mid.is_correct(), mid.capacity()
    out = fwd.apply(mid, sk)
    assert out.is_correct(), out.capacity()
    got = ea.decrypt(out, sk)
    for sl in range(ea.nslots):
        np.testing.assert_array_equal(
            np.asarray(got[sl]) % ea.pr, np.asarray(w[sl]) % ea.pr)


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
