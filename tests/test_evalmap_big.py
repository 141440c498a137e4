"""m=35113 (13*37*73) factor-tree correctness — the reference's BIG
bootstrap config (/root/reference/benchmarks/bgv_thinboot.cpp:129,
mvec {37,13,73}) — validated at the cleartext level through the real
MatMul1D/rotate/trace code paths before any TPU benchmark runs it.

phi(35113) = 31104, d = ord(2) = 36, 864 slots; mvec {37, 949} with the
composite last factor exactly as the reference (gens {16134, 8548},
ords {36, 24} — reproduced independently by nt.factoralign).
"""

import numpy as np
import pytest

from helib_tpu.context import Context
from helib_tpu.ea import EncryptedArray
from helib_tpu.evalmap import ThinEvalMapTree
from helib_tpu.nt.numbth import phi_n


def _slot_positions(ctx, tmap, phis):
    """Flat powerful index that each slot's value is placed on / read from
    (same helper as test_evalmap; tests/ is not a package)."""
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


@pytest.mark.slow
@pytest.mark.big_mem
def test_m35113_thin_factor_tree_cleartext():
    from helib_tpu.debugging import PtSim
    from helib_tpu.powerful import PowerfulBasis

    ctx = Context(m=35113, p=2, r=1, bits=120, c=3, scheme="bgv",
                  mvec=(37, 949))
    ea = EncryptedArray(ctx)
    assert ctx.pal.aligned is not None, "35113 factor tree must align"
    rng = np.random.default_rng(35113)

    m, mvec = ctx.m, list(ctx.pal.mvec)
    pwb = PowerfulBasis(m, mvec)
    phis = [phi_n(mt) for mt in mvec]
    fwd = ThinEvalMapTree(ea, invert=False)
    pos = _slot_positions(ctx, fwd, phis)
    assert len(set(pos)) == len(pos)

    def pad_m(poly):
        out = np.zeros(m, dtype=np.int64)
        out[: len(poly)] = poly
        return out

    # slotToCoeff: slot constants land on powerful coordinates
    v = rng.integers(0, ctx.ptxt_space, ea.nslots)
    y = fwd.apply(PtSim(ea.encode(list(v)), ea), None).poly
    pw = np.array([int(x) % ctx.ptxt_space
                   for x in pwb.poly_to_w_powerful(pad_m(y),
                                                   ctx.ptxt_space)])
    np.testing.assert_array_equal(pw[pos], v)
    assert not np.delete(pw, pos).any()

    # coeffToSlot at the recryption plaintext space (r' > r), arbitrary
    # (non-thin) input — the property digit extraction relies on
    big_r = 5
    ea_big = EncryptedArray(ctx, r_override=big_r)
    inv = ThinEvalMapTree(ea_big, invert=True)
    N = ctx.p ** big_r
    u = rng.integers(0, N, ctx.phi_m)
    pw_u = np.array([int(x) % N
                     for x in pwb.poly_to_w_powerful(pad_m(u), N)])
    out = inv.apply(PtSim(u, ea_big), None).poly
    dec = ea_big.decode(out)
    for sl in range(ea_big.nslots):
        val = dec[sl]
        assert not np.any(val[1:]), f"slot {sl} not constant"
        assert int(val[0]) % N == int(pw_u[pos[sl]]), sl
