"""Tutorial 8: BGV packed (SIMD) arithmetic.

Mirrors /root/reference/examples/BGV_packed_arithmetic: one ciphertext
holds nslots plaintext values; adds/multiplies/rotations act slot-wise,
plaintext operands mix in for free via Ptxt mirrors.
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from helib_tpu.context import Context
from helib_tpu.keys import SecKey, PubKey
from helib_tpu.ea import EncryptedArray
from helib_tpu.ptxt import PtxtBGV


def main():
    # the reference example's parameters: m=32109, p=4999 gives many slots;
    # scaled down for a quick demo ring (same API surface)
    ctx = Context(m=257, p=2, r=4, bits=300, c=2, scheme="bgv")
    sk = SecKey(ctx, seed=0)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rng = np.random.default_rng(5)
    pr = ctx.ptxt_space
    print(f"m={ctx.m} p^r={pr} slots={ea.nslots} d={ea.d}")

    v = rng.integers(0, pr, ea.nslots)
    ct = ea.encrypt(list(v), pk, rng)

    ct.add(ct)                               # ctxt + ctxt
    expect = (v + v) % pr
    ct2 = ct.multiply(ct, sk)                # ctxt * ctxt (+relin)
    expect = expect * expect % pr

    pt = PtxtBGV(ea, list(rng.integers(0, pr, ea.nslots)))
    ct2.add_constant(ea.encode_ptxt(pt.ints()))   # ctxt + ptxt
    expect = (expect + pt.ints()) % pr

    rot = ea.rotate(ct2, 1, sk)              # SIMD rotation
    expect = np.roll(expect, 1)

    got = ea.decrypt_ints(rot, sk)
    assert np.array_equal(got, expect)
    print("packed add/mult/ptxt-add/rotate: exact ✓  "
          f"capacity={rot.capacity():.0f}")


if __name__ == "__main__":
    main()
