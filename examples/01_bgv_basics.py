"""Tutorial 1: BGV basics — packed arithmetic, rotations, depth.

Role equivalent of the reference examples/tutorial BGV walk-throughs."""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from helib_tpu.context import Context
from helib_tpu.keys import SecKey, PubKey
from helib_tpu.ea import EncryptedArray
from helib_tpu.algos.sums import total_sums


def main():
    # Build a context: m=31 gives 6 slots of GF(2^5) with p=2.
    ctx = Context(m=31, p=2, r=1, bits=400, c=3, scheme="bgv")
    ctx.printout()
    sk = SecKey(ctx, seed=0)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rng = np.random.default_rng(0)

    v1 = np.array([1, 0, 1, 1, 0, 1])
    v2 = np.array([0, 1, 1, 0, 1, 1])
    c1 = ea.encrypt(list(v1), pk, rng)
    c2 = ea.encrypt(list(v2), pk, rng)
    print("capacity after encrypt:", round(c1.capacity(), 1))

    prod = c1.multiply(c2, sk)               # slot-wise product, relinearized
    print("product slots:", ea.decrypt_ints(prod, sk), "== ", v1 * v2)
    print("capacity after multiply:", round(prod.capacity(), 1))

    rot = ea.rotate(prod.copy(), 2, sk)
    print("rotated by 2:", ea.decrypt_ints(rot, sk))

    tot = total_sums(ea, prod, sk)
    print("total sums:", ea.decrypt_ints(tot, sk))


if __name__ == "__main__":
    main()
