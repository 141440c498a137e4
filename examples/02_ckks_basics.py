"""Tutorial 2: CKKS approximate arithmetic — encode, multiply, rescale."""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from helib_tpu.context import Context
from helib_tpu.keys import SecKey, PubKey
from helib_tpu.ckks import EncryptedArrayCKKS


def main():
    ctx = Context(m=256, p=-1, r=30, bits=240, c=3, scheme="ckks")
    sk = SecKey(ctx, seed=0)
    pk = PubKey(sk)
    ea = EncryptedArrayCKKS(ctx)
    rng = np.random.default_rng(0)

    z = rng.uniform(-1, 1, ea.nslots) + 1j * rng.uniform(-1, 1, ea.nslots)
    ct = ea.encrypt(z, pk, rng)
    sq = ct.square(sk)
    ea.rescale(sq)
    got = ea.decrypt(sq, sk)
    print("max error of z^2:", float(np.max(np.abs(got - z * z))))
    rot = ea.rotate(sq, 1, sk)
    print("rotate ok:", float(np.max(np.abs(ea.decrypt(rot, sk)
                                            - np.roll(z * z, 1)))))


if __name__ == "__main__":
    main()
