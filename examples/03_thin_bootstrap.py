"""Tutorial 3: thin bootstrapping — refresh a worn-out ciphertext."""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from helib_tpu.context import Context
from helib_tpu.keys import SecKey, PubKey
from helib_tpu.ea import EncryptedArray
from helib_tpu.recryption import RecryptData, thin_recrypt


def main():
    ctx = Context(m=31, p=2, r=1, bits=800, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=0, hwt=16)      # sparse key for bootstrapping
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rc = RecryptData(ctx, sk, ea, hwt=16)
    print("recryption params:", rc)
    rng = np.random.default_rng(0)

    v = np.array([1, 0, 1, 1, 0, 1])
    ct = ea.encrypt(list(v), pk, rng)
    ct.bring_to_k(3)                      # pretend we computed a deep circuit
    print("capacity before recrypt:", round(ct.capacity(), 1))
    out = thin_recrypt(ct, rc, sk)
    print("capacity after recrypt:", round(out.capacity(), 1))
    print("slots preserved:", ea.decrypt_ints(out, sk), "==", v)


if __name__ == "__main__":
    main()
