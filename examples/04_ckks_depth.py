"""Tutorial 4: CKKS capacity and accuracy through a depth ladder.

Mirrors /root/reference/examples/tutorial/02_ckks_depth.cpp: each
homomorphic multiplication consumes *capacity* (log2 Q/noise — when it
drops below 1 the ciphertext is dead) and grows the *absolute error*
(|decrypted - expected|, bounded by Ctxt.error_bound()).  This walks a
squaring ladder and prints both after every level.
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from helib_tpu.context import Context
from helib_tpu.keys import SecKey, PubKey
from helib_tpu.ckks import EncryptedArrayCKKS


def main():
    # precision r=20 matches the reference tutorial's precision(20)
    ctx = Context(m=1024, p=-1, r=20, bits=300, c=3, scheme="ckks")
    sk = SecKey(ctx, seed=0)
    pk = PubKey(sk)
    ea = EncryptedArrayCKKS(ctx)
    rng = np.random.default_rng(1)

    z = rng.uniform(-1, 1, ea.nslots)
    ct = ea.encrypt(z, pk, rng)
    expect = z.copy()
    print(f"fresh: capacity={ct.capacity():.1f} "
          f"errorBound={ct.error_bound():.2e}")

    level = 0
    while True:
        nxt = ct.multiply(ct, sk)
        ea.rescale(nxt)
        if not nxt.is_correct():
            print(f"level {level + 1}: capacity exhausted "
                  f"({nxt.capacity():.1f}) — stopping")
            break
        ct, expect, level = nxt, expect * expect, level + 1
        err = float(np.max(np.abs(ea.decrypt(ct, sk) - expect)))
        print(f"level {level}: capacity={ct.capacity():.1f} "
              f"errorBound={ct.error_bound():.2e} actual_err={err:.2e}")
        assert err <= max(ct.error_bound(), 1e-6), "error bound violated"


if __name__ == "__main__":
    main()
