"""Tutorial 6: CKKS encrypted matrix-vector products + multLowLvl.

Mirrors /root/reference/examples/tutorial/04_ckks_matmul.cpp and
05_ckks_multlowlvl.cpp: a plaintext matrix applied to an encrypted vector
via rotation-and-diagonal (MatMulCKKS), and the level-aware multiply that
equalizes operand levels before the tensor product.
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from helib_tpu.context import Context
from helib_tpu.keys import SecKey, PubKey
from helib_tpu.ckks import EncryptedArrayCKKS
from helib_tpu.algos.matmul_ckks import MatMulCKKS


def main():
    ctx = Context(m=256, p=-1, r=30, bits=300, c=3, scheme="ckks")
    sk = SecKey(ctx, seed=0)
    pk = PubKey(sk)
    ea = EncryptedArrayCKKS(ctx)
    rng = np.random.default_rng(3)
    n = ea.nslots

    M = rng.uniform(-1, 1, (n, n))
    z = rng.uniform(-1, 1, n)
    ct = ea.encrypt(z, pk, rng)
    mm = MatMulCKKS(ea, lambda i, j: M[i, j])
    out = mm.apply(ct, sk)
    err = np.max(np.abs(ea.decrypt(out, sk).real - M @ z))
    print(f"matmul {n}x{n}: err={float(err):.2e}")

    # multLowLvl: the reference tutorial's lesson (05_ckks_multlowlvl.cpp)
    # is DEFERRED RELINEARIZATION — an inner product sum_i c_i * d_i adds
    # the fast non-canonical products and relinearizes ONCE at the end
    # (relinearize is the expensive half of a multiply)
    ws = rng.uniform(-1, 1, (3, n))
    cs = [ea.encrypt(w, pk, rng) for w in ws]
    ds = [ea.encrypt(z, pk, rng) for _ in range(3)]
    acc = None
    for c, d in zip(cs, ds):
        t = c.mul_low_level(d)          # fast: tensor only, 3 parts
        acc = t if acc is None else acc.add(t)
    acc.relinearize(sk)                 # one relin for the whole sum
    ea.rescale(acc)
    expect = sum(w * z for w in ws)
    err = np.max(np.abs(ea.decrypt(acc, sk).real - expect))
    print(f"inner product (1 relin for 3 mults): err={float(err):.2e} "
          f"capacity={acc.capacity():.1f}")


if __name__ == "__main__":
    main()
