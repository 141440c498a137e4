"""Tutorial 7: serialization and sk-free deserialized evaluation.

Mirrors /root/reference/examples/tutorial/07_ckks_serialization.cpp +
08_ckks_deserialization.cpp: the client serializes Context + PubKey (with
its key-switching matrices) and a ciphertext; the server deserializes and
computes WITHOUT any secret material; the client decrypts the returned
result.
"""

import io
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from helib_tpu.context import Context
from helib_tpu.keys import SecKey, PubKey, SKHandle
from helib_tpu.ckks import EncryptedArrayCKKS
from helib_tpu.io import (write_context, read_context, write_pubkey,
                          read_pubkey, write_ctxt, read_ctxt)


def main():
    # ---- client side ----
    ctx = Context(m=256, p=-1, r=30, bits=240, c=3, scheme="ckks")
    sk = SecKey(ctx, seed=0)
    pk = PubKey(sk)
    sk.gen_ks_matrix(SKHandle(2, 1, 0))     # mult relin matrix
    ea = EncryptedArrayCKKS(ctx)
    rng = np.random.default_rng(4)
    z = rng.uniform(-1, 1, ea.nslots)
    ct = ea.encrypt(z, pk, rng)

    blob = io.BytesIO()
    write_context(blob, ctx)
    write_pubkey(blob, pk)                  # includes the KS matrices
    write_ctxt(blob, ct)
    print(f"serialized context+pubkey+ctxt: {blob.tell()} bytes")

    # ---- server side: NO SecKey object exists here ----
    blob.seek(0)
    sctx = read_context(blob)
    spk = read_pubkey(blob, sctx)
    sct = read_ctxt(blob, sctx, spk)
    result = sct.multiply(sct, spk)         # sk-free relinearization
    out = io.BytesIO()
    write_ctxt(out, result)

    # ---- client side again ----
    out.seek(0)
    back = read_ctxt(out, ctx, pk)
    sea = EncryptedArrayCKKS(ctx)
    err = np.max(np.abs(sea.decrypt(back, sk) - z * z))
    print(f"server-computed z^2: err={float(err):.2e}")


if __name__ == "__main__":
    main()
