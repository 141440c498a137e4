"""Secret-key-free evaluation (the HE deployment model).

In the reference, key-switching matrices live on the PubKey
(/root/reference/include/helib/keys.h:48-318) and Ctxt::reLinearize /
smartAutomorph touch only public material (/root/reference/src/Ctxt.cpp:
718-786, 2462-2515) — a server holding Context + PubKey alone can
relinearize, rotate, and run matmuls.  These tests pin that capability:
the SecKey object is deleted after keygen + serialization, and the whole
evaluation runs on a PubKey deserialized from bytes.
"""

import io as _io

import numpy as np
import pytest

from helib_tpu.context import Context
from helib_tpu.keys import SecKey, PubKey, SKHandle, find_ks_matrix
from helib_tpu.ea import EncryptedArray
from helib_tpu.exceptions import LogicError
from helib_tpu import ksstrategy
from helib_tpu.io import (write_context, read_context, write_pubkey,
                          read_pubkey)


def _setup(m=31, p=2, r=1, bits=120, c=2):
    ctx = Context(m=m, p=p, r=r, bits=bits, c=c, scheme="bgv")
    sk = SecKey(ctx, seed=7)
    pk = PubKey(sk)
    return ctx, sk, pk


def test_pubkey_only_rotate_matmul_relin_bit_exact():
    """serialize Context+PubKey -> delete SecKey from the server side ->
    encrypt + square + rotate + MatMul1D on the deserialized PubKey alone;
    decrypt with the client-side SecKey matches the plaintext oracle."""
    ctx, sk, pk = _setup()
    # keygen-time strategy: mult matrix + 1D rotation matrices
    sk.gen_ks_matrix(SKHandle(2, 1, 0))
    ksstrategy.add_1d_matrices(sk)

    buf = _io.BytesIO()
    write_context(buf, ctx)
    write_pubkey(buf, pk)
    buf.seek(0)
    server_ctx = read_context(buf)
    server_pk = read_pubkey(buf, server_ctx)   # NO SecKey on the server
    assert server_pk.matrices, "deserialized PubKey must carry KS matrices"

    ea = EncryptedArray(server_ctx)
    rng = np.random.default_rng(3)
    vals = list(rng.integers(0, 2, ea.nslots))
    ct = ea.encrypt(vals, server_pk, rng)

    # square (tensor + relinearize) with the PubKey only
    ct2 = ct.multiply(ct, server_pk)
    # rotate with the PubKey only
    ct2 = ea.rotate(ct2, 1, server_pk)
    # MatMul1D (BSGS + hoisting) with the PubKey only
    from helib_tpu.algos.matmul import MatMul1D
    nsl = ea.nslots
    mat = rng.integers(0, 2, (nsl, nsl))
    mm = MatMul1D(ea, 0, lambda i, j: int(mat[i, j]))
    out = mm.apply(ct2, server_pk)

    # plaintext oracle
    sq = [v * v % 2 for v in vals]
    rot = [sq[(i - 1) % nsl] for i in range(nsl)]
    exp = [int(sum(mat[i, j] * rot[j] for j in range(nsl)) % 2)
           for i in range(nsl)]

    # decrypt client-side with the ORIGINAL SecKey (ct evaluated under the
    # deserialized context; decrypt under the original one — same params)
    ea_client = EncryptedArray(ctx)
    out.ctx = ctx
    got = list(int(v) for v in ea_client.decrypt_ints(out, sk))
    assert got == exp


def test_pubkey_missing_matrix_raises():
    """A PubKey with no matrices must fail loudly, not mint from a secret
    (reference smartAutomorph asserts on an unreachable keySwitchMap)."""
    ctx, sk, pk = _setup()
    ea = EncryptedArray(ctx)
    rng = np.random.default_rng(0)
    ct = ea.encrypt([1] * ea.nslots, pk, rng)
    with pytest.raises(LogicError):
        ct.multiply(ct, pk)          # no (2,1) matrix anywhere
    sk.gen_ks_matrix(SKHandle(2, 1, 0))
    ct.multiply(ct, pk)              # shared dict: now visible on the pk


def test_seckey_on_demand_minting_strict_mode(monkeypatch):
    """SecKey minting on miss is a dev convenience; HELIB_STRICT_KS makes
    it an error so strategy coverage can be asserted in CI."""
    ctx, sk, pk = _setup()
    ea = EncryptedArray(ctx)
    rng = np.random.default_rng(0)
    ct = ea.encrypt([1] * ea.nslots, pk, rng)
    monkeypatch.setenv("HELIB_STRICT_KS", "1")
    with pytest.raises(LogicError):
        ct.multiply(ct, sk)
    monkeypatch.delenv("HELIB_STRICT_KS")
    ct.multiply(ct, sk)              # mints with a warning


def test_pubkey_hop_path_rotation():
    """smartAutomorph on a PubKey holding only generator-power matrices
    routes through hop_path instead of failing (reference keySwitchMap)."""
    ctx, sk, pk = _setup(m=31)
    sk.gen_ks_matrix(SKHandle(2, 1, 0))
    ksstrategy.add_minimal_1d_matrices(sk)   # only g and g^-1 hops
    ea = EncryptedArray(ctx)
    rng = np.random.default_rng(5)
    vals = list(rng.integers(0, 2, ea.nslots))
    ct = ea.encrypt(vals, pk, rng)
    ct = ea.rotate(ct, 2, pk)                # needs a hop chain
    exp = [vals[(i - 2) % ea.nslots] for i in range(ea.nslots)]
    assert list(int(v) for v in ea.decrypt_ints(ct, sk)) == exp


def test_find_ks_matrix_views_shared():
    ctx, sk, pk = _setup()
    assert find_ks_matrix(pk, SKHandle(2, 1, 0)) is None
    W = sk.gen_ks_matrix(SKHandle(2, 1, 0))
    assert find_ks_matrix(pk, SKHandle(2, 1, 0)) is W
    assert not hasattr(pk, "sk"), "PubKey must not reference the SecKey"
