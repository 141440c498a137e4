"""Application layer: Ptxt mirror, PtxtArray, encrypted DB query, CLI e2e
(mirrors reference TestPtxt / TestPartialMatch / utils bats pipeline)."""

import subprocess
import sys

import numpy as np
import pytest

from helib_tpu.context import Context
from helib_tpu.keys import SecKey, PubKey
from helib_tpu.ea import EncryptedArray
from helib_tpu.ptxt import PtxtBGV, PtxtArray
from helib_tpu.algos.query import Database, make_query


@pytest.fixture(scope="module")
def setup():
    ctx = Context(m=31, p=2, r=1, bits=500, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=71)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rng = np.random.default_rng(73)
    return ctx, sk, pk, ea, rng


def test_ptxt_mirrors_ctxt(setup):
    ctx, sk, pk, ea, rng = setup
    s1 = rng.integers(0, 2, ea.nslots)
    s2 = rng.integers(0, 2, ea.nslots)
    p1, p2 = PtxtBGV(ea, list(s1)), PtxtBGV(ea, list(s2))
    c1, c2 = ea.encrypt(list(s1), pk, rng), ea.encrypt(list(s2), pk, rng)
    # add / mul / rotate mirror
    np.testing.assert_array_equal(p1.add(p2).ints(),
                                  ea.decrypt_ints(c1.copy().add(c2), sk))
    np.testing.assert_array_equal(p1.multiply(p2).ints(),
                                  ea.decrypt_ints(c1.multiply(c2, sk), sk))
    np.testing.assert_array_equal(p1.rotate(2).ints(),
                                  ea.decrypt_ints(ea.rotate(c1.copy(), 2, sk),
                                                  sk))
    np.testing.assert_array_equal(p1.total_sums().ints()[0] * np.ones(
        ea.nslots, dtype=np.int64), p1.total_sums().ints())


def test_ptxt_array(setup):
    ctx, sk, pk, ea, rng = setup
    vals = rng.integers(0, 2, ea.nslots)
    pa = PtxtArray(ea, list(vals))
    ct = pa.encrypt(pk, rng)
    pb = PtxtArray(ea).decrypt(ct, sk)
    np.testing.assert_array_equal(pb.store(), vals)
    assert pa.distance(pb) == 0


def test_database_query(setup):
    ctx, sk, pk, ea, rng = setup
    col0 = rng.integers(0, 2, ea.nslots)
    col1 = rng.integers(0, 2, ea.nslots)
    db = Database(ea, sk, [ea.encrypt(list(col0), pk, rng),
                           ea.encrypt(list(col1), pk, rng)])
    q0 = rng.integers(0, 2, 1)[0]
    q1 = rng.integers(0, 2, 1)[0]
    qc = {0: ea.encrypt([q0] * ea.nslots, pk, rng),
          1: ea.encrypt([q1] * ea.nslots, pk, rng)}
    expr = make_query(0) & make_query(1)
    res = db.contains(expr, qc)
    expect = ((col0 == q0) & (col1 == q1)).astype(np.int64)
    np.testing.assert_array_equal(ea.decrypt_ints(res, sk), expect)
    expr2 = make_query(0) | ~make_query(1)
    res2 = db.contains(expr2, qc)
    expect2 = ((col0 == q0) | (col1 != q1)).astype(np.int64)
    np.testing.assert_array_equal(ea.decrypt_ints(res2, sk), expect2)


def test_cli_pipeline(tmp_path):
    """create-context -> key-gen -> encrypt -> decrypt -> diff
    (reference utils/tests/full-pipeline.bats)."""
    import os
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": "/root/repo",
                "HELIB_FORCE_CPU": "1"})
    ctxf = tmp_path / "ctx.bin"
    data = tmp_path / "data.txt"
    ct = tmp_path / "ct.bin"
    out = tmp_path / "out.txt"
    np.savetxt(data, np.array([1, 0, 1, 1, 0, 1]), fmt="%d")

    def run(*args):
        r = subprocess.run([sys.executable, "-m", "helib_tpu.cli", *args],
                           capture_output=True, text=True, env=env,
                           cwd="/root/repo", timeout=900)
        assert r.returncode == 0, r.stderr[-2000:]

    run("create-context", f"m=31", "p=2", "r=1", "bits=200", "c=2",
        f"out={ctxf}")
    run("key-gen", f"ctx={ctxf}", f"out={tmp_path}/key")
    run("encrypt", f"ctx={ctxf}", f"key={tmp_path}/key.pk", f"in={data}",
        f"out={ct}")
    run("decrypt", f"ctx={ctxf}", f"key={tmp_path}/key.sk", f"in={ct}",
        f"out={out}")
    got = np.loadtxt(out, dtype=np.int64)
    np.testing.assert_array_equal(got[:6], [1, 0, 1, 1, 0, 1])
