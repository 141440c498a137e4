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


def test_query_builder_cnf():
    """Weighted-CNF compilation (reference QueryBuilder::build,
    query.h:391-404, expandOr/tidy/buildWeights)."""
    from helib_tpu.algos.query import (QueryBuilder, make_query, parse_query,
                                       Not, And, Or, Col)
    q = (make_query(0) | make_query(1)) & make_query(2)
    qt = QueryBuilder(q).build(4)
    # one OR clause {0,1} and one singleton clause {2}
    assert len(qt.taus) == 2 and qt.contains_or
    taus = sorted(tuple(t) for t in qt.taus)
    assert taus == [(0, 0, 1, 0), (1, 1, 0, 0)]
    assert qt.mus == [0, 0]

    # NOT pushes through: !(0 AND 1) == (!0 OR !1)
    qt2 = QueryBuilder(~(make_query(0) & make_query(1))).build(2)
    assert len(qt2.taus) == 1
    assert tuple(qt2.taus[0]) == (-1, -1) and qt2.mus == [2]

    # tautology clause (0 OR !0) is dropped
    qt3 = QueryBuilder((make_query(0) | ~make_query(0))
                       & make_query(1)).build(2)
    assert len(qt3.taus) == 1 and tuple(qt3.taus[0]) == (0, 1)

    # infix string parsing (reference convertToPostFix)
    e = parse_query("0 AND (1 OR NOT 2)")
    assert isinstance(e, And) and isinstance(e.b, Or)
    assert isinstance(e.b.b, Not) and e.b.b.a.index == 2

    # removeOr rewrite keeps only AND/NOT
    qb = QueryBuilder(make_query(0) | make_query(1)).remove_or()
    def no_or(node):
        if isinstance(node, Or):
            return False
        kids = [getattr(node, k) for k in ("a", "b") if hasattr(node, k)]
        return all(no_or(k) for k in kids)
    assert no_or(qb.expr)


def test_database_query_weighted_cnf():
    """contains() via the shallow weighted-CNF path (large p): clause scores
    are linear, product across clauses, FLT map back to 0/1 (reference
    partialMatch.h:366-397)."""
    from helib_tpu.algos.query import Database, make_query, QueryBuilder
    ctx = Context(m=31, p=5, r=1, bits=600, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=101)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rng = np.random.default_rng(103)
    cols = [rng.integers(0, 3, ea.nslots) for _ in range(3)]
    db = Database(ea, sk, [ea.encrypt(list(c), pk, rng) for c in cols])
    qv = [1, 2, 0]
    qc = {i: ea.encrypt([qv[i]] * ea.nslots, pk, rng) for i in range(3)}
    expr = (make_query(0) | ~make_query(1)) & make_query(2)
    qt = QueryBuilder(expr).build(3)
    assert qt.contains_or and ctx.p > 2   # exercises the weighted path
    res = db.contains(qt, qc)
    m = [(c == v).astype(np.int64) for c, v in zip(cols, qv)]
    expect = ((m[0] | (1 - m[1])) & m[2]).astype(np.int64)
    np.testing.assert_array_equal(ea.decrypt_ints(res, sk), expect)

    # get_score returns the raw clause-product score
    score = db.get_score(qt, qc)
    raw = (m[0] + (1 - m[1])) * m[2] % ctx.p
    np.testing.assert_array_equal(ea.decrypt_ints(score, sk), raw)
