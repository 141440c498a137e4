"""Depth-bounded permutation-network optimizer tests
(mirrors reference TestPermutations.cpp / OptimizePermutations.cpp)."""

import numpy as np
import pytest

from helib_tpu.context import Context
from helib_tpu.keys import SecKey, PubKey
from helib_tpu.ea import EncryptedArray
from helib_tpu.algos.optimize_perms import (
    optimal_benes, optimal_lower, optimal_upper, compute_e_values,
    tree_leaves, coord_split, PermIndepPrecomp, PermPrecomp, benes_depth)


def test_optimal_benes_dp():
    for n in [4, 6, 8, 15, 16, 30]:
        k = benes_depth(n)
        for budget in (1, 2, 3, 9):
            for good in (False, True):
                c, groups = optimal_benes(n, budget, good)
                if groups is not None:
                    assert len(groups) <= budget
                    assert sum(groups) == 2 * k - 1
        # more budget never costs more
        c1, _ = optimal_benes(n, 1, False)
        c3, _ = optimal_benes(n, 3, False)
        c9, _ = optimal_benes(n, 9, False)
        assert c1 >= c3 >= c9
        # good merging never costs more than bad
        cb, _ = optimal_benes(n, 2, False)
        cg, _ = optimal_benes(n, 2, True)
        assert cg <= cb


def test_optimal_lower_splits():
    """With a small budget, splitting a composite order beats collapsing a
    single wide network (the point of the generator-tree DP)."""
    memo = {}
    c_split, tree = optimal_lower(30, True, 4, 1, memo)
    assert c_split < 30 - 1  # a single collapsed layer would cost n-1 = 29
    leaves = tree_leaves(tree)
    prod = 1
    for l in leaves:
        prod *= l.order
    assert prod == 30


def test_upper_mid_allocation():
    cost, trees = optimal_upper([(6, True), (4, False)], 7)
    assert trees is not None
    mids = [l.mid for t in trees for l in tree_leaves(t)]
    assert sum(mids) == 1


@pytest.mark.parametrize("order,good", [(12, True), (12, False), (15, True),
                                        (8, False)])
def test_e_value_embedding(order, good):
    """coord_split digits recompose to the coordinate through the e-values
    (reference computeEvalues, OptimizePermutations.cpp:880)."""
    memo = {}
    _, tree = optimal_lower(order, good, 4, 1, memo)
    tree = tree.clone()
    compute_e_values(tree, order)
    leaves = tree_leaves(tree)
    for x in range(order):
        digs = coord_split(tree, x)
        assert sum(d * l.e for d, l in zip(digs, leaves)) % order == x


@pytest.mark.parametrize("m,depth", [(31, 3), (85, 4), (255, 6)])
def test_network_cleartext(m, depth):
    ctx = Context(m=m, p=2, r=1, bits=180, c=2, scheme="bgv")
    ea = EncryptedArray(ctx)
    pip = PermIndepPrecomp(ea, depth)
    rng = np.random.default_rng(m)
    for _ in range(3):
        perm = rng.permutation(ea.nslots)
        pp = PermPrecomp(pip, perm)
        v = np.arange(100, 100 + ea.nslots)
        np.testing.assert_array_equal(pp.apply_vector(v), v[perm])
        assert pp.rotations() <= pip.get_cost()
        assert pip.depth <= depth


def test_network_homomorphic():
    """Full PermIndepPrecomp/PermPrecomp apply on a ciphertext (reference
    TestPermutations applyToCtxt path)."""
    ctx = Context(m=31, p=2, r=1, bits=500, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=71)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    pip = PermIndepPrecomp(ea, 3)
    rng = np.random.default_rng(73)
    perm = rng.permutation(ea.nslots)
    pp = PermPrecomp(pip, perm)
    s = rng.integers(0, 2, ea.nslots)
    ct = ea.encrypt(list(s), pk, rng)
    out = pp.apply(ct, sk)
    assert out.is_correct(), out.capacity()
    np.testing.assert_array_equal(ea.decrypt_ints(out, sk), s[perm])


def test_network_homomorphic_good_dim():
    """Good (native) dimension: rotate1D wraps merge offsets mod the
    subdimension size."""
    ctx = Context(m=63, p=2, r=1, bits=500, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=77)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    assert any(ctx.pal.native), "m=63 should have a native dim"
    pip = PermIndepPrecomp(ea, 4)
    rng = np.random.default_rng(79)
    perm = rng.permutation(ea.nslots)
    pp = PermPrecomp(pip, perm)
    s = rng.integers(0, 2, ea.nslots)
    ct = ea.encrypt(list(s), pk, rng)
    out = pp.apply(ct, sk)
    assert out.is_correct(), out.capacity()
    np.testing.assert_array_equal(ea.decrypt_ints(out, sk), s[perm])


def test_add_matrices_4_network():
    """addMatrices4Network generates exactly the automorphisms a built
    network uses (reference keySwitching.cpp:667)."""
    from helib_tpu.ksstrategy import add_matrices_4_network
    ctx = Context(m=31, p=2, r=1, bits=500, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=79)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    pip = PermIndepPrecomp(ea, 3)
    rng = np.random.default_rng(83)
    perm = rng.permutation(ea.nslots)
    pp = PermPrecomp(pip, perm)

    add_matrices_4_network(sk, pp)
    pal = ctx.pal
    for dim, amt in pp.needed_rotations():
        dim, amt = int(dim), int(amt)
        kexp = pow(int(pal.gens[dim]), amt % int(pal.orders[dim]), ctx.m)
        assert (1, kexp) in sk.matrices, (dim, amt, kexp)

    # network applies correctly with the generated set
    s = rng.integers(0, 2, ea.nslots)
    ct = ea.encrypt(list(s), pk, rng)
    out = pp.apply(ct, sk)
    np.testing.assert_array_equal(ea.decrypt_ints(out, sk), s[perm])
