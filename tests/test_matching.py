"""Matching / max-flow / permutation decomposition tests
(mirrors the reference matching.cpp usage in permutation routing)."""

import numpy as np

from helib_tpu.algos.matching import (max_bipartite_matching, maximum_flow,
                                      perm_to_column_perms)


def test_bipartite_matching():
    m = max_bipartite_matching(3, 3, [(0, 0), (0, 1), (1, 1), (2, 2)])
    assert len(m) == 3
    m2 = max_bipartite_matching(2, 2, [(0, 0), (1, 0)])
    assert len(m2) == 1


def test_maximum_flow():
    f, flow = maximum_flow(4, 0, 3, {(0, 1): 3, (0, 2): 2, (1, 3): 2,
                                     (2, 3): 2, (1, 2): 1})
    assert f == 4
    assert all(v > 0 for v in flow.values())


def test_perm_to_column_perms():
    rng = np.random.default_rng(11)
    for rows, cols in [(2, 3), (3, 4), (4, 4), (5, 2)]:
        n = rows * cols
        for _ in range(10):
            perm = rng.permutation(n)
            pre, mid, post = perm_to_column_perms(perm, rows, cols)
            for j in range(n):
                assert pre[j] % cols == j % cols
                assert mid[j] // cols == j // cols
                assert post[j] % cols == j % cols
            v = np.arange(n)
            got = v[pre][mid][post]
            np.testing.assert_array_equal(got, v[perm])
