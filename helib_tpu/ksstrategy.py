"""Key-switching matrix generation strategies.

TPU-native equivalent of reference keySwitching.h:205-256 /
src/keySwitching.cpp: decide WHICH automorphism matrices to pre-generate
(rotations are the expensive resource), plus the multi-hop key-switch map
(reference PubKey::setKeySwitchMap, keys.h:143-147) used by smartAutomorph
when an exact matrix is missing.
"""

from __future__ import annotations

import math

from .keys import SecKey, SKHandle
from .nt.numbth import inv_mod

KS_GIANT_STEP_THRESHOLD = 50   # reference keySwitching.h:225 (BSGS cutoff)


def add_relin_matrix(sk: SecKey):
    sk.gen_ks_matrix(SKHandle(2, 1, 0))


def add_1d_matrices(sk: SecKey, dim: int | None = None):
    """Matrices for all powers of each generator (reference add1DMatrices)."""
    pal = sk.ctx.pal
    m = sk.ctx.m
    dims = range(len(pal.gens)) if dim is None else [dim]
    for d in dims:
        g, D = pal.gens[d], pal.orders[d]
        for j in range(1, D):
            sk.gen_ks_matrix(SKHandle(1, pow(g, j, m), 0))
            if not pal.native[d]:
                # bad dims also need the wrapped automorphism g^{j-D}
                sk.gen_ks_matrix(SKHandle(1, pow(g, j - D, m), 0))


def add_some_1d_matrices(sk: SecKey, bound: int = KS_GIANT_STEP_THRESHOLD):
    """BSGS subset for big dims (reference addSome1DMatrices): for dims with
    order > bound, only baby steps [1, g) and giant steps multiples of g."""
    pal = sk.ctx.pal
    m = sk.ctx.m
    for d in range(len(pal.gens)):
        g, D = pal.gens[d], pal.orders[d]
        if D <= bound:
            add_1d_matrices(sk, d)
            continue
        gs = int(math.isqrt(D))
        for j in list(range(1, gs)) + list(range(gs, D, gs)):
            sk.gen_ks_matrix(SKHandle(1, pow(g, j, m), 0))


def add_frb_matrices(sk: SecKey):
    """Frobenius powers X -> X^{p^j} (reference addFrbMatrices)."""
    ctx = sk.ctx
    for j in range(1, ctx.pal.d):
        sk.gen_ks_matrix(SKHandle(1, pow(ctx.p, j, ctx.m), 0))


def ks_giant_step_size(D: int) -> int:
    """ceil(sqrt(D)) — giant-step size shared with the BSGS matmul routines
    (reference KSGiantStepSize, keySwitching.cpp:297)."""
    if D <= 0:
        raise ValueError("step size must be positive")
    g = math.isqrt(D)
    return g if g * g >= D else g + 1


KS_MIN_THRESHOLD = 8   # reference HELIB_KEYSWITCH_MIN_THRESH


def add_some_frb_matrices(sk: SecKey, bound: int = KS_GIANT_STEP_THRESHOLD):
    """BSGS subset of Frobenius matrices s(X^{p^j})->s(X) when ord(p) is
    large (reference addSomeFrbMatrices, keySwitching.h:235,
    keySwitching.cpp:599)."""
    ctx = sk.ctx
    d = ctx.pal.d
    if bound >= d:
        add_frb_matrices(sk)
        return
    g = ks_giant_step_size(d)
    for j in list(range(1, g)) + list(range(g, d, g)):
        sk.gen_ks_matrix(SKHandle(1, pow(ctx.p, j, ctx.m), 0))


def add_bsgs_frb_matrices(sk: SecKey):
    """Force the BSGS Frobenius set (reference addBSGSFrbMatrices)."""
    add_some_frb_matrices(sk, 0)


def add_minimal_frb_matrices(sk: SecKey):
    """Cheapest Frobenius set: s(X^p) plus one giant step when ord(p) is
    large; powers reached by hop chains (reference addMinimalFrbMatrices,
    keySwitching.cpp:660)."""
    ctx = sk.ctx
    d = ctx.pal.d
    if d <= 1:
        return
    sk.gen_ks_matrix(SKHandle(1, ctx.p % ctx.m, 0))
    if d > KS_MIN_THRESHOLD:
        g = ks_giant_step_size(d)
        sk.gen_ks_matrix(SKHandle(1, pow(ctx.p, g, ctx.m), 0))


def add_matrices_4_network(sk: SecKey, pp):
    """Generate exactly the automorphism matrices a built permutation
    network will use (reference addMatrices4Network, keySwitching.h:249,
    keySwitching.cpp:667).  `pp` is an algos.optimize_perms.PermPrecomp."""
    pal = sk.ctx.pal
    m = sk.ctx.m
    for dim, amt in sorted(pp.needed_rotations()):
        dim, amt = int(dim), int(amt)
        if amt % pal.orders[dim] == 0:
            continue
        g, D = int(pal.gens[dim]), int(pal.orders[dim])
        amt %= D
        sk.gen_ks_matrix(SKHandle(1, pow(g, amt, m), 0))
        if not pal.native[dim]:
            sk.gen_ks_matrix(SKHandle(1, pow(g, amt - D, m), 0))


def add_all_matrices(sk: SecKey):
    """Every automorphism (reference addAllMatrices) — heavyweight."""
    m = sk.ctx.m
    for k in range(2, m):
        if math.gcd(k, m) == 1:
            sk.gen_ks_matrix(SKHandle(1, k, 0))


def add_minimal_1d_matrices(sk: SecKey):
    """One matrix per generator (+inverse) — cheapest set enabling all
    rotations via hops (reference addMinimal1DMatrices)."""
    pal = sk.ctx.pal
    m = sk.ctx.m
    for d in range(len(pal.gens)):
        g = pal.gens[d]
        sk.gen_ks_matrix(SKHandle(1, g % m, 0))
        sk.gen_ks_matrix(SKHandle(1, inv_mod(g, m), 0))


def hop_path(key, kexp: int) -> list[int] | None:
    """Decompose X->X^kexp into available one-hop automorphisms (role of
    reference setKeySwitchMap + smartAutomorph's hop chain, Ctxt.cpp:2462).
    Returns a list of hop exponents whose product is kexp mod m, or None."""
    m = key.ctx.m
    avail = sorted({h[1] for h in key.matrices if h[0] == 1 and h[1] != 1})
    if not avail:
        return None
    kexp %= m
    if kexp == 1:
        return []
    # BFS over the group generated by available hops
    from collections import deque
    prev: dict[int, tuple[int, int]] = {1: (0, 0)}
    dq = deque([1])
    while dq:
        cur = dq.popleft()
        for a in avail:
            nxt = cur * a % m
            if nxt not in prev:
                prev[nxt] = (cur, a)
                if nxt == kexp:
                    path = []
                    node = kexp
                    while node != 1:
                        p, a2 = prev[node]
                        path.append(a2)
                        node = p
                    return list(reversed(path))
                dq.append(nxt)
    return None
