"""Factor-tree ThinEvalMap: scalable slot<->coefficient maps.

TPU-native equivalent of reference ThinEvalMap (/root/reference/src/
EvalMap.cpp:495-930, include/helib/EvalMap.h:87-104): the linear maps of
thin bootstrapping decomposed along the coprime factorization m = prod m_t
into one MatMul1D stage per hypercube dimension — O(sum D_t) rotations
instead of the dense sigma-span solve (recryption.LinearMapR) whose
construction is O(phi(m)^4).

Construction (simplified relative to the reference's inflate/deflate pair;
equivalent for THIN bootstrapping):
  * slotToCoeff (forward): per hypercube dim, a MatMul1D with the
    Vandermonde V_t[i][j] = pts_j^i over E = Z_{p^r}[Y]/G, where
    pts_j = Y^{reps_j * (m/m_t)} (reference ThinStep2Matrix points).
  * coeffToSlot (inverse): per dim the inverse Vandermonde, then a constant
    multiply by the trace-dual c (Tr(c) = 1), then traceMap.  The final
    trace leaves a CONSTANT in every slot for ANY input (total Z-linearity),
    and on thin inputs the composition is exactly the identity:
        Tr(c * (V^{-1} (x) ... ) ( (x) V ... ) v) = Tr(c) * v = v.
    The reference achieves the same through its Step1 deflation against the
    trace form; folding the dual element c in is algebraically equivalent
    for thin ciphertexts and considerably simpler.

Requires a Context built with a factor-aligned mvec
(nt/factoralign.find_aligned_mvec)."""

from __future__ import annotations

import numpy as np

from .nt import polymod as pm
from .nt.numbth import inv_mod
from .ea import EncryptedArray
from .algos.matmul import MatMul1D


# ---------------------------------------------------------------------------
# E-arithmetic helpers (E = Z_{p^r}[Y]/G)
# ---------------------------------------------------------------------------

def _e_mat_inv(A, G, p, r):
    """Inverse of a matrix with entries in E (coeff lists), Gauss-Jordan
    (role of reference ppInvert over zz_pE)."""
    pr = p**r
    n = len(A)
    M = [[list(A[i][j]) for j in range(n)] for i in range(n)]
    Inv = [[([1] if i == j else []) for j in range(n)] for i in range(n)]
    for col in range(n):
        piv = next((i for i in range(col, n)
                    if M[i][col] and _e_is_unit(M[i][col], G, p)), None)
        assert piv is not None, "singular E-matrix"
        if piv != col:
            M[col], M[piv] = M[piv], M[col]
            Inv[col], Inv[piv] = Inv[piv], Inv[col]
        ip = pm.poly_inv_mod(M[col][col], G, p, r)
        M[col] = [pm.pmulmod(x, ip, G, pr) for x in M[col]]
        Inv[col] = [pm.pmulmod(x, ip, G, pr) for x in Inv[col]]
        for i2 in range(n):
            if i2 == col or not M[i2][col]:
                continue
            f = M[i2][col]
            M[i2] = [pm.psub(a, pm.pmulmod(f, b, G, pr), pr)
                     for a, b in zip(M[i2], M[col])]
            Inv[i2] = [pm.psub(a, pm.pmulmod(f, b, G, pr), pr)
                       for a, b in zip(Inv[i2], Inv[col])]
    return Inv


def _e_is_unit(x, G, p):
    xr = pm.trim([c % p for c in x])
    if not xr:
        return False
    Gp = [c % p for c in G]
    return pm.pgcd(xr, Gp, p) == [1]


def _inv_scalar_matrix(A: np.ndarray, p: int, r: int) -> np.ndarray:
    """Inverse of an integer matrix mod p^r (vectorized Gauss-Jordan)."""
    pr = p**r
    n = A.shape[0]
    M = (A % pr).astype(np.int64)
    Inv = np.eye(n, dtype=np.int64)
    for col in range(n):
        piv = col + int(np.argmax(M[col:, col] % p != 0))
        assert M[piv, col] % p != 0, "singular scalar matrix"
        if piv != col:
            M[[col, piv]] = M[[piv, col]]
            Inv[[col, piv]] = Inv[[piv, col]]
        ip = pow(int(M[col, col]), -1, pr)
        M[col] = (M[col] * ip) % pr
        Inv[col] = (Inv[col] * ip) % pr
        f = M[:, col].copy()
        f[col] = 0
        M = (M - np.outer(f, M[col])) % pr
        Inv = (Inv - np.outer(f, Inv[col])) % pr
    return Inv


def _trace(x, G, p, r, d):
    """Tr(x) = sum_{k<d} x^{p^k} mod (G, p^r)."""
    pr = p**r
    x0 = pm.pmod([c % pr for c in x], G, pr)
    acc = list(x0)
    xk = list(x0)
    for _ in range(1, d):
        xk = pm.ppowmod(xk, p, G, pr)
        acc = pm.padd(acc, xk, pr)
    return acc


def trace_dual_one(G, p, r, d):
    """c in E with Tr(c) = 1 (trace form is nondegenerate for p unramified):
    c = first row of the inverse of the trace matrix [Tr(Y^{i+j})]."""
    tvec = []
    for i in range(2 * d - 1):
        tr = _trace([0] * i + [1], G, p, r, d)
        assert len(tr) <= 1, "trace of a basis power is not constant"
        tvec.append(int(tr[0]) if tr else 0)
    tmat = np.array([[tvec[i + j] for j in range(d)] for i in range(d)],
                    dtype=np.int64)
    tmat_inv = _inv_scalar_matrix(tmat, p, r)
    return [int(x) for x in tmat_inv[0]]


# ---------------------------------------------------------------------------

class ThinEvalMapTree:
    def __init__(self, ea: EncryptedArray, invert: bool):
        ctx = ea.ctx
        pal = ctx.pal
        assert pal.aligned is not None, "Context must be built with mvec"
        s = pal.aligned
        mvec = list(pal.mvec)
        self.ea = ea
        self.invert = invert
        nf = len(mvec)
        d = pal.d
        p, r, pr = ea.p, ea.r, ea.pr
        G = ea.G
        m = ctx.m

        # local representatives (reference init_representatives): inverse
        # powers of the local generator
        local_reps = []
        for t in range(nf):
            mt = mvec[t]
            Dt = len(s["local_reps"][t])
            g_inv = inv_mod(s["local_gens"][t] % mt, mt)
            local_reps.append([pow(g_inv, i, mt) for i in range(Dt)])
        fac_to_dim = {f: i for i, f in enumerate(s["dims_factor"])}

        def vandermonde(t):
            cof = m // mvec[t]
            sz = len(local_reps[t])
            pts = [pm.ppowmod([0, 1], (rep * cof) % m, G, pr)
                   for rep in local_reps[t]]
            A = [[None] * sz for _ in range(sz)]
            for j in range(sz):
                A[0][j] = [1]
            for i in range(1, sz):
                for j in range(sz):
                    A[i][j] = pm.pmulmod(A[i - 1][j], pts[j], G, pr)
            return A, sz

        self.stages = []          # ("matmul", dim, A) in application order
        self.trace_dual = None
        if not invert:
            for t in range(nf - 1, -1, -1):
                A, sz = vandermonde(t)
                if sz > 1:
                    self.stages.append(("matmul", fac_to_dim[t], A))
        else:
            for t in range(nf):
                A, sz = vandermonde(t)
                if sz > 1:
                    Ainv = _e_mat_inv(A, G, p, r)
                    self.stages.append(("matmul", fac_to_dim[t], Ainv))
            self.trace_dual = trace_dual_one(G, p, r, d)

    def apply(self, ctxt, sk):
        ea = self.ea
        cur = ctxt
        for _, dim, A in self.stages:
            mm = MatMul1D(ea, dim, lambda i, j, A=A: A[i][j])
            cur = mm.apply(cur, sk)
        if self.invert:
            c = np.zeros(ea.d, dtype=np.int64)
            cc = np.asarray(self.trace_dual, dtype=np.int64)
            c[:len(cc)] = cc
            cur = cur.copy()
            cur.mul_constant_poly(ea.encode([c] * ea.nslots))
            cur.trace_map(sk)
        return cur
