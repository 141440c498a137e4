"""phi(m)-axis sharding for a single large NTT (four-step + stage exchange).

SURVEY.md §2.9 (last row): a single bootstrappable-size ciphertext tensor
[L, phi(m)] fits one chip, but scaling one big transform across chips needs
the transform axis sharded.  The classic four-step factorization splits the
n-point transform (n = A * nB) into

    out[b*nB + j] = sum_l W2[j, l] * ( tw[b, l] * sum_a W1[b, a] x[a*nB + l] )

      W1[b, a] = rho_b^a         (A x A   "coarse" block matmul)
      tw[b, l] = sigma_b^l       (twist diagonal)
      W2[j, l] = zeta^{t(j) l}   (nB-point local transform, block-independent)

with rho_b = w^(nB * E[b*nB]), sigma_b = w^(E[b*nB]), zeta = w^(ord/nB), and
t(j) the within-block output order — all derived from the SAME symbolic
splitting recursion as ops.ntt.Pow2NTT, so the composition reproduces the
full kernel's `eval_exponents` output order bit-for-bit.

Sharding story: shard the data's block axis (A).  The coarse matmul
contracts over the sharded axis — the one collective exchange (volume =
1x the tensor, the information-theoretic minimum for a transposed
transform); the twist and the nB-point local NTTs are fully local.  XLA
GSPMD inserts the all-gather/all-to-all from the shardings; nothing here
is device-count-specific.

Role equivalence: the reference parallelizes transforms only across RNS
primes with NTL thread pools (DoubleCRT.cpp:79-84); this axis does not
exist there — invented per SURVEY §2.9.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.ntt import Pow2NTT, power_table, _stage_exponents
from ..ops.modops import add_mod, sub_mod, mul_mod_shoup, shoup
from ..nt.numbth import inv_mod
from ..exceptions import assert_true

U32 = jnp.uint32


@dataclass
class ShardedNTT:
    """Four-step split of a Pow2NTT over qs, transform size n = A * nB.

    A is the shard factor (number of row blocks = mesh axis size)."""
    qs: np.ndarray
    n: int
    negacyclic: bool
    A: int
    dev: dict = field(init=False)

    def __post_init__(self):
        n, A = self.n, self.A
        assert_true(n % A == 0 and A & (A - 1) == 0, 'invariant: n % A == 0 and A & (A - 1) == 0')
        nB = n // A
        qs = np.asarray(self.qs, dtype=np.uint64)
        P = len(qs)
        base = Pow2NTT(self.qs, n, negacyclic=self.negacyclic)
        ordr = 2 * n if self.negacyclic else n
        E = base.eval_exponents.astype(object) % ordr
        blk = np.asarray(E).reshape(A, nB)
        # block invariants (same derivation as the fused-kernel four-step)
        assert_true(((blk * nB) % ordr == (blk[:, :1] * nB) % ordr).all(), 'invariant: ((blk * nB) % ordr == (blk[:, :1] * nB) % ordr).all()')
        step = ordr // nB
        tj = (blk - blk[:, :1]) % ordr
        assert_true((tj % step == 0).all(), 'invariant: (tj % step == 0).all()')
        tj = (tj // step).astype(np.int64)
        assert_true((tj == tj[0:1]).all(), "within-block order must be shared")
        tj = tj[0]
        # verify t(j) equals the standalone nB recursion order (so the local
        # stage tables below reproduce exactly the same output ordering)
        _, Eb = _stage_exponents(nB, 0, nB)
        assert_true(tj.tolist() == list(Eb), "local order mismatch")

        W1 = np.zeros((P, A, A), dtype=np.uint32)
        TW = np.zeros((P, A, nB), dtype=np.uint32)
        W1i = np.zeros((P, A, A), dtype=np.uint32)
        TWi = np.zeros((P, A, nB), dtype=np.uint32)
        loc_tw, loc_itw = [], []          # per stage: [P, 2^s]
        ninv_loc = np.zeros((P, 1), dtype=np.uint32)
        stage_exps, _ = _stage_exponents(nB, 0, nB)
        for k, q in enumerate(qs):
            q = int(q)
            w = base.roots[k]
            zeta = pow(w, step, q)
            zi = inv_mod(zeta, q)
            Ainv = inv_mod(A, q)
            for b in range(A):
                rho = pow(w, int(blk[b, 0] * nB) % ordr, q)
                sig = pow(w, int(blk[b, 0]) % ordr, q)
                W1[k, b] = power_table(rho, q, A)
                TW[k, b] = power_table(sig, q, nB)
                # inverse coarse matrix used as W[a, b] = rho_b^{-a}
                # (transposed below when shipped to the device dict)
                W1i[k, b] = power_table(inv_mod(rho, q), q, A)
                TWi[k, b] = (power_table(inv_mod(sig, q), q, nB)
                             .astype(np.uint64) * np.uint64(Ainv)
                             % np.uint64(q)).astype(np.uint32)
            ninv_loc[k, 0] = inv_mod(nB, q)
            zp = power_table(zeta, q, nB).astype(np.uint32)
            zpi = power_table(zi, q, nB).astype(np.uint32)
            for s, exps in enumerate(stage_exps):
                e = np.array(exps, dtype=np.int64) % nB
                if k == 0:
                    loc_tw.append(np.zeros((P, len(e)), dtype=np.uint32))
                    loc_itw.append(np.zeros((P, len(e)), dtype=np.uint32))
                loc_tw[s][k] = zp[e]
                loc_itw[s][k] = zpi[e]

        def sh(a):
            return shoup(a, qs.reshape((P,) + (1,) * (a.ndim - 1)))

        q32 = qs.astype(np.uint32)
        self.dev = {
            "q": jnp.asarray(q32[:, None, None]),             # [P,1,1]
            "W1": jnp.asarray(W1), "W1_sh": jnp.asarray(sh(W1)),
            "W1i": jnp.asarray(W1i.transpose(0, 2, 1)),
            "W1i_sh": jnp.asarray(sh(W1i).transpose(0, 2, 1)),
            "TW": jnp.asarray(TW), "TW_sh": jnp.asarray(sh(TW)),
            "TWi": jnp.asarray(TWi), "TWi_sh": jnp.asarray(sh(TWi)),
            "ltw": [jnp.asarray(a) for a in loc_tw],
            "ltw_sh": [jnp.asarray(sh(a)) for a in loc_tw],
            "litw": [jnp.asarray(a) for a in loc_itw],
            "litw_sh": [jnp.asarray(sh(a)) for a in loc_itw],
            "ninv": jnp.asarray(ninv_loc[:, None, :]),
            "ninv_sh": jnp.asarray(sh(ninv_loc)[:, None, :]),
        }

    # ------------------------------------------------------------------
    def _coarse(self, x, W, Wsh):
        """sum_a W[p, b, a] * x[..., p, a, l] (mod q): the cross-shard stage.

        Written as A broadcast mulmod+add passes so GSPMD lowers it to one
        gather of the sharded axis + local elementwise work."""
        t = self.dev
        q = t["q"]
        acc = None
        for a in range(self.A):
            term = mul_mod_shoup(x[..., a:a + 1, :], W[:, :, a, None],
                                 Wsh[:, :, a, None], q)
            acc = term if acc is None else add_mod(acc, term, q)
        return acc

    def _local(self, x, tw, tw_sh, inverse: bool):
        """Staged nB-point transform along the last axis (block-local)."""
        t = self.dev
        q = t["q"][..., None]
        nB = self.n // self.A
        if not inverse:
            for s in range(len(tw)):
                m = 1 << s
                half = nB // (2 * m)
                w = tw[s][:, None, :, None]
                ws = tw_sh[s][:, None, :, None]
                xr = x.reshape(*x.shape[:-1], m, 2, half)
                u, v = xr[..., 0, :], xr[..., 1, :]
                wv = mul_mod_shoup(v, w, ws, q)
                y = jnp.stack([add_mod(u, wv, q), sub_mod(u, wv, q)], axis=-2)
                x = y.reshape(*y.shape[:-3], nB)
            return x
        for s in reversed(range(len(tw))):
            m = 1 << s
            half = nB // (2 * m)
            w = tw[s][:, None, :, None]
            ws = tw_sh[s][:, None, :, None]
            xr = x.reshape(*x.shape[:-1], m, 2, half)
            a, b = xr[..., 0, :], xr[..., 1, :]
            u = add_mod(a, b, q)
            v = mul_mod_shoup(sub_mod(a, b, q), w, ws, q)
            y = jnp.stack([u, v], axis=-2)
            x = y.reshape(*y.shape[:-3], nB)
        return mul_mod_shoup(x, self.dev["ninv"], self.dev["ninv_sh"],
                             self.dev["q"])

    # ------------------------------------------------------------------
    def _shard_blocks(self, X):
        """Pin the A-block axis (second-to-last) to the instance's mesh
        axis "shard" — this is what makes the four-step actually
        DISTRIBUTE under jit (without a constraint GSPMD is free to keep
        the whole tensor replicated); no-op until set_mesh() is called."""
        mesh = getattr(self, "mesh", None)
        if mesh is None:
            return X
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = P(*([None] * (X.ndim - 2)), "shard", None)
        return jax.lax.with_sharding_constraint(
            X, NamedSharding(mesh, spec))

    def set_mesh(self, mesh):
        """Attach a 1-D Mesh with axis "shard" of size A; subsequent
        fwd/inv traces carry block-axis sharding constraints."""
        assert_true(mesh.shape["shard"] == self.A, (mesh.shape, self.A))
        self.mesh = mesh
        return self

    def fwd(self, x):
        """x [..., P, n] coefficients -> evaluations (Pow2NTT order).
        The [..., P, A, nB] view's A axis is the sharded one; the coarse
        contraction is the single cross-shard exchange."""
        t = self.dev
        X = x.reshape(*x.shape[:-1], self.A, self.n // self.A)
        X = self._shard_blocks(X)
        S = self._coarse(X, t["W1"], t["W1_sh"])
        S = self._shard_blocks(S)
        S = mul_mod_shoup(S, t["TW"], t["TW_sh"], t["q"])
        S = self._local(S, t["ltw"], t["ltw_sh"], inverse=False)
        return S.reshape(*x.shape[:-1], self.n)

    def inv(self, y):
        """Inverse of fwd (same sharded structure, mirrored)."""
        t = self.dev
        Y = y.reshape(*y.shape[:-1], self.A, self.n // self.A)
        Y = self._shard_blocks(Y)
        S = self._local(Y, t["litw"], t["litw_sh"], inverse=True)
        S = mul_mod_shoup(S, t["TWi"], t["TWi_sh"], t["q"])
        S = self._coarse(S, t["W1i"], t["W1i_sh"])
        S = self._shard_blocks(S)
        return S.reshape(*y.shape[:-1], self.n)


def sharded_bluestein_ntt(bt) -> ShardedNTT:
    """Build the phi(m)-axis-sharded four-step transform for the length-B
    auxiliary convolutions of a BluesteinTables instance (the large-m
    bootstrap NTT path: at m=31775 a single forward DFT is three B=65536
    convolutions per limb row — the transform axis is the one worth
    sharding, SURVEY §2.9)."""
    from ..ops.ntt import aux_primes
    return ShardedNTT(aux_primes(), bt.B, negacyclic=False,
                      A=_default_shards(bt.B))


def _default_shards(B: int) -> int:
    import jax
    return min(8, max(2, len(jax.devices("cpu")
                              if jax.default_backend() != "tpu"
                              else jax.devices())))


def bluestein_apply_sharded(x, t, m: int, B: int, sntt: ShardedNTT):
    """ops.ntt.bluestein_apply with the B-point convolutions running on the
    phi(m)-axis-sharded four-step NTT: the A-block axis of the [A, B/A]
    view is the mesh axis; the coarse stage is the single cross-shard
    exchange (1x tensor volume), twist + local transforms + the pointwise
    khat multiply are shard-local.

    x: [..., P, m] residues; t: BluesteinTables.dev.  Bit-exact vs
    bluestein_apply (the khat tables are in Pow2NTT eval order, which
    ShardedNTT.fwd reproduces exactly).

    Per-limb collective volume: one A-block exchange of 3*B u32 words for
    the forward and one for the inverse transform = 6*B*4 bytes ~ 1.5 MiB
    at B=65536 — a few microseconds of ICI per mod-down row against
    ~50 us of butterfly compute, so the exchange is not the bottleneck
    on a real multi-chip mesh (BASELINE.md scaling note)."""
    from ..ops.modops import mul_mod_shoup as mms, add_mod as addm, reduce_u32
    q = t["q"]
    a = mms(x, t["u_in"], t["u_in_sh"], q)                 # [..., P, m]
    a3 = reduce_u32(a[..., None, :, :], t["aux_q"])        # [..., 3, P, m]
    pad = [(0, 0)] * (a3.ndim - 1) + [(0, B - m)]
    ap = jnp.pad(a3, pad)
    # ShardedNTT tables broadcast as [3, ...]; put the limb axis in front
    apl = jnp.swapaxes(ap, -3, -2)                         # [..., P, 3, B]
    A = sntt.fwd(apl)
    kh = jnp.swapaxes(t["khat"], 0, 1)                     # [P, 3, B]
    khs = jnp.swapaxes(t["khat_sh"], 0, 1)
    aux_q = t["aux_q"][:, 0]                               # [3, 1]
    Pr = mms(A, kh, khs, aux_q)
    p = jnp.swapaxes(sntt.inv(Pr), -3, -2)                 # [..., 3, P, B]
    y = mms(p, t["yt_inv"], t["yt_inv_sh"], t["aux_q"])
    alpha = jnp.floor(jnp.sum(y.astype(jnp.float32) * t["inv_r_f32"],
                              axis=-3) + jnp.float32(0.25)).astype(U32)
    terms = mms(y, t["Rt_mod_q"], t["Rt_mod_q_sh"], q[None])
    acc = addm(addm(terms[..., 0, :, :], terms[..., 1, :, :], q),
               terms[..., 2, :, :], q)
    corr = mms(alpha, t["negR"], t["negR_sh"], q)
    V = addm(acc, corr, q)[..., :m]
    return mms(V, t["u_out"], t["u_out_sh"], q)
