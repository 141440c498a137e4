"""NTT kernel tests against exact integer DFT oracles.

Mirrors the reference's kernel-level test strategy (GTestPGFFT: FFT vs naive
DFT, SURVEY.md §4) for our transforms: roundtrip, naive-DFT equality, and the
convolution theorem (pointwise mult == polynomial mult mod X^n+1 / X^m-1)."""

import numpy as np
import pytest

import jax.numpy as jnp

from helib_tpu.nt.numbth import root_of_unity
from helib_tpu.nt.primegen import gen_primes
from helib_tpu.ops.ntt import (Pow2NTT, ntt_pow2_fwd, ntt_pow2_inv,
                               BluesteinTables, bluestein_apply, power_table)
from helib_tpu.ops import modops


def naive_eval(coeffs, exps, root, q):
    """Evaluate poly at root^e for each e in exps (exact Python ints)."""
    out = []
    for e in exps:
        x = pow(root, int(e) % max(1, (q - 1)), q) if e else 1
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + int(c)) % q
        out.append(acc)
    return np.array(out, dtype=np.uint32)


@pytest.mark.parametrize("n", [8, 64, 256])
def test_pow2_negacyclic_roundtrip_and_naive(n):
    qs = np.array(gen_primes(2 * n, 3), dtype=np.uint32)
    t = Pow2NTT(qs, n, negacyclic=True)
    rng = np.random.default_rng(0)
    x = (rng.integers(0, qs[:, None].astype(np.int64), (len(qs), n))
         .astype(np.uint32))
    X = np.asarray(ntt_pow2_fwd(jnp.asarray(x), t.tree()))
    for k, q in enumerate(qs):
        psi = t.roots[k]
        expect = naive_eval(x[k], t.eval_exponents % (2 * n), psi, int(q))
        np.testing.assert_array_equal(X[k], expect)
    back = np.asarray(ntt_pow2_inv(jnp.asarray(X), t.tree()))
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("n", [8, 128])
def test_pow2_cyclic_roundtrip_and_naive(n):
    qs = np.array(gen_primes(n, 3), dtype=np.uint32)
    t = Pow2NTT(qs, n, negacyclic=False)
    rng = np.random.default_rng(1)
    x = (rng.integers(0, qs[:, None].astype(np.int64), (len(qs), n))
         .astype(np.uint32))
    X = np.asarray(ntt_pow2_fwd(jnp.asarray(x), t.tree()))
    for k, q in enumerate(qs):
        w = t.roots[k]
        expect = naive_eval(x[k], t.eval_exponents % n, w, int(q))
        np.testing.assert_array_equal(X[k], expect)
    back = np.asarray(ntt_pow2_inv(jnp.asarray(X), t.tree()))
    np.testing.assert_array_equal(back, x)


def test_pow2_convolution_theorem():
    n = 64
    qs = np.array(gen_primes(2 * n, 2), dtype=np.uint32)
    t = Pow2NTT(qs, n, negacyclic=True)
    rng = np.random.default_rng(2)
    a = rng.integers(0, qs[:, None].astype(np.int64), (2, n)).astype(np.uint32)
    b = rng.integers(0, qs[:, None].astype(np.int64), (2, n)).astype(np.uint32)
    A = ntt_pow2_fwd(jnp.asarray(a), t.tree())
    B = ntt_pow2_fwd(jnp.asarray(b), t.tree())
    qd = t.q_d
    mu = jnp.asarray(modops.barrett_mu(qs)[:, None])
    C = modops.mul_mod(A, B, qd, mu)
    c = np.asarray(ntt_pow2_inv(C, t.tree()))
    # oracle: negacyclic poly multiplication
    for k, q in enumerate(qs):
        q = int(q)
        full = np.zeros(2 * n, dtype=object)
        for i in range(n):
            for j in range(n):
                full[i + j] += int(a[k, i]) * int(b[k, j])
        red = [(full[i] - full[i + n]) % q for i in range(n)]
        np.testing.assert_array_equal(c[k], np.array(red, dtype=np.uint32))


@pytest.mark.parametrize("m", [15, 45, 257, 255])
def test_bluestein_roundtrip_and_naive(m):
    qs = np.array(gen_primes(m, 2), dtype=np.uint32)
    tf = BluesteinTables(qs, m, inverse=False)
    ti = BluesteinTables(qs, m, inverse=True)
    rng = np.random.default_rng(3)
    x = rng.integers(0, qs[:, None].astype(np.int64), (len(qs), m)).astype(np.uint32)
    X = np.asarray(bluestein_apply(jnp.asarray(x), tf.dev, m, tf.B))
    # naive full-m DFT oracle (mod q, vectorized uint64)
    for k, q in enumerate(qs):
        q = int(q)
        w = root_of_unity(m, q)
        pw = power_table(w, q, m).astype(np.uint64)
        ij = (np.arange(m)[:, None] * np.arange(m)[None, :]) % m
        prod = pw[ij] * x[k].astype(np.uint64) % np.uint64(q)
        expect = (prod.sum(axis=1) % np.uint64(q)).astype(np.uint32)
        np.testing.assert_array_equal(X[k], expect)
    back = np.asarray(bluestein_apply(jnp.asarray(X), ti.dev, m, ti.B))
    np.testing.assert_array_equal(back, x)


def test_bluestein_batched_shapes():
    m = 45
    qs = np.array(gen_primes(m, 2), dtype=np.uint32)
    tf = BluesteinTables(qs, m, inverse=False)
    rng = np.random.default_rng(4)
    x = rng.integers(0, qs[None, :, None].astype(np.int64),
                     (3, len(qs), m)).astype(np.uint32)
    X = np.asarray(bluestein_apply(jnp.asarray(x), tf.dev, m, tf.B))
    X0 = np.asarray(bluestein_apply(jnp.asarray(x[0]), tf.dev, m, tf.B))
    np.testing.assert_array_equal(X[0], X0)


def test_modops_barrett_exhaustive_edges():
    qs = np.array(gen_primes(64, 3), dtype=np.uint32)
    q = jnp.asarray(qs[:, None])
    mu = jnp.asarray(modops.barrett_mu(qs)[:, None])
    rng = np.random.default_rng(5)
    a = rng.integers(0, qs[:, None].astype(np.int64), (3, 1024)).astype(np.uint32)
    b = rng.integers(0, qs[:, None].astype(np.int64), (3, 1024)).astype(np.uint32)
    # include extremes
    a[:, 0] = qs - 1
    b[:, 0] = qs - 1
    a[:, 1] = 0
    r = np.asarray(modops.mul_mod(jnp.asarray(a), jnp.asarray(b), q, mu))
    expect = (a.astype(np.uint64) * b.astype(np.uint64)
              % qs[:, None].astype(np.uint64)).astype(np.uint32)
    np.testing.assert_array_equal(r, expect)
    # shoup path with fixed w per limb
    w = (qs - 3).astype(np.uint32)[:, None]
    wsh = jnp.asarray(modops.shoup(w, qs[:, None]))
    r2 = np.asarray(modops.mul_mod_shoup(jnp.asarray(a), jnp.asarray(w), wsh, q))
    expect2 = (a.astype(np.uint64) * w.astype(np.uint64)
               % qs[:, None].astype(np.uint64)).astype(np.uint32)
    np.testing.assert_array_equal(r2, expect2)
