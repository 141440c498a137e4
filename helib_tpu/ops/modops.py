"""Vectorized modular arithmetic on uint32 residues.

TPU-native replacement for the roles of NTL mulmod / Intel HEXL elementwise
kernels (reference src/intelExt.h:24-58, src/DoubleCRT.cpp:135-338).

Design:
  * All device primes q are PRIME_BITS(=30)-bit: q in (2^29, 2^30).  Residues
    are uint32; products fit in 60 bits.
  * General modular multiply: Barrett reduction with per-prime constant
    mu = floor(2^61 / q) (fits uint32 because q > 2^29):
        x = a*b  (< 2^60)
        t = ((x >> 29) * mu) >> 32        # t in [floor(x/q)-2, floor(x/q)]
        r = x - t*q, then <=2 conditional subtracts.
  * Multiply by a fixed per-limb constant (twiddles, CRT factors): Shoup
    precomputation w' = floor(w * 2^32 / q):
        r = a*w - ((a*w') >> 32)*q  (mod 2^32), one conditional subtract.
  * Arithmetic runs in uint64 (XLA emulates 64-bit ints as 32-bit pairs on
    TPU).  A hand-written 32-bit-pair path can replace this inside Pallas
    kernels later; the semantics here are the reference.

Shapes: residue tensors are [..., L, N] with per-limb prime vectors broadcast
as [L, 1] (or scalars).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32
U64 = jnp.uint64

BARRETT_S1 = 29
BARRETT_S2 = 32


# ---------------------------------------------------------------------------
# host-side precomputation
# ---------------------------------------------------------------------------

def barrett_mu(q) -> np.ndarray:
    """mu = floor(2^(s1+s2) / q) per prime; q may be scalar or array."""
    q = np.asarray(q, dtype=np.uint64)
    return ((np.uint64(1) << np.uint64(BARRETT_S1 + BARRETT_S2)) // q).astype(np.uint32)


def shoup(w, q) -> np.ndarray:
    """Shoup companion floor(w * 2^32 / q) for fixed multiplicands w mod q."""
    w = np.asarray(w, dtype=np.uint64)
    q = np.asarray(q, dtype=np.uint64)
    return ((w << np.uint64(32)) // q).astype(np.uint32)


# ---------------------------------------------------------------------------
# device ops (jnp, uint64 internals)
# ---------------------------------------------------------------------------

def add_mod(a, b, q):
    r = a + b
    return jnp.where(r >= q, r - q, r)


def sub_mod(a, b, q):
    r = a + q - b
    return jnp.where(r >= q, r - q, r)


def neg_mod(a, q):
    return jnp.where(a == 0, a, q - a)


def mul_mod(a, b, q, mu):
    """General modular multiply, Barrett.  a,b uint32 in [0,q); q,mu [L,1]."""
    x = a.astype(U64) * b.astype(U64)
    t = ((x >> U64(BARRETT_S1)) * mu.astype(U64)) >> U64(BARRETT_S2)
    r = x - t * q.astype(U64)
    q64 = q.astype(U64)
    r = jnp.where(r >= q64, r - q64, r)
    r = jnp.where(r >= q64, r - q64, r)
    return r.astype(U32)


def mul_mod_shoup(a, w, w_shoup, q):
    """a * w mod q with precomputed Shoup companion for w."""
    a64 = a.astype(U64)
    hi = (a64 * w_shoup.astype(U64)) >> U64(32)
    r = (a64 * w.astype(U64) - hi * q.astype(U64)).astype(U64) & U64(0xFFFFFFFF)
    r = r.astype(U32)
    return jnp.where(r >= q, r - q, r)


def reduce_u32(a, q):
    """Reduce a uint32 value < 2*q into [0, q) (for cross-prime re-reduction
    when values < 2^30 meet primes > 2^29)."""
    return jnp.where(a >= q, a - q, a)


def reduce_u64_mod(x, q, mu):
    """Reduce uint64 x < 2^60 mod q via Barrett."""
    t = ((x >> U64(BARRETT_S1)) * mu.astype(U64)) >> U64(BARRETT_S2)
    r = x - t * q.astype(U64)
    q64 = q.astype(U64)
    r = jnp.where(r >= q64, r - q64, r)
    r = jnp.where(r >= q64, r - q64, r)
    return r.astype(U32)


# ---------------------------------------------------------------------------
# numpy mirrors (host/test oracle; exact, any width)
# ---------------------------------------------------------------------------

def np_mul_mod(a, b, q):
    return (a.astype(np.uint64) * b.astype(np.uint64) % np.uint64(q)).astype(np.uint32)


def np_add_mod(a, b, q):
    r = a.astype(np.uint64) + b.astype(np.uint64)
    return (r % np.uint64(q)).astype(np.uint32)
