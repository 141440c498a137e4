"""Jit-compiled ciphertext pipelines.

The Ctxt layer orchestrates per-op; for production serving the hot sequence
(tensor product -> digit decomposition -> key-switch MAC -> mod-down) is
traced once into a single XLA program here.  All branching in the Ctxt layer
is on host metadata (prime-set prefix k, noise floats), so tracing a fixed
(context, level) specializes the whole pipeline.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .context import Context
from .keys import SecKey, PubKey, SKHandle
from .ctxt import Ctxt


def make_mult_relin(ctx: Context, sk: SecKey, k: int | None = None,
                    noise: float | None = None):
    """Returns (fn, example_args): fn maps the four part tensors of two
    canonical ciphertexts at level k to the two part tensors of their
    relinearized product (with special primes dropped).

    The flagship compute step: the inner loop of every BGV/CKKS circuit
    (reference call stack SURVEY.md §3.3)."""
    k = k if k is not None else ctx.L
    pk = sk.pubkey or PubKey(sk)
    # pre-generate the relin matrix outside the traced function
    sk.gen_ks_matrix(SKHandle(2, 1, 0))
    noise = noise if noise is not None else ctx.noise_mod(max(ctx.ptxt_space, 2))

    def fn(c0_0, c0_1, c1_0, c1_1):
        def mk(a, b):
            ct = Ctxt(ctx, pk, [(SKHandle(0, 1, 0), a), (SKHandle(1, 1, 0), b)],
                      k, False, ctx.ptxt_space if ctx.scheme == "bgv" else 1,
                      noise, 1)
            return ct
        ca, cb = mk(c0_0, c0_1), mk(c1_0, c1_1)
        out = ca.tensor(cb)
        out.relinearize(sk)
        out.drop_special_primes()
        parts = dict((h.powS, d) for h, d in out.parts)
        return parts[0], parts[1]

    N = ctx.n_eval
    qs = ctx.primes_of(k, False)
    rng = np.random.default_rng(0)
    ex = tuple(jnp.asarray(rng.integers(0, qs[:, None].astype(np.int64),
                                        (k, N)).astype(np.uint32))
               for _ in range(4))
    return fn, ex


def make_batched_mult_relin(ctx: Context, sk: SecKey, batch: int,
                            k: int | None = None):
    """vmapped-over-batch version: [B, k, N] part tensors."""
    fn, ex = make_mult_relin(ctx, sk, k)
    bfn = jax.vmap(fn, in_axes=(0, 0, 0, 0))
    bex = tuple(jnp.broadcast_to(e, (batch,) + e.shape) for e in ex)
    return bfn, bex
