"""Constant-lifting jit: compile with closure tables as ARGUMENTS.

Every jit in this library closes over large device tables (NTT twiddles,
Bluestein spectral kernels, KS matrices).  jax.jit embeds closed-over
concrete arrays as dense constants in the lowered StableHLO, which

  * balloons the compile payload (at m=31775 / B=65536 the Bluestein
    tables alone are hundreds of MB — over a remote-compile tunnel this
    produced HTTP 413s / broken pipes and is the prime suspect for the
    round-2 TPU-worker crash during the m=31775 recrypt),
  * defeats compile caching across contexts with identical shapes, and
  * made every Context/jit warm-up re-upload all tables (the 2000 s cold
    setup at m=1271).

`lifted_jit(fn, *ex)` traces fn once, hoists the jaxpr's array consts into
explicit leading arguments, and returns a wrapped jit whose lowering
contains no large constants.  The const arrays are kept by reference (no
copies) and passed on every call — on device this is free (buffer aliasing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

try:                                # jax >= 0.6 keeps eval_jaxpr in core
    from jax.core import eval_jaxpr as _eval_jaxpr
except ImportError:                 # pragma: no cover
    from jax.extend.core import eval_jaxpr as _eval_jaxpr

# consts smaller than this stay embedded (scalars etc. — lifting them just
# adds argument-plumbing overhead)
_LIFT_BYTES = 4096


def lifted_jit(fn, *example_args):
    """Trace `fn` on `example_args` (shapes only), lift its large array
    consts to arguments, and return `run(*args)` backed by one jit whose
    lowered module contains no table constants."""
    closed, out_shape = jax.make_jaxpr(fn, return_shape=True)(*example_args)
    out_tree = jax.tree.structure(out_shape)
    jaxpr = closed.jaxpr
    consts = closed.consts
    big_idx = [i for i, c in enumerate(consts)
               if getattr(c, "nbytes", 0) >= _LIFT_BYTES]
    big_set = set(big_idx)
    small = [c if i not in big_set else None for i, c in enumerate(consts)]
    big = [jnp.asarray(consts[i]) for i in big_idx]   # by reference

    def run_flat(big_consts, *flat_args):
        full = list(small)
        for slot, val in zip(big_idx, big_consts):
            full[slot] = val
        outs = _eval_jaxpr(jaxpr, full, *flat_args)
        return jax.tree.unflatten(out_tree, outs)

    jrun = jax.jit(run_flat)

    def run(*args):
        flat, _ = jax.tree.flatten(args)
        return jrun(big, *flat)

    run.lifted_bytes = sum(c.nbytes for c in big)
    run.n_lifted = len(big)
    return run
