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

# host-table -> device-buffer dedup: the same numpy table (NTT twiddles,
# Bluestein kernels) is lifted by MANY jits; upload it once and alias the
# buffer thereafter.  Keyed by id() — context tables are process-lifetime
# objects, and we keep a reference to the source array so ids can't be
# recycled while the cache entry lives.
_DEVICE_CACHE: dict = {}


def _to_device(c):
    if isinstance(c, jax.Array):
        return c
    key = id(c)
    hit = _DEVICE_CACHE.get(key)
    if hit is not None and hit[0] is c:
        return hit[1]
    dev = jnp.asarray(c)
    _DEVICE_CACHE[key] = (c, dev)
    return dev


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
    big = [_to_device(consts[i]) for i in big_idx]    # deduped upload

    def run_flat(big_consts, *flat_args):
        full = list(small)
        for slot, val in zip(big_idx, big_consts):
            full[slot] = val
        outs = _eval_jaxpr(jaxpr, full, *flat_args)
        return jax.tree.unflatten(out_tree, outs)

    jrun = jax.jit(run_flat)

    def run(*args):
        flat, _ = jax.tree.flatten(args)
        try:
            return jrun(big, *flat)
        except Exception as e:  # one retry for transient tunnel failures
            msg = str(e)
            if ("remote_compile" in msg or "response body closed" in msg
                    or "Connection reset" in msg):
                import time
                time.sleep(2.0)
                return jrun(big, *flat)
            raise

    run.lifted_bytes = sum(c.nbytes for c in big)
    run.n_lifted = len(big)
    return run
