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


def _nbytes(c) -> int:
    """Byte size of a const/literal value.  jax 0.9 jaxpr consts are
    TypedNdArray wrappers WITHOUT .nbytes — relying on getattr(c,
    'nbytes', 0) silently classified every table as small, re-embedding
    them as dense HLO constants (the m=32003 NTT lowered to a 2.17 GB
    module -> remote-compile HTTP 413, results_r5.log bgv_big)."""
    nb = getattr(c, "nbytes", None)
    if nb is not None:
        try:
            return int(nb)
        except (TypeError, ValueError):
            pass
    shape = getattr(c, "shape", None)
    dtype = getattr(c, "dtype", None)
    if shape is None or dtype is None:
        return 0
    try:
        import numpy as _np
        n = 1
        for d in shape:
            n *= int(d)
        return n * _np.dtype(dtype).itemsize
    except Exception:
        return 0

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


def _lift_literals(jaxpr):
    """Rewrite large eqn-level Literals into fresh constvars.

    Host numpy tables used inside a traced fn do NOT surface as jaxpr
    consts — they ride as eqn literals and lower to inline stablehlo
    `constant` ops.  At m=32003 (L=194, B=65536) the NTT program lowered
    to a 2.17 GB module this way (measured), far past the remote-compile
    tunnel's request limit (HTTP 413, results_r5.log bgv_big).  Returns
    (jaxpr', lifted_vals) with jaxpr'.constvars extended."""
    from jax._src import core as jcore
    new_vars: list = []
    vals: list = []
    seen: dict = {}
    eqns = []
    changed = False
    for eqn in jaxpr.eqns:
        ninv = []
        for v in eqn.invars:
            if (isinstance(v, jcore.Literal)
                    and _nbytes(v.val) >= _LIFT_BYTES):
                key = id(v.val)
                var = seen.get(key)
                if var is None:
                    var = jcore.Var(jcore.get_aval(v.val))
                    seen[key] = var
                    new_vars.append(var)
                    vals.append(v.val)
                ninv.append(var)
                changed = True
            else:
                ninv.append(v)
        eqns.append(eqn.replace(invars=ninv) if ninv != eqn.invars else eqn)
    if not changed:
        return jaxpr, []
    jaxpr = jaxpr.replace(constvars=list(jaxpr.constvars) + new_vars,
                          eqns=eqns)
    return jaxpr, vals


def lifted_jit(fn, *example_args):
    """Trace `fn` on `example_args` (shapes only), lift its large array
    consts AND inline literals to arguments, and return `run(*args)`
    backed by one jit whose lowered module contains no table constants."""
    closed, out_shape = jax.make_jaxpr(fn, return_shape=True)(*example_args)
    out_tree = jax.tree.structure(out_shape)
    jaxpr, lit_vals = _lift_literals(closed.jaxpr)
    consts = list(closed.consts) + lit_vals
    big_idx = [i for i, c in enumerate(consts)
               if _nbytes(c) >= _LIFT_BYTES]
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

    run.lifted_bytes = sum(_nbytes(c) for c in big)
    run.n_lifted = len(big)
    run.jrun = jrun          # diagnostics: payload-size checks lower this
    run.big = big
    return run
