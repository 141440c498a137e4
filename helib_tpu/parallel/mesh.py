"""Multi-chip execution: device meshes and sharded ciphertext pipelines.

The reference has NO distributed backend (single-process NTL threads,
SURVEY.md §2.9); this module is the invented multi-chip story:

  * axis "batch": data parallelism over independent ciphertexts,
  * axis "limb" : the RNS tower axis — elementwise ring ops and automorphisms
    are limb-local; only basis extension (key-switch digits, mod-down delta)
    sums across limbs, which XLA GSPMD turns into all-gathers/psums on ICI.

Shardings are expressed with jax.sharding.NamedSharding over a Mesh and the
pipelines from helib_tpu.pipeline are jit-compiled with in/out shardings;
XLA inserts the collectives.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..context import Context
from ..keys import SecKey
from ..pipeline import make_batched_mult_relin
from ..exceptions import assert_true


def make_mesh(n_devices: int | None = None, batch_axis: int | None = None):
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        # virtual CPU mesh (xla_force_host_platform_device_count)
        devs = jax.devices("cpu")
    assert_true(len(devs) >= n, (len(devs), n))
    devs = devs[:n]
    if batch_axis is None:
        # favor limb sharding up to 4-way, batch for the rest
        limb = min(4, n)
        batch_axis = n // limb
    limb = n // batch_axis
    arr = np.array(devs).reshape(batch_axis, limb)
    return Mesh(arr, ("batch", "limb"))


def sharded_mult_relin(ctx: Context, sk: SecKey, mesh: Mesh, batch: int):
    """jit-compiled batched mult+relin with [batch, limb, N] sharding."""
    fn, ex = make_batched_mult_relin(ctx, sk, batch)
    spec = P("batch", "limb", None)
    sh = NamedSharding(mesh, spec)
    jfn = jax.jit(fn, in_shardings=(sh, sh, sh, sh),
                  out_shardings=(sh, sh))
    ex = tuple(jax.device_put(e, sh) for e in ex)
    return jfn, ex


def sharded_automorph_relin(ctx: Context, sk: SecKey, mesh: Mesh, batch: int,
                            kexp: int | None = None):
    """jit-compiled batched rotate (automorph + key-switch) with
    [batch, limb, N] sharding: the automorphism gather stays limb-local;
    the key-switch digit basis extension is the cross-limb collective."""
    import jax as _jax
    from ..pipeline import make_automorph_relin
    fn, ex = make_automorph_relin(ctx, sk, kexp)
    bfn = _jax.vmap(fn, in_axes=(0, 0))
    bex = tuple(jnp.broadcast_to(e, (batch,) + e.shape) for e in ex)
    spec = P("batch", "limb", None)
    sh = NamedSharding(mesh, spec)
    jfn = jax.jit(bfn, in_shardings=(sh, sh), out_shardings=(sh, sh))
    bex = tuple(jax.device_put(e, sh) for e in bex)
    return jfn, bex
