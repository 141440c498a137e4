"""Multi-host (multi-process) execution.

The reference has no distributed backend at all (SURVEY.md §2.9: NTL thread
pools only), so this layer is designed from the math rather than ported:

  * Each host process owns a slice of a GLOBAL device mesh with axes
    ("batch", "limb").  Elementwise ring ops, automorphisms and the
    key-switch MACs are limb-local; the only cross-limb communication is
    basis extension (breakIntoDigits / mod-down delta), which XLA GSPMD
    lowers to all-gather/psum.  With the limb axis mapped to intra-host ICI
    and the batch axis to DCN, those collectives never cross hosts.
  * Arrays are constructed per-process from process-local shards with
    jax.make_array_from_process_local_data; jit with NamedSharding in/out
    specs runs SPMD across every process that entered the computation.

Single-process multi-chip (one host, N TPUs) needs none of this — use
helib_tpu.parallel.mesh directly.  This module adds the jax.distributed
bootstrap + helpers for the N-host case, testable on CPU with
gloo-backed collectives (tests/test_distributed.py runs two real processes).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: str, num_processes: int,
                     process_id: int):
    """Join the process group (reference: nothing — HElib is single-process;
    this is the TPU-pod bootstrap).  On real pods jax.distributed discovers
    topology from the TPU runtime; on CPU the caller should also set
    XLA_FLAGS=--xla_force_host_platform_device_count=<n> before importing
    jax to get multiple virtual local devices."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(limb: int | None = None) -> Mesh:
    """A ("batch", "limb") mesh over ALL global devices (every process must
    call this with the same arguments).  The limb axis is chosen to stay
    within one process's local devices whenever possible, so cross-limb
    collectives (basis extension) ride intra-host interconnect and only the
    embarrassingly-parallel batch axis spans hosts."""
    devs = jax.devices()
    n = len(devs)
    local = max(1, jax.local_device_count())
    if limb is None:
        limb = min(4, local)
    while n % limb:
        limb //= 2
    limb = max(limb, 1)
    arr = np.array(devs).reshape(n // limb, limb)
    return Mesh(arr, ("batch", "limb"))


def put_global(mesh: Mesh, spec: P, local_batch: np.ndarray):
    """Assemble a global array from this process's batch shard.
    `local_batch` is [local_B, ...]; the global array is
    [local_B * num_batch_processes, ...] sharded by `spec`."""
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sh, local_batch)


def sharded_pipeline(ctx, sk, mesh: Mesh, global_batch: int):
    """jit-compiled batched mult+relin with global [batch, limb, N] sharding
    (same program as parallel.mesh.sharded_mult_relin, but example inputs
    are assembled from process-local shards so it runs multi-host)."""
    from ..pipeline import make_batched_mult_relin
    fn, ex = make_batched_mult_relin(ctx, sk, global_batch)
    spec = P("batch", "limb", None)
    sh = NamedSharding(mesh, spec)
    jfn = jax.jit(fn, in_shardings=(sh, sh, sh, sh), out_shardings=(sh, sh))
    nproc = max(1, jax.process_count())
    local_b = global_batch // nproc
    exg = tuple(
        put_global(mesh, spec, np.asarray(e)[:local_b]) for e in ex)
    return jfn, exg
