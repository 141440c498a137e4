"""Sharded-surface correctness on the virtual 8-device CPU mesh.

VERDICT round-1 item 4: beyond the mult+relin pipeline, the rotation
(automorph + key-switch) pipeline and a phi(m)-axis-sharded single NTT must
compile and produce bit-exact results under real mesh shardings.

These tests run on the 8-virtual-CPU-device mesh configured in conftest
(xla_force_host_platform_device_count); the driver's dryrun_multichip
exercises the same code paths.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from helib_tpu.context import Context
from helib_tpu.keys import SecKey, PubKey, SKHandle


def _virtual_devices(n=8):
    """The 8 virtual CPU devices from conftest.  jax.devices() alone is not
    enough: a TPU plugin (axon) can take over the default backend even under
    JAX_PLATFORMS=cpu, hiding the virtual CPU mesh."""
    devs = jax.devices()
    if len(devs) < n:
        try:
            devs = jax.devices("cpu")
        except RuntimeError:
            pass
    return devs


def _mesh_or_skip(n=8):
    devs = _virtual_devices(n)
    if len(devs) < n:
        pytest.skip(f"need {n} virtual devices, have {len(devs)}")
    from helib_tpu.parallel.mesh import make_mesh
    return make_mesh(n)


def test_sharded_automorph_relin_matches_host():
    """Batched rotate pipeline under [batch, limb] sharding == unsharded."""
    from helib_tpu.parallel.mesh import make_mesh, sharded_automorph_relin
    mesh = _mesh_or_skip()
    limb = mesh.shape["limb"]
    ctx = Context(m=45, p=2, r=1, bits=int(limb * 2 * 29.5), c=3,
                  scheme="bgv")
    assert ctx.L % limb == 0
    sk = SecKey(ctx, seed=7)
    batch = mesh.shape["batch"] * 2
    jfn, ex = sharded_automorph_relin(ctx, sk, mesh, batch)
    with mesh:
        out = jfn(*ex)
        jax.block_until_ready(out)
    # unsharded oracle on the same inputs
    from helib_tpu.pipeline import make_automorph_relin
    fn, _ = make_automorph_relin(ctx, sk)
    host = jax.vmap(fn, in_axes=(0, 0))(
        *(np.asarray(e) for e in ex))
    for a, b in zip(out, host):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_ntt_phi_axis():
    """phi(m)-axis four-step NTT: bit-exact vs the fused transform, with the
    block axis actually sharded over the mesh (GSPMD inserts the exchange)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from helib_tpu.parallel.sharded_ntt import ShardedNTT
    from helib_tpu.ops.ntt import Pow2NTT, ntt_pow2_fwd
    from helib_tpu.nt.primegen import gen_primes

    devs = _virtual_devices(8)
    if len(devs) < 8:
        pytest.skip("need 8 virtual devices")
    n, A = 2048, 8
    qs = np.array(gen_primes(2 * n, 2), dtype=np.uint32)
    s = ShardedNTT(qs, n, negacyclic=True, A=A)
    base = Pow2NTT(qs, n, negacyclic=True)
    rng = np.random.default_rng(11)
    x = rng.integers(0, qs[:, None].astype(np.int64), (2, n)).astype(np.uint32)
    ref = np.asarray(ntt_pow2_fwd(jnp.asarray(x), base.tree()))

    mesh = Mesh(np.array(devs[:A]).reshape(A), ("shard",))
    # shard the block axis of the [P, A, nB] view
    sh_in = NamedSharding(mesh, P(None, "shard", None))
    xs = jax.device_put(jnp.asarray(x).reshape(2, A, n // A), sh_in)

    fwd = jax.jit(lambda v: s.fwd(v.reshape(2, n)).reshape(2, A, n // A),
                  in_shardings=(sh_in,), out_shardings=sh_in)
    with mesh:
        got = fwd(xs)
        jax.block_until_ready(got)
    np.testing.assert_array_equal(np.asarray(got).reshape(2, n), ref)

    inv = jax.jit(lambda v: s.inv(v.reshape(2, n)).reshape(2, A, n // A),
                  in_shardings=(sh_in,), out_shardings=sh_in)
    with mesh:
        back = inv(got)
        jax.block_until_ready(back)
    np.testing.assert_array_equal(np.asarray(back).reshape(2, n), x)


def test_sharded_ntt_unsharded_semantics():
    """Mesh-free check that the four-step factorization itself is exact
    (fwd matches the staged kernel; inv is its inverse) for cyclic and
    negacyclic variants."""
    from helib_tpu.parallel.sharded_ntt import ShardedNTT
    from helib_tpu.ops.ntt import Pow2NTT, ntt_pow2_fwd
    from helib_tpu.nt.primegen import gen_primes
    for n, neg in [(512, True), (512, False)]:
        qs = np.array(gen_primes(2 * n, 2), dtype=np.uint32)
        s = ShardedNTT(qs, n, negacyclic=neg, A=8)
        base = Pow2NTT(qs, n, negacyclic=neg)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.integers(0, qs[:, None].astype(np.int64),
                                     (2, n)).astype(np.uint32))
        ref = ntt_pow2_fwd(x, base.tree())
        got = s.fwd(x)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        back = s.inv(got)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_sharded_bluestein_matches_unsharded():
    """Full general-m DFT (the large-m bootstrap transform) with its
    B-point convolutions on the phi(m)-axis-sharded four-step NTT, the
    block axis actually sharded over the 8-device mesh — bit-exact vs
    ops.ntt.bluestein_apply (round-3 item 5: the ShardedNTT wired into a
    production Bluestein pipeline, not just the standalone transform)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from helib_tpu.ops.ntt import BluesteinTables, bluestein_apply
    from helib_tpu.ops import ntt as nttmod
    from helib_tpu.parallel.sharded_ntt import (ShardedNTT,
                                                bluestein_apply_sharded)
    from helib_tpu.nt.primegen import gen_primes, gen_aux_primes

    devs = _virtual_devices(8)
    if len(devs) < 8:
        pytest.skip("need 8 virtual devices")
    m = 255                      # B = 512, A = 8 blocks of 64
    qs = np.array(gen_primes(2 * m, 2), dtype=np.uint32)
    bt = BluesteinTables(qs, m, inverse=False)
    sntt = ShardedNTT(np.array(gen_aux_primes(3), dtype=np.uint32),
                      bt.B, negacyclic=False, A=8)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.integers(0, qs[:, None].astype(np.int64),
                                 (len(qs), m)).astype(np.uint32))
    nttmod.USE_PALLAS = False
    ref = np.asarray(bluestein_apply(x, bt.dev, m, bt.B))
    nttmod.USE_PALLAS = None

    mesh = Mesh(np.array(devs[:8], dtype=object).reshape(8), ("shard",))
    fn = jax.jit(lambda v: bluestein_apply_sharded(v, bt.dev, m, bt.B,
                                                   sntt))
    with mesh:
        got = fn(x)
        jax.block_until_ready(got)
    np.testing.assert_array_equal(np.asarray(got), ref)


@pytest.mark.big_mem
def test_thin_recrypt_with_sharded_parts():
    """Thin bootstrap with the ciphertext part tensors device_put onto a
    limb-sharded mesh: the whole eager pipeline stays sharded (GSPMD
    propagates shardings through every jnp op) and decrypts identically."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from helib_tpu.ea import EncryptedArray
    from helib_tpu.recryption import RecryptData, thin_recrypt

    devs = _virtual_devices(2)
    if len(devs) < 2:
        pytest.skip("need >= 2 virtual devices")
    ctx = Context(m=31, p=2, r=1, bits=800, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=61, hwt=16)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rc = RecryptData(ctx, sk, ea, hwt=16)
    rng = np.random.default_rng(67)
    slots = rng.integers(0, ctx.ptxt_space, ea.nslots)
    ct = ea.encrypt(list(slots), pk, rng)
    ct.bring_to_k(4)   # 4 live limbs: divisible over the 2-device limb axis

    mesh = Mesh(np.array(devs[:2]).reshape(2), ("limb",))
    sh_limb = NamedSharding(mesh, P("limb", None))
    with mesh:
        ct.parts = [(h, jax.device_put(d, sh_limb)) for h, d in ct.parts]
        out = thin_recrypt(ct, rc, sk)
        np.testing.assert_array_equal(ea.decrypt_ints(out, sk), slots)
