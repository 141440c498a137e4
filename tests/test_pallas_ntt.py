"""Fused Pallas NTT kernel vs the reference jnp stage implementation
(interpret mode on CPU; the real-TPU path is exercised by bench.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from helib_tpu.nt.primegen import gen_primes
from helib_tpu.ops import ntt as nttmod
from helib_tpu.ops.ntt import Pow2NTT, ntt_pow2_fwd, ntt_pow2_inv
from helib_tpu.ops.pallas_ntt import apply_ntt


def _fwd(x, tree):
    return apply_ntt(x, tree, tree["q"], inverse=False, interpret=True)


def _inv(x, tree):
    return apply_ntt(x, tree, tree["q"], inverse=True, interpret=True)


@pytest.mark.parametrize("n,negacyclic", [(256, True), (1024, True),
                                          (512, False), (2048, True)])
def test_pallas_matches_jnp(n, negacyclic):
    qs = np.array(gen_primes(2 * n, 5), dtype=np.uint32)
    t = Pow2NTT(qs, n, negacyclic=negacyclic)
    tree = t.tree()
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.integers(0, qs[:, None].astype(np.int64),
                                 (len(qs), n)).astype(np.uint32))
    nttmod.USE_PALLAS = False
    ref_fwd = np.asarray(ntt_pow2_fwd(x, tree))
    got_fwd = np.asarray(_fwd(x, tree))
    np.testing.assert_array_equal(got_fwd, ref_fwd)
    ref_inv = np.asarray(ntt_pow2_inv(jnp.asarray(ref_fwd), tree))
    got_inv = np.asarray(_inv(jnp.asarray(ref_fwd), tree))
    np.testing.assert_array_equal(got_inv, ref_inv)


def test_pallas_fused_conv():
    """Fused NTT->pointwise->iNTT kernel == three-step reference."""
    from helib_tpu.ops import modops
    from helib_tpu.ops.pallas_ntt import apply_conv
    n = 512
    qs = np.array(gen_primes(n, 3), dtype=np.uint32)
    t = Pow2NTT(qs, n, negacyclic=False)
    tree = t.tree()
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.integers(0, qs[:, None].astype(np.int64),
                                 (len(qs), n)).astype(np.uint32))
    kh = rng.integers(0, qs[:, None].astype(np.int64),
                      (len(qs), n)).astype(np.uint32)
    khsh = modops.shoup(kh, qs[:, None].astype(np.uint64))
    nttmod.USE_PALLAS = False
    A = ntt_pow2_fwd(x, tree)
    q = tree["q"]
    Pr = modops.mul_mod_shoup(A, jnp.asarray(kh), jnp.asarray(khsh), q)
    ref = np.asarray(ntt_pow2_inv(Pr, tree))
    got = np.asarray(apply_conv(x, tree, jnp.asarray(kh), jnp.asarray(khsh),
                                q, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_pallas_padding_and_batch():
    n = 256
    qs = np.array(gen_primes(2 * n, 3), dtype=np.uint32)
    t = Pow2NTT(qs, n, negacyclic=True)
    tree = t.tree()
    rng = np.random.default_rng(19)
    # batched leading dim + non-multiple-of-8 rows
    x = jnp.asarray(rng.integers(0, qs[None, :, None].astype(np.int64),
                                 (2, len(qs), n)).astype(np.uint32))
    nttmod.USE_PALLAS = False
    ref = np.asarray(ntt_pow2_fwd(x, tree))
    got = np.asarray(_fwd(x, tree))
    np.testing.assert_array_equal(got, ref)
