"""v2 (block-list whole-phase) Pallas NTT kernels vs the staged jnp path
(interpret mode on CPU; real-TPU numbers in benchmarks/kernel_v2_bench.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from helib_tpu.nt.primegen import gen_primes
from helib_tpu.ops import ntt as nttmod
from helib_tpu.ops.ntt import Pow2NTT, ntt_pow2_fwd, ntt_pow2_inv
from helib_tpu.ops.pallas_ntt2 import apply_ntt2, apply_conv2


@pytest.mark.parametrize("n,negacyclic,max_k",
                         [(256, True, 2), (256, True, 3),
                          (1024, False, 2), (2048, True, 2)])
# max_k capped at 3 here: interpret mode inlines the kernel as pure jax
# ops, and the unrolled whole-phase graphs (max_k=None -> up to 128
# blocks) take minutes of XLA:CPU compile.  Real-TPU runs exercise the
# large-k schedules (benchmarks/kernel_v2_bench.py).
def test_v2_matches_staged(n, negacyclic, max_k):
    qs = np.array(gen_primes(2 * n, 3), dtype=np.uint32)
    t = Pow2NTT(qs, n, negacyclic=negacyclic)
    tree = t.tree()
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.integers(0, qs[:, None].astype(np.int64),
                                 (3, n)).astype(np.uint32))
    nttmod.USE_PALLAS = False
    try:
        ref_f = np.asarray(ntt_pow2_fwd(x, tree))
        got_f = np.asarray(apply_ntt2(x, tree, tree["q"], inverse=False,
                                      interpret=True, max_k=max_k))
        np.testing.assert_array_equal(got_f, ref_f)
        ref_i = np.asarray(ntt_pow2_inv(jnp.asarray(ref_f), tree))
        got_i = np.asarray(apply_ntt2(jnp.asarray(ref_f), tree, tree["q"],
                                      inverse=True, interpret=True,
                                      max_k=max_k))
        np.testing.assert_array_equal(got_i, ref_i)
    finally:
        nttmod.USE_PALLAS = None


def test_v2_fused_conv():
    from helib_tpu.ops import modops
    n = 512
    qs = np.array(gen_primes(n, 3), dtype=np.uint32)
    t = Pow2NTT(qs, n, negacyclic=False)
    tree = t.tree()
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.integers(0, qs[:, None].astype(np.int64),
                                 (3, n)).astype(np.uint32))
    kh = rng.integers(0, qs[:, None].astype(np.int64),
                      (3, n)).astype(np.uint32)
    khsh = modops.shoup(kh, qs[:, None].astype(np.uint64))
    nttmod.USE_PALLAS = False
    try:
        A = ntt_pow2_fwd(x, tree)
        Pr = modops.mul_mod_shoup(A, jnp.asarray(kh), jnp.asarray(khsh),
                                  tree["q"])
        ref = np.asarray(ntt_pow2_inv(Pr, tree))
        got = np.asarray(apply_conv2(x, tree, jnp.asarray(kh),
                                     jnp.asarray(khsh), tree["q"],
                                     interpret=True, max_k=2))
        np.testing.assert_array_equal(got, ref)
    finally:
        nttmod.USE_PALLAS = None
