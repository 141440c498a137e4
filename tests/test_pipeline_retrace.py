"""Regression: jitting the mult+relin pipeline more than once must not leak
tracers out of the lru-cached constant builders (_digit_consts, _drop_consts,
ks_stacked_W).  A device array created during an active trace is a tracer;
caching one poisons every later trace."""

import numpy as np
import jax

from helib_tpu.context import Context
from helib_tpu.keys import SecKey
from helib_tpu.pipeline import make_mult_relin


def test_double_jit_mult_relin():
    ctx = Context(m=31, p=2, r=1, bits=300, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=7)
    fn, args = make_mult_relin(ctx, sk)
    j1 = jax.jit(fn)
    o1 = j1(*args)
    jax.block_until_ready(o1)
    # a second, distinct jit retraces from scratch and must see concrete
    # cached constants, not stale tracers
    j2 = jax.jit(lambda *a: fn(*a))
    o2 = j2(*args)
    jax.block_until_ready(o2)
    for a, b in zip(o1, o2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
