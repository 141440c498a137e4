"""Per-phase cost of the fused conv kernel: coarse stages, transposes,
fine stages, pointwise — measured as standalone pallas kernels on TPU."""
import sys
import time
import pathlib
import functools

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from helib_tpu.ops import pallas_ntt as PN
from helib_tpu.ops.ntt import aux_primes, aux_ntt
from helib_tpu.ops.modops import shoup

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
ROWS = 160
K = 100
LANE = PN.LANE


def make(variant, tsel, n):
    stages = n.bit_length() - 1
    A = n // LANE
    coarse = stages - 7

    def kern(x_ref, tw_ref, tsh_ref, fine_ref, fsh_ref, q_ref, o_ref):
        x = x_ref[:]
        q = q_ref[:]
        R = x.shape[0]
        if variant == "coarse":
            x3 = PN._fwd_coarse3(x.reshape(R, A, LANE), q, R, A,
                                 tw_ref, tsh_ref, coarse)
            x3 = PN._inv_coarse3(x3, q, R, A, tw_ref, tsh_ref, coarse)
            x = x3.reshape(R, n)
        elif variant == "transpose":
            xt = jnp.swapaxes(x.reshape(R, A, LANE), 1, 2)
            xt = xt + q[:, :, None]
            x = jnp.swapaxes(xt, 1, 2).reshape(R, n)
        elif variant == "fine":
            xt = jnp.swapaxes(x.reshape(R, A, LANE), 1, 2)
            xt = PN._fwd_fine(xt, q, R, n, fine_ref, fsh_ref, coarse, stages)
            xt = PN._inv_fine(xt, q, R, n, fine_ref, fsh_ref, coarse, stages)
            x = jnp.swapaxes(xt, 1, 2).reshape(R, n)
        o_ref[:] = PN._csub(x, q)

    zero = np.int32(0)
    bs = lambda w: pl.BlockSpec((PN.ROW_BLOCK, w), lambda i: (i, zero),
                                memory_space=pltpu.VMEM)
    bs4 = pl.BlockSpec((PN.ROW_BLOCK, A, 1, LANE),
                       lambda i: (i, zero, zero, zero),
                       memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kern, grid=(ROWS // PN.ROW_BLOCK,),
        in_specs=[bs(n), bs4, bs4, bs(n), bs(n), bs(1)],
        out_specs=bs(n),
        out_shape=jax.ShapeDtypeStruct((ROWS, n), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    return f


def main():
    n = N
    nttB = aux_ntt(n)
    tree = nttB.tree()
    raux = aux_primes()
    pidx = np.arange(ROWS) % 3
    qrow = raux[pidx].astype(np.uint32)
    rng = np.random.default_rng(0)
    x = rng.integers(0, qrow[:, None].astype(np.int64), (ROWS, n)).astype(np.uint32)
    tsel = {k: jnp.asarray(np.asarray(tree[k])[pidx])
            for k in ("tw_cat3", "tw_cat3_sh", "tw_fine", "tw_fine_sh")}
    q = jnp.asarray(qrow[:, None])
    args = (tsel["tw_cat3"], tsel["tw_cat3_sh"],
            tsel["tw_fine"], tsel["tw_fine_sh"], q)
    xd = jnp.asarray(x)
    for variant in ("transpose", "coarse", "fine"):
        f = make(variant, tsel, n)

        @jax.jit
        def chain(v):
            return jax.lax.fori_loop(0, K, lambda _, u: f(u, *args), v)

        r = chain(xd)
        s = float(jnp.sum(r.astype(jnp.float32)))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            r = chain(xd)
            s = float(jnp.sum(r.astype(jnp.float32)))
            best = min(best, time.time() - t0)
        print(f"{variant}: n={n} per-app={best/K*1e6:.1f}us "
              f"per-row={best/K/ROWS*1e6:.2f}us (s={s:.3g})", flush=True)


if __name__ == "__main__":
    main()
