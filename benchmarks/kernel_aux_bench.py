"""Per-row-table conv kernel vs shared-twiddle (aux-major) conv on TPU.

The shared path (pallas_conv_shared) grids over (aux, row-block) and
fetches ONE twiddle block per aux prime, cutting per-block twiddle DMA ~8x
and VMEM residency ~3.5x.  This measures what that buys at the real
Bluestein shapes (m=8009 headline, m=1601 for the G=2 grouped case,
m=31775 for B=65536), value-checked per shape.

Run: python benchmarks/kernel_aux_bench.py [batch] [iters]
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def bench(fn, x, iters):
    y = fn(x)
    jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(iters):
        y = fn(y)
    jax.block_until_ready(y)
    return (time.time() - t0) / iters


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from helib_tpu.nt.primegen import gen_primes
    from helib_tpu.ops import ntt as nttmod
    from helib_tpu.ops import pallas_ntt as pn
    from helib_tpu.jitutil import lifted_jit

    raux = np.asarray(nttmod.aux_primes(), dtype=np.int64)
    for m, P in ((8009, 17), (1601, 17), (31775, 21)):
        qs = np.array(gen_primes(m, P), dtype=np.uint32)
        t = nttmod.BluesteinTables(qs, m, inverse=False)
        B = t.B
        # cap the batch so x + out + spectral broadcasts stay well under
        # the 16 GB HBM (B=65536 at batch 16 would need ~8.6 GB of input
        # alone)
        b = max(1, min(batch, (1 << 31) // (3 * P * B * 4)))
        tree = t.dev
        aux = tree["aux"]
        rng = np.random.default_rng(7)
        # aux-major [3, batch, P, B] (what bluestein_apply feeds the
        # shared path); the per-row kernel gets the same data aux-mid
        xs = jnp.asarray(rng.integers(0, raux[:, None, None, None],
                                      (3, b, P, B)).astype(np.uint32))
        xr = jnp.moveaxis(xs, 0, 1)
        rows = 3 * b * P

        f1 = lifted_jit(lambda v: pn.apply_conv(
            v, aux, tree["khat_f"], tree["khat_f_sh"], tree["aux_q"],
            kh_layout="fine"), xr)
        per1 = bench(f1, xr, iters)
        print(f"m={m} B={B} per-row: {per1 / rows * 1e6:8.2f} us/row",
              flush=True)

        f2 = lifted_jit(lambda v: pn.apply_conv_aux(
            v, aux, tree["khat_f"], tree["khat_f_sh"], tree["aux_q"]), xs)
        got = np.asarray(f2(xs))
        ok = (got == np.moveaxis(np.asarray(f1(xr)), 1, 0)).all()
        per2 = bench(f2, xs, iters)
        print(f"m={m} B={B} shared : {per2 / rows * 1e6:8.2f} us/row  "
              f"exact={ok}  speedup={per1 / per2:.3f}x", flush=True)


if __name__ == "__main__":
    main()
