"""v1 vs v2 fused conv kernel on the real TPU (us/aux-row, chained).

The round-3 roofline put the v1 conv at 9.8 us/row (n=16384) against a
~5 us/row butterfly floor, the gap being per-composite concat
materializations (one per radix-4 pair) and the two outer transposes.
v2 (pallas_ntt2) removes the intermediate materializations entirely;
this measures what that buys at the headline shapes and picks max_k.

Run: python benchmarks/kernel_v2_bench.py [rows] [iters]
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
        y = fn(y)          # chained: fresh data, stays pipelined
    jax.block_until_ready(y)
    return (time.time() - t0) / iters


def main():
    # rows must be large enough that one kernel dispatch (~rows x 10 us)
    # exceeds the ~5-10 ms tunnel dispatch latency, else the chain measures
    # dispatch rate, not the kernel (the 96-row first run read 16 us/row
    # for v1 where the round-3 in-pipeline trace shows 9.8)
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from helib_tpu.nt.primegen import gen_primes
    from helib_tpu.ops.ntt import Pow2NTT
    from helib_tpu.ops import modops
    from helib_tpu.ops.pallas_ntt import apply_conv
    from helib_tpu.ops.pallas_ntt2 import apply_conv2

    for n in (16384, 8192):
        # realistic prime count (m=8009 chain: L+S = 18-26 limbs) with a
        # batch lead dim to reach `rows` total — 1024-prime tables embed
        # tens of MB of constants per jit and overflow the remote-compile
        # payload (HTTP 413), which no real pipeline does
        P = 26
        B = max(1, rows // P)
        qs = np.array(gen_primes(2 * n, P), dtype=np.uint32)
        t = Pow2NTT(qs, n, negacyclic=True)
        tree = t.tree()
        rows = P * B
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.integers(0, qs[:, None].astype(np.int64),
                                     (B, P, n)).astype(np.uint32))
        kh = rng.integers(0, qs[:, None].astype(np.int64),
                          (P, n)).astype(np.uint32)
        khsh = np.asarray(modops.shoup(kh, qs[:, None].astype(np.uint64)))
        khj, khshj = jnp.asarray(kh), jnp.asarray(khsh)
        q = tree["q"]

        # lifted_jit: the tree/khat tables total tens of MB and, closed
        # over, become dense HLO constants that overflow the remote-compile
        # payload (HTTP 413, results_r5.log 04:07)
        from helib_tpu.jitutil import lifted_jit
        f1 = lifted_jit(lambda v: apply_conv(v, tree, khj, khshj, q), x)
        per = bench(f1, x, iters)
        print(f"n={n} v1        : {per / rows * 1e6:8.2f} us/row", flush=True)
        ref = np.asarray(f1(x))

        for max_k in (4, None, 3, 2):
            try:
                f2 = lifted_jit(lambda v, mk=max_k: apply_conv2(
                    v, tree, khj, khshj, q, max_k=mk), x)
                got = np.asarray(f2(x))
                ok = (got == ref).all()
                per = bench(f2, x, iters)
                print(f"n={n} v2 k={str(max_k):>4}: "
                      f"{per / rows * 1e6:8.2f} us/row  exact={ok}",
                      flush=True)
            except Exception as e:
                print(f"n={n} v2 k={max_k}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
