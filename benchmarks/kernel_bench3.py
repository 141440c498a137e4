"""Tuning experiments: ROW_BLOCK sweep for the fused NTT, and batched
mult+relin throughput with in-graph chaining."""
import sys, time, pathlib, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax, jax.numpy as jnp

def timeit(fn, *args, iters=15):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / iters

def main():
    from helib_tpu.ops.ntt import Pow2NTT, aux_primes
    from helib_tpu.ops import pallas_ntt as pn
    n = 16384
    qs = aux_primes()
    t = Pow2NTT(qs, n, negacyclic=False).tree()
    CHAIN = 20
    for rb in (8, 16, 32, 64):
        pn.ROW_BLOCK = rb
        pn.pallas_ntt.clear_cache() if hasattr(pn.pallas_ntt, "clear_cache") else None
        reps = 32
        x = jnp.asarray(np.random.randint(0, qs[0], size=(reps, 3, n), dtype=np.uint32))
        @jax.jit
        def f(v):
            for _ in range(CHAIN):
                v = pn.apply_ntt(v, t["tw_cat"], t["tw_cat_sh"], t["tw_fine"], t["tw_fine_sh"], t["q"], inverse=False)
            return v
        dt = timeit(f, x, iters=10)
        print(json.dumps({"bench": "ntt_rowblock", "rb": rb, "rows": reps*3, "us_per_row": dt/CHAIN/(reps*3)*1e6}), flush=True)
    pn.ROW_BLOCK = 8

    # batched mult+relin throughput
    from helib_tpu.context import Context
    from helib_tpu.keys import SecKey
    from helib_tpu.pipeline import make_batched_mult_relin, make_mult_relin
    ctx = Context(m=8009, p=2, r=1, bits=380, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=3)
    for B in (1, 8, 32):
        if B == 1:
            fn, ex = make_mult_relin(ctx, sk)
        else:
            fn, ex = make_batched_mult_relin(ctx, sk, B)
        @jax.jit
        def f(a, b, c, d):
            for _ in range(4):
                a, b = fn(a, b, c, d)
            return a, b
        dt = timeit(f, *ex, iters=5)
        per_op = dt / 4 / B
        print(json.dumps({"bench": "mult_relin_batched", "batch": B, "ms_per_op": per_op*1e3, "ops_per_s": 1/per_op}), flush=True)

if __name__ == "__main__":
    main()
