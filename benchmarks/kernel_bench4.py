"""mult+relin throughput after the coeff-domain digit decomposition:
single-op latency + batched throughput (the bench.py headline)."""
import sys, time, pathlib, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax, jax.numpy as jnp

def timeit(fn, *args, iters=8):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / iters

def main():
    from helib_tpu.context import Context
    from helib_tpu.keys import SecKey
    from helib_tpu.pipeline import make_batched_mult_relin, make_mult_relin
    t0 = time.time()
    ctx = Context(m=8009, p=2, r=1, bits=380, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=3)
    print(json.dumps({"setup_s": time.time()-t0}), flush=True)
    from helib_tpu.jitutil import lifted_jit
    for B in (1, 16):
        if B == 1:
            fn, ex = make_mult_relin(ctx, sk)
        else:
            fn, ex = make_batched_mult_relin(ctx, sk, B)
        def chain(a, b, c, d):
            for _ in range(4):
                a, b = fn(a, b, c, d)
            return a, b
        f = lifted_jit(chain, *ex)
        t0 = time.time()
        r = f(*ex); jax.block_until_ready(r)
        compile_s = time.time() - t0
        dt = timeit(f, *ex, iters=5)
        per_op = dt / 4 / B
        print(json.dumps({"batch": B, "compile_s": compile_s, "ms_per_op": per_op*1e3, "ops_per_s": 1/per_op}), flush=True)

if __name__ == "__main__":
    main()
