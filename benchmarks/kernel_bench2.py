"""Kernel microbenchmarks with in-graph chaining to amortize the ~1 ms
remote-dispatch overhead: each jitted function applies the kernel CHAIN
times sequentially (data-dependent), so per-application time is
(t_call - overhead) / CHAIN."""
import sys, time, pathlib, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

CHAIN = 20

def timeit(fn, *args, iters=20):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / iters

def main():
    print("device:", jax.devices()[0], flush=True)
    from helib_tpu.ops.ntt import Pow2NTT, aux_primes, BluesteinTables, bluestein_apply
    from helib_tpu.ops import pallas_ntt as pn

    n = 16384
    qs = aux_primes()
    t = Pow2NTT(qs, n, negacyclic=False).tree()

    # overhead floor: trivial jit call
    f0 = jax.jit(lambda v: v)
    x0 = jnp.zeros((8, 128), jnp.uint32)
    print(json.dumps({"bench": "noop_call_overhead", "us": timeit(f0, x0, iters=50)*1e6}), flush=True)

    for reps in (3, 16):
        x = jnp.asarray(np.random.randint(0, qs[0], size=(reps, 3, n), dtype=np.uint32))
        @jax.jit
        def f(v):
            for _ in range(CHAIN):
                v = pn.apply_ntt(v, t["tw_cat"], t["tw_cat_sh"], t["tw_fine"], t["tw_fine_sh"], t["q"], inverse=False)
            return v
        dt = timeit(f, x)
        rows = reps*3
        print(json.dumps({"bench": f"ntt_fwd_n{n}", "rows": rows, "us_per_row": dt/CHAIN/rows*1e6, "ms_per_apply": dt/CHAIN*1e3}), flush=True)

    reps = 16
    kh = jnp.asarray(np.random.randint(0, qs[0], size=(3, n), dtype=np.uint32))
    x = jnp.asarray(np.random.randint(0, qs[0], size=(reps, 3, n), dtype=np.uint32))
    @jax.jit
    def fc(v):
        for _ in range(CHAIN):
            v = pn.apply_conv(v, t, kh, kh, t["q"])
        return v
    dt = timeit(fc, x)
    print(json.dumps({"bench": f"conv_n{n}", "rows": reps*3, "us_per_row": dt/CHAIN/(reps*3)*1e6}), flush=True)

    m = 8009
    from helib_tpu.context import Context
    ctx = Context(m=m, p=2, r=1, bits=380, c=3, scheme="bgv")
    qs_ct = ctx.all_q[:16].astype(np.uint32)
    bt = BluesteinTables(qs_ct, m, inverse=False)
    x = jnp.asarray(np.random.randint(0, 1000, size=(16, m), dtype=np.uint32))
    @jax.jit
    def fb(v):
        for _ in range(8):
            v = bluestein_apply(v % jnp.uint32(1000), bt.dev, m, bt.B)
        return v
    dt = timeit(fb, x, iters=10)
    print(json.dumps({"bench": f"bluestein_m{m}", "rows": 16, "us_per_row": dt/8/16*1e6, "ms_per_apply": dt/8*1e3}), flush=True)

    # HBM bandwidth with chaining
    big = jnp.asarray(np.random.randint(0, 2**30, size=(256, n), dtype=np.uint32))
    @jax.jit
    def fh(v):
        for _ in range(CHAIN):
            v = v + jnp.uint32(1)
        return v
    dt = timeit(fh, big, iters=30)
    print(json.dumps({"bench": "hbm_add_u32", "GBps": big.size*4*2*CHAIN/dt/1e9}), flush=True)

    # MXU rate with chaining: [128,16384]=x, y=[16384->128x128 dot]
    a = jnp.asarray(np.random.randn(512, 512), dtype=jnp.bfloat16)
    b = jnp.asarray(np.random.randn(512, 512), dtype=jnp.bfloat16)
    @jax.jit
    def fm(u):
        for _ in range(CHAIN):
            u = jnp.dot(u, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return u
    dt = timeit(fm, a, iters=30)
    print(json.dumps({"bench": "mxu_bf16_512", "TFLOPS": 2*512**3*CHAIN/dt/1e12}), flush=True)

    ai = jnp.asarray(np.random.randint(-127, 127, (512, 512), dtype=np.int8))
    bi = jnp.asarray(np.random.randint(-127, 127, (512, 512), dtype=np.int8))
    @jax.jit
    def fi(u):
        for _ in range(CHAIN):
            u = (jax.lax.dot_general(u, bi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32) & 127).astype(jnp.int8)
        return u
    dt = timeit(fi, ai, iters=30)
    print(json.dumps({"bench": "mxu_int8_512", "TOPS": 2*512**3*CHAIN/dt/1e12}), flush=True)

if __name__ == "__main__":
    main()
