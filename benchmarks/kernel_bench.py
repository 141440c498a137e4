"""Kernel microbenchmarks on the real TPU: NTT roofline analysis.

Times the fused Pallas NTT/conv kernels, the Bluestein wrapper, an HBM
bandwidth reference and an MXU matmul reference, to locate the gap between
the current kernel and speed-of-light (VERDICT round-2 task 2).
"""
import sys, time, pathlib, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

def timeit(fn, iters=30):
    r = fn(); jax.block_until_ready(r)           # compile
    t0 = time.time()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    return (time.time() - t0) / iters

def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    from helib_tpu.ops.ntt import Pow2NTT, aux_primes, BluesteinTables, bluestein_apply, _broadcast_tree
    from helib_tpu.ops import pallas_ntt as pn

    n = 16384
    qs = aux_primes()
    t = Pow2NTT(qs, n, negacyclic=False).tree()

    for P in (8, 24, 48):
        reps = (P + 2) // 3
        x = jnp.asarray(np.random.randint(0, qs[0], size=(reps, 3, n), dtype=np.uint32))
        f = jax.jit(lambda v: pn.apply_ntt(v, t["tw_cat"], t["tw_cat_sh"], t["tw_fine"], t["tw_fine_sh"], t["q"], inverse=False))
        dt = timeit(lambda: f(x))
        print(json.dumps({"bench": f"pallas_ntt_fwd_n{n}", "rows": reps*3, "us_per_row": dt/ (reps*3) * 1e6, "total_ms": dt*1e3}), flush=True)

    # fused conv (fwd+pointwise+inv)
    reps = 16
    kh = jnp.asarray(np.random.randint(0, qs[0], size=(3, n), dtype=np.uint32))
    khsh = kh  # shape-only for timing
    x = jnp.asarray(np.random.randint(0, qs[0], size=(reps, 3, n), dtype=np.uint32))
    f = jax.jit(lambda v: pn.apply_conv(v, t, kh, khsh, t["q"]))
    dt = timeit(lambda: f(x))
    print(json.dumps({"bench": f"pallas_conv_n{n}", "rows": reps*3, "us_per_row": dt/(reps*3)*1e6, "total_ms": dt*1e3}), flush=True)

    # bluestein full transform m=8009, L=16 limbs
    m = 8009
    from helib_tpu.nt.primegen import gen_primes
    try:
        qs_ct = np.array(gen_primes(m, 30, 16), dtype=np.uint32)
    except Exception:
        from helib_tpu.context import Context
        ctx = Context(m=m, p=2, r=1, bits=380, c=3, scheme="bgv")
        qs_ct = ctx.all_q[:16].astype(np.uint32)
    bt = BluesteinTables(qs_ct, m, inverse=False)
    x = jnp.asarray(np.random.randint(0, 1000, size=(16, m), dtype=np.uint32))
    f = jax.jit(lambda v: bluestein_apply(v, bt.dev, m, bt.B))
    dt = timeit(lambda: f(x))
    print(json.dumps({"bench": f"bluestein_m{m}", "rows": 16, "us_per_row": dt/16*1e6, "total_ms": dt*1e3}), flush=True)

    # HBM bandwidth reference: u32 copy+add of the same footprint
    big = jnp.asarray(np.random.randint(0, 2**30, size=(48, n), dtype=np.uint32))
    f = jax.jit(lambda v: v + jnp.uint32(1))
    dt = timeit(lambda: f(big), iters=100)
    bytes_moved = big.size * 4 * 2
    print(json.dumps({"bench": "hbm_add_u32", "GBps": bytes_moved/dt/1e9, "us": dt*1e6}), flush=True)

    # MXU reference: bf16 matmul [128,128]@[128,16384]
    a = jnp.asarray(np.random.randn(128, 128), dtype=jnp.bfloat16)
    b = jnp.asarray(np.random.randn(128, 16384), dtype=jnp.bfloat16)
    f = jax.jit(lambda u, v: jnp.dot(u, v, preferred_element_type=jnp.float32))
    dt = timeit(lambda: f(a, b), iters=100)
    flops = 2 * 128 * 128 * 16384
    print(json.dumps({"bench": "mxu_bf16_128x128x16384", "TFLOPS": flops/dt/1e12, "us": dt*1e6}), flush=True)

    # int8 matmul support probe
    try:
        ai = jnp.asarray(np.random.randint(-127, 127, (128, 128), dtype=np.int8))
        bi = jnp.asarray(np.random.randint(-127, 127, (128, 16384), dtype=np.int8))
        f = jax.jit(lambda u, v: jax.lax.dot_general(u, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
        dt = timeit(lambda: f(ai, bi), iters=100)
        print(json.dumps({"bench": "mxu_int8_128x128x16384", "TOPS": flops/dt/1e12, "us": dt*1e6}), flush=True)
    except Exception as e:
        print("int8 matmul failed:", repr(e), flush=True)

if __name__ == "__main__":
    main()
