"""Headline benchmark: BGV ciphertext mult+relinearize throughput per chip.

Matches the reference workload `benchmarks/bgv_basic.cpp` "small" config
(m=8009, p=2, bits=380, c=3; reference bgv_basic.cpp:214-269).  Prints ONE
JSON line {metric, value, unit, vs_baseline}.

vs_baseline: HElib publishes no absolute numbers in-repo (BASELINE.md); the
reference point used here is an order-of-magnitude per-socket estimate of
30 ms per mult+relin for multithreaded HElib at this config, consistent with
the timings reported in the HElib design report (eprint 2020/1481) for
comparable parameter sizes.  vs_baseline = ref_seconds / our_seconds
(>1 means faster than the reference estimate).
"""

import json
import sys
import time

REF_SECONDS = 0.030   # documented per-op proxy for HElib small config


def main():
    import numpy as np
    import jax

    from helib_tpu.context import Context
    from helib_tpu.keys import SecKey
    from helib_tpu.pipeline import make_mult_relin

    m, p, bits, c = 8009, 2, 380, 3
    t0 = time.time()
    ctx = Context(m=m, p=p, r=1, bits=bits, c=c, scheme="bgv")
    sk = SecKey(ctx, seed=3)
    fn, args = make_mult_relin(ctx, sk)
    jfn = jax.jit(fn, donate_argnums=())
    setup_s = time.time() - t0

    t0 = time.time()
    out = jfn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    # steady-state timing
    iters = 5
    jax.block_until_ready(jfn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = jfn(*args)
    jax.block_until_ready(out)
    per_op = (time.time() - t0) / iters
    if per_op < 0.25:
        iters = max(10, int(2.0 / per_op))
        t0 = time.time()
        for _ in range(iters):
            out = jfn(*args)
        jax.block_until_ready(out)
        per_op = (time.time() - t0) / iters

    ops_per_s = 1.0 / per_op
    print(json.dumps({
        "metric": "bgv_mult_relin_ops_per_s_m8009_b380",
        "value": round(ops_per_s, 3),
        "unit": "ops/s",
        "vs_baseline": round(REF_SECONDS / per_op, 3),
    }))
    print(f"# setup={setup_s:.1f}s compile={compile_s:.1f}s "
          f"per_op={per_op*1e3:.2f}ms device={jax.devices()[0].device_kind}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
