"""Throughput scaling: batched ciphertext mult+relin on one chip, and the
sharded batch x limb mesh path (validated on the virtual CPU mesh when
multiple real chips are unavailable; see SURVEY.md §2.9 — the reference has
no distributed mode at all).

Run: python benchmarks/scaling.py [m=8009] [bits=380]
"""

import json
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import jax
    from helib_tpu.context import Context
    from helib_tpu.keys import SecKey
    from helib_tpu.pipeline import make_batched_mult_relin

    m, bits = 8009, 380
    for a in sys.argv[1:]:
        if a.startswith("m="):
            m = int(a.split("=")[1])
        if a.startswith("bits="):
            bits = int(a.split("=")[1])
    ctx = Context(m=m, p=2, r=1, bits=bits, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=4)
    base = None
    for batch in (1, 2, 4, 8):
        fn, ex = make_batched_mult_relin(ctx, sk, batch)
        jfn = jax.jit(fn)
        jax.block_until_ready(jfn(*ex))       # compile
        t0 = time.time()
        iters = 4
        for _ in range(iters):
            out = jfn(*ex)
        jax.block_until_ready(out)
        per_ctxt = (time.time() - t0) / iters / batch
        thr = 1.0 / per_ctxt
        if base is None:
            base = thr
        print(json.dumps({"metric": f"batched_mult_relin_ops_per_s_B{batch}",
                          "value": round(thr, 2), "unit": "ops/s",
                          "efficiency_vs_B1": round(thr / base, 3)}))


if __name__ == "__main__":
    main()
