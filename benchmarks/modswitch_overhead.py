"""Per-op overhead of the measured mod-switch noise (VERDICT r4 item 6).

The reference measures the EXACT canonical norm of the rounding delta on
every modDownToSet (Ctxt.cpp:491-503, unconditional).  Since round 5 the
eager BGV path does the same by default: the balanced delta/D remainder is
a free byproduct of the scale-down kernel (dcrt.rt_scale_down
want_frac=True), so the per-op cost is one [N]-float host transfer + one
host FFT per part.  This benchmark quantifies that cost on the eager
mult -> relinearize -> mod-down loop, flag off vs on.

Run: python benchmarks/modswitch_overhead.py [m] [bits] [iters]
(m=8009 default; m=31775 needs mvec-free plain context — fine.)
"""

import os
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def run_chain(ctx, sk, pk, iters):
    rng = np.random.default_rng(3)
    pt = rng.integers(0, ctx.ptxt_space, ctx.phi_m)
    ct = pk.encrypt_bgv(pt, rng)
    import jax
    # warm all programs for this (k, special) ladder
    t = ct.multiply(ct, sk)
    t.bring_to_k(t.natural_k())
    jax.block_until_ready(t.parts[0][1])
    t0 = time.time()
    cur = ct
    for _ in range(iters):
        cur = cur.multiply(cur, sk)
        cur.bring_to_k(max(cur.natural_k(), 3))
        if cur.k <= 3:          # restart the ladder from the top
            cur = pk.encrypt_bgv(pt, rng)
    jax.block_until_ready(cur.parts[0][1])
    return (time.time() - t0) / iters


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 8009
    bits = int(sys.argv[2]) if len(sys.argv) > 2 else 380
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    from helib_tpu.context import Context
    from helib_tpu.keys import SecKey, PubKey

    ctx = Context(m=m, p=2, r=1, bits=bits, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=3)
    pk = PubKey(sk)

    import json
    res = {}
    for flag in ("0", "1"):
        os.environ["HELIB_EXACT_MODSWITCH"] = flag
        per = run_chain(ctx, sk, pk, iters)
        res[flag] = per
        print(json.dumps({
            "metric": f"eager_mult_modswitch_ms_m{m}_exact{flag}",
            "value": round(per * 1e3, 3), "unit": "ms"}), flush=True)
    ovh = (res["1"] - res["0"]) / res["0"] * 100.0
    print(json.dumps({"metric": f"measured_modswitch_overhead_pct_m{m}",
                      "value": round(ovh, 1), "unit": "%"}))


if __name__ == "__main__":
    main()
