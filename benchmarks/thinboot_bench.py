"""BGV thin-bootstrap latency benchmark on real TPU.

Mirrors the reference google-benchmark workload
(/root/reference/benchmarks/bgv_thinboot.cpp:104-145): encrypt, consume
capacity, thinReCrypt, verify, and report wall latency of the recryption
(setup excluded, as in the reference which times only the bootstrap call).

Params (reference naming):
  tiny : m = 31*41 = 1271,  p=2, bits=600, c=3, skHwt=64
  small: m = 31775 (5^2*31*41), p=2, bits=600, c=3, skHwt=64

Usage: python benchmarks/thinboot_bench.py [tiny|small] [reps]
"""

import os
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# Boot latency rows are reported with the worst-case mod-switch bound
# (HELIB_EXACT_MODSWITCH=0) so numbers stay comparable across rounds; the
# measured-noise default's overhead is benchmarked separately
# (benchmarks/modswitch_overhead.py).  Export HELIB_EXACT_MODSWITCH=1 to
# time the measured-noise path here instead.
os.environ.setdefault("HELIB_EXACT_MODSWITCH", "0")

import numpy as np

PARAMS = {
    "tiny": dict(m=1271, mvec=(31, 41), bits=600),
    "small": dict(m=31775, mvec=(31, 25, 41), bits=600),
    "big": dict(m=35113, mvec=(37, 949), bits=600),
}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cfg = PARAMS[which]

    from helib_tpu.context import Context
    from helib_tpu.keys import SecKey, PubKey
    from helib_tpu.ea import EncryptedArray
    from helib_tpu.recryption import RecryptData, thin_recrypt

    t0 = time.time()
    ctx = Context(m=cfg["m"], p=2, r=1, bits=cfg["bits"], c=3, scheme="bgv",
                  mvec=cfg["mvec"])
    sk = SecKey(ctx, seed=141, hwt=64)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    print(f"[setup] context+keys+EA: {time.time() - t0:.1f}s "
          f"(m={ctx.m}, phi={ctx.phi_m}, L={ctx.L}, nslots={ea.nslots}, "
          f"d={ea.d})", flush=True)

    t0 = time.time()
    rc = RecryptData(ctx, sk, ea, hwt=64)
    print(f"[setup] recrypt data (maps, ekey): {time.time() - t0:.1f}s "
          f"(e={rc.e}, ePrime={rc.ePrime})", flush=True)

    rng = np.random.default_rng(143)
    slots = rng.integers(0, ctx.ptxt_space, ea.nslots)
    ct = ea.encrypt(list(slots), pk, rng)
    ct.bring_to_k(3)

    times = []
    for i in range(reps):
        t0 = time.time()
        out = thin_recrypt(ct, rc, sk)
        dt = time.time() - t0
        times.append(dt)
        ok = (ea.decrypt_ints(out, sk) == slots).all() and out.is_correct()
        print(f"[run {i}] thinReCrypt: {dt:.2f}s  correct={ok} "
              f"capacity={out.capacity():.1f}", flush=True)
        assert ok
    best = min(times)
    print(f"RESULT thinboot_{which}: {best:.2f} s/bootstrap "
          f"({ea.nslots} slots, {best / ea.nslots * 1000:.2f} ms/slot)")


if __name__ == "__main__":
    main()
