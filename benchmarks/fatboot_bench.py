"""BGV fat (packed) bootstrap latency benchmark on real TPU.

Mirrors the reference google-benchmark workload
(/root/reference/benchmarks/bgv_fatboot.cpp:105-145): encrypt a full packed
ciphertext (slots hold extension-field elements, not just constants), consume
capacity, reCrypt, verify, report the recryption latency alone (the reference
times only the `reCrypt` call).

Params (reference naming; bits per bgv_fatboot.cpp: 580, c=2, skHwt=64 —
we keep c=3 which our uniform-prime chain uses throughout):
  tiny : m = 31*41 = 1271
  small: m = 31775 (5^2*31*41)
  big  : m = 35113 (13*37*73)

Usage: python benchmarks/fatboot_bench.py [tiny|small|big] [reps]
"""

import os
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# See thinboot_bench.py: boot rows use the worst-case mod-switch bound so
# numbers stay comparable across rounds; the measured-noise default is
# benchmarked separately (benchmarks/modswitch_overhead.py).
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
    from helib_tpu.recryption import FatRecryptData, fat_recrypt

    t0 = time.time()
    ctx = Context(m=cfg["m"], p=2, r=1, bits=cfg["bits"], c=3, scheme="bgv",
                  mvec=cfg["mvec"])
    sk = SecKey(ctx, seed=151, hwt=64)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    print(f"[setup] context+keys+EA: {time.time() - t0:.1f}s "
          f"(m={ctx.m}, phi={ctx.phi_m}, L={ctx.L}, nslots={ea.nslots}, "
          f"d={ea.d})", flush=True)

    t0 = time.time()
    rc = FatRecryptData(ctx, sk, ea, hwt=64)
    print(f"[setup] fat recrypt data (block maps, ekey): "
          f"{time.time() - t0:.1f}s (e={rc.e}, ePrime={rc.ePrime})",
          flush=True)

    # Packed payload: a full degree-(d-1) extension-field element per slot.
    rng = np.random.default_rng(153)
    slots = [rng.integers(0, ctx.ptxt_space, ea.d) for _ in range(ea.nslots)]
    ct = pk.encrypt_bgv(ea.encode(slots), rng)
    ct.bring_to_k(3)

    times = []
    for i in range(reps):
        t0 = time.time()
        out = fat_recrypt(ct, rc, sk)
        dt = time.time() - t0
        times.append(dt)
        dec = ea.decode(sk.decrypt_bgv(out))
        ok = all((np.asarray(a) % ctx.ptxt_space
                  == np.asarray(b) % ctx.ptxt_space).all()
                 for a, b in zip(dec, slots)) and out.is_correct()
        print(f"[run {i}] reCrypt: {dt:.2f}s  correct={ok} "
              f"capacity={out.capacity():.1f}", flush=True)
        assert ok
    best = min(times)
    print(f"RESULT fatboot_{which}: {best:.2f} s/bootstrap "
          f"({ea.nslots} slots x d={ea.d}, "
          f"{best / (ea.nslots * ea.d) * 1000:.3f} ms/coeff)")


if __name__ == "__main__":
    main()
