"""Capacity-loss audit of the prefix-k uniform-prime policy (round-3
item 8, VERDICT).

The reference picks mod-switch targets from a mixed-size prime chain with
~1-bit resolution (primeChain.h getSet4Size / computeIntervalForMul,
Ctxt.cpp:1610-1656); this framework uses uniform ~30-bit primes with
prefix-k sets, so every mod-switch quantizes to 30-bit steps.  This audit
measures what that quantization actually costs over a deep circuit:

  * per squaring: capacity consumed (bits) and the limbs dropped,
  * the rounding waste = 30*ceil(drop/30) - drop accumulated over the
    circuit, translated into levels lost vs an ideal 1-bit-resolution
    policy (= what the reference's policy approaches).

Run on CPU (noise machine is host-side; no TPU needed):
    python benchmarks/capacity_audit.py [m] [bits] [depth]
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 257
    bits = int(sys.argv[2]) if len(sys.argv) > 2 else 700
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 12

    from helib_tpu.context import Context, PRIME_BITS
    from helib_tpu.keys import SecKey, PubKey
    from helib_tpu.ea import EncryptedArray
    from helib_tpu import timing

    timing.fhe_stats = True
    ctx = Context(m=m, p=2, r=1, bits=bits, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=3)
    pk = PubKey(sk)
    ea = EncryptedArray(ctx)
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 2, ea.nslots)
    ct = ea.encrypt(list(vals), pk, rng)

    print(f"m={m} bits={bits} L={ctx.L} prime_bits~{PRIME_BITS} "
          f"depth={depth}")
    print(f"{'step':>4} {'k':>3} {'capacity':>9} {'drop':>7} "
          f"{'noise-growth':>12} {'waste':>6}")
    cap0 = ct.capacity()
    total_drop = 0.0
    total_noise = 0.0
    total_waste = 0.0
    steps = 0
    expect = vals.copy()
    for i in range(depth):
        k_before = ct.k
        cap_before = ct.capacity()
        noise_before = ct.noise
        ct = ct.square(sk)
        expect = expect * expect % ctx.ptxt_space
        if not ct.is_correct():
            print(f"-- capacity exhausted after {i} squarings")
            break
        steps += 1
        drop = cap_before - ct.capacity()
        # noise growth if NO primes had been dropped (pre-mod-switch):
        # reconstruct from the drop and the modulus bits removed
        mod_removed = (k_before - ct.k) * np.log2(
            float(np.mean(ctx.qs[:k_before].astype(np.float64))))
        growth = drop + 0.0  # capacity accounts for both
        waste = max(0.0, mod_removed - (noise_before and growth))
        # simpler, robust accounting: waste per step = capacity drop minus
        # the intrinsic noise growth (what an ideal-resolution policy
        # would consume).  Intrinsic growth = drop - slack where slack =
        # capacity the NEXT multiply could not use because the prime
        # granularity forced an extra limb drop.  We report both raw
        # numbers and let the summary integrate over the circuit.
        print(f"{i:>4} {ct.k:>3} {ct.capacity():>9.1f} {drop:>7.1f} "
              f"{mod_removed:>12.1f} {drop - mod_removed:>6.1f}")
        total_drop += drop
        total_noise += drop - mod_removed
        total_waste += max(0.0, -(drop - mod_removed))
    got = ea.decrypt_ints(ct, sk)
    ok = bool((got == expect).all())
    per_mult = total_drop / max(steps, 1)
    print(f"\ndecrypt-correct={ok} steps={steps} "
          f"capacity used={total_drop:.1f} of {cap0:.1f} bits "
          f"({per_mult:.1f} bits/mult)")
    print(f"reference-policy comparison: uniform-30-bit quantization can "
          f"waste at most {PRIME_BITS} bits per multiply; measured "
          f"amortized per-mult consumption {per_mult:.1f} bits vs "
          f"intrinsic noise growth "
          f"{(total_drop - total_waste)/max(steps,1):.1f} bits "
          f"=> {(total_waste/max(steps,1)):.2f} bits/mult quantization "
          f"loss ({total_waste/PRIME_BITS:.2f} limbs over the circuit)")
    from helib_tpu.timing import print_stats
    print_stats()


if __name__ == "__main__":
    main()
