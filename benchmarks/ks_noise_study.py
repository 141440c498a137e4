"""KS-noise-ratio profile across levels (VERDICT r4 item 5).

The reference records ratio = addedKSNoise / (noise * P) on every
key-switch and warns when it exceeds 1 (Ctxt.cpp:827-841:
`ratio = addedNoise / noiseBound; if (ratio > 1) Warning(...)`).  Our
relinearize mirrors that exactly (ctxt.py KS-noise-ratio).  The question
(VERDICT r4 weak 6): is the 332x ratio observed on the headline bench a
sizing bug that silently costs capacity, or the expected fresh-ciphertext
regime?

Structure of the ratio with our prefix-k chain (context.py: S special
primes sized to the largest digit, P ~= D_max):

    addedNoise ~= (D_max/2)*canon * W.noise        (digit MAC)
    noise*P    ~= noise * D_max
    ratio      ~= canon * W.noise / (2 * noise)

i.e. the ratio is INDEPENDENT of the chain and inversely proportional to
the ciphertext's own noise.  Fresh ciphertexts (tiny noise) therefore
warn by design — exactly as the reference does on its own benchmarks —
while grown noise (post-mult levels) pushes the ratio below 1.  What the
ratio does NOT measure is capacity: the noise actually RETAINED after the
mod-down by P is addedNoise/P ~= canon*W.noise/2, a constant floor; this
script also reports that floor against the mod-switch additive noise to
show no capacity is silently lost.

Run (CPU fine): python benchmarks/ks_noise_study.py [m] [bits] [c]
"""

import sys
import math
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 8009
    bits = int(sys.argv[2]) if len(sys.argv) > 2 else 380
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from helib_tpu.context import Context
    from helib_tpu.keys import SecKey, PubKey
    from helib_tpu import ctxt as ctxt_mod
    from helib_tpu import timing

    ctx = Context(m=m, p=2, r=1, bits=bits, c=c, scheme="bgv")
    sk = SecKey(ctx, seed=11)
    pk = PubKey(sk)
    logP = ctx.log2_special()
    print(f"# m={m} phi={ctx.phi_m} L={ctx.L} S={ctx.S} c={c} "
          f"log2P={logP:.1f}")

    rows = []
    orig_update = timing.stats_update

    def capture(name, val):
        if name == "KS-noise-ratio":
            rows.append(val)
        return orig_update(name, val)
    timing.stats_update = capture
    ctxt_mod.stats_update = capture  # module-local import in relinearize
    try:
        rng = np.random.default_rng(17)
        pt = rng.integers(0, 2, ctx.phi_m)
        a = pk.encrypt_bgv(pt, rng)
        print(f"{'k':>3} {'noise_in':>9} {'ratio':>10} {'retained':>9} "
              f"{'capacity':>9}")
        while a.natural_k() > 2:
            noise_in = a.noise
            n0 = len(rows)
            b = a.mul_low_level(a)
            b.relinearize(sk)
            ratio = rows[-1] if len(rows) > n0 else float("nan")
            # log2 of the noise the KS RETAINS after the mod-down by P:
            # addedNoise/P = ratio * noise_in  (ratio = added/(noise_in*P))
            retained = (math.log2(ratio) if ratio > 0 else -64.0) + noise_in
            b.drop_special_primes()
            print(f"{b.k:>3} {noise_in:>9.1f} {ratio:>10.3g} "
                  f"{retained:>9.1f} {b.capacity():>9.1f}")
            a = b
        # floors for context: what the KS leaves behind vs the mod-switch
        # additive noise every mod-down charges anyway
        ms_noise = a.mod_switch_added_noise()
        print(f"# mod-switch additive noise floor (log2): {ms_noise:.1f}")
        print(f"# => KS-retained noise exceeds the mod-switch floor only "
              f"when log2(ratio) + noise_in > {ms_noise:.1f}")
    finally:
        timing.stats_update = orig_update
        ctxt_mod.stats_update = orig_update


if __name__ == "__main__":
    main()
