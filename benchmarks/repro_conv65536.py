"""Bisect harness for the m=31775 recrypt TPU-worker crash (round-3 item 1).

STATUS round-2 suspect: the fused Bluestein conv kernel at B=65536
(VMEM/stack) during the extract-digits mod-down.  This drives ONLY that
kernel, at the same shapes the recrypt uses, for many iterations, with
host-side value checks every CHECK_EVERY rounds (against the staged jnp
path) so a silent-corruption failure mode is also caught.

Usage: python benchmarks/repro_conv65536.py [iters] [rows]
"""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from helib_tpu.ops.ntt import aux_primes, aux_ntt, BluesteinTables
from helib_tpu.ops import ntt as ntt_mod
from helib_tpu.ops.pallas_ntt import apply_conv
from helib_tpu.ops.modops import mul_mod_shoup


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 24   # e.g. 3 aux x 8 limbs
    m = 31775
    B = 1 << int(np.ceil(np.log2(2 * m - 1)))
    assert B == 65536, B
    print(f"B={B} rows={rows} iters={iters}", flush=True)
    nttB = aux_ntt(B)
    tree = nttB.tree()
    raux = aux_primes()
    rng = np.random.default_rng(0)
    # one aux prime per row, cycling
    qrow = raux[np.arange(rows) % 3].astype(np.uint32)
    kh = rng.integers(0, qrow[:, None].astype(np.int64), (rows, B)).astype(np.uint32)
    from helib_tpu.ops.modops import shoup
    khsh = shoup(kh, qrow[:, None].astype(np.uint64))
    x0 = rng.integers(0, qrow[:, None].astype(np.int64), (rows, B)).astype(np.uint32)

    # broadcast tables to [rows, ...]: use prime index per row
    pidx = np.arange(rows) % 3
    q = jnp.asarray(qrow[:, None])
    tsel = {k: jnp.asarray(np.asarray(tree[k])[pidx])
            for k in ("tw_cat3", "tw_cat3_sh", "itw_cat3", "itw_cat3_sh",
                      "tw_fine", "tw_fine_sh", "itw_fine", "itw_fine_sh")}

    from helib_tpu.ops.pallas_ntt import spectral_fine_layout
    kh_d = jnp.asarray(spectral_fine_layout(kh))
    khsh_d = jnp.asarray(spectral_fine_layout(khsh))

    @jax.jit
    def step_impl(v, tsel, kh_d, khsh_d, q):
        return apply_conv(v, tsel, kh_d, khsh_d, q, kh_layout="fine")

    def step(v):
        return step_impl(v, tsel, kh_d, khsh_d, q)

    # reference value from the staged jnp path (once)
    x_d = jnp.asarray(x0)
    y0 = np.asarray(step(x_d))
    ntt_mod.USE_PALLAS = False
    tree_b = {"q": q, **{k: tree[k] for k in ("tw", "tw_sh", "itw", "itw_sh")},
              "ninv": jnp.asarray(np.asarray(tree["ninv"])[pidx]),
              "ninv_sh": jnp.asarray(np.asarray(tree["ninv_sh"])[pidx])}
    twl = [jnp.asarray(np.asarray(a)[pidx]) for a in tree["tw"]]
    twsl = [jnp.asarray(np.asarray(a)[pidx]) for a in tree["tw_sh"]]
    itwl = [jnp.asarray(np.asarray(a)[pidx]) for a in tree["itw"]]
    itwsl = [jnp.asarray(np.asarray(a)[pidx]) for a in tree["itw_sh"]]
    tree_b.update(tw=twl, tw_sh=twsl, itw=itwl, itw_sh=itwsl)
    A = ntt_mod.ntt_pow2_fwd(x_d, tree_b)
    P = mul_mod_shoup(A, jnp.asarray(kh), jnp.asarray(khsh), q)
    ref = np.asarray(ntt_mod.ntt_pow2_inv(P, tree_b))
    ntt_mod.USE_PALLAS = None
    ok = (y0 == ref).all()
    print("initial value check:", "OK" if ok else "MISMATCH", flush=True)
    assert ok

    CHECK_EVERY = 25
    v = x_d
    t0 = time.time()
    for i in range(iters):
        v = step(v)
        if (i + 1) % CHECK_EVERY == 0:
            val = np.asarray(v)
            bad = (val >= qrow[:, None]).sum()
            print(f"iter {i+1}: {time.time()-t0:.1f}s  out-of-range={bad}",
                  flush=True)
            assert bad == 0
    jax.block_until_ready(v)
    dt = time.time() - t0
    print(f"done {iters} iters in {dt:.1f}s ({dt/iters*1e3:.2f} ms/iter)",
          flush=True)


if __name__ == "__main__":
    main()
