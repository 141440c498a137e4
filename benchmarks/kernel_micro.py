"""Chained-dispatch microbenchmark of the fused conv / NTT kernels on TPU.

Chains K kernel applications inside ONE jit so the axon-tunnel dispatch
latency (~10 ms RTT) amortizes away; reports per-application device time.

Usage: python benchmarks/kernel_micro.py [n] [rows] [K] [reps]
"""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from helib_tpu.ops.ntt import aux_primes, aux_ntt
from helib_tpu.ops import ntt as ntt_mod
from helib_tpu.ops.pallas_ntt import apply_conv, apply_ntt, spectral_fine_layout
from helib_tpu.ops.modops import shoup, mul_mod_shoup


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    nttB = aux_ntt(n)
    tree = nttB.tree()
    raux = aux_primes()
    rng = np.random.default_rng(0)
    pidx = np.arange(rows) % 3
    qrow = raux[pidx].astype(np.uint32)
    kh = rng.integers(0, qrow[:, None].astype(np.int64), (rows, n)).astype(np.uint32)
    khsh = shoup(kh, qrow[:, None].astype(np.uint64))
    khf = jnp.asarray(spectral_fine_layout(kh))
    khfsh = jnp.asarray(spectral_fine_layout(khsh))
    x0 = rng.integers(0, qrow[:, None].astype(np.int64), (rows, n)).astype(np.uint32)

    tsel = {k: jnp.asarray(np.asarray(tree[k])[pidx])
            for k in ("tw_cat", "tw_cat_sh", "itw_cat", "itw_cat_sh",
                      "tw_cat3", "tw_cat3_sh", "itw_cat3", "itw_cat3_sh",
                      "tw_fine", "tw_fine_sh", "itw_fine", "itw_fine_sh")}
    q = jnp.asarray(qrow[:, None])

    @jax.jit
    def chain_conv(v):
        return jax.lax.fori_loop(
            0, K,
            lambda _, u: apply_conv(u, tsel, khf, khfsh, q,
                                    kh_layout="fine"),
            v)

    @jax.jit
    def chain_ntt(v):
        def body(_, u):
            u = apply_ntt(u, tsel, q, inverse=False)
            return apply_ntt(u, tsel, q, inverse=True)
        return jax.lax.fori_loop(0, K, body, v)

    x_d = jnp.asarray(x0)

    # correctness vs staged jnp path (one conv application)
    y1 = np.asarray(apply_conv(x_d, tsel, khf, khfsh, q, kh_layout="fine"))
    ntt_mod.USE_PALLAS = False
    tb = {"q": q,
          "ninv": jnp.asarray(np.asarray(tree["ninv"])[pidx]),
          "ninv_sh": jnp.asarray(np.asarray(tree["ninv_sh"])[pidx]),
          "tw": [jnp.asarray(np.asarray(a)[pidx]) for a in tree["tw"]],
          "tw_sh": [jnp.asarray(np.asarray(a)[pidx]) for a in tree["tw_sh"]],
          "itw": [jnp.asarray(np.asarray(a)[pidx]) for a in tree["itw"]],
          "itw_sh": [jnp.asarray(np.asarray(a)[pidx]) for a in tree["itw_sh"]]}
    A = ntt_mod.ntt_pow2_fwd(x_d, tb)
    Pr = mul_mod_shoup(A, jnp.asarray(kh), jnp.asarray(khsh), q)
    ref = np.asarray(ntt_mod.ntt_pow2_inv(Pr, tb))
    ntt_mod.USE_PALLAS = None
    print("conv value check:", "OK" if (y1 == ref).all() else "MISMATCH",
          flush=True)
    assert (y1 == ref).all()

    for name, fn in [("conv", chain_conv), ("fwd+inv", chain_ntt)]:
        t0 = time.time()
        r = fn(x_d); jax.block_until_ready(r)
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            r = fn(x_d); jax.block_until_ready(r)
            best = min(best, time.time() - t0)
        per_app = best / K
        per_row = per_app / rows
        print(f"{name}: n={n} rows={rows} K={K} compile={compile_s:.1f}s "
              f"per-app={per_app*1e6:.1f}us per-row={per_row*1e6:.2f}us",
              flush=True)


if __name__ == "__main__":
    main()
