"""Decompose the fused-NTT kernel cost: what do 28 stages' worth of
(a) bare lazy Shoup muls, (b) muls + butterfly adds/csubs, (c) full stages
with interleave cost on the VPU?  Pinpoints whether multiplies, selects, or
relayouts dominate.  Run on TPU."""
import sys
import time
import pathlib
import functools

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from helib_tpu.ops.pallas_ntt import (_shoup_lazy, _csub, ROW_BLOCK)
from helib_tpu.ops.ntt import aux_primes
from helib_tpu.ops.modops import shoup

N = 16384
STAGES = 28


def kern_mul(x_ref, w_ref, wsh_ref, q_ref, o_ref, *, variant):
    x = x_ref[:]
    w = w_ref[:]
    wsh = wsh_ref[:]
    q = q_ref[:]
    R = x.shape[0]
    n = x.shape[1]
    if variant == "mul":
        # 14 muls (the conv's per-point mul count) and nothing else
        for _ in range(14):
            x = _shoup_lazy(x, w, wsh, q)
        x = _csub(x, q)
    elif variant == "bfly":
        # 28 half-stage equivalents: mul on half the data + adds + csub,
        # fixed stride (no reshuffle)
        h = n // 2
        for _ in range(STAGES):
            u = _csub(x[:, :h], 2 * q)
            t = _shoup_lazy(x[:, h:], w[:, :h], wsh[:, :h], q)
            x = jnp.concatenate([u + t, u + 2 * q - t], axis=1)
        x = _csub(_csub(x, 2 * q), q)
    elif variant == "stage":
        # full radix-2 stages incl. the stack/reshape interleave, stride
        # n/4 every time (representative coarse stage)
        m = 4
        half = n // (2 * m)
        for _ in range(STAGES):
            xr = x.reshape(R, m, 2, half)
            u = _csub(xr[:, :, 0, :], 2 * q[:, :, None])
            t = _shoup_lazy(xr[:, :, 1, :], w[:, :m][:, :, None],
                            wsh[:, :m][:, :, None], q[:, :, None])
            x = jnp.stack([u + t, u + 2 * q[:, :, None] - t],
                          axis=2).reshape(R, n)
        x = _csub(_csub(x, 2 * q), q)
    elif variant == "stage_r":
        # strided chunk READS (block view), contiguous concat write
        m = 4
        half = n // (2 * m)
        for _ in range(STAGES):
            xr = x.reshape(R, m, 2, half)
            u = _csub(xr[:, :, 0, :], 2 * q[:, :, None])
            t = _shoup_lazy(xr[:, :, 1, :], w[:, :m][:, :, None],
                            wsh[:, :m][:, :, None], q[:, :, None])
            x = jnp.concatenate([(u + t).reshape(R, n // 2),
                                 (u + 2 * q[:, :, None] - t)
                                 .reshape(R, n // 2)], axis=1)
        x = _csub(_csub(x, 2 * q), q)
    elif variant == "stage_c":
        # same data flow as "stage" but concatenate along the intra-block
        # axis instead of stack+reshape (layout-identity write)
        m = 4
        half = n // (2 * m)
        for _ in range(STAGES):
            xr = x.reshape(R, m, 2, half)
            u = _csub(xr[:, :, 0, :], 2 * q[:, :, None])
            t = _shoup_lazy(xr[:, :, 1, :], w[:, :m][:, :, None],
                            wsh[:, :m][:, :, None], q[:, :, None])
            x = jnp.concatenate([u + t, u + 2 * q[:, :, None] - t],
                                axis=2).reshape(R, n)
        x = _csub(_csub(x, 2 * q), q)
    elif variant == "stage_c64":
        # concat variant at fine-ish granularity m=64 (half=128)
        m = 64
        half = n // (2 * m)
        for _ in range(STAGES):
            xr = x.reshape(R, m, 2, half)
            u = _csub(xr[:, :, 0, :], 2 * q[:, :, None])
            t = _shoup_lazy(xr[:, :, 1, :], w[:, :m][:, :, None],
                            wsh[:, :m][:, :, None], q[:, :, None])
            x = jnp.concatenate([u + t, u + 2 * q[:, :, None] - t],
                                axis=2).reshape(R, n)
        x = _csub(_csub(x, 2 * q), q)
    elif variant == "stage_w":
        # contiguous half reads, stacked interleave WRITE at m=4
        m = 4
        half = n // (2 * m)
        for _ in range(STAGES):
            h = n // 2
            u = _csub(x[:, :h], 2 * q).reshape(R, m, half)
            t = _shoup_lazy(x[:, h:], w[:, :h], wsh[:, :h], q) \
                .reshape(R, m, half)
            x = jnp.stack([u, t], axis=2).reshape(R, n)
        x = _csub(_csub(x, 2 * q), q)
    o_ref[:] = x


def run(variant, rows=160, K=50, reps=3):
    raux = aux_primes()
    qrow = raux[np.arange(rows) % 3].astype(np.uint32)
    rng = np.random.default_rng(0)
    x = rng.integers(0, qrow[:, None].astype(np.int64), (rows, N)).astype(np.uint32)
    w = rng.integers(1, qrow[:, None].astype(np.int64), (rows, N)).astype(np.uint32)
    wsh = shoup(w, qrow[:, None].astype(np.uint64))
    q = jnp.asarray(qrow[:, None])
    kern = functools.partial(kern_mul, variant=variant)
    zero = np.int32(0)
    bs = lambda wd: pl.BlockSpec((ROW_BLOCK, wd), lambda i: (i, zero),
                                 memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kern, grid=(rows // ROW_BLOCK,),
        in_specs=[bs(N), bs(N), bs(N), bs(1)],
        out_specs=bs(N),
        out_shape=jax.ShapeDtypeStruct((rows, N), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))

    @jax.jit
    def chain(v, w, wsh, q):
        return jax.lax.fori_loop(0, K, lambda _, u: f(u, w, wsh, q), v)

    xd = jnp.asarray(x)
    wd = jnp.asarray(w)
    wshd = jnp.asarray(wsh)
    r = chain(xd, wd, wshd, q); jax.block_until_ready(r)
    cks = int(np.asarray(r).sum(dtype=np.uint64) & 0xFFFFFFFF)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        r = chain(xd, wd, wshd, q)
        s = float(jnp.sum(r.astype(jnp.float32)))   # force full materialize
        best = min(best, time.time() - t0)
    per_app = best / K
    print(f"{variant}: rows={rows} per-app={per_app*1e6:.1f}us "
          f"per-row={per_app/rows*1e6:.2f}us cksum={cks} s={s:.3g}",
          flush=True)


if __name__ == "__main__":
    import sys as _s
    vs = _s.argv[1:] or ("mul", "bfly", "stage", "stage_r", "stage_w")
    for v in vs:
        run(v)
