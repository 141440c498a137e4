"""Fused Pallas NTT kernels (two-phase / four-step layout).

The jnp stage-by-stage NTT in ops/ntt.py reads+writes HBM once per butterfly
stage (log2(n) passes).  These kernels keep a block of limb rows resident in
VMEM and run ALL stages in-register, with 32-bit Shoup butterflies (no
uint64 emulation).

TPU constraint: Mosaic cannot relayout reshapes that move data across the
128-wide lane dimension, so butterflies with stride < 128 cannot use the
plain [m, 2, half] view.  Classic fix (four-step NTT): run the coarse stages
(half >= 128) in natural layout, transpose the [A, 128] view to [128, A]
(A = n/128), and run the fine stages along the former-block axis where the
effective stride is again >= lane width.  Fine-stage twiddles are stored
pre-transposed ("fine" tables) so no in-kernel table relayouts are needed.

    wv  = a*w - mulhi32(a, w_shoup)*q      (wrapping u32 arithmetic)
    out = (u + wv, u - wv)  with one conditional subtract each

Role equivalence: the Intel-HEXL-style fused NTT
(reference src/intelExt.cpp, src/CModulus.cpp:228-345) re-done for the TPU.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32

ROW_BLOCK = 8          # limb rows per program (sublane-aligned)
LANE = 128
MIN_PALLAS_N = 8192    # below this, the jnp path is used instead


def fine_layout(seg: np.ndarray, n: int) -> np.ndarray:
    """Relayout a stage-s twiddle segment [P, m] (m = 2^s >= n/LANE) into the
    transposed fine-phase order: entry (gi, c) <- seg[c*g2 + gi] where
    A = n//LANE, g2 = m//A."""
    P, m = seg.shape
    A = n // LANE
    g2 = m // A
    return seg.reshape(P, A, g2).swapaxes(1, 2).reshape(P, m)


def _mulhi32(a, b):
    """High 32 bits of u32*u32 via 16-bit halves (wrapping u32 ops)."""
    m16 = jnp.uint32(0xFFFF)
    a0 = a & m16
    a1 = a >> jnp.uint32(16)
    b0 = b & m16
    b1 = b >> jnp.uint32(16)
    lo = a0 * b0
    m1 = a1 * b0
    m2 = a0 * b1
    carry = ((lo >> jnp.uint32(16)) + (m1 & m16) + (m2 & m16)) >> jnp.uint32(16)
    return a1 * b1 + (m1 >> jnp.uint32(16)) + (m2 >> jnp.uint32(16)) + carry


def _shoup_mul(a, w, wsh, q):
    hi = _mulhi32(a, wsh)
    r = a * w - hi * q
    return jnp.where(r >= q, r - q, r)


def _csub(v, q):
    return jnp.where(v >= q, v - q, v)


def _ntt_kernel(x_ref, tw_ref, tsh_ref, fine_ref, fsh_ref, q_ref, o_ref, *,
                n: int, inverse: bool):
    x = x_ref[:]                       # [R, n]
    q = q_ref[:]                       # [R, 1]
    R = x.shape[0]
    stages = n.bit_length() - 1
    A = n // LANE
    coarse = stages - 7                # stages with half >= LANE

    def coarse_stage(x, s):
        m = 1 << s
        half = n // (2 * m)
        w = tw_ref[:, m:2 * m]
        wsh = tsh_ref[:, m:2 * m]
        xr = x.reshape(R, m, 2, half)
        u, v = xr[:, :, 0, :], xr[:, :, 1, :]
        qq = q[:, :, None]
        if not inverse:
            wv = _shoup_mul(v, w[:, :, None], wsh[:, :, None], qq)
            out = jnp.stack([_csub(u + wv, qq), _csub(u + qq - wv, qq)],
                            axis=2)
        else:
            uu = _csub(u + v, qq)
            d = _csub(u + qq - v, qq)
            vv = _shoup_mul(d, w[:, :, None], wsh[:, :, None], qq)
            out = jnp.stack([uu, vv], axis=2)
        return out.reshape(R, n)

    def fine_stage(xt, s):
        # xt: [R, LANE, A]; butterflies along the LANE axis
        m = 1 << s
        half = n // (2 * m)            # < LANE
        g2 = LANE // (2 * half)
        w = fine_ref[:, m:2 * m].reshape(R, g2, 1, A)
        wsh = fsh_ref[:, m:2 * m].reshape(R, g2, 1, A)
        xr = xt.reshape(R, g2, 2, half, A)
        u, v = xr[:, :, 0], xr[:, :, 1]          # [R, g2, half, A]
        qq = q[:, :, None, None]
        if not inverse:
            wv = _shoup_mul(v, w, wsh, qq)
            out = jnp.stack([_csub(u + wv, qq), _csub(u + qq - wv, qq)],
                            axis=2)
        else:
            uu = _csub(u + v, qq)
            d = _csub(u + qq - v, qq)
            vv = _shoup_mul(d, w, wsh, qq)
            out = jnp.stack([uu, vv], axis=2)
        return out.reshape(R, LANE, A)

    if not inverse:
        for s in range(coarse):
            x = coarse_stage(x, s)
        xt = jnp.swapaxes(x.reshape(R, A, LANE), 1, 2)     # [R, LANE, A]
        for s in range(coarse, stages):
            xt = fine_stage(xt, s)
        x = jnp.swapaxes(xt, 1, 2).reshape(R, n)
    else:
        xt = jnp.swapaxes(x.reshape(R, A, LANE), 1, 2)
        for s in reversed(range(coarse, stages)):
            xt = fine_stage(xt, s)
        x = jnp.swapaxes(xt, 1, 2).reshape(R, n)
        for s in reversed(range(coarse)):
            x = coarse_stage(x, s)
        x = _shoup_mul(x, tw_ref[:, 0:1], tsh_ref[:, 0:1], q)   # * n^{-1}
    o_ref[:] = x


@functools.partial(jax.jit, static_argnames=("n", "inverse", "interpret"))
def pallas_ntt(x, tw_cat, tsh_cat, fine_cat, fsh_cat, q, *, n: int,
               inverse: bool, interpret: bool = False):
    """x: [P, n] uint32 (P multiple of ROW_BLOCK, n >= 2^8 power of two).
    The coarse stages only read entries [0, n/LANE) of the cat tables, so
    only that prefix is shipped to VMEM."""
    P = x.shape[0]
    assert P % ROW_BLOCK == 0, P
    grid = (P // ROW_BLOCK,)
    ncoarse = max(n // LANE, 2)
    tw_c = tw_cat[:, :ncoarse]
    tsh_c = tsh_cat[:, :ncoarse]
    kern = functools.partial(_ntt_kernel, n=n, inverse=inverse)
    zero = np.int32(0)   # keep index_map outputs i32 under jax_enable_x64
    bs = lambda w: pl.BlockSpec((ROW_BLOCK, w), lambda i: (i, zero),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bs(n), bs(ncoarse), bs(ncoarse), bs(n), bs(n), bs(1)],
        out_specs=bs(n),
        out_shape=jax.ShapeDtypeStruct((P, n), jnp.uint32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, tw_c, tsh_c, fine_cat, fsh_cat, q)


def _conv_kernel(x_ref, tw_ref, tsh_ref, fine_ref, fsh_ref,
                 itw_ref, itsh_ref, ifine_ref, ifsh_ref,
                 kh_ref, khsh_ref, q_ref, o_ref, *, n: int):
    """Cyclic convolution with a precomputed spectral kernel, fully fused:
    iNTT(NTT(x) ⊙ khat) without leaving VMEM (the Bluestein hot path)."""
    x = x_ref[:]
    q = q_ref[:]
    R = x.shape[0]
    stages = n.bit_length() - 1
    A = n // LANE
    coarse = stages - 7

    def stage_pair(x, s, wseg, wsegsh, inverse):
        m = 1 << s
        half = n // (2 * m)
        xr = x.reshape(R, m, 2, half)
        u, v = xr[:, :, 0, :], xr[:, :, 1, :]
        qq = q[:, :, None]
        w = wseg[:, :, None]
        wsh = wsegsh[:, :, None]
        if not inverse:
            wv = _shoup_mul(v, w, wsh, qq)
            out = jnp.stack([_csub(u + wv, qq), _csub(u + qq - wv, qq)],
                            axis=2)
        else:
            uu = _csub(u + v, qq)
            d = _csub(u + qq - v, qq)
            vv = _shoup_mul(d, w, wsh, qq)
            out = jnp.stack([uu, vv], axis=2)
        return out.reshape(R, n)

    def fstage(xt, s, fref, fsref, inverse):
        m = 1 << s
        half = n // (2 * m)
        g2 = LANE // (2 * half)
        w = fref[:, m:2 * m].reshape(R, g2, 1, A)
        wsh = fsref[:, m:2 * m].reshape(R, g2, 1, A)
        xr = xt.reshape(R, g2, 2, half, A)
        u, v = xr[:, :, 0], xr[:, :, 1]
        qq = q[:, :, None, None]
        if not inverse:
            wv = _shoup_mul(v, w, wsh, qq)
            out = jnp.stack([_csub(u + wv, qq), _csub(u + qq - wv, qq)],
                            axis=2)
        else:
            uu = _csub(u + v, qq)
            d = _csub(u + qq - v, qq)
            vv = _shoup_mul(d, w, wsh, qq)
            out = jnp.stack([uu, vv], axis=2)
        return out.reshape(R, LANE, A)

    # forward
    for s in range(coarse):
        m = 1 << s
        x = stage_pair(x, s, tw_ref[:, m:2 * m], tsh_ref[:, m:2 * m], False)
    xt = jnp.swapaxes(x.reshape(R, A, LANE), 1, 2)
    for s in range(coarse, stages):
        xt = fstage(xt, s, fine_ref, fsh_ref, False)
    x = jnp.swapaxes(xt, 1, 2).reshape(R, n)
    # pointwise with the spectral kernel
    x = _shoup_mul(x, kh_ref[:], khsh_ref[:], q)
    # inverse
    xt = jnp.swapaxes(x.reshape(R, A, LANE), 1, 2)
    for s in reversed(range(coarse, stages)):
        xt = fstage(xt, s, ifine_ref, ifsh_ref, True)
    x = jnp.swapaxes(xt, 1, 2).reshape(R, n)
    for s in reversed(range(coarse)):
        m = 1 << s
        x = stage_pair(x, s, itw_ref[:, m:2 * m], itsh_ref[:, m:2 * m], True)
    x = _shoup_mul(x, itw_ref[:, 0:1], itsh_ref[:, 0:1], q)
    o_ref[:] = x


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def pallas_conv(x, tw, tsh, fine, fsh, itw, itsh, ifine, ifsh, kh, khsh, q,
                *, n: int, interpret: bool = False):
    P = x.shape[0]
    assert P % ROW_BLOCK == 0
    grid = (P // ROW_BLOCK,)
    ncoarse = max(n // LANE, 2)
    kern = functools.partial(_conv_kernel, n=n)
    zero = np.int32(0)
    bs = lambda w: pl.BlockSpec((ROW_BLOCK, w), lambda i: (i, zero),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bs(n), bs(ncoarse), bs(ncoarse), bs(n), bs(n),
                  bs(ncoarse), bs(ncoarse), bs(n), bs(n),
                  bs(n), bs(n), bs(1)],
        out_specs=bs(n),
        out_shape=jax.ShapeDtypeStruct((P, n), jnp.uint32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, tw[:, :ncoarse], tsh[:, :ncoarse], fine, fsh,
      itw[:, :ncoarse], itsh[:, :ncoarse], ifine, ifsh, kh, khsh, q)


def apply_conv(x, tree, kh, khsh, q, interpret: bool = False):
    """Fused spectral convolution; tables from an ops.ntt tree; kh/khsh/q
    broadcastable to x."""
    n = x.shape[-1]
    lead = x.shape[:-1]

    def prep(a, w):
        return jnp.broadcast_to(a, lead + (w,)).reshape(-1, w)

    xf = x.reshape(-1, n)
    args = [prep(tree["tw_cat"], n), prep(tree["tw_cat_sh"], n),
            prep(tree["tw_fine"], n), prep(tree["tw_fine_sh"], n),
            prep(tree["itw_cat"], n), prep(tree["itw_cat_sh"], n),
            prep(tree["itw_fine"], n), prep(tree["itw_fine_sh"], n),
            prep(kh, n), prep(khsh, n), prep(q, 1)]
    P = xf.shape[0]
    pad = (-P) % ROW_BLOCK
    if pad:
        ext = lambda a: jnp.pad(a, ((0, pad), (0, 0)), mode="edge")
        xf = ext(xf)
        args = [ext(a) for a in args]
    out = pallas_conv(xf, *args, n=n, interpret=interpret)
    if pad:
        out = out[:P]
    return out.reshape(*lead, n)


# ---------------------------------------------------------------------------
# wrapper: flatten leading dims into rows, pad to the row block
# ---------------------------------------------------------------------------

def apply_ntt(x, tw_cat, tsh_cat, fine_cat, fsh_cat, q, inverse: bool,
              interpret: bool = False):
    """x: [..., n]; tables broadcastable to x.shape; q to x.shape[:-1]+(1,)."""
    n = x.shape[-1]
    lead = x.shape[:-1]

    def prep(a, width):
        return jnp.broadcast_to(a, lead + (width,)).reshape(-1, width)

    xf = x.reshape(-1, n)
    full = prep(tw_cat, n)
    fullsh = prep(tsh_cat, n)
    ffine = prep(fine_cat, n)
    ffsh = prep(fsh_cat, n)
    fullq = prep(q, 1)
    P = xf.shape[0]
    pad = (-P) % ROW_BLOCK
    if pad:
        ext = lambda a: jnp.pad(a, ((0, pad), (0, 0)), mode="edge")
        xf, full, fullsh, ffine, ffsh, fullq = map(
            ext, (xf, full, fullsh, ffine, ffsh, fullq))
    out = pallas_ntt(xf, full, fullsh, ffine, ffsh, fullq, n=n,
                     inverse=inverse, interpret=interpret)
    if pad:
        out = out[:P]
    return out.reshape(*lead, n)
