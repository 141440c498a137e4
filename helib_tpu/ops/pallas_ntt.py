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
MIN_PALLAS_N = 16384   # below this the jnp path is used: the fine
                       # phase needs A = n/128 >= 128 lanes, so
                       # n=8192 (A=64) would hit lane-splitting
                       # reshapes Mosaic cannot relayout


def fine_layout(seg: np.ndarray, n: int) -> np.ndarray:
    """Relayout a stage-s twiddle segment [P, m] (m = 2^s >= n/LANE) into the
    transposed fine-phase order: entry (gi, c) <- seg[c*g2 + gi] where
    A = n//LANE, g2 = m//A."""
    P, m = seg.shape
    A = n // LANE
    g2 = m // A
    return seg.reshape(P, A, g2).swapaxes(1, 2).reshape(P, m)


def _mulhi32(a, b):
    """High 32 bits of u32*u32 via 16-bit halves (wrapping u32 ops).

    Plain Python ints (weak-typed literals) on purpose: `jnp.uint32(...)`
    scalars are concrete jax.Arrays that the kernel trace can capture as
    closure constants, which pallas_call rejects ("captures constants ...
    pass them as inputs") in some nesting contexts."""
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    lo = a0 * b0
    m1 = a1 * b0
    m2 = a0 * b1
    carry = ((lo >> 16) + (m1 & 0xFFFF) + (m2 & 0xFFFF)) >> 16
    return a1 * b1 + (m1 >> 16) + (m2 >> 16) + carry


def _shoup_mul(a, w, wsh, q):
    hi = _mulhi32(a, wsh)
    r = a * w - hi * q
    return jnp.where(r >= q, r - q, r)


def _shoup_lazy(a, w, wsh, q):
    """Lazy Shoup multiply: result in [0, 2q) for any uint32 a (Harvey)."""
    return a * w - _mulhi32(a, wsh) * q


def _csub(v, q):
    return jnp.where(v >= q, v - q, v)


# Lazy-reduction butterflies (Harvey): forward keeps values < 4q, inverse
# keeps values < 2q; full reduction happens once at kernel exit.

def _fwd_pass(x, q, R, n, tw_ref, tsh_ref, fine_ref, fsh_ref):
    """All forward stages; input < 2q, output < 4q (lazy)."""
    stages = n.bit_length() - 1
    A = n // LANE
    coarse = stages - 7
    for s in range(coarse):
        m = 1 << s
        half = n // (2 * m)
        w = tw_ref[:, m:2 * m][:, :, None]
        wsh = tsh_ref[:, m:2 * m][:, :, None]
        qq = q[:, :, None]
        xr = x.reshape(R, m, 2, half)
        u = _csub(xr[:, :, 0, :], 2 * qq)
        t = _shoup_lazy(xr[:, :, 1, :], w, wsh, qq)
        x = jnp.stack([u + t, u + 2 * qq - t], axis=2).reshape(R, n)
    xt = jnp.swapaxes(x.reshape(R, A, LANE), 1, 2)     # [R, LANE, A]
    for s in range(coarse, stages):
        m = 1 << s
        half = n // (2 * m)
        g2 = LANE // (2 * half)
        w = fine_ref[:, m:2 * m].reshape(R, g2, 1, A)
        wsh = fsh_ref[:, m:2 * m].reshape(R, g2, 1, A)
        qq = q[:, :, None, None]
        xr = xt.reshape(R, g2, 2, half, A)
        u = _csub(xr[:, :, 0], 2 * qq)
        t = _shoup_lazy(xr[:, :, 1], w, wsh, qq)
        xt = jnp.stack([u + t, u + 2 * qq - t], axis=2).reshape(R, LANE, A)
    return jnp.swapaxes(xt, 1, 2).reshape(R, n)


def _inv_pass(x, q, R, n, itw_ref, itsh_ref, ifine_ref, ifsh_ref):
    """All inverse stages + n^{-1}; input < 2q, output < 2q (lazy)."""
    stages = n.bit_length() - 1
    A = n // LANE
    coarse = stages - 7
    xt = jnp.swapaxes(x.reshape(R, A, LANE), 1, 2)
    for s in reversed(range(coarse, stages)):
        m = 1 << s
        half = n // (2 * m)
        g2 = LANE // (2 * half)
        w = ifine_ref[:, m:2 * m].reshape(R, g2, 1, A)
        wsh = ifsh_ref[:, m:2 * m].reshape(R, g2, 1, A)
        qq = q[:, :, None, None]
        xr = xt.reshape(R, g2, 2, half, A)
        a, b = xr[:, :, 0], xr[:, :, 1]
        u = _csub(a + b, 2 * qq)
        v = _shoup_lazy(a + 2 * qq - b, w, wsh, qq)
        xt = jnp.stack([u, v], axis=2).reshape(R, LANE, A)
    x = jnp.swapaxes(xt, 1, 2).reshape(R, n)
    for s in reversed(range(coarse)):
        m = 1 << s
        half = n // (2 * m)
        w = itw_ref[:, m:2 * m][:, :, None]
        wsh = itsh_ref[:, m:2 * m][:, :, None]
        qq = q[:, :, None]
        xr = x.reshape(R, m, 2, half)
        a, b = xr[:, :, 0, :], xr[:, :, 1, :]
        u = _csub(a + b, 2 * qq)
        v = _shoup_lazy(a + 2 * qq - b, w, wsh, qq)
        x = jnp.stack([u, v], axis=2).reshape(R, n)
    return _shoup_lazy(x, itw_ref[:, 0:1], itsh_ref[:, 0:1], q)  # * n^{-1}


def _ntt_kernel(x_ref, tw_ref, tsh_ref, fine_ref, fsh_ref, q_ref, o_ref, *,
                n: int, inverse: bool):
    x = x_ref[:]                       # [R, n], fully reduced on entry
    q = q_ref[:]                       # [R, 1]
    R = x.shape[0]
    if not inverse:
        x = _fwd_pass(x, q, R, n, tw_ref, tsh_ref, fine_ref, fsh_ref)
        x = _csub(_csub(x, 2 * q), q)
    else:
        x = _inv_pass(x, q, R, n, tw_ref, tsh_ref, fine_ref, fsh_ref)
        x = _csub(x, q)
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
    # coarse tables only need entries [0, n/LANE), but Mosaic blocks must be
    # >= one full 128-lane tile wide (n=8192 has n/LANE=64)
    ncoarse = max(n // LANE, LANE)
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
    iNTT(NTT(x) ⊙ khat) without leaving VMEM (the Bluestein hot path).
    Lazy reductions throughout: fwd < 4q -> khat shoup (any u32) < 2q ->
    inverse < 2q -> one final csub."""
    x = x_ref[:]
    q = q_ref[:]
    R = x.shape[0]
    x = _fwd_pass(x, q, R, n, tw_ref, tsh_ref, fine_ref, fsh_ref)
    x = _shoup_lazy(x, kh_ref[:], khsh_ref[:], q)
    x = _inv_pass(x, q, R, n, itw_ref, itsh_ref, ifine_ref, ifsh_ref)
    o_ref[:] = _csub(x, q)


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def pallas_conv(x, tw, tsh, fine, fsh, itw, itsh, ifine, ifsh, kh, khsh, q,
                *, n: int, interpret: bool = False):
    P = x.shape[0]
    assert P % ROW_BLOCK == 0
    grid = (P // ROW_BLOCK,)
    ncoarse = max(n // LANE, LANE)
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
