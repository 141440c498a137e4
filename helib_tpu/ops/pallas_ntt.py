"""Fused Pallas NTT kernels (two-phase sublane-butterfly layout, radix-4).

The jnp stage-by-stage NTT in ops/ntt.py reads+writes HBM once per butterfly
stage (log2(n) passes).  These kernels keep a block of limb rows resident in
VMEM and run ALL stages in-register, with 32-bit Shoup butterflies (no
uint64 emulation).

TPU layout strategy (round-3 redesign, measured on v5e):
  * Butterfly relayouts along the LANE dimension are the dominant cost on
    the VPU — a stack/reshape interleave at sub-512-lane granularity costs
    ~4x the butterfly arithmetic itself, even though the write positions
    are layout-identical.  Fix: NEVER butterfly along lanes.
  * COARSE phase: view x as [A, 128] (A = n/128).  Coarse butterflies
    (stride >= 128 in natural order) pair rows of this view, i.e. operate
    along the SUBLANE-side A axis, elementwise in the 128 lanes.  Twiddle
    tables are shipped pre-expanded along lanes as [C, 1, 128] blocks so
    the kernel never broadcasts across lanes.
  * FINE phase: transpose to [128, A] once; the remaining 7 stages pair
    sub-rows of the former-lane axis, again sublane-side, with
    fine-relayouted twiddle tables ("fine" order).
  * Radix-4 composite stages: two butterfly levels share ONE interleave;
    stage-(s+1) twiddles are stored even/odd-deinterleaved so every table
    access is a plain slice (no in-kernel table relayouts).
  * Interleaves are expressed as jnp.concatenate along the block axis
    (layout-identity writes) — measured 3.3x cheaper than jnp.stack.
  * The fused convolution kernel does its pointwise khat multiply in the
    TRANSPOSED fine layout, so the two middle transposes cancel; khat is
    shipped pre-relayouted (spectral_fine_layout).

    wv  = a*w - mulhi32(a, w_shoup)*q      (wrapping u32 arithmetic)
    out = (u + wv, u - wv)  with lazy Harvey reductions (< 4q fwd, < 2q inv)

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
from ..exceptions import assert_true

U32 = jnp.uint32

ROW_BLOCK = 8          # limb rows per program (sublane-aligned)
LANE = 128
MIN_PALLAS_N = 2048    # below this the jnp path is used.  For
                       # 2048 <= n < 16384 the fine phase groups
                       # G = 16384/n rows so its lane axis is always
                       # G*A = 128 wide (see group_fine_tables); below
                       # 2048 the group would exceed ROW_BLOCK.
MAX_PALLAS_N = 65536   # above this the fused kernel's VMEM residency
                       # (x + out + 8 twiddle tables + 2 spectral tables,
                       # each [8, n] u32, double-buffered across the grid)
                       # exceeds the v5e scoped-memory budget — measured:
                       # B=131072 (the m=35113 Bluestein) fails allocation
                       # where B=65536 (m=31775) runs.  Larger transforms
                       # fall back to the staged jnp path.


def row_group(n: int) -> int:
    """Rows fused per fine-phase group so the grouped lane width G*A is a
    full 128-lane tile (clamped to ROW_BLOCK; below n=2048 the lane tile
    stays partially filled, which only the interpret-mode tests use)."""
    return min(ROW_BLOCK, max(1, (LANE * LANE) // n))


def fine_layout(seg: np.ndarray, n: int) -> np.ndarray:
    """Relayout a stage-s twiddle segment [P, m] (m = 2^s >= n/LANE) into the
    transposed fine-phase order: entry (gi, c) <- seg[c*g2 + gi] where
    A = n//LANE, g2 = m//A."""
    P, m = seg.shape
    A = n // LANE
    g2 = m // A
    return seg.reshape(P, A, g2).swapaxes(1, 2).reshape(P, m)


def spectral_fine_layout(kh: np.ndarray) -> np.ndarray:
    """Relayout a spectral vector [..., n] (NTT output / cat order) into the
    transposed fine layout [..., LANE, A] the conv kernel's pointwise
    multiply sees: out[..., l, a] == kh[..., a*LANE + l].  Kept 3D so the
    kernel block needs no in-kernel (lane-splitting) reshape."""
    n = kh.shape[-1]
    A = n // LANE
    lead = kh.shape[:-1]
    return kh.reshape(*lead, A, LANE).swapaxes(-1, -2)


def coarse3_layout(cat: np.ndarray, n: int) -> np.ndarray:
    """Expand a concatenated coarse table [P, >=A] into the lane-broadcast
    4D form [P, A, 1, LANE] the coarse sublane-butterfly kernel reads
    (entry (c, 0, l) == cat[c] for every lane l)."""
    A = max(n // LANE, 1)
    P = cat.shape[0]
    out = np.empty((P, A, 1, LANE), dtype=cat.dtype)
    out[:] = cat[:, :A, None, None]
    return out


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
    return _csub(a * w - hi * q, q)


def _shoup_lazy(a, w, wsh, q):
    """Lazy Shoup multiply: result in [0, 2q) for any uint32 a (Harvey)."""
    return a * w - _mulhi32(a, wsh) * q


def _csub(v, q):
    # (min(v, v-q) would be 1 op but Mosaic has no arith.minui lowering)
    return jnp.where(v >= q, v - q, v)


# ---------------------------------------------------------------------------
# stage scheduling: greedy radix-4 pairing with one optional radix-2 head
# ---------------------------------------------------------------------------

def _schedule(start: int, stop: int):
    """Split stages [start, stop) ascending into an optional single radix-2
    stage followed by radix-4 composite pairs (s, s+1)."""
    count = stop - start
    single = start if count % 2 == 1 else None
    first_pair = start + (count % 2)
    pairs = [(s, s + 1) for s in range(first_pair, stop - 1, 2)]
    return single, pairs


# ---------------------------------------------------------------------------
# coarse phase: butterflies along the A (sublane-side) axis of [R, A, LANE].
# Tables tw3 are [R, A, 1, LANE] (lane-pre-expanded, eo-deinterleaved for
# second-of-pair stages).  Forward: inputs < 4q, outputs < 4q (lazy).
# ---------------------------------------------------------------------------

def _fwd_r2_coarse3(x3, qq, R, A, tw3_ref, tsh3_ref, s):
    m = 1 << s
    halfA = A // (2 * m)
    w = tw3_ref[:, m:2 * m]                            # [R, m, 1, LANE]
    wsh = tsh3_ref[:, m:2 * m]
    xr = x3.reshape(R, m, 2, halfA, LANE)
    u = _csub(xr[:, :, 0], 2 * qq)                     # [R, m, halfA, LANE]
    t = _shoup_lazy(xr[:, :, 1], w, wsh, qq)
    return jnp.concatenate([u + t, u + 2 * qq - t],
                           axis=2).reshape(R, A, LANE)


def _fwd_r4_coarse3(x3, qq, R, A, tw3_ref, tsh3_ref, s):
    m = 1 << s
    halfA = A // (2 * m)
    qA = halfA // 2
    w1 = tw3_ref[:, m:2 * m]
    w1s = tsh3_ref[:, m:2 * m]
    xr = x3.reshape(R, m, 2, halfA, LANE)
    u = _csub(xr[:, :, 0], 2 * qq)
    t = _shoup_lazy(xr[:, :, 1], w1, w1s, qq)
    a0 = (u + t).reshape(R, m, 2, qA, LANE)
    a1 = (u + 2 * qq - t).reshape(R, m, 2, qA, LANE)
    w2e = tw3_ref[:, 2 * m:3 * m]
    w2es = tsh3_ref[:, 2 * m:3 * m]
    w2o = tw3_ref[:, 3 * m:4 * m]
    w2os = tsh3_ref[:, 3 * m:4 * m]
    u0 = _csub(a0[:, :, 0], 2 * qq)
    t0 = _shoup_lazy(a0[:, :, 1], w2e, w2es, qq)
    u1 = _csub(a1[:, :, 0], 2 * qq)
    t1 = _shoup_lazy(a1[:, :, 1], w2o, w2os, qq)
    return jnp.concatenate([u0 + t0, u0 + 2 * qq - t0,
                            u1 + t1, u1 + 2 * qq - t1],
                           axis=2).reshape(R, A, LANE)


def _fwd_coarse3(x3, q, R, A, tw3_ref, tsh3_ref, coarse):
    qq = q[:, :, None, None]
    single, pairs = _schedule(0, coarse)
    if single is not None:
        x3 = _fwd_r2_coarse3(x3, qq, R, A, tw3_ref, tsh3_ref, single)
    for s, _ in pairs:
        x3 = _fwd_r4_coarse3(x3, qq, R, A, tw3_ref, tsh3_ref, s)
    return x3


def _inv_r2_coarse3(x3, qq, R, A, itw3_ref, itsh3_ref, s):
    m = 1 << s
    halfA = A // (2 * m)
    w = itw3_ref[:, m:2 * m]
    wsh = itsh3_ref[:, m:2 * m]
    xr = x3.reshape(R, m, 2, halfA, LANE)
    a, b = xr[:, :, 0], xr[:, :, 1]
    u = _csub(a + b, 2 * qq)
    v = _shoup_lazy(a + 2 * qq - b, w, wsh, qq)
    return jnp.concatenate([u, v], axis=2).reshape(R, A, LANE)


def _inv_r4_coarse3(x3, qq, R, A, itw3_ref, itsh3_ref, s):
    m = 1 << s
    qA = A // (4 * m)
    w1 = itw3_ref[:, m:2 * m]
    w1s = itsh3_ref[:, m:2 * m]
    w2e = itw3_ref[:, 2 * m:3 * m]
    w2es = itsh3_ref[:, 2 * m:3 * m]
    w2o = itw3_ref[:, 3 * m:4 * m]
    w2os = itsh3_ref[:, 3 * m:4 * m]
    xr = x3.reshape(R, m, 4, qA, LANE)
    a0, b0 = xr[:, :, 0], xr[:, :, 1]
    a1, b1 = xr[:, :, 2], xr[:, :, 3]
    u0 = _csub(a0 + b0, 2 * qq)
    v0 = _shoup_lazy(a0 + 2 * qq - b0, w2e, w2es, qq)
    u1 = _csub(a1 + b1, 2 * qq)
    v1 = _shoup_lazy(a1 + 2 * qq - b1, w2o, w2os, qq)
    U0 = _csub(u0 + u1, 2 * qq)
    U1 = _csub(v0 + v1, 2 * qq)
    V0 = _shoup_lazy(u0 + 2 * qq - u1, w1, w1s, qq)
    V1 = _shoup_lazy(v0 + 2 * qq - v1, w1, w1s, qq)
    return jnp.concatenate([U0, U1, V0, V1],
                           axis=2).reshape(R, A, LANE)


def _inv_coarse3(x3, q, R, A, itw3_ref, itsh3_ref, coarse):
    qq = q[:, :, None, None]
    single, pairs = _schedule(0, coarse)
    for s, _ in reversed(pairs):
        x3 = _inv_r4_coarse3(x3, qq, R, A, itw3_ref, itsh3_ref, s)
    if single is not None:
        x3 = _inv_r2_coarse3(x3, qq, R, A, itw3_ref, itsh3_ref, single)
    return x3


# ---------------------------------------------------------------------------
# fine phase: butterflies along the former-lane axis of [R, LANE, A]
#
# Table slices reshape with a -1 lead so the same helpers serve BOTH table
# layouts: per-row [R2, ...] (pow2 per-prime path) and shared [1, ...]
# (aux-prime Bluestein path, one table block per aux prime broadcast across
# the row block — see pallas_conv_shared).
# ---------------------------------------------------------------------------

def _fwd_r2_fine(xt, qq4, R2, n, W, G, fine_ref, fsh_ref, s):
    m = 1 << s
    half = n // (2 * m)
    g2 = LANE // (2 * half)
    w = fine_ref[:, m * G:2 * m * G].reshape(-1, g2, 1, W)
    wsh = fsh_ref[:, m * G:2 * m * G].reshape(-1, g2, 1, W)
    xr = xt.reshape(R2, g2, 2, half, W)
    u = _csub(xr[:, :, 0], 2 * qq4)
    t = _shoup_lazy(xr[:, :, 1], w, wsh, qq4)
    return jnp.concatenate([u + t, u + 2 * qq4 - t],
                           axis=2).reshape(R2, LANE, W)


def _fwd_r4_fine(xt, qq4, R2, n, W, G, fine_ref, fsh_ref, s):
    """Fine stages s, s+1 fused.  Stage s+1 twiddles are stored even/odd-
    deinterleaved in fine layout ([2m:3m] = blocks 2gi, [3m:4m] = 2gi+1);
    all indices scale by the row-group factor G (grouped sub-16k layout)."""
    m = 1 << s
    half = n // (2 * m)
    half2 = half // 2
    g2 = LANE // (2 * half)
    w1 = fine_ref[:, m * G:2 * m * G].reshape(-1, g2, 1, W)
    w1s = fsh_ref[:, m * G:2 * m * G].reshape(-1, g2, 1, W)
    xr = xt.reshape(R2, g2, 2, half, W)                # [r, gi, j, h, a]
    u = _csub(xr[:, :, 0], 2 * qq4)                    # [R2, g2, half, W]
    t = _shoup_lazy(xr[:, :, 1], w1, w1s, qq4)
    a0 = (u + t).reshape(R2, g2, 2, half2, W)
    a1 = (u + 2 * qq4 - t).reshape(R2, g2, 2, half2, W)
    w2e = fine_ref[:, 2 * m * G:3 * m * G].reshape(-1, g2, 1, W)
    w2es = fsh_ref[:, 2 * m * G:3 * m * G].reshape(-1, g2, 1, W)
    w2o = fine_ref[:, 3 * m * G:4 * m * G].reshape(-1, g2, 1, W)
    w2os = fsh_ref[:, 3 * m * G:4 * m * G].reshape(-1, g2, 1, W)
    u0 = _csub(a0[:, :, 0], 2 * qq4)
    t0 = _shoup_lazy(a0[:, :, 1], w2e, w2es, qq4)
    u1 = _csub(a1[:, :, 0], 2 * qq4)
    t1 = _shoup_lazy(a1[:, :, 1], w2o, w2os, qq4)
    return jnp.concatenate([u0 + t0, u0 + 2 * qq4 - t0,
                            u1 + t1, u1 + 2 * qq4 - t1],
                           axis=2).reshape(R2, LANE, W)


def _fwd_fine(xt, qq4, R2, n, W, G, fine_ref, fsh_ref, coarse, stages):
    single, pairs = _schedule(coarse, stages)
    if single is not None:
        xt = _fwd_r2_fine(xt, qq4, R2, n, W, G, fine_ref, fsh_ref, single)
    for s, _ in pairs:
        xt = _fwd_r4_fine(xt, qq4, R2, n, W, G, fine_ref, fsh_ref, s)
    return xt


def _inv_r2_fine(xt, qq4, R2, n, W, G, ifine_ref, ifsh_ref, s):
    m = 1 << s
    half = n // (2 * m)
    g2 = LANE // (2 * half)
    w = ifine_ref[:, m * G:2 * m * G].reshape(-1, g2, 1, W)
    wsh = ifsh_ref[:, m * G:2 * m * G].reshape(-1, g2, 1, W)
    xr = xt.reshape(R2, g2, 2, half, W)
    a, b = xr[:, :, 0], xr[:, :, 1]
    u = _csub(a + b, 2 * qq4)
    v = _shoup_lazy(a + 2 * qq4 - b, w, wsh, qq4)
    return jnp.concatenate([u, v], axis=2).reshape(R2, LANE, W)


def _inv_r4_fine(xt, qq4, R2, n, W, G, ifine_ref, ifsh_ref, s):
    """Inverse stages s+1 then s fused (mirror of _fwd_r4_fine)."""
    m = 1 << s
    half = n // (2 * m)
    half2 = half // 2
    g2 = LANE // (2 * half)
    w1 = ifine_ref[:, m * G:2 * m * G].reshape(-1, g2, 1, W)
    w1s = ifsh_ref[:, m * G:2 * m * G].reshape(-1, g2, 1, W)
    w2e = ifine_ref[:, 2 * m * G:3 * m * G].reshape(-1, g2, 1, W)
    w2es = ifsh_ref[:, 2 * m * G:3 * m * G].reshape(-1, g2, 1, W)
    w2o = ifine_ref[:, 3 * m * G:4 * m * G].reshape(-1, g2, 1, W)
    w2os = ifsh_ref[:, 3 * m * G:4 * m * G].reshape(-1, g2, 1, W)
    xr = xt.reshape(R2, g2, 4, half2, W)               # blocks 4gi + 2j + k
    a0, b0 = xr[:, :, 0], xr[:, :, 1]
    a1, b1 = xr[:, :, 2], xr[:, :, 3]
    u0 = _csub(a0 + b0, 2 * qq4)
    v0 = _shoup_lazy(a0 + 2 * qq4 - b0, w2e, w2es, qq4)
    u1 = _csub(a1 + b1, 2 * qq4)
    v1 = _shoup_lazy(a1 + 2 * qq4 - b1, w2o, w2os, qq4)
    U0 = _csub(u0 + u1, 2 * qq4)
    U1 = _csub(v0 + v1, 2 * qq4)
    V0 = _shoup_lazy(u0 + 2 * qq4 - u1, w1, w1s, qq4)
    V1 = _shoup_lazy(v0 + 2 * qq4 - v1, w1, w1s, qq4)
    return jnp.concatenate([U0, U1, V0, V1],
                           axis=2).reshape(R2, LANE, W)


def _inv_fine(xt, qq4, R2, n, W, G, ifine_ref, ifsh_ref, coarse, stages):
    single, pairs = _schedule(coarse, stages)
    for s, _ in reversed(pairs):
        xt = _inv_r4_fine(xt, qq4, R2, n, W, G, ifine_ref, ifsh_ref, s)
    if single is not None:
        xt = _inv_r2_fine(xt, qq4, R2, n, W, G, ifine_ref, ifsh_ref, single)
    return xt


# ---------------------------------------------------------------------------
# full passes
# ---------------------------------------------------------------------------

def _fwd_pass(x, q, qg4, R, n, tw3_ref, tsh3_ref, fine_ref, fsh_ref):
    """All forward stages; input < 2q, output < 4q (lazy), natural order.
    For n < 16384 the fine phase runs on G = 16384/n rows fused into one
    [LANE, G*A = 128] tile (one standard transpose either side)."""
    stages = n.bit_length() - 1
    A = n // LANE
    G = row_group(n)
    W = G * A
    R2 = R // G
    coarse = stages - 7
    x3 = _fwd_coarse3(x.reshape(R, A, LANE), q, R, A, tw3_ref, tsh3_ref,
                      coarse)
    xt = jnp.swapaxes(x3.reshape(R2, W, LANE), 1, 2)   # [R2, LANE, W]
    xt = _fwd_fine(xt, qg4, R2, n, W, G, fine_ref, fsh_ref, coarse, stages)
    return jnp.swapaxes(xt, 1, 2).reshape(R, n)


def _inv_pass(x, q, qg4, R, n, itw3_ref, itsh3_ref, ifine_ref, ifsh_ref):
    """All inverse stages + n^{-1}; input < 2q, output < 2q (lazy)."""
    stages = n.bit_length() - 1
    A = n // LANE
    G = row_group(n)
    W = G * A
    R2 = R // G
    coarse = stages - 7
    xt = jnp.swapaxes(x.reshape(R2, W, LANE), 1, 2)
    xt = _inv_fine(xt, qg4, R2, n, W, G, ifine_ref, ifsh_ref, coarse, stages)
    x3 = jnp.swapaxes(xt, 1, 2).reshape(R, A, LANE)
    x3 = _inv_coarse3(x3, q, R, A, itw3_ref, itsh3_ref, coarse)
    # * n^{-1} (stored at entry 0 of the expanded inverse coarse table)
    x3 = _shoup_lazy(x3, itw3_ref[:, 0], itsh3_ref[:, 0], q[:, :, None])
    return x3.reshape(R, n)


def _ntt_kernel(x_ref, tw3_ref, tsh3_ref, fine_ref, fsh_ref, q_ref, qg4_ref,
                o_ref, *, n: int, inverse: bool):
    x = x_ref[:]                       # [R, n], fully reduced on entry
    q = q_ref[:]                       # [R, 1]
    qg4 = qg4_ref[:]                   # [R/G, 1, 1, G*A]
    R = x.shape[0]
    if not inverse:
        x = _fwd_pass(x, q, qg4, R, n, tw3_ref, tsh3_ref, fine_ref, fsh_ref)
        x = _csub(_csub(x, 2 * q), q)
    else:
        x = _inv_pass(x, q, qg4, R, n, tw3_ref, tsh3_ref, fine_ref, fsh_ref)
        x = _csub(x, q)
    o_ref[:] = x


@functools.partial(jax.jit, static_argnames=("n", "inverse", "interpret"))
def pallas_ntt(x, tw3, tsh3, gfine, gfsh, q, qg4, *, n: int,
               inverse: bool, interpret: bool = False):
    """x: [P, n] uint32 (P multiple of ROW_BLOCK, n >= 2^11 power of two).
    tw3/tsh3: [P, A, 1, LANE] coarse3_layout tables (fwd or inv per
    direction); gfine/gfsh: [P/G, G*n] grouped fine-layout tables
    (group_fine_tables); qg4: [P/G, 1, 1, G*A] per-lane moduli."""
    P = x.shape[0]
    G = row_group(n)
    # grouped tables have P/G rows; keep >= 8 sublanes per block by scaling
    # the per-program row count to ROW_BLOCK*G (Pallas requires the last
    # two block dims divisible by (8, 128))
    RB = ROW_BLOCK * G
    assert_true(P % RB == 0, (P, G))
    grid = (P // RB,)
    A = max(n // LANE, 1)
    W = G * A
    kern = functools.partial(_ntt_kernel, n=n, inverse=inverse)
    zero = np.int32(0)   # keep index_map outputs i32 under jax_enable_x64
    bs = lambda w: pl.BlockSpec((RB, w), lambda i: (i, zero),
                                memory_space=pltpu.VMEM)
    bsg = pl.BlockSpec((ROW_BLOCK, G * n), lambda i: (i, zero),
                       memory_space=pltpu.VMEM)
    bs4 = pl.BlockSpec((RB, A, 1, LANE),
                       lambda i: (i, zero, zero, zero),
                       memory_space=pltpu.VMEM)
    bsq4 = pl.BlockSpec((ROW_BLOCK, 1, 1, W),
                        lambda i: (i, zero, zero, zero),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bs(n), bs4, bs4, bsg, bsg, bs(1), bsq4],
        out_specs=bs(n),
        out_shape=jax.ShapeDtypeStruct((P, n), jnp.uint32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, tw3, tsh3, gfine, gfsh, q, qg4)


def _conv_kernel(x_ref, tw3_ref, tsh3_ref, fine_ref, fsh_ref,
                 itw3_ref, itsh3_ref, ifine_ref, ifsh_ref,
                 khf_ref, khfsh_ref, q_ref, qg4_ref, o_ref, *, n: int):
    """Cyclic convolution with a precomputed spectral kernel, fully fused:
    iNTT(NTT(x) ⊙ khat) without leaving VMEM (the Bluestein hot path).
    The pointwise multiply happens in the TRANSPOSED fine layout (khat is
    shipped in spectral_fine_layout order, row-grouped for n < 16384), so
    the two middle four-step transposes cancel.  Lazy reductions
    throughout: fwd < 4q -> khat shoup (any u32) < 2q -> inverse < 2q ->
    one final csub."""
    x = x_ref[:]
    q = q_ref[:]
    qg4 = qg4_ref[:]
    R = x.shape[0]
    stages = n.bit_length() - 1
    A = n // LANE
    G = row_group(n)
    W = G * A
    R2 = R // G
    coarse = stages - 7
    x3 = _fwd_coarse3(x.reshape(R, A, LANE), q, R, A, tw3_ref, tsh3_ref,
                      coarse)
    xt = jnp.swapaxes(x3.reshape(R2, W, LANE), 1, 2)   # [R2, LANE, W]
    xt = _fwd_fine(xt, qg4, R2, n, W, G, fine_ref, fsh_ref, coarse, stages)
    xt = _shoup_lazy(xt, khf_ref[:], khfsh_ref[:], qg4[:, 0])
    xt = _inv_fine(xt, qg4, R2, n, W, G, ifine_ref, ifsh_ref, coarse,
                   stages)
    x3 = jnp.swapaxes(xt, 1, 2).reshape(R, A, LANE)
    x3 = _inv_coarse3(x3, q, R, A, itw3_ref, itsh3_ref, coarse)
    x3 = _shoup_lazy(x3, itw3_ref[:, 0], itsh3_ref[:, 0],
                     q[:, :, None])                    # * n^{-1}
    o_ref[:] = _csub(x3.reshape(R, n), q)


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def pallas_conv(x, tw3, tsh3, gfine, gfsh, itw3, itsh3, gifine, gifsh,
                khf, khfsh, q, qg4, *, n: int, interpret: bool = False):
    """khf/khfsh must be in (grouped) spectral_fine_layout order:
    [P/G, LANE, G*A]."""
    P = x.shape[0]
    G = row_group(n)
    RB = ROW_BLOCK * G          # see pallas_ntt: 8 sublanes per block
    assert_true(P % RB == 0, (P, G))
    grid = (P // RB,)
    A = max(n // LANE, 1)
    W = G * A
    kern = functools.partial(_conv_kernel, n=n)
    zero = np.int32(0)
    bs = lambda w: pl.BlockSpec((RB, w), lambda i: (i, zero),
                                memory_space=pltpu.VMEM)
    bsg = pl.BlockSpec((ROW_BLOCK, G * n), lambda i: (i, zero),
                       memory_space=pltpu.VMEM)
    bs3 = pl.BlockSpec((ROW_BLOCK, LANE, W), lambda i: (i, zero, zero),
                       memory_space=pltpu.VMEM)
    bs4 = pl.BlockSpec((RB, A, 1, LANE),
                       lambda i: (i, zero, zero, zero),
                       memory_space=pltpu.VMEM)
    bsq4 = pl.BlockSpec((ROW_BLOCK, 1, 1, W),
                        lambda i: (i, zero, zero, zero),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bs(n), bs4, bs4, bsg, bsg,
                  bs4, bs4, bsg, bsg,
                  bs3, bs3, bs(1), bsq4],
        out_specs=bs(n),
        out_shape=jax.ShapeDtypeStruct((P, n), jnp.uint32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, tw3, tsh3, gfine, gfsh, itw3, itsh3, gifine, gifsh,
      khf, khfsh, q, qg4)


def _conv_kernel_shared(x_ref, tw3_ref, tsh3_ref, fine_ref, fsh_ref,
                        itw3_ref, itsh3_ref, ifine_ref, ifsh_ref,
                        khf_ref, khfsh_ref, q_ref, qg4_ref, o_ref, *,
                        n: int):
    """_conv_kernel with SHARED twiddle tables: the grid is 2D
    (table-group, row-block) and every table block has a leading length-1
    axis that broadcasts across the RB data rows — all rows of a block
    share one modulus (the Bluestein aux-prime layout).  Cuts per-block
    twiddle DMA ~8x and VMEM residency ~3.5x vs per-row tables; only the
    spectral kernel (per ctxt prime by nature) stays per-row."""
    x = x_ref[0]                  # [RB, n]
    q = q_ref[0]                  # [1, 1] — broadcasts against every row
    qg4 = qg4_ref[0]              # [1, 1, W]
    qg4 = qg4[None]               # [1, 1, 1, W]
    # fine tables carry a unit middle axis ([T, 1, G*n]) so their block
    # shape's last two dims equal the array dims (Mosaic constraint);
    # squeeze to the [1, G*n] layout the butterfly helpers slice
    fine_ref = fine_ref[:, 0]
    fsh_ref = fsh_ref[:, 0]
    ifine_ref = ifine_ref[:, 0]
    ifsh_ref = ifsh_ref[:, 0]
    R = x.shape[0]
    stages = n.bit_length() - 1
    A = n // LANE
    G = row_group(n)
    W = G * A
    R2 = R // G
    coarse = stages - 7
    # table refs have a leading length-1 axis; the helpers' [:, slice]
    # accesses broadcast it against the RB data rows
    x3 = _fwd_coarse3(x.reshape(R, A, LANE), q, R, A, tw3_ref, tsh3_ref,
                      coarse)
    xt = jnp.swapaxes(x3.reshape(R2, W, LANE), 1, 2)
    xt = _fwd_fine(xt, qg4, R2, n, W, G, fine_ref, fsh_ref, coarse, stages)
    xt = _shoup_lazy(xt, khf_ref[0], khfsh_ref[0], qg4[:, 0])
    xt = _inv_fine(xt, qg4, R2, n, W, G, ifine_ref, ifsh_ref, coarse,
                   stages)
    x3 = jnp.swapaxes(xt, 1, 2).reshape(R, A, LANE)
    x3 = _inv_coarse3(x3, q, R, A, itw3_ref, itsh3_ref, coarse)
    x3 = _shoup_lazy(x3, itw3_ref[:, 0], itsh3_ref[:, 0], q[:, :, None])
    o_ref[:] = _csub(x3.reshape(R, n), q)[None]


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def pallas_conv_shared(x, tw3, tsh3, gfine, gfsh, itw3, itsh3, gifine,
                       gifsh, khf, khfsh, q, qg4, *, n: int,
                       interpret: bool = False):
    """x: [T, R, n]; twiddle tables [T, ...] (ONE block per table group t,
    shared by all R rows of group t); fine tables [T, 1, G*n] (unit middle
    axis — Mosaic requires each block's LAST TWO dims divisible by (8,128)
    or equal to the array dims); khf/khfsh: [T, R/G, LANE, G*A] per-row
    spectral kernels; q: [T, 1, 1]; qg4: [T, 1, 1, G*A]."""
    T, R = x.shape[0], x.shape[1]
    G = row_group(n)
    RB = ROW_BLOCK * G
    assert_true(R % RB == 0, (R, G))
    grid = (T, R // RB)
    A = max(n // LANE, 1)
    W = G * A
    kern = functools.partial(_conv_kernel_shared, n=n)
    zero = np.int32(0)
    bx = pl.BlockSpec((1, RB, n), lambda t, i: (t, i, zero),
                      memory_space=pltpu.VMEM)
    b4 = pl.BlockSpec((1, A, 1, LANE), lambda t, i: (t, zero, zero, zero),
                      memory_space=pltpu.VMEM)
    bg = pl.BlockSpec((1, 1, G * n), lambda t, i: (t, zero, zero),
                      memory_space=pltpu.VMEM)
    b3 = pl.BlockSpec((1, ROW_BLOCK, LANE, W),
                      lambda t, i: (t, i, zero, zero),
                      memory_space=pltpu.VMEM)
    bq = pl.BlockSpec((1, 1, 1), lambda t, i: (t, zero, zero),
                      memory_space=pltpu.VMEM)
    bq4 = pl.BlockSpec((1, 1, 1, W), lambda t, i: (t, zero, zero, zero),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bx, b4, b4, bg, bg, b4, b4, bg, bg, b3, b3, bq, bq4],
        out_specs=bx,
        out_shape=jax.ShapeDtypeStruct((T, R, n), jnp.uint32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, tw3, tsh3, gfine, gfsh, itw3, itsh3, gifine, gifsh,
      khf, khfsh, q, qg4)


def _shared_fine(tab, n: int, G: int):
    """Shared fine table [T, n] -> grouped [T, G*n]: each of the G grouped
    rows carries the SAME table group, so the grouped layout is the
    G-fold self-interleave."""
    if G == 1:
        return tab
    T = tab.shape[0]
    rep = jnp.repeat(tab, G, axis=0)
    return group_fine_tables(rep, n, G)


def apply_conv_aux(x, tree, kh, khsh, q, interpret: bool = False):
    """Shared-table fused conv for the Bluestein aux path: x is AUX-MAJOR
    [T, ..., n] (T = #aux primes), `tree` tables have lead [T] or [T, 1]
    (the _broadcast_tree aux layout), kh/khsh [T, ..., LANE, A] in
    spectral_fine_layout, q [T]-leading.  Unlike apply_conv, the twiddle
    tables are NOT broadcast per data row — each grid step fetches one
    shared block per aux prime (see _conv_kernel_shared)."""
    n = x.shape[-1]
    T = x.shape[0]
    lead = x.shape[1:-1]
    A = n // LANE
    G = row_group(n)
    RB = ROW_BLOCK * G

    def tb(a, trail):
        a = jnp.asarray(a)
        return a.reshape((T,) + trail)

    xf = x.reshape(T, -1, n)
    R = xf.shape[1]
    pad = (-R) % RB
    if pad:
        xf = jnp.pad(xf, ((0, 0), (0, pad), (0, 0)), mode="edge")

    # align kh's mid dims (e.g. the ctxt-prime axis) to the TRAILING dims
    # of lead by inserting broadcast axes after the aux axis
    target = 1 + len(lead) + 2
    if kh.ndim < target:
        ins = (1,) * (target - kh.ndim)
        kh = kh.reshape(kh.shape[:1] + ins + kh.shape[1:])
        khsh = khsh.reshape(khsh.shape[:1] + ins + khsh.shape[1:])
    khf = jnp.broadcast_to(kh, (T,) + lead + (LANE, A)) \
             .reshape(T, -1, LANE, A)
    khsf = jnp.broadcast_to(khsh, (T,) + lead + (LANE, A)) \
              .reshape(T, -1, LANE, A)
    if pad:
        khf = jnp.pad(khf, ((0, 0), (0, pad), (0, 0), (0, 0)), mode="edge")
        khsf = jnp.pad(khsf, ((0, 0), (0, pad), (0, 0), (0, 0)),
                       mode="edge")
    if G > 1:
        gsp = lambda a: (group_spectral(a.reshape(-1, LANE, A), G)
                         .reshape(T, -1, LANE, G * A))
        khf, khsf = gsp(khf), gsp(khsf)
    qT = tb(q, (1, 1))
    qg4 = jnp.broadcast_to(qT.reshape(T, 1, 1, 1), (T, 1, 1, G * A))
    fin = lambda a: _shared_fine(tb(a, (n,)), n, G)[:, None]  # [T,1,G*n]
    args = [tb(tree["tw_cat3"], (A, 1, LANE)),
            tb(tree["tw_cat3_sh"], (A, 1, LANE)),
            fin(tree["tw_fine"]), fin(tree["tw_fine_sh"]),
            tb(tree["itw_cat3"], (A, 1, LANE)),
            tb(tree["itw_cat3_sh"], (A, 1, LANE)),
            fin(tree["itw_fine"]), fin(tree["itw_fine_sh"]),
            khf, khsf, qT, qg4]
    out = pallas_conv_shared(xf, *args, n=n, interpret=interpret)
    if pad:
        out = out[:, :R]
    return out.reshape((T,) + lead + (n,))


def group_fine_tables(fine_rows, n: int, G: int):
    """Per-row fine cat table [R, n] -> grouped [R/G, G*n]: each stage
    segment (and each eo half of second-of-pair segments) is transformed
    (gi, a) -> (gi, g, a), interleaving the G grouped rows' twiddles along
    the lane axis exactly as the grouped data transpose interleaves their
    columns.  Works on jnp (trace-time) and numpy inputs."""
    if G == 1:
        return fine_rows
    R = fine_rows.shape[0]
    R2 = R // G
    A = n // LANE
    stages = n.bit_length() - 1
    coarse = stages - 7
    single, pairs = _schedule(coarse, stages)

    def blk(seg, gseg):
        # seg [R, gseg*A] in (gi, a) layout -> [R2, gseg*G*A]
        return (seg.reshape(R2, G, gseg, A).transpose(0, 2, 1, 3)
                .reshape(R2, gseg * G * A))

    roles = ([(single, False)] if single is not None else []) + \
            [x for s0, s1 in pairs for x in [(s0, False), (s1, True)]]
    roles.sort()
    parts = [jnp.zeros((R2, (1 << coarse) * G), fine_rows.dtype)]
    for s, second in roles:
        m = 1 << s
        seg = fine_rows[:, m:2 * m]
        if second:
            h = m // 2
            parts.append(blk(seg[:, :h], h // A))
            parts.append(blk(seg[:, h:], h // A))
        else:
            parts.append(blk(seg, m // A))
    return jnp.concatenate(parts, axis=1)


def group_spectral(khf, G: int):
    """Grouped spectral_fine_layout: [R, LANE, A] -> [R/G, LANE, G*A]."""
    if G == 1:
        return khf
    R, _, A = khf.shape
    return (khf.reshape(R // G, G, LANE, A).transpose(0, 2, 1, 3)
            .reshape(R // G, LANE, G * A))


def group_q(qrows, G: int, A: int):
    """Per-row moduli [R, 1] -> per-lane [R/G, 1, 1, G*A]."""
    R = qrows.shape[0]
    return jnp.broadcast_to(qrows.reshape(R // G, G, 1),
                            (R // G, G, A)).reshape(R // G, 1, 1, G * A)


def apply_conv(x, tree, kh, khsh, q, interpret: bool = False,
               kh_layout: str = "cat"):
    """Fused spectral convolution; tables from an ops.ntt tree; q
    broadcastable to x.  kh_layout="fine" means kh/khsh are already in
    spectral_fine_layout order [..., LANE, A] (the BluesteinTables fast
    path); "cat" inputs are [..., n] and relayouted here (one extra XLA
    transpose per call)."""
    n = x.shape[-1]
    lead = x.shape[:-1]
    A = n // LANE
    G = row_group(n)
    RB = ROW_BLOCK * G
    if kh_layout == "cat":
        kh = jnp.swapaxes(kh.reshape(*kh.shape[:-1], A, LANE), -1, -2)
        khsh = jnp.swapaxes(khsh.reshape(*khsh.shape[:-1], A, LANE), -1, -2)

    def prep(a, w):
        return jnp.broadcast_to(a, lead + (w,)).reshape(-1, w)

    def prep3(a):
        return jnp.broadcast_to(a, lead + (LANE, A)).reshape(-1, LANE, A)

    def prep4(a):
        return jnp.broadcast_to(a, lead + (A, 1, LANE)) \
                  .reshape(-1, A, 1, LANE)

    xf = x.reshape(-1, n)
    P = xf.shape[0]
    pad = (-P) % RB
    ext = lambda a: jnp.pad(a, ((0, pad), (0, 0)) + ((0, 0),) *
                            (a.ndim - 2), mode="edge")
    if pad:
        xf = ext(xf)
    gt = lambda a: group_fine_tables(ext(prep(a, n)) if pad
                                     else prep(a, n), n, G)
    gs = lambda a: group_spectral(ext(prep3(a)) if pad else prep3(a), G)
    p4 = lambda a: ext(prep4(a)) if pad else prep4(a)
    qrows = ext(prep(q, 1)) if pad else prep(q, 1)
    args = [p4(tree["tw_cat3"]), p4(tree["tw_cat3_sh"]),
            gt(tree["tw_fine"]), gt(tree["tw_fine_sh"]),
            p4(tree["itw_cat3"]), p4(tree["itw_cat3_sh"]),
            gt(tree["itw_fine"]), gt(tree["itw_fine_sh"]),
            gs(kh), gs(khsh), qrows, group_q(qrows, G, A)]
    out = pallas_conv(xf, *args, n=n, interpret=interpret)
    if pad:
        out = out[:P]
    return out.reshape(*lead, n)


# ---------------------------------------------------------------------------
# wrapper: flatten leading dims into rows, pad to the row block
# ---------------------------------------------------------------------------

def apply_ntt(x, tree, q, inverse: bool, interpret: bool = False):
    """x: [..., n]; tree supplies coarse3/fine tables (fwd or inv picked by
    `inverse`); q broadcastable to x.shape[:-1]+(1,)."""
    n = x.shape[-1]
    lead = x.shape[:-1]
    A = max(n // LANE, 1)
    if inverse:
        tw3, tsh3 = tree["itw_cat3"], tree["itw_cat3_sh"]
        fine, fsh = tree["itw_fine"], tree["itw_fine_sh"]
    else:
        tw3, tsh3 = tree["tw_cat3"], tree["tw_cat3_sh"]
        fine, fsh = tree["tw_fine"], tree["tw_fine_sh"]

    def prep(a, width):
        return jnp.broadcast_to(a, lead + (width,)).reshape(-1, width)

    def prep4(a):
        return jnp.broadcast_to(a, lead + (A, 1, LANE)) \
                  .reshape(-1, A, 1, LANE)

    G = row_group(n)
    RB = ROW_BLOCK * G
    xf = x.reshape(-1, n)
    P = xf.shape[0]
    pad = (-P) % RB
    ext = lambda a: jnp.pad(a, ((0, pad), (0, 0)) + ((0, 0),) *
                            (a.ndim - 2), mode="edge")
    if pad:
        xf = ext(xf)
    gt = lambda a: group_fine_tables(ext(prep(a, n)) if pad
                                     else prep(a, n), n, G)
    p4 = lambda a: ext(prep4(a)) if pad else prep4(a)
    qrows = ext(prep(q, 1)) if pad else prep(q, 1)
    args = [p4(tw3), p4(tsh3), gt(fine), gt(fsh),
            qrows, group_q(qrows, G, A)]
    out = pallas_ntt(xf, *args, n=n, inverse=inverse, interpret=interpret)
    if pad:
        out = out[:P]
    return out.reshape(*lead, n)
