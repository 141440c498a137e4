"""Fused Pallas NTT kernels, v2: whole-phase block-list butterflies.

The v1 kernel (pallas_ntt.py) materializes the working array with a
jnp.concatenate after every radix-4 composite — 8 concat events per
direction at n=16384, and the measured interleave cost (~0.35 us/row per
event) is ~half of total kernel time (STATUS round-3 roofline: 9.8 us/row
against a ~5 us/row butterfly floor).

v2 removes the materializations entirely: each butterfly phase (coarse =
all stages with pair stride >= LANE, fine = the last 7 stages after ONE
transpose) keeps its data as a LIST of 2^k sub-blocks at the finest
granularity and performs every butterfly level as elementwise ops on block
pairs:

    level j pairs blocks (p, p | stride), stride = 2^(k-1-j);
    twiddle class for the pair = p >> (k - j)  (the level-j sub-group
    index = the already-split high bits of the block position).

Values flow level-to-level in vector registers (Mosaic spills to VMEM only
under register pressure); the ONLY materializations left per direction are
the one concat that feeds each phase boundary and the two outer four-step
transposes v1 already had.  The spectral multiply of the conv kernel is
done per-block in the transposed fine layout, so the forward-fine ->
pointwise -> inverse-fine pipeline runs without ANY materialization.

Twiddle layout: stage s0+j of a composite starting at s0 keeps its v1
"cat" span [2^(s0+j), 2^(s0+j+1)) but is stored class-deinterleaved:
class p (of 2^j) at offset p*2^s0 holds entries seg[p::2^j] — the
generalization of v1's even/odd split for pair-second stages.  Tables are
rebuilt host-side from the per-stage numpy segments (build_v2_tables);
the v1 device tables are untouched, so both kernels can coexist.

Same role equivalence as v1: the Intel-HEXL fused NTT
(reference src/intelExt.cpp, src/CModulus.cpp:228-345) for the TPU.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ..exceptions import assert_true

from .pallas_ntt import (LANE, ROW_BLOCK, MIN_PALLAS_N, MAX_PALLAS_N,
                         _csub, _shoup_lazy, row_group, fine_layout,
                         group_spectral, group_q, spectral_fine_layout)

U32 = jnp.uint32


def phase_schedule(start: int, stop: int, max_k: int | None = None):
    """Composites [(s0, k), ...] covering stages [start, stop).  With
    max_k=None the whole phase is ONE composite (no intermediate
    materialization at all); otherwise greedy chunks of <= max_k with the
    remainder first (ascending), mirroring v1's single-then-pairs shape."""
    count = stop - start
    if count <= 0:
        return []
    if max_k is None or count <= max_k:
        return [(start, count)]
    rem = count % max_k
    out = [(start, rem)] if rem else []
    s = start + rem
    while s < stop:
        out.append((s, max_k))
        s += max_k
    return out


# ---------------------------------------------------------------------------
# generic composite butterflies on a block list
# ---------------------------------------------------------------------------

def _fwd_composite(blocks, qq, k, tw):
    """blocks: 2^k arrays (natural position order, finest granularity).
    tw(j, cls) -> (w, wsh) broadcastable against a block.  In-place style:
    returns the new list.  Inputs < 4q, outputs < 4q (Harvey lazy)."""
    nb = 1 << k
    for j in range(k):
        stride = 1 << (k - 1 - j)
        for p in range(nb):
            if p & stride:
                continue
            cls = p >> (k - j)
            w, wsh = tw(j, cls)
            u = _csub(blocks[p], 2 * qq)
            t = _shoup_lazy(blocks[p | stride], w, wsh, qq)
            blocks[p] = u + t
            blocks[p | stride] = u + 2 * qq - t
    return blocks


def _inv_composite(blocks, qq, k, tw):
    """Mirror of _fwd_composite (levels descending)."""
    nb = 1 << k
    for j in range(k - 1, -1, -1):
        stride = 1 << (k - 1 - j)
        for p in range(nb):
            if p & stride:
                continue
            cls = p >> (k - j)
            w, wsh = tw(j, cls)
            a, b = blocks[p], blocks[p | stride]
            u = _csub(a + b, 2 * qq)
            v = _shoup_lazy(a + 2 * qq - b, w, wsh, qq)
            blocks[p] = u
            blocks[p | stride] = v
    return blocks


# ---------------------------------------------------------------------------
# coarse phase: blocks along the A (sublane-side) axis of [R, A, LANE]
# ---------------------------------------------------------------------------

def _coarse_blocks(x3, R, A, sched):
    """Split [R, A, LANE] into the finest blocks of the FIRST composite.
    Subsequent composites re-split (their granularity is finer)."""
    return x3


def _run_coarse(x3, q, R, A, tw3_ref, tsh3_ref, sched, inverse):
    """All coarse composites.  tw3 tables are [R, A, 1, LANE]
    (lane-pre-expanded, v2 class layout).  x3: [R, A, LANE]."""
    qq = q[:, :, None, None]
    comps = sched if not inverse else list(reversed(sched))
    for s0, k in comps:
        m0 = 1 << s0
        nb = 1 << k
        sub = A // (m0 * nb)          # block length along A
        xr = x3.reshape(R, m0, nb, sub, LANE)
        blocks = [xr[:, :, p] for p in range(nb)]

        def tw(j, cls, m0=m0, s0=s0):
            base = (1 << j) * m0 + cls * m0
            return (tw3_ref[:, base:base + m0],
                    tsh3_ref[:, base:base + m0])

        if inverse:
            blocks = _inv_composite(blocks, qq, k, tw)
        else:
            blocks = _fwd_composite(blocks, qq, k, tw)
        x3 = jnp.concatenate(blocks, axis=2).reshape(R, A, LANE)
    return x3


# ---------------------------------------------------------------------------
# fine phase: blocks along the former-lane axis of [R2, LANE, W]
# ---------------------------------------------------------------------------

def _fine_split(xt, R2, n, W, G, s0, k):
    m0 = 1 << s0
    g2 = m0 // (n // LANE)            # = m0 / A (lane groups of stage s0)
    half0 = LANE // (2 * g2)          # data span of one stage-s0 half
    nb = 1 << k
    sub = (2 * half0) // nb
    xr = xt.reshape(R2, g2, nb, sub, W)
    return [xr[:, :, p] for p in range(nb)], g2


def _run_fine(xt, qq4, R2, n, W, G, fine_ref, fsh_ref, sched, inverse,
              spectral=None):
    """All fine composites on [R2, LANE, W].  When `spectral` is given
    (khf, khfsh, i_fine_ref, i_fsh_ref), the LAST forward composite's
    output blocks are multiplied by the spectral kernel per-block and fed
    straight into the inverse composites — no materialization in between
    (the fused-conv fast path; requires a single-composite schedule)."""
    A = n // LANE
    comps = sched if not inverse else list(reversed(sched))
    for ci, (s0, k) in enumerate(comps):
        m0 = 1 << s0
        blocks, g2 = _fine_split(xt, R2, n, W, G, s0, k)

        def tw(j, cls, ref=fine_ref, sref=fsh_ref, m0=m0, g2=g2):
            base = ((1 << j) * m0 + cls * m0) * G
            return (ref[:, base:base + m0 * G].reshape(R2, g2, 1, W),
                    sref[:, base:base + m0 * G].reshape(R2, g2, 1, W))

        if inverse:
            blocks = _inv_composite(blocks, qq4, k, tw)
        else:
            blocks = _fwd_composite(blocks, qq4, k, tw)
            if spectral is not None and ci == len(comps) - 1:
                khf, khfsh, iref, isref = spectral
                nb = 1 << k
                sub = LANE // (g2 * nb)
                khr = khf.reshape(R2, g2, nb, sub, W)
                khsr = khfsh.reshape(R2, g2, nb, sub, W)
                blocks = [_shoup_lazy(b, khr[:, :, p], khsr[:, :, p], qq4)
                          for p, b in enumerate(blocks)]

                def itw(j, cls, m0=m0, g2=g2):
                    base = ((1 << j) * m0 + cls * m0) * G
                    return (iref[:, base:base + m0 * G]
                            .reshape(R2, g2, 1, W),
                            isref[:, base:base + m0 * G]
                            .reshape(R2, g2, 1, W))

                blocks = _inv_composite(blocks, qq4, k, itw)
        xt = jnp.concatenate(blocks, axis=2).reshape(R2, LANE, W)
    return xt


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _ntt2_kernel(x_ref, tw3_ref, tsh3_ref, fine_ref, fsh_ref, q_ref,
                 qg4_ref, o_ref, *, n: int, inverse: bool, max_k):
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
    csched = phase_schedule(0, coarse, max_k)
    fsched = phase_schedule(coarse, stages, max_k)
    qq4 = qg4
    if not inverse:
        x3 = _run_coarse(x.reshape(R, A, LANE), q, R, A, tw3_ref, tsh3_ref,
                         csched, inverse=False)
        xt = jnp.swapaxes(x3.reshape(R2, W, LANE), 1, 2)
        xt = _run_fine(xt, qq4, R2, n, W, G, fine_ref, fsh_ref, fsched,
                       inverse=False)
        x = jnp.swapaxes(xt, 1, 2).reshape(R, n)
        o_ref[:] = _csub(_csub(x, 2 * q), q)
    else:
        xt = jnp.swapaxes(x.reshape(R2, W, LANE), 1, 2)
        xt = _run_fine(xt, qq4, R2, n, W, G, fine_ref, fsh_ref, fsched,
                       inverse=True)
        x3 = jnp.swapaxes(xt, 1, 2).reshape(R, A, LANE)
        x3 = _run_coarse(x3, q, R, A, tw3_ref, tsh3_ref, csched,
                         inverse=True)
        x3 = _shoup_lazy(x3, tw3_ref[:, 0], tsh3_ref[:, 0], q[:, :, None])
        o_ref[:] = _csub(x3.reshape(R, n), q)


def _conv2_kernel(x_ref, tw3_ref, tsh3_ref, fine_ref, fsh_ref,
                  itw3_ref, itsh3_ref, ifine_ref, ifsh_ref,
                  khf_ref, khfsh_ref, q_ref, qg4_ref, o_ref, *, n: int,
                  max_k):
    """iNTT(NTT(x) . khat) fully fused; with a single-composite fine
    schedule the whole fwd-fine -> pointwise -> inv-fine pipeline runs on
    the block list without one materialization."""
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
    csched = phase_schedule(0, coarse, max_k)
    fsched = phase_schedule(coarse, stages, max_k)
    x3 = _run_coarse(x.reshape(R, A, LANE), q, R, A, tw3_ref, tsh3_ref,
                     csched, inverse=False)
    xt = jnp.swapaxes(x3.reshape(R2, W, LANE), 1, 2)
    if len(fsched) == 1:
        xt = _run_fine(xt, qg4, R2, n, W, G, fine_ref, fsh_ref, fsched,
                       inverse=False,
                       spectral=(khf_ref[:], khfsh_ref[:],
                                 ifine_ref, ifsh_ref))
    else:
        xt = _run_fine(xt, qg4, R2, n, W, G, fine_ref, fsh_ref, fsched,
                       inverse=False)
        xt = _shoup_lazy(xt, khf_ref[:], khfsh_ref[:], qg4[:, 0])
        xt = _run_fine(xt, qg4, R2, n, W, G, ifine_ref, ifsh_ref, fsched,
                       inverse=True)
    x3 = jnp.swapaxes(xt, 1, 2).reshape(R, A, LANE)
    x3 = _run_coarse(x3, q, R, A, itw3_ref, itsh3_ref, csched, inverse=True)
    x3 = _shoup_lazy(x3, itw3_ref[:, 0], itsh3_ref[:, 0], q[:, :, None])
    o_ref[:] = _csub(x3.reshape(R, n), q)


@functools.partial(jax.jit,
                   static_argnames=("n", "inverse", "interpret", "max_k"))
def pallas_ntt2(x, tw3, tsh3, gfine, gfsh, q, qg4, *, n: int, inverse: bool,
                interpret: bool = False, max_k=None):
    P = x.shape[0]
    G = row_group(n)
    RB = ROW_BLOCK * G
    assert_true(P % RB == 0, (P, G))
    grid = (P // RB,)
    A = max(n // LANE, 1)
    W = G * A
    kern = functools.partial(_ntt2_kernel, n=n, inverse=inverse, max_k=max_k)
    zero = np.int32(0)
    bs = lambda w: pl.BlockSpec((RB, w), lambda i: (i, zero),
                                memory_space=pltpu.VMEM)
    bsg = pl.BlockSpec((ROW_BLOCK, G * n), lambda i: (i, zero),
                       memory_space=pltpu.VMEM)
    bs2 = pl.BlockSpec((RB, A), lambda i: (i, zero),
                       memory_space=pltpu.VMEM)
    bsq4 = pl.BlockSpec((ROW_BLOCK, 1, 1, W),
                        lambda i: (i, zero, zero, zero),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bs(n), bs4_spec(RB, A), bs4_spec(RB, A), bsg, bsg,
                  bs(1), bsq4],
        out_specs=bs(n),
        out_shape=jax.ShapeDtypeStruct((P, n), jnp.uint32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, tw3, tsh3, gfine, gfsh, q, qg4)


def bs4_spec(RB, A):
    zero = np.int32(0)
    return pl.BlockSpec((RB, A, 1, LANE), lambda i: (i, zero, zero, zero),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("n", "interpret", "max_k"))
def pallas_conv2(x, tw3, tsh3, gfine, gfsh, itw3, itsh3, gifine, gifsh,
                 khf, khfsh, q, qg4, *, n: int, interpret: bool = False,
                 max_k=None):
    P = x.shape[0]
    G = row_group(n)
    RB = ROW_BLOCK * G
    assert_true(P % RB == 0, (P, G))
    grid = (P // RB,)
    A = max(n // LANE, 1)
    W = G * A
    kern = functools.partial(_conv2_kernel, n=n, max_k=max_k)
    zero = np.int32(0)
    bs = lambda w: pl.BlockSpec((RB, w), lambda i: (i, zero),
                                memory_space=pltpu.VMEM)
    bsg = pl.BlockSpec((ROW_BLOCK, G * n), lambda i: (i, zero),
                       memory_space=pltpu.VMEM)
    bs3 = pl.BlockSpec((ROW_BLOCK, LANE, W), lambda i: (i, zero, zero),
                       memory_space=pltpu.VMEM)
    bsq4 = pl.BlockSpec((ROW_BLOCK, 1, 1, W),
                        lambda i: (i, zero, zero, zero),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bs(n), bs4_spec(RB, A), bs4_spec(RB, A), bsg, bsg,
                  bs4_spec(RB, A), bs4_spec(RB, A), bsg, bsg,
                  bs3, bs3, bs(1), bsq4],
        out_specs=bs(n),
        out_shape=jax.ShapeDtypeStruct((P, n), jnp.uint32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, tw3, tsh3, gfine, gfsh, itw3, itsh3, gifine, gifsh,
      khf, khfsh, q, qg4)


# ---------------------------------------------------------------------------
# v2 table construction (host-side, from per-stage natural segments)
# ---------------------------------------------------------------------------

def _class_cat(stage_segs, n, sched, head):
    """Build a v2 cat table [P, n] from natural per-stage segments.
    stage_segs[s]: [P, 2^s]; head: [P, 1] entry 0 (n^{-1} or zero)."""
    P = head.shape[0]
    cat = np.zeros((P, n), dtype=np.uint32)
    cat[:, :1] = head
    for s0, k in sched:
        m0 = 1 << s0
        for j in range(k):
            seg = stage_segs[s0 + j]
            for cls in range(1 << j):
                base = (1 << j) * m0 + cls * m0
                cat[:, base:base + m0] = seg[:, cls::(1 << j)]
    return cat


def _class_fine(stage_segs, n, sched, G):
    """v2 fine-layout table [P/G-grouped later; here per-row P, n]: each
    class slice additionally goes through fine_layout (the transposed
    four-step order), exactly as v1 does per eo half."""
    P = stage_segs[-1].shape[0]
    fine = np.zeros((P, n), dtype=np.uint32)
    for s0, k in sched:
        m0 = 1 << s0
        for j in range(k):
            seg = stage_segs[s0 + j]
            for cls in range(1 << j):
                base = (1 << j) * m0 + cls * m0
                fine[:, base:base + m0] = fine_layout(
                    seg[:, cls::(1 << j)], n)
    return fine


def group_fine_tables_v2(fine_rows, n: int, G: int, sched):
    """Grouped fine tables for the v2 class layout: every class slice is a
    contiguous m0-entry segment in (gi, a) layout; interleave the G grouped
    rows' twiddles along the lane axis per class (cf. v1 group_fine_tables,
    which walks the radix-4 roles)."""
    if G == 1:
        return fine_rows
    xp = jnp if isinstance(fine_rows, jnp.ndarray) else np
    R = fine_rows.shape[0]
    R2 = R // G
    A = n // LANE

    def blk(seg, gseg):
        return (seg.reshape(R2, G, gseg, A).transpose(0, 2, 1, 3)
                .reshape(R2, gseg * G * A))

    parts = []
    pos = 0
    first_m0 = 1 << sched[0][0]
    parts.append(xp.zeros((R2, first_m0 * G), fine_rows.dtype))
    pos = first_m0
    for s0, k in sched:
        m0 = 1 << s0
        for j in range(k):
            for cls in range(1 << j):
                base = (1 << j) * m0 + cls * m0
                if base != pos:
                    # positions are contiguous by construction
                    assert_true(base == pos, (base, pos))
                parts.append(blk(fine_rows[:, base:base + m0], m0 // A))
                pos = base + m0
    return xp.concatenate(parts, axis=1)


class V2Tables:
    """v2 kernel tables derived host-side from a transform's per-stage
    numpy twiddle segments.  Cached per (tables object id, max_k)."""

    def __init__(self, np_tw, np_tw_sh, np_itw, np_itw_sh, ninv, ninv_sh,
                 n, max_k=None):
        stages = n.bit_length() - 1
        coarse = stages - 7
        self.csched = phase_schedule(0, coarse, max_k)
        self.fsched = phase_schedule(coarse, stages, max_k)
        zero = np.zeros_like(ninv)
        from .pallas_ntt import coarse3_layout
        cat = _class_cat(np_tw, n, self.csched, zero)
        cat_sh = _class_cat(np_tw_sh, n, self.csched, zero)
        icat = _class_cat(np_itw, n, self.csched, ninv)
        icat_sh = _class_cat(np_itw_sh, n, self.csched, ninv_sh)
        self.tw_cat3 = coarse3_layout(cat, n)
        self.tw_cat3_sh = coarse3_layout(cat_sh, n)
        self.itw_cat3 = coarse3_layout(icat, n)
        self.itw_cat3_sh = coarse3_layout(icat_sh, n)
        self.tw_fine = _class_fine(np_tw, n, self.fsched, 1)
        self.tw_fine_sh = _class_fine(np_tw_sh, n, self.fsched, 1)
        self.itw_fine = _class_fine(np_itw, n, self.fsched, 1)
        self.itw_fine_sh = _class_fine(np_itw_sh, n, self.fsched, 1)
        self.n = n
        self.max_k = max_k


_v2_cache: dict = {}


def v2_tables_for(t, n: int, max_k=None) -> V2Tables:
    """V2Tables for an ops.ntt transform table dict `t` (its np segments
    must be recoverable: we rebuild natural segments from t["tw"]/t["itw"]
    per-stage lists, which both Pow2NTT and BluesteinTables expose in their
    tree())."""
    key = (id(t.get("tw")), n, max_k)
    v = _v2_cache.get(key)
    if v is None:
        def seg(x):
            # trees may carry _broadcast_tree's size-1 batch axes between
            # the prime axis and the entries (e.g. the Bluestein aux tree)
            a = np.asarray(x)
            return a.reshape(a.shape[0], a.shape[-1])
        np_tw = [seg(a) for a in t["tw"]]
        np_tw_sh = [seg(a) for a in t["tw_sh"]]
        np_itw = [seg(a) for a in t["itw"]]
        np_itw_sh = [seg(a) for a in t["itw_sh"]]
        ninv = seg(t["ninv"])
        ninv_sh = seg(t["ninv_sh"])
        v = V2Tables(np_tw, np_tw_sh, np_itw, np_itw_sh, ninv, ninv_sh, n,
                     max_k)
        # restore the tree's original lead shape (prime axis + any
        # _broadcast_tree size-1 batch axes, e.g. the aux tree's [3, 1])
        # so the wrappers' broadcast_to aligns against the input's lead
        lead = np.asarray(t["ninv"]).shape[:-1]
        if len(lead) > 1:
            for attr in ("tw_cat3", "tw_cat3_sh", "itw_cat3", "itw_cat3_sh",
                         "tw_fine", "tw_fine_sh", "itw_fine", "itw_fine_sh"):
                a = getattr(v, attr)
                setattr(v, attr, a.reshape(lead + a.shape[1:]))
        _v2_cache[key] = v
    return v


# ---------------------------------------------------------------------------
# wrappers mirroring pallas_ntt.apply_ntt / apply_conv
# ---------------------------------------------------------------------------

def apply_ntt2(x, t, q, inverse: bool, interpret: bool = False, max_k=None):
    n = x.shape[-1]
    lead = x.shape[:-1]
    A = max(n // LANE, 1)
    v = v2_tables_for(t, n, max_k)
    if inverse:
        tw3, tsh3 = v.itw_cat3, v.itw_cat3_sh
        fine, fsh = v.itw_fine, v.itw_fine_sh
    else:
        tw3, tsh3 = v.tw_cat3, v.tw_cat3_sh
        fine, fsh = v.tw_fine, v.tw_fine_sh
    G = row_group(n)
    RB = ROW_BLOCK * G

    def prep(a, width):
        return jnp.broadcast_to(a, lead + (width,)).reshape(-1, width)

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
    gt = lambda a: group_fine_tables_v2(ext(prep(a, n)) if pad
                                        else prep(a, n), n, G, v.fsched)
    p4 = lambda a: ext(prep4(a)) if pad else prep4(a)
    qrows = ext(prep(q, 1)) if pad else prep(q, 1)
    args = [p4(tw3), p4(tsh3), gt(fine), gt(fsh),
            qrows, group_q(qrows, G, A)]
    out = pallas_ntt2(xf, *args, n=n, inverse=inverse, interpret=interpret,
                      max_k=max_k)
    if pad:
        out = out[:P]
    return out.reshape(*lead, n)


def apply_conv2(x, t, kh, khsh, q, interpret: bool = False,
                kh_layout: str = "cat", max_k=None):
    n = x.shape[-1]
    lead = x.shape[:-1]
    A = n // LANE
    G = row_group(n)
    RB = ROW_BLOCK * G
    v = v2_tables_for(t, n, max_k)
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
    gt = lambda a: group_fine_tables_v2(ext(prep(a, n)) if pad
                                        else prep(a, n), n, G, v.fsched)
    gs = lambda a: group_spectral(ext(prep3(a)) if pad else prep3(a), G)
    p4 = lambda a: ext(prep4(a)) if pad else prep4(a)
    qrows = ext(prep(q, 1)) if pad else prep(q, 1)
    args = [p4(v.tw_cat3), p4(v.tw_cat3_sh),
            gt(v.tw_fine), gt(v.tw_fine_sh),
            p4(v.itw_cat3), p4(v.itw_cat3_sh),
            gt(v.itw_fine), gt(v.itw_fine_sh),
            gs(kh), gs(khsh), qrows, group_q(qrows, G, A)]
    out = pallas_conv2(xf, *args, n=n, interpret=interpret, max_k=max_k)
    if pad:
        out = out[:P]
    return out.reshape(*lead, n)
