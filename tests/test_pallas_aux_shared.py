"""Shared-twiddle (aux-major) fused conv path vs the per-row-table kernel
and the staged jnp Bluestein pipeline (interpret mode on CPU; TPU A/B in
benchmarks/kernel_aux_bench.py).

pallas_conv_shared grids over (aux prime, row block) and fetches ONE
twiddle block per aux prime instead of a per-row broadcast copy; results
must stay bit-exact on every path."""

import numpy as np
import pytest

import jax.numpy as jnp

from helib_tpu.nt.primegen import gen_primes
from helib_tpu.ops import ntt as nttmod
from helib_tpu.ops import pallas_ntt as pn


def _bluestein_tables(m, P=2):
    qs = np.array(gen_primes(m, P), dtype=np.uint32)
    return nttmod.BluesteinTables(qs, m, inverse=False), qs


def test_conv_aux_matches_per_row_kernel():
    m = 101                       # B = 256: smallest fused-kernel size
    t, qs = _bluestein_tables(m)
    B = t.B
    tree = t.dev
    aux = tree["aux"]
    rng = np.random.default_rng(31)
    raux = np.asarray(nttmod.aux_primes(), dtype=np.int64)
    x = jnp.asarray(rng.integers(0, raux[:, None, None],
                                 (3, len(qs), B)).astype(np.uint32))
    ref = np.asarray(pn.apply_conv(x, aux, tree["khat_f"],
                                   tree["khat_f_sh"], tree["aux_q"],
                                   interpret=True, kh_layout="fine"))
    got = np.asarray(pn.apply_conv_aux(x, aux, tree["khat_f"],
                                       tree["khat_f_sh"], tree["aux_q"],
                                       interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_conv_aux_batched_lead():
    """Extra leading (batch) dims ahead of the ctxt-prime axis."""
    m = 101
    t, qs = _bluestein_tables(m)
    B = t.B
    tree = t.dev
    aux = tree["aux"]
    rng = np.random.default_rng(37)
    raux = np.asarray(nttmod.aux_primes(), dtype=np.int64)
    x = jnp.asarray(rng.integers(0, raux[:, None, None, None],
                                 (3, 2, len(qs), B)).astype(np.uint32))
    ref = np.asarray(pn.apply_conv(
        jnp.moveaxis(x, 0, 1), aux, tree["khat_f"], tree["khat_f_sh"],
        tree["aux_q"], interpret=True, kh_layout="fine"))
    got = np.asarray(pn.apply_conv_aux(x, aux, tree["khat_f"],
                                       tree["khat_f_sh"], tree["aux_q"],
                                       interpret=True))
    np.testing.assert_array_equal(got, np.moveaxis(ref, 1, 0))


def test_bluestein_aux_shared_end_to_end(monkeypatch):
    """Full bluestein_apply: aux-shared branch (kernel in interpret mode)
    must be bit-exact vs the staged jnp path, including the rewritten
    aux-major CRT tail."""
    m = 101
    t, qs = _bluestein_tables(m)
    tree = t.dev
    rng = np.random.default_rng(41)
    x = jnp.asarray(rng.integers(0, qs[:, None].astype(np.int64),
                                 (len(qs), m)).astype(np.uint32))

    monkeypatch.setattr(nttmod, "USE_PALLAS", False)
    ref = np.asarray(nttmod.bluestein_apply(x, tree, m, t.B))

    orig = pn.pallas_conv_shared
    monkeypatch.setattr(
        pn, "pallas_conv_shared",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(nttmod, "USE_PALLAS", True)
    monkeypatch.setenv("HELIB_NTT_AUXSHARED", "1")
    got = np.asarray(nttmod.bluestein_apply(x, tree, m, t.B))
    np.testing.assert_array_equal(got, ref)

    # batched lead as the vmapped pipelines produce
    xb = jnp.stack([x, (x + 1) % jnp.asarray(qs[:, None])])
    gotb = np.asarray(nttmod.bluestein_apply(xb, tree, m, t.B))
    monkeypatch.setattr(nttmod, "USE_PALLAS", False)
    refb = np.asarray(nttmod.bluestein_apply(xb, tree, m, t.B))
    np.testing.assert_array_equal(gotb, refb)
