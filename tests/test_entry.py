"""Driver entry-point tests: jittable single-chip step + virtual 8-device
sharded dry-run (the multi-chip test strategy from SURVEY.md §4)."""

import sys
import pathlib

import jax
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge


def test_entry_jits():
    fn, args = ge.entry()
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    assert out[0].shape == args[0].shape


def test_dryrun_multichip():
    assert len(jax.devices("cpu")) >= 8
    ge.dryrun_multichip(8)


def test_device_encrypt_path():
    """Jitted device-side encryption decrypts correctly."""
    from helib_tpu.context import Context
    from helib_tpu.keys import SecKey, PubKey, SKHandle, balanced_int
    from helib_tpu.ctxt import Ctxt
    from helib_tpu.pipeline import make_encrypt, fresh_noise
    from helib_tpu import dcrt

    ctx = Context(m=45, p=2, r=1, bits=150, c=3, scheme="bgv")
    sk = SecKey(ctx, seed=81)
    pk = PubKey(sk)
    rng = np.random.default_rng(83)
    pt = rng.integers(0, 2, ctx.phi_m)
    Q = ctx.prod_qs(ctx.L)
    pr = ctx.ptxt_space
    fixed = np.array([balanced_int(int(c) * (Q % pr) % pr, pr) for c in pt],
                     dtype=np.int64)
    pt_eval = dcrt.small_coeffs_to_rt(ctx, fixed, ctx.L, False)
    fn = jax.jit(make_encrypt(ctx, pk))
    c0, c1 = fn(jax.random.PRNGKey(17), pt_eval)
    ct = Ctxt(ctx, pk, [(SKHandle(0, 1, 0), c0), (SKHandle(1, 1, 0), c1)],
              ctx.L, False, pr, fresh_noise(ctx, pk), 1)
    assert ct.is_correct()
    dec = sk.decrypt_bgv(ct)
    np.testing.assert_array_equal(dec, pt % pr)
