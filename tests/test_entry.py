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
