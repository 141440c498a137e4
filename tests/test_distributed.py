"""Two-PROCESS distributed execution test (the multi-host story, §2.9).

Spawns two real OS processes that join a jax.distributed process group over
localhost, build a global ("batch","limb") mesh spanning both processes'
virtual CPU devices, run the sharded mult+relin pipeline, and check the
result BIT-EXACTLY against the single-process unsharded execution of the
same function on the same inputs (residue arithmetic is exact, so any
wrong collective shows up as a mismatch).  Skipped cleanly if the CPU
collectives backend is unavailable.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=2")
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
import jax
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
import numpy as np
from jax.sharding import PartitionSpec as P
from helib_tpu.context import Context
from helib_tpu.keys import SecKey
from helib_tpu.parallel.distributed import global_mesh, sharded_pipeline

ctx = Context(m=45, p=2, r=1, bits=118, c=3, scheme="bgv")
sk = SecKey(ctx, seed=1)
mesh = global_mesh(limb=2)
assert len(jax.devices()) == 4 and jax.process_count() == 2
jfn, ex = sharded_pipeline(ctx, sk, mesh, global_batch=2)
with mesh:
    out = jfn(*ex)
    jax.block_until_ready(out)
# every process holds the shards of its own batch entry; gather the full
# arrays for value checking against the single-process oracle
gathered = [np.asarray(jax.experimental.multihost_utils
                       .process_allgather(o, tiled=True)) for o in out]
if pid == 0:
    # single-process oracle: same pipeline, unsharded, one batch row
    # (make_batched_mult_relin broadcasts identical rows, so row 0 of the
    # distributed result must equal the unsharded single-row result)
    from helib_tpu.pipeline import make_mult_relin
    fn, ex1 = make_mult_relin(ctx, sk)
    ref = jax.jit(fn)(*ex1)
    jax.block_until_ready(ref)
    for got, want in zip(gathered, ref):
        want = np.asarray(want)
        assert got.shape[1:] == want.shape, (got.shape, want.shape)
        for b in range(got.shape[0]):
            np.testing.assert_array_equal(got[b], want)
    print("DIST_OK values-match", gathered[0].shape)
"""


@pytest.mark.slow
def test_two_process_mult_relin(tmp_path):
    """Real 2-process jax.distributed run, decoded result compared
    bit-exactly with the unsharded single-process execution."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ, PYTHONPATH="/root/repo")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", port],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        if p.returncode != 0:
            if "distributed" in o and ("not support" in o or
                                       "Unimplemented" in o):
                pytest.skip("CPU collectives unavailable: " + o[-200:])
            raise AssertionError(o[-2000:])
    assert "DIST_OK values-match" in outs[0]


def test_global_mesh_single_process():
    """global_mesh shape logic without a process group."""
    import jax
    from helib_tpu.parallel.distributed import global_mesh
    mesh = global_mesh()
    assert set(mesh.axis_names) == {"batch", "limb"}
    assert mesh.devices.size == len(jax.devices())
