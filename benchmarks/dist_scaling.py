"""Multi-process scaling-efficiency measurement (BASELINE.md scaling gate).

Runs the sharded mult+relin pipeline at the same GLOBAL work twice:
  1 process x 4 virtual devices   vs   2 processes x 2 virtual devices each
and reports throughput efficiency = T1 / T2.  On this host the devices are
virtual CPU devices (no multi-chip hardware is available — SURVEY.md §2.9),
so the number measures the collective/SPMD overhead of the multi-host code
path, not ICI bandwidth; the same program runs unchanged on a real pod.

Usage: python benchmarks/dist_scaling.py [iters]
Prints one JSON line {metric, value ...} per configuration + the efficiency.
"""

import json
import os
import socket
import subprocess
import sys
import pathlib

REPO = str(pathlib.Path(__file__).resolve().parents[1])

WORKER = r"""
import os, sys, time, json
nproc = int(sys.argv[1]); pid = int(sys.argv[2]); port = sys.argv[3]
iters = int(sys.argv[4]); devs_per_proc = int(sys.argv[5])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           f" --xla_force_host_platform_device_count={devs_per_proc}")
import jax
if nproc > 1:
    jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                               num_processes=nproc, process_id=pid)
import numpy as np
from helib_tpu.context import Context
from helib_tpu.keys import SecKey
from helib_tpu.parallel.distributed import global_mesh, sharded_pipeline

m = int(sys.argv[6]); bits = int(sys.argv[7]); batch = int(sys.argv[8])
ctx = Context(m=m, p=2, r=1, bits=bits, c=3, scheme="bgv")
sk = SecKey(ctx, seed=1)
mesh = global_mesh(limb=2)
jfn, ex = sharded_pipeline(ctx, sk, mesh, global_batch=batch)
with mesh:
    out = jfn(*ex); jax.block_until_ready(out)      # compile
    t0 = time.time()
    for _ in range(iters):
        out = jfn(*ex)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
if pid == 0:
    print(json.dumps({"nproc": nproc, "sec_per_batch": dt}), flush=True)
"""


def run_config(nproc: int, iters: int, m: int = 45, bits: int = 118,
               batch: int = 32) -> float:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    devs_per_proc = 4 // nproc
    script = "/tmp/dist_scaling_worker.py"
    with open(script, "w") as f:
        f.write(WORKER)
    env = dict(os.environ, PYTHONPATH=REPO)
    procs = [subprocess.Popen(
        [sys.executable, script, str(nproc), str(i), port, str(iters),
         str(devs_per_proc), str(m), str(bits), str(batch)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(nproc)]
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(o[-1500:])
    for line in outs[0].splitlines():
        try:
            d = json.loads(line)
            if "sec_per_batch" in d:
                return d["sec_per_batch"]
        except json.JSONDecodeError:
            continue
    raise RuntimeError("no result line:\n" + outs[0][-1000:])


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    # small config (round-2 setting) + big config where per-step compute
    # amortizes the collective overhead (round-3 item 7: the gate must be
    # measured where it CAN pass)
    for tag, m, bits, batch, it in (("small", 45, 118, 32, iters),
                                    ("big", 257, 236, 64, max(2, iters // 2))):
        t1 = run_config(1, it, m, bits, batch)
        t2 = run_config(2, it, m, bits, batch)
        eff = t1 / t2
        print(json.dumps({"metric": f"dist_mult_relin_sec_per_batch_1proc_{tag}",
                          "value": round(t1, 4), "unit": "s"}))
        print(json.dumps({"metric": f"dist_mult_relin_sec_per_batch_2proc_{tag}",
                          "value": round(t2, 4), "unit": "s"}))
        print(json.dumps({"metric": f"dist_scaling_efficiency_2proc_{tag}",
                          "value": round(eff, 3), "unit": "x",
                          "note": "virtual CPU devices; measures "
                                  "SPMD/collective overhead, not ICI"}))


if __name__ == "__main__":
    main()
