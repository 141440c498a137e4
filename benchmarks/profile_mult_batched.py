"""Device-time breakdown of the BATCHED headline step (m=8009, batch-16
mult+relin) — names where the 45.6 ms/step goes, kernel vs XLA fusions.

The round-3 roofline attributed the kernel gap to concat materializations;
the v2 (block-list) kernel removed them and measured a TIE at realistic
shapes (results_r5.log kernel_v2), so the attribution needs re-deriving
from a fresh trace of the real pipeline.

Run: python benchmarks/profile_mult_batched.py [B]
"""

import sys, time, pathlib, glob, gzip, json, collections
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np, jax

from helib_tpu.context import Context
from helib_tpu.keys import SecKey
from helib_tpu.pipeline import make_batched_mult_relin
from helib_tpu.jitutil import lifted_jit

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
t0 = time.time()
ctx = Context(m=8009, p=2, r=1, bits=380, c=3, scheme="bgv")
sk = SecKey(ctx, seed=3)
fn, args = make_batched_mult_relin(ctx, sk, B)
jfn = lifted_jit(fn, *args)
r = jfn(*args); jax.block_until_ready(r)
r = jfn(*args); jax.block_until_ready(r)
print(f"setup+compile {time.time()-t0:.1f}s", flush=True)

ITERS = 10
t0 = time.time()
o0, o1 = jfn(*args)
for _ in range(ITERS - 1):
    o0, o1 = jfn(o0, o1, args[2], args[3])
jax.block_until_ready((o0, o1))
step = (time.time() - t0) / ITERS
print(f"steady step {step*1e3:.2f} ms  ({step/B*1e3:.3f} ms/op at B={B})",
      flush=True)

jax.profiler.start_trace("/tmp/jtrace_b")
o0, o1 = jfn(*args)
for _ in range(4):
    o0, o1 = jfn(o0, o1, args[2], args[3])
jax.block_until_ready((o0, o1))
jax.profiler.stop_trace()

fs = glob.glob("/tmp/jtrace_b/**/*.trace.json.gz", recursive=True)
ev = collections.Counter()
pid_names = {}
for f in fs:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e.get("args", {}).get("name", "")
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            pn = pid_names.get(e.get("pid"), "")
            if "TPU" in pn or "tpu" in pn or "/device" in pn.lower():
                ev[e.get("name", "?")] += e["dur"]
tot = sum(ev.values())
print(f"total device time {tot/1e3:.2f} ms over 5 steps")
for name, dur in ev.most_common(30):
    print(f"{dur/1e3:10.2f} ms  {100*dur/max(tot,1):5.1f}%  {name[:100]}")
