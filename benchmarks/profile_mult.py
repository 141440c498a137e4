import sys, time, pathlib, glob, gzip, json, collections
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np, jax

from helib_tpu.context import Context
from helib_tpu.keys import SecKey
from helib_tpu.pipeline import make_mult_relin

ctx = Context(m=8009, p=2, r=1, bits=380, c=3, scheme="bgv")
sk = SecKey(ctx, seed=3)
fn, ex = make_mult_relin(ctx, sk)
jfn = jax.jit(fn)
r = jfn(*ex); jax.block_until_ready(r)
r = jfn(*ex); jax.block_until_ready(r)

jax.profiler.start_trace("/tmp/jtrace")
for _ in range(10):
    r = jfn(*ex)
jax.block_until_ready(r)
jax.profiler.stop_trace()
print("trace done", flush=True)

# parse trace.json.gz for device op durations
fs = glob.glob("/tmp/jtrace/**/*.trace.json.gz", recursive=True)
print(fs)
ev = collections.Counter()
tot = 0.0
for f in fs:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            pidname = e.get("pid")
            name = e.get("name", "?")
            ev[name] += e["dur"]
top = ev.most_common(40)
for name, dur in top:
    print(f"{dur/1e3:10.2f} ms  {name[:110]}")
