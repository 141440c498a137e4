"""Bisect the m=31775 recrypt TPU-worker crash: run rt_scale_down (the
extract-digits mod-down) standalone at every (k, special, new_k) shape the
digit-extraction ladder visits, each a fresh compile + execution at
B=65536.  A kernel fault pins the failing shape.

Usage: python benchmarks/bisect_scaledown.py [m] [bits]
"""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 31775
    bits = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    from helib_tpu.context import Context
    from helib_tpu import dcrt

    t0 = time.time()
    ctx = Context(m=m, p=2, r=1, bits=bits, c=3, scheme="bgv")
    print(f"context: {time.time()-t0:.1f}s L={ctx.L} S={ctx.S} "
          f"N={ctx.n_eval}", flush=True)
    rng = np.random.default_rng(0)

    def mk(k, special):
        rows = ctx.rows_of(k, special)
        qs = ctx.all_q[np.array(rows)]
        return jnp.asarray(rng.integers(
            0, qs[:, None].astype(np.int64),
            (len(rows), ctx.n_eval)).astype(np.uint32))

    cases = []
    # drop-special mod-down at every k (the KS exit path)
    for k in range(ctx.L, 1, -1):
        cases.append((k, True, k, False))
    # level-drop mod-down at every k (the ladder's add/sub alignment path)
    for k in range(ctx.L, 2, -1):
        cases.append((k, False, k - 1, False))
    for pspace in (2, 4):
        pass
    for i, (k, sp, nk, nsp) in enumerate(cases):
        t0 = time.time()
        x = mk(k, sp)
        try:
            out = dcrt.rt_scale_down(ctx, x, k, sp, nk, nsp, 4)
            jax.block_until_ready(out)
            print(f"[{i+1}/{len(cases)}] k={k} sp={sp} -> k={nk}: OK "
                  f"{time.time()-t0:.1f}s", flush=True)
        except Exception as exc:
            print(f"[{i+1}/{len(cases)}] k={k} sp={sp} -> k={nk}: "
                  f"FAILED {type(exc).__name__}: {str(exc)[:300]}",
                  flush=True)
            raise
    print("all scale_down shapes OK", flush=True)


if __name__ == "__main__":
    main()
