"""Micro: in-kernel cost of a DEPENDENT op chain at shapes (B,), (4,B), (8,B).

If (kL, B)-shaped dependent ops cost ~the same per op as (B,) ones, then
level-batching the kinematics tree (all 4 leap fingers as one (4, B) chain)
divides the latency-bound chain time by ~4.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os
B, T = 384, int(_os.environ.get('T','100'))
LT = 128
import os
N_OPS = int(os.environ.get('N_OPS', '2000'))

for rows in (1,):
    def kernel(x_ref, o_ref, rows=rows):
        x = x_ref[:]  # (rows, LT)
        # dependent chain: each op needs the previous result
        for i in range(N_OPS):
            x = x + 1e-3 * (x * x) - 1e-3 * x  # nonlinear: not constant-foldable
        o_ref[:] = x

    def pcall(x):
        return pl.pallas_call(
            kernel,
            grid=(B // LT,),
            in_specs=[pl.BlockSpec((rows, LT), lambda i: (0, i))],
            out_specs=pl.BlockSpec((rows, LT), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((rows, B), jnp.float32),
        )(x)

    def loop(x):
        def body(c, _):
            return pcall(c), None
        return jax.lax.scan(body, x, None, length=T)[0]

    run = jax.jit(loop)
    x0 = jnp.ones((rows, B), jnp.float32)
    t0 = time.time(); jax.block_until_ready(run(x0)); comp = time.time() - t0
    ts = []
    for _ in range(10):
        t0 = time.time(); jax.block_until_ready(run(x0)); ts.append(time.time() - t0)
    per_step = np.median(ts) / T
    print(f"rows={rows}: {per_step*1e6:8.2f} us/step  ({per_step/N_OPS*1e9/ (B//LT):6.2f} ns/op/tile)  compile {comp:.1f}s", flush=True)
