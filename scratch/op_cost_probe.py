"""Per-instruction cost model probe: chained elementwise ops on (rows, 128)
tiles inside one Pallas kernel, scanned T times. Measures cycles/op vs row
count — calibrates how much sublane packing / op batching would buy."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 100
NOPS = 2000

for rows in (1, 3, 8, 24):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        x = a
        for i in range(NOPS):
            x = x * b + a  # 1 FMA per element per op
        o_ref[:] = x

    def pcall(a, b):
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec((rows, 128), lambda i: (0, 0)),
                      pl.BlockSpec((rows, 128), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((rows, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        )(a, b)

    def loop(a, b):
        def body(c, _):
            return pcall(c, b), None
        return jax.lax.scan(body, a, None, length=T)[0]

    run = jax.jit(loop)
    a = jnp.full((rows, 128), 0.5, jnp.float32)
    b = jnp.full((rows, 128), 0.999, jnp.float32)
    jax.block_until_ready(run(a, b))
    ts = []
    for _ in range(20):
        t0 = time.perf_counter(); jax.block_until_ready(run(a, b)); ts.append(time.perf_counter() - t0)
    per_step = np.median(ts) / T
    ns_per_op = per_step / NOPS * 1e9
    print(f"rows={rows:3d}: {per_step*1e6:8.1f} us/step  {ns_per_op:6.2f} ns/op  (~{ns_per_op*0.94:5.1f} cyc/op)", flush=True)
