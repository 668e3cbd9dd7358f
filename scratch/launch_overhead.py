import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, LT = 384, 100, 128
dt = jnp.float32

def kernel(a_ref, o_ref):
    o_ref[:] = a_ref[:] * 1.000001 + 1e-7

def pcall(x):
    return pl.pallas_call(
        kernel,
        grid=(B // LT,),
        in_specs=[pl.BlockSpec((23, LT), lambda i: (0, i))],
        out_specs=pl.BlockSpec((23, LT), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((23, B), dt),
    )(x)

def loop(x):
    def body(c, _):
        return pcall(c), None
    return jax.lax.scan(body, x, None, length=T)[0]

run = jax.jit(loop)
x = jnp.ones((23, B), dt)
jax.block_until_ready(run(x))
ts = []
for _ in range(30):
    t0 = time.perf_counter(); jax.block_until_ready(run(x)); ts.append(time.perf_counter() - t0)
print(f"trivial pallas scan-{T}: p50 {np.median(ts)*1e3:.2f} ms  ({np.median(ts)*1e6/T:.1f} us/step)", flush=True)

# same but 10 kernels per scan step (does overhead scale with call count?)
def loop10(x):
    def body(c, _):
        for _ in range(10):
            c = pcall(c)
        return c, None
    return jax.lax.scan(body, x, None, length=T)[0]
run10 = jax.jit(loop10)
jax.block_until_ready(run10(x))
ts = []
for _ in range(10):
    t0 = time.perf_counter(); jax.block_until_ready(run10(x)); ts.append(time.perf_counter() - t0)
print(f"10x pallas per step:    p50 {np.median(ts)*1e3:.2f} ms  ({np.median(ts)*1e6/T/10:.1f} us/call)", flush=True)
