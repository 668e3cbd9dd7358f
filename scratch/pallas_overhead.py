import time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def bench(name, f, *args, n=30):
    t0=time.time(); jax.block_until_ready(f(*args)); c=time.time()-t0
    ts=[]
    for _ in range(n):
        t0=time.time(); jax.block_until_ready(f(*args)); ts.append(time.time()-t0)
    print(f"{name:<42} compile {c:6.1f}s  p50 {np.median(ts)*1e3:9.3f} ms", flush=True)

x = jnp.ones((8,128), jnp.float32)

def k_chain(x_ref, o_ref):
    v = x_ref[:]
    for _ in range(50):
        v = v * 1.001 + 0.001
    o_ref[:] = v

def pcall(k, xx):
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(xx.shape, xx.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)], out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(xx)

# a) single call
bench("single pallas call (50-op chain)", jax.jit(lambda x: pcall(k_chain, x)), x)

# b) 100 sequential pallas calls via scan
def step(c,_): return pcall(k_chain, c), None
bench("scan of 100 pallas calls", jax.jit(lambda x: jax.lax.scan(step, x, None, length=100)[0]), x)

# c) 100 sequential pallas calls unrolled in jit
def unrolled(x):
    for _ in range(100):
        x = pcall(k_chain, x)
    return x
bench("100 pallas calls unrolled", jax.jit(unrolled), x)

# d) same work, fori_loop INSIDE one kernel
def k_loop(x_ref, o_ref):
    def body(i, v):
        for _ in range(50):
            v = v * 1.001 + 0.001
        return v
    o_ref[:] = jax.lax.fori_loop(0, 100, body, x_ref[:])
bench("1 pallas call, fori_loop(100) inside", jax.jit(lambda x: pcall(k_loop, x)), x)

# e) XLA scan of the same chain (no pallas)
def xstep(c,_):
    v=c
    for _ in range(50):
        v = v*1.001+0.001
    return v, None
bench("XLA scan of 100x50-op chain", jax.jit(lambda x: jax.lax.scan(xstep, x, None, length=100)[0]), x)

# f) empty jit dispatch baseline
bench("jit identity+1", jax.jit(lambda x: x+1.0), x)
