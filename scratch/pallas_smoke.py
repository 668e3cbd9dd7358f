import time, sys
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), flush=True)

# 1. trivial kernel
def k1(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0 + 1.0

x = jnp.ones((8, 128), jnp.float32)
f1 = jax.jit(lambda x: pl.pallas_call(k1, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)], out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))
t0=time.time(); r = f1(x); jax.block_until_ready(r); print("trivial pallas ok", time.time()-t0, float(r[0,0]), flush=True)

# 2. kernel with fori_loop + unrolled python loop (scan-body-like), inside lax.scan
def k2(x_ref, o_ref):
    v = x_ref[:]
    for i in range(50):  # unrolled chain
        v = v * 1.001 + 0.001
    o_ref[:] = v

def step(c, _):
    c = pl.pallas_call(k2, out_shape=jax.ShapeDtypeStruct(c.shape, c.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)], out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(c)
    return c, None

f2 = jax.jit(lambda x: jax.lax.scan(step, x, None, length=100)[0])
t0=time.time(); r = f2(x); jax.block_until_ready(r); print("pallas-in-scan ok", time.time()-t0, flush=True)
ts=[]
for _ in range(20):
    t0=time.time(); jax.block_until_ready(f2(x)); ts.append(time.time()-t0)
print("pallas-in-scan p50 ms:", np.median(ts)*1e3, flush=True)

# 3. bigger kernel with grid + scratch, batch-in-lanes layout (22, 384)
def k3(q_ref, o_ref):
    q = q_ref[:]
    acc = jnp.zeros_like(q)
    for i in range(22):
        acc = acc + q * q[i:i+1, :]
    o_ref[:] = acc

xb = jnp.ones((22, 384), jnp.float32)
f3 = jax.jit(lambda x: pl.pallas_call(k3, out_shape=jax.ShapeDtypeStruct(xb.shape, xb.dtype),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)], out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))
t0=time.time(); r=f3(xb); jax.block_until_ready(r); print("rowbcast kernel ok", time.time()-t0, flush=True)
