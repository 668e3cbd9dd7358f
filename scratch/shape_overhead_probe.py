import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl

B, T, LT = 384, 100, 128
dt = jnp.float32
nq, nv, nu, nefc = 23, 22, 16, 304

def kernel(qp, qv, ct, f, oq, ov, of_):
    oq[:] = qp[:] * 1.000001
    ov[:] = qv[:] + 1e-9
    of_[:] = f[:] * 0.999999 + ct[0, :][None] * 1e-9

def pcall(qp, qv, ct, f):
    return pl.pallas_call(
        kernel,
        grid=(B // LT,),
        in_specs=[pl.BlockSpec((nq, LT), lambda i: (0, i)),
                  pl.BlockSpec((nv, LT), lambda i: (0, i)),
                  pl.BlockSpec((nu, LT), lambda i: (0, i)),
                  pl.BlockSpec((nefc, LT), lambda i: (0, i))],
        out_specs=(pl.BlockSpec((nq, LT), lambda i: (0, i)),
                   pl.BlockSpec((nv, LT), lambda i: (0, i)),
                   pl.BlockSpec((nefc, LT), lambda i: (0, i))),
        out_shape=(jax.ShapeDtypeStruct((nq, B), dt),
                   jax.ShapeDtypeStruct((nv, B), dt),
                   jax.ShapeDtypeStruct((nefc, B), dt)),
    )(qp, qv, ct, f)

def loop(qp, qv, ct, f):
    def body(c, _):
        a, b_, c_ = pcall(c[0], c[1], ct, c[2])
        return (a, b_, c_), None
    return jax.lax.scan(body, (qp, qv, f), None, length=T)[0][0]

run = jax.jit(loop)
qp = jnp.ones((nq, B), dt); qv = jnp.zeros((nv, B), dt)
ct = jnp.ones((nu, B), dt); f = jnp.zeros((nefc, B), dt)
jax.block_until_ready(run(qp, qv, ct, f))
ts = []
for _ in range(30):
    t0 = time.perf_counter(); jax.block_until_ready(run(qp, qv, ct, f)); ts.append(time.perf_counter() - t0)
print(f"shape-realistic trivial pallas scan-{T}: p50 {np.median(ts)*1e3:.2f} ms ({np.median(ts)*1e6/T:.1f} us/step)", flush=True)
