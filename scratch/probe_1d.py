import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl

T, NOPS, LT = 100, 1000, 128

def run_case(name, shape, mk_body):
    def kernel(a_ref, o_ref):
        o_ref[:] = mk_body(a_ref[:])
    def pcall(x):
        return pl.pallas_call(
            kernel, grid=(1,),
            in_specs=[pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))],
            out_specs=pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape)),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        )(x)
    run = jax.jit(lambda x: jax.lax.scan(lambda c, _: (pcall(c), None), x, None, length=T)[0])
    x = jnp.full(shape, 0.7, jnp.float32)
    try:
        jax.block_until_ready(run(x))
        ts = []
        for _ in range(20):
            t0 = time.perf_counter(); jax.block_until_ready(run(x)); ts.append(time.perf_counter() - t0)
        print(f"{name:<24} {np.median(ts)/T/NOPS*1e9:8.2f} ns/op", flush=True)
    except Exception as e:
        print(f"{name:<24} FAIL {str(e).splitlines()[0][:90]}", flush=True)

def chain(v):
    for _ in range(NOPS):
        v = v * 0.999 + 1e-6
    return v

run_case("1d (128,) chain", (128,), chain)
run_case("2d (1,128) chain", (1, 128), chain)

# mixed 1d ops with slicing from a 2d input (kinematics pattern)
def kin_like(a):  # a: (23,128)
    v = a[0]
    w = a[1]
    for _ in range(NOPS // 2):
        u = v * w + a[2]
        v = w * 0.99 + u
        w = u * v * 0.5
    return a + 1e-12 * v[None]
run_case("2d in, 1d rows chain", (23, 128), kin_like)
