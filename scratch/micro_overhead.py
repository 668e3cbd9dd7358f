"""Microbenchmarks: per-fusion overhead and batched-matvec layouts on the chip.

Decides the optimization direction:
  1. chain of K dependent elementwise ops at (320, 22): per-fusion overhead
  2. APGD-shaped batched matvec chains, batch-first vs batch-last vs pallas
"""
import sys

sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp
import numpy as np

B, E, V, ITERS = 320, 304, 22, 25


def timeit(name, fn, *args, n=20):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    ct = time.time() - t0
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:<44} compile {ct:6.1f}s  p50 {np.median(ts) * 1e3:8.3f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, V)), jnp.float32)

    # 1. sequential elementwise chain: scan of 100 iterations, each ~3 fused ops
    def chain(x):
        def body(c, _):
            c = jnp.tanh(c) * 1.0001 + 0.001
            return c, ()
        return jax.lax.scan(body, x, None, length=1000)[0]
    timeit("1000 seq fused elementwise (320,22)", jax.jit(chain), x)

    # scan of 1000 iterations each containing a LANE-UNFRIENDLY gather+scatter
    idx = jnp.asarray(rng.integers(0, V, V), jnp.int32)
    def chain_gs(x):
        def body(c, _):
            c = c.at[:, idx].add(0.001 * c[:, 0:1])
            return jnp.tanh(c), ()
        return jax.lax.scan(body, x, None, length=1000)[0]
    timeit("1000 seq gather+scatter (320,22)", jax.jit(chain_gs), x)

    # 2. APGD-shaped iteration, batch-first (current formulation)
    J = jnp.asarray(rng.standard_normal((B, E, V)), jnp.float32)
    K = jnp.asarray(rng.standard_normal((B, V, E)) * 0.01, jnp.float32)
    b = jnp.asarray(rng.standard_normal((B, E)), jnp.float32)

    def apgd_bf(J, K, b):
        def body(f, _):
            grad = jnp.einsum("bev,bv->be", J, jnp.einsum("bve,be->bv", K, f)) + b
            return jnp.maximum(f - 0.01 * grad, 0.0), ()
        f0 = jnp.zeros_like(b)
        def step(c, _):
            return jax.lax.scan(body, c, None, length=ITERS)[0], ()
        return jax.lax.scan(step, f0, None, length=100)[0]
    timeit("100x25 APGD einsum batch-first", jax.jit(apgd_bf), J, K, b)

    # batch-last: J (E, V, B), K (V, E, B), b (E, B) -- multiply+reduce form
    Jt = jnp.transpose(J, (1, 2, 0))
    Kt = jnp.transpose(K, (1, 2, 0))
    bt = jnp.transpose(b, (1, 0))

    def apgd_bl(J, K, b):
        def body(f, _):
            v = jnp.sum(K * f[None], axis=1)  # (V, B)
            grad = jnp.sum(J * v[None], axis=1) + b  # (E, B)
            return jnp.maximum(f - 0.01 * grad, 0.0), ()
        f0 = jnp.zeros_like(b)
        def step(c, _):
            return jax.lax.scan(body, c, None, length=ITERS)[0], ()
        return jax.lax.scan(step, f0, None, length=100)[0]
    timeit("100x25 APGD mul+reduce batch-last", jax.jit(apgd_bl), Jt, Kt, bt)

    # batch-first but multiply+reduce (no dot_general)
    def apgd_bf_mr(J, K, b):
        def body(f, _):
            v = jnp.sum(K * f[:, None, :], axis=2)  # (B, V)
            grad = jnp.sum(J * v[:, None, :], axis=2) + b  # (B, E)
            return jnp.maximum(f - 0.01 * grad, 0.0), ()
        f0 = jnp.zeros_like(b)
        def step(c, _):
            return jax.lax.scan(body, c, None, length=ITERS)[0], ()
        return jax.lax.scan(step, f0, None, length=100)[0]
    timeit("100x25 APGD mul+reduce batch-first", jax.jit(apgd_bf_mr), J, K, b)

    # pallas kernel: whole 25-iteration APGD in VMEM, grid over batch
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BB = 8  # batch block

    def apgd_kernel(J_ref, K_ref, b_ref, f_ref):
        Jb = J_ref[:]  # (BB, E, V)
        Kb = K_ref[:]  # (BB, V, E)
        bb = b_ref[:]  # (BB, E)
        def body(i, f):
            v = jnp.einsum("bve,be->bv", Kb, f, preferred_element_type=jnp.float32)
            grad = jnp.einsum("bev,bv->be", Jb, v, preferred_element_type=jnp.float32) + bb
            return jnp.maximum(f - 0.01 * grad, 0.0)
        f_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros_like(bb))

    def apgd_pl(J, K, b):
        call = pl.pallas_call(
            apgd_kernel,
            out_shape=jax.ShapeDtypeStruct((B, E), jnp.float32),
            grid=(B // BB,),
            in_specs=[
                pl.BlockSpec((BB, E, V), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BB, V, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BB, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BB, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )
        def step(c, _):
            return call(J, K, b + 0.0 * c), ()
        return jax.lax.scan(step, b, None, length=100)[0]
    try:
        timeit("100x25 APGD pallas (BB=8 batch-first)", jax.jit(apgd_pl), J, K, b)
    except Exception as e:  # noqa: BLE001
        print("pallas batch-first failed:", str(e)[:500], flush=True)


if __name__ == "__main__":
    main()
