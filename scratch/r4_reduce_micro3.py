"""Micro: in-kernel reduction strategies for the J-contraction shapes.

Compares per-apply cost of J^T f + J v at leap shapes (236, 22, 128) inside a
Pallas kernel: usum-tree (current), jnp.sum (native multi_reduction), and
jax.lax dot-general formulations.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from judo_tpu.physics.lane_engine import usum

NEFC, NV, B, LT = 236, 22, 384, 128
T = 100
C = 32
N_APPLY = 14  # ~12 iters + CW


def apply_usum(J, f, v):
    # J^T f
    terms = [usum(J[r0:r0+C] * f[r0:r0+C][:, None, :], 0) for r0 in range(0, NEFC, C)]
    while len(terms) > 1:
        terms = [terms[i] + terms[i+1] for i in range(0, len(terms)-1, 2)] + ([terms[-1]] if len(terms) % 2 else [])
    w = terms[0]
    # J w
    return jnp.concatenate([usum(J[r0:r0+C] * w[None, :, :], 1) for r0 in range(0, NEFC, C)], axis=0)


def apply_jnpsum(J, f, v):
    terms = [jnp.sum(J[r0:r0+C] * f[r0:r0+C][:, None, :], axis=0) for r0 in range(0, NEFC, C)]
    w = sum(terms[1:], terms[0])
    return jnp.concatenate([jnp.sum(J[r0:r0+C] * w[None, :, :], axis=1) for r0 in range(0, NEFC, C)], axis=0)


def apply_full(J, f, v):
    # no chunking at all: (236, 22, 128) product in one go (2.6 MB f32)
    w = jnp.sum(J * f[:, None, :], axis=0)
    return jnp.sum(J * w[None, :, :], axis=1)


def apply_apgd_like(J, f, v):
    # the real APGD body: apply + projection + momentum, fori_loop-wrapped
    reg = jnp.ones((NEFC, LT), jnp.float32) * 0.1
    step = jnp.full((LT,), 1e-3, jnp.float32)
    def body(_, carry):
        fc, y, t = carry
        w = jnp.sum(J * y[:, None, :], axis=0)
        grad = jnp.sum(J * w[None, :, :], axis=1) + reg * y + f
        f_new = jnp.maximum(y - step[None] * grad, 0.0)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = f_new + ((t - 1.0) / t_new)[None] * (f_new - fc)
        restart = jnp.sum(grad * (f_new - fc), axis=0) > 0
        y_new = jnp.where(restart[None], f_new, y_new)
        t_new = jnp.where(restart, jnp.ones_like(t_new), t_new)
        return (f_new, y_new, t_new)
    t0 = jnp.ones((LT,), jnp.float32)
    out = jax.lax.fori_loop(0, N_APPLY, body, (f, f, t0))
    return out[0]

def apply_apgd_unrolled(J, f, v):
    reg = jnp.ones((NEFC, LT), jnp.float32) * 0.1
    step = jnp.full((LT,), 1e-3, jnp.float32)
    fc, y, t = f, f, jnp.ones((LT,), jnp.float32)
    for _ in range(N_APPLY):
        w = jnp.sum(J * y[:, None, :], axis=0)
        grad = jnp.sum(J * w[None, :, :], axis=1) + reg * y + f
        f_new = jnp.maximum(y - step[None] * grad, 0.0)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = f_new + ((t - 1.0) / t_new)[None] * (f_new - fc)
        restart = jnp.sum(grad * (f_new - fc), axis=0) > 0
        y_new = jnp.where(restart[None], f_new, y_new)
        t_new = jnp.where(restart, jnp.ones_like(t_new), t_new)
        fc, y, t = f_new, y_new, t_new
    return fc

VARIANTS = [("apgd fori_loop", None), ("apgd stackedJ", None), ("apgd stackedJ+scratch", None)]

for name, apply in VARIANTS:
    def kernel(J_ref, f_ref, o_ref, Js_ref, name=name, apply=apply):
        f = f_ref[:]
        if name == "apgd fori_loop":
            J = J_ref[:]
        else:
            base = J_ref[:]
            # build J the way assembly does: stack of 236 computed (nv, B) rows
            rows = [base[i] * (1.0 + 1e-6 * i) for i in range(NEFC)]
            J = jnp.stack(rows)
            if name == "apgd stackedJ+scratch":
                Js_ref[:] = J
                J = Js_ref[:]
        f = apply_apgd_like(J, f, None)
        o_ref[:] = f

    def pcall(J, f):
        return pl.pallas_call(
            kernel,
            grid=(B // LT,),
            in_specs=[pl.BlockSpec((NEFC, NV, LT), lambda i: (0, 0, i)),
                      pl.BlockSpec((NEFC, LT), lambda i: (0, i))],
            out_specs=pl.BlockSpec((NEFC, LT), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((NEFC, B), jnp.float32),
            scratch_shapes=[pltpu.VMEM((NEFC, NV, LT), jnp.float32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
        )(J, f)

    @jax.jit
    def loop(key):
        J = jax.random.normal(key, (NEFC, NV, B), jnp.float32)
        f = jnp.ones((NEFC, B), jnp.float32)
        def body(c, _):
            return pcall(J, c), None
        return jax.lax.scan(body, f, None, length=T)[0].sum()

    try:
        t0 = time.time(); jax.block_until_ready(loop(jax.random.key(0))); comp = time.time()-t0
        t0 = time.time()
        outs = [loop(jax.random.key(1+i)) for i in range(8)]
        jax.block_until_ready(outs)
        per = (time.time()-t0)/8/T/N_APPLY*1e6
        print(f"{name:<20} {per:7.2f} us/apply (x{N_APPLY}/step, T={T})  compile {comp:.0f}s", flush=True)
    except Exception as e:
        print(f"{name:<20} FAIL: {type(e).__name__}: {str(e).splitlines()[0][:100]}", flush=True)
