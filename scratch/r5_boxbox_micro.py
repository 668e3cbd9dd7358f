"""Microscope on the stacked box-box kernel: cumulative-stage timing inside a
T-loop pallas kernel at production-like shapes (P=15, B=128, T=300)."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

float(np.asarray(jnp.asarray(0.01)))

import judo_tpu.physics.lane_collision as lc
from judo_tpu.physics.lane_engine import const_col, l_cross, l_dot3, usum

P, B, T = 15, 128, 300
dtype = jnp.float32


def boxbox_stage(stage, x1, m1, s1, x2, m2, s2):
    """Replicates _k_box_box up to `stage`, consuming intermediates."""
    d_vec = x2 - x1
    size1 = [lc._s(s1, i) for i in range(3)]
    size2 = [lc._s(s2, i) for i in range(3)]
    cols1 = jnp.stack([lc._col(m1, i) for i in range(3)])
    cols2 = jnp.stack([lc._col(m2, j) for j in range(3)])
    cr = l_cross(cols1[:, None], cols2[None])
    axes_s = jnp.concatenate([cols1, cols2, cr.reshape(9, *cr.shape[2:])], axis=0)
    nrm = jnp.sqrt(jnp.maximum(l_dot3(axes_s, axes_s), 1e-24))
    an_s = axes_s / jnp.maximum(nrm, 1e-12)[..., None, :]
    if stage == "axes":
        return usum(usum(an_s, 0), 1) + usum(nrm, 0)  # (P, B) consume
    p1 = sum(size1[i] * jnp.abs(l_dot3(an_s, cols1[i][None])) for i in range(3))
    p2 = sum(size2[j] * jnp.abs(l_dot3(an_s, cols2[j][None])) for j in range(3))
    seps_s = jnp.abs(l_dot3(an_s, d_vec[None])) - p1 - p2
    if stage == "seps":
        return usum(seps_s, 0)
    out = lc._k_box_box(x1, m1, s1, x2, m2, s2)
    acc = 0.0
    for d, p, n in out:
        acc = acc + d + usum(p, -2) + usum(n, -2)
    return acc


def build(stage):
    def kernel(x1_ref, q_ref, o_ref, s):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            s[:] = x1_ref[:]

        x1 = s[:][:, :3, :]  # (P, 3, B) evolving
        x2 = s[:][:, 3:6, :]
        m1c = q_ref[:][:, :9, :].reshape(P, 3, 3, B)
        m2c = q_ref[:][:, 9:, :].reshape(P, 3, 3, B)
        s1 = tuple(const_col(np.full(P, 0.03), dtype) for _ in range(3))
        s2 = tuple(const_col(np.full(P, 0.04), dtype) for _ in range(3))
        r = boxbox_stage(stage, x1, m1c, s1, x2, m2c, s2)
        upd = 1e-9 * usum(r, 0)[None]  # (1, B) consume
        s[:] = s[:] * (1.0 + 1e-12) + upd[None]
        o_ref[0] = s[:][:, 0, :]

    def f(x1, q):
        return pl.pallas_call(
            kernel, grid=(T,),
            in_specs=[pl.BlockSpec((P, 6, B), lambda t: (0, 0, 0)),
                      pl.BlockSpec((P, 18, B), lambda t: (0, 0, 0))],
            out_specs=pl.BlockSpec((1, P, B), lambda t: (t, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((T, P, B), dtype),
            scratch_shapes=[pltpu.VMEM((P, 6, B), dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(pltpu.GridDimensionSemantics.ARBITRARY,),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x1, q)
    return jax.jit(f)


rng = np.random.default_rng(0)
x = jax.device_put(jnp.asarray(0.1 * rng.standard_normal((P, 6, B)), dtype))
# orthonormal-ish rotation columns
q = jax.device_put(jnp.asarray(np.tile(np.eye(3).reshape(9, 1), (P, 2, B)).reshape(P, 18, B)
                               + 0.01 * rng.standard_normal((P, 18, B)), dtype))

for stage in ("axes", "seps", "full"):
    fn = build(stage)
    t0 = time.perf_counter()
    jax.block_until_ready(fn(x, q))
    comp = time.perf_counter() - t0
    K = 10
    t0 = time.perf_counter()
    outs = [fn(x, q) for _ in range(K)]
    jax.block_until_ready(outs[-1])
    tot = (time.perf_counter() - t0) / K * 1e3
    print(f"{stage:6s}: {tot:8.2f} ms/call ({tot/T*1e3:6.1f} us/step)  compile {comp:.0f}s", flush=True)
