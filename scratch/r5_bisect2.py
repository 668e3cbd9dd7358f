"""Bisect scratch-empty (40ms) vs standalone-empty (0.06ms)."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MODE = sys.argv[1] if len(sys.argv) > 1 else "exact"

if MODE in ("exact", "noimport"):
    if MODE == "exact":
        from judo_tpu.tasks.leap_cube import LeapCube
        task = LeapCube()
        pm = task.planning_model
        nq, nv, nu = pm.nq, pm.nv, pm.nu
        data_qpos = np.asarray(task.data.qpos)
        mid = 0.5 * (task.actuator_ctrlrange[:, 0] + task.actuator_ctrlrange[:, 1])
    else:
        nq, nv, nu = 23, 22, 16
        data_qpos = np.linspace(0, 1, nq)
        mid = np.zeros(nu)
    nefc = 236
    T, TILE, B = 100, 128, 384
    h = 0.01

    def step(qp, qv, ctrl, f, v):
        qvn = qv * 0.999 + 1e-9 * jnp.sum(ctrl, axis=0)[None]
        return qp + 1e-9 * jnp.sum(qvn, axis=0)[None], qvn, f, v

    def kernel(qpos_ref, qvel_ref, ctrl_ref, oq_ref, ov_ref, qp_s, qv_s, f_s, v_s):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            qp_s[:] = qpos_ref[:]
            qv_s[:] = qvel_ref[:]
            f_s[:] = jnp.zeros_like(f_s)
            v_s[:] = jnp.ones_like(v_s)

        qp, qv, f, v = qp_s[:], qv_s[:], f_s[:], v_s[:]
        qp, qv, f, v = step(qp, qv, ctrl_ref[0], f, v)
        qp_s[:], qv_s[:] = qp, qv
        f_s[:] = f * 0 + f if f.shape == f_s.shape else f_s[:]
        v_s[:] = v if v.shape == v_s.shape else v_s[:]
        oq_ref[0] = qp
        ov_ref[0] = qv

    def rollout(qpos, qvel, ctrl):
        grid = (B // TILE, T)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((nq, TILE), lambda i, t: (0, i)),
                pl.BlockSpec((nv, TILE), lambda i, t: (0, i)),
                pl.BlockSpec((1, nu, TILE), lambda i, t: (t, 0, i)),
            ],
            out_specs=(
                pl.BlockSpec((1, nq, TILE), lambda i, t: (t, 0, i)),
                pl.BlockSpec((1, nv, TILE), lambda i, t: (t, 0, i)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((T, nq, B), jnp.float32),
                jax.ShapeDtypeStruct((T, nv, B), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((nq, TILE), jnp.float32),
                pltpu.VMEM((nv, TILE), jnp.float32),
                pltpu.VMEM((nefc, TILE), jnp.float32),
                pltpu.VMEM((nefc, TILE), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    pltpu.GridDimensionSemantics.ARBITRARY,
                    pltpu.GridDimensionSemantics.ARBITRARY,
                ),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(qpos, qvel, ctrl)

    rng = np.random.default_rng(0)
    qp0 = jnp.asarray(np.tile(data_qpos, (B, 1)).T, jnp.float32)
    qv0 = jnp.zeros((nv, B), jnp.float32)
    ct = jnp.asarray((mid[None, :, None] + 0.1 * rng.standard_normal((T, nu, B))), jnp.float32)

    roll = jax.jit(rollout)
    t0 = time.perf_counter()
    out = roll(qp0, qv0, ct)
    jax.block_until_ready(out)
    print(f"compile {time.perf_counter()-t0:.1f}s", flush=True)
    ts, outs = [], []
    for _ in range(25):
        t0 = time.perf_counter()
        outs.append(roll(qp0, qv0, ct))
        if len(outs) > 2:
            jax.block_until_ready(outs.pop(0))
        ts.append(time.perf_counter() - t0)
    jax.block_until_ready(outs)
    print(f"{MODE}: p50 {np.median(ts)*1e3:8.2f} ms/call", flush=True)
