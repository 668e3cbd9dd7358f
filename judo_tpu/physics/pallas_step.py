"""Pallas TPU kernel wrapping the lanes physics step, and the batched rollout.

One `pl.pallas_call` = one physics step for a whole batch: the grid tiles the
batch across 128-lane blocks, every intermediate of the ~2k-op step lives in
VMEM/registers, and XLA sees a single opaque op per step — eliminating the
fusion-boundary/HBM-round-trip overhead that dominates the vmap(step)
formulation (lane_engine.py docstring; measured ~10-50x overhead at batch 320
on v5e, scratch/profile_out.txt).

Three interchangeable backends, same numerics:
- "pallas":   Mosaic-compiled TPU kernel (the production path)
- "interpret": pallas interpreter (tests the kernel plumbing on CPU)
- "xla":      step_l called directly under jit (CPU fallback / parity ref)

Replaces: the reference's threaded rollout loops
(judo/utils/mj_rollout_backend.py:84, mujoco_extensions .. system_class.cpp:272-331).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from judo_tpu.physics.lane_step import step_l
from judo_tpu.physics.model import PhysicsModel
from judo_tpu.physics.solver import num_constraint_rows

LANE_TILE = 128


def pick_lane_tile(B: int, cap: int = 128) -> int:
    """Batch-tile (multiple of 128, <= cap) dividing B.

    128 stays optimal (re-measured r5, scratch/r5_ab2.py): a 384-lane tile
    is ~9% slower than three 128-lane tiles advancing as independent SSA
    chains in one kernel body (_build_fused_rollout) — the step is bound by
    dependent-op latency, which wider ops do not shorten, while separate
    chains interleave through the VPU pipeline.
    """
    for t in range(cap, 0, -LANE_TILE):
        if B % t == 0:
            return t
    return LANE_TILE

# XLA compiler options for any jit that closes over the Pallas step: the
# fused contact step's live set peaks ~27 MB, above the 16 MB default
# scoped-vmem budget XLA grants the enclosing fusion (v5e VMEM is 128 MB).
# Pass to jax.jit(..., compiler_options=LANE_COMPILER_OPTIONS); the local
# XLA_FLAGS env route aborts CPU-only client processes (unknown TPU flag).
LANE_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": 98304}


def lane_supported(m: PhysicsModel) -> bool:
    """True when every model feature is covered by the lanes step (same
    narrowphase coverage as the XLA path; unsupported pair types would be
    silently dropped there, so require exact coverage here)."""
    from judo_tpu.physics.collision import _KERNELS
    from judo_tpu.physics.model import EQ_JOINT

    for g1, g2 in m.collision_pairs:
        if (m.geom_type[g1], m.geom_type[g2]) not in _KERNELS:
            return False
    for e in range(m.neq):
        if m.eq_type[e] != EQ_JOINT:
            return False
    return True


def _build_pallas_step(m: PhysicsModel, iterations: int | None, interpret: bool, lipschitz: str = "cw"):
    """Pallas step builder for one model (cheap closure construction; the
    expensive tracing/compilation is cached by the caller's jit)."""
    from jax.experimental import pallas as pl

    nefc = num_constraint_rows(m)
    nq, nv, nu, ns = m.nq, m.nv, m.nu, m.nsensordata

    def kernel(qpos_ref, qvel_ref, ctrl_ref, f_ref, oq_ref, ov_ref, os_ref, of_ref):
        out = step_l(
            m,
            qpos_ref[:],
            qvel_ref[:],
            ctrl_ref[:],
            f_ref[:] if nefc else None,
            solver_iterations=iterations,
            lipschitz=lipschitz,
            in_pallas=not interpret,
        )
        oq_ref[:] = out.qpos
        ov_ref[:] = out.qvel
        os_ref[:] = out.sensordata if ns else jnp.zeros_like(os_ref)
        of_ref[:] = out.efc_force if nefc else jnp.zeros_like(of_ref)

    def step_fn(qpos, qvel, ctrl, f):
        B = qpos.shape[-1]
        assert B % LANE_TILE == 0, f"lane batch {B} must be a multiple of {LANE_TILE}"
        dtype = qpos.dtype
        grid = (B // LANE_TILE,)

        in_specs = [
            pl.BlockSpec((nq, LANE_TILE), lambda i: (0, i)),
            pl.BlockSpec((nv, LANE_TILE), lambda i: (0, i)),
            pl.BlockSpec((max(nu, 1), LANE_TILE), lambda i: (0, i)),
            pl.BlockSpec((max(nefc, 1), LANE_TILE), lambda i: (0, i)),
        ]
        out_specs = (
            pl.BlockSpec((nq, LANE_TILE), lambda i: (0, i)),
            pl.BlockSpec((nv, LANE_TILE), lambda i: (0, i)),
            pl.BlockSpec((max(ns, 1), LANE_TILE), lambda i: (0, i)),
            pl.BlockSpec((max(nefc, 1), LANE_TILE), lambda i: (0, i)),
        )
        out_shape = (
            jax.ShapeDtypeStruct((nq, B), dtype),
            jax.ShapeDtypeStruct((nv, B), dtype),
            jax.ShapeDtypeStruct((max(ns, 1), B), dtype),
            jax.ShapeDtypeStruct((max(nefc, 1), B), dtype),
        )
        if nu == 0:
            ctrl = jnp.zeros((1, B), dtype)
        if nefc == 0:
            f = jnp.zeros((1, B), dtype)
        from jax.experimental.pallas import tpu as pltpu

        # The contact-rich step's live set peaks above the 16 MB default
        # scoped-vmem limit (leap_cube: ~27 MB); v5e VMEM is 128 MB, so lift
        # the cap for this kernel rather than spilling stages through HBM.
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(qpos, qvel, ctrl, f)

    return step_fn


def _xla_step_fn(m: PhysicsModel, iterations: int | None, lipschitz: str = "cw"):
    nefc = num_constraint_rows(m)
    ns = m.nsensordata

    def step_fn(qpos, qvel, ctrl, f, v):
        out = step_l(
            m, qpos, qvel, ctrl, f if nefc else None,
            solver_iterations=iterations, lipschitz=lipschitz,
            cw_v=v if nefc else None,
        )
        B = qpos.shape[-1]
        sens = out.sensordata if ns else jnp.zeros((1, B), qpos.dtype)
        fo = out.efc_force if nefc else jnp.zeros((1, B), qpos.dtype)
        vo = out.cw_v if nefc else jnp.zeros((1, B), qpos.dtype)
        return out.qpos, out.qvel, sens, fo, vo

    return step_fn


def _build_fused_rollout(
    m: PhysicsModel,
    T: int,
    substeps: int,
    iterations: int | None,
    interpret: bool,
    lipschitz: str = "cw",
):
    """The WHOLE rollout as one ``pallas_call``.

    Grid = (T,): each grid step advances ALL batch tiles one physics step
    (x substeps), with every 128-lane tile carried as its own independent
    SSA chain through per-tile VMEM scratch (see the in-kernel note on
    dependent-op latency). Controls stream in per-step blocks from HBM;
    per-step states/sensors stream out. Versus scan(pallas_call) this
    removes the per-step kernel launch + HBM carry round-trip entirely —
    measured ~60% of rollout wall time at leap_cube sizes (VERDICT r3;
    scratch/r4_prof.py) — and XLA sees a single opaque op for the whole
    rollout, which also slashes compile time.

    Replaces: the reference's per-candidate rollout thread loop
    (judo/utils/mj_rollout_backend.py:84, system_class.cpp:272-331).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nefc = num_constraint_rows(m)
    nq, nv, nu, ns = m.nq, m.nv, m.nu, m.nsensordata
    nefc_ = max(nefc, 1)
    nu_ = max(nu, 1)
    ns_ = max(ns, 1)

    def make_kernel(n_chains: int, tile: int):
        def kernel(qpos_ref, qvel_ref, ctrl_ref, f0_ref, oq_ref, ov_ref, os_ref, of0_ref, *scratch):
            # per-chain scratch: [qp, qv, f, v] x n_chains
            t = pl.program_id(0)

            @pl.when(t == 0)
            def _init():  # load initial states + onset warm-starts
                for c in range(n_chains):
                    qp_s, qv_s, f_s, v_s = scratch[4 * c : 4 * c + 4]
                    lo = c * tile
                    qp_s[:] = qpos_ref[:, lo : lo + tile]
                    qv_s[:] = qvel_ref[:, lo : lo + tile]
                    # onset warm start: the caller-carried step-0 forces of
                    # the PREVIOUS solve (the plant state one control cycle
                    # ago) — the TPU analogue of mjData's efc warm-start
                    # persisting across the reference's per-thread rollouts.
                    # Zeros (cold) when no carry exists.
                    f_s[:] = f0_ref[:, lo : lo + tile]
                    v_s[:] = jnp.ones_like(v_s)  # CW probe: any positive start

            # the n_chains batch tiles advance as INDEPENDENT SSA chains in
            # one kernel body: the VPU dependent-op latency (~0.7 us through
            # Mosaic) is the binding constraint on this step, and independent
            # chains interleave through the pipeline (measured 1.4x on the
            # dependency-chain microbenchmark, scratch/r5_*; a lane-wider
            # tile does NOT achieve this — the chain length is unchanged)
            for c in range(n_chains):
                qp_s, qv_s, f_s, v_s = scratch[4 * c : 4 * c + 4]
                lo = c * tile
                qp, qv, f, v = qp_s[:], qv_s[:], f_s[:], v_s[:]
                ctrl = ctrl_ref[0, :, lo : lo + tile]
                sens = None
                for _ in range(substeps):
                    out = step_l(
                        m, qp, qv, ctrl,
                        f if nefc else None,
                        solver_iterations=iterations,
                        lipschitz=lipschitz,
                        cw_v=v if nefc else None,
                        in_pallas=not interpret,
                    )
                    qp, qv, sens = out.qpos, out.qvel, out.sensordata
                    f = out.efc_force if nefc else f
                    v = out.cw_v if nefc else v
                qp_s[:] = qp
                qv_s[:] = qv
                f_s[:] = f
                v_s[:] = v
                oq_ref[0, :, lo : lo + tile] = qp
                ov_ref[0, :, lo : lo + tile] = qv
                os_ref[0, :, lo : lo + tile] = (
                    sens if ns else jnp.zeros((ns_, tile), qp.dtype)
                )

                @pl.when(t == 0)
                def _save_onset():  # step-0 forces -> next solve's warm start
                    of0_ref[:, lo : lo + tile] = f if nefc else jnp.zeros((1, tile), qp.dtype)

        return kernel

    def rollout_fn(qpos, qvel, ctrl, f0):
        """(nq, B), (nv, B), (T, nu_, B), (nefc_, B) ->
        ((T, nq, B), (T, nv, B), (T, ns_, B), (nefc_, B))."""
        B = qpos.shape[-1]
        assert B % LANE_TILE == 0, f"lane batch {B} must be a multiple of {LANE_TILE}"
        dtype = qpos.dtype
        tile = pick_lane_tile(B)
        n_chains = B // tile
        grid = (T,)
        in_specs = [
            pl.BlockSpec((nq, B), lambda t: (0, 0)),
            pl.BlockSpec((nv, B), lambda t: (0, 0)),
            pl.BlockSpec((1, nu_, B), lambda t: (t, 0, 0)),
            pl.BlockSpec((nefc_, B), lambda t: (0, 0)),
        ]
        out_specs = (
            pl.BlockSpec((1, nq, B), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, nv, B), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, ns_, B), lambda t: (t, 0, 0)),
            pl.BlockSpec((nefc_, B), lambda t: (0, 0)),
        )
        out_shape = (
            jax.ShapeDtypeStruct((T, nq, B), dtype),
            jax.ShapeDtypeStruct((T, nv, B), dtype),
            jax.ShapeDtypeStruct((T, ns_, B), dtype),
            jax.ShapeDtypeStruct((nefc_, B), dtype),
        )
        scratch_shapes = [
            s
            for _ in range(n_chains)
            for s in (
                pltpu.VMEM((nq, tile), dtype),
                pltpu.VMEM((nv, tile), dtype),
                pltpu.VMEM((nefc_, tile), dtype),
                pltpu.VMEM((nefc_, tile), dtype),  # carried CW probe vector
            )
        ]
        return pl.pallas_call(
            make_kernel(n_chains, tile),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                # T-carry in scratch requires sequential grid traversal
                dimension_semantics=(pltpu.GridDimensionSemantics.ARBITRARY,),
                # contact-rich step live set peaks ~27 MB/tile (v5e VMEM: 128)
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(qpos, qvel, ctrl, f0)

    return rollout_fn


def _build_fused_policy_rollout(
    m: PhysicsModel,
    policy,
    T: int,
    substeps: int,
    iterations: int | None,
    interpret: bool,
):
    """The WHOLE policy-in-the-loop rollout as one ``pallas_call``.

    Same structure as _build_fused_rollout (grid (tiles, T), VMEM-carried
    state), with per-step COMMANDS streamed instead of ctrl: the kernel body
    runs obs -> locomotion MLP -> ctrl mapping -> ``substeps`` physics steps,
    carrying the 12-dim policy output per lane in VMEM scratch. The MLP
    weights close over the kernel as constants (~840 KB f32 — loaded to VMEM
    once per tile).

    Replaces: the reference's C++ System::rollout policy threads
    (mujoco_extensions/system/system_class.cpp:272-331) — and the 125 ms
    cutoff watchdog becomes a deterministic budget by construction.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from judo_tpu.tasks.spot.policy_lanes import (
        SpotPolicyLanes,
        lanes_weight_tensors,
        spot_policy_step_l,
    )

    nefc = num_constraint_rows(m)
    nq, nv, ns = m.nq, m.nv, m.nsensordata
    ncmd = 25
    nefc_ = max(nefc, 1)
    ns_ = max(ns, 1)
    waugs_np = lanes_weight_tensors(policy)  # [W^T | b] per layer, host
    acts = tuple(policy.mlp.activations)
    n_layers = len(waugs_np)

    def kernel(qpos_ref, qvel_ref, pout0_ref, cmd_ref, *rest):
        w_refs = rest[:n_layers]
        oq_ref, ov_ref, os_ref, op_ref, qp_s, qv_s, po_s, f_s, v_s = rest[n_layers:]
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            qp_s[:] = qpos_ref[:]
            qv_s[:] = qvel_ref[:]
            po_s[:] = pout0_ref[:]
            f_s[:] = jnp.zeros_like(f_s)
            v_s[:] = jnp.ones_like(v_s)

        lp = SpotPolicyLanes(waugs=tuple(w[:] for w in w_refs), acts=acts)
        out = spot_policy_step_l(
            m, lp, qp_s[:], qv_s[:], cmd_ref[0], po_s[:],
            physics_substeps=substeps,
            f_warm=f_s[:] if nefc else None,
            cw_v=v_s[:] if nefc else None,
            solver_iterations=iterations,
            in_pallas=not interpret,
        )
        qp_s[:] = out.qpos
        qv_s[:] = out.qvel
        po_s[:] = out.policy_output
        if nefc:
            f_s[:] = out.efc_force
            v_s[:] = out.cw_v
        oq_ref[0] = out.qpos
        ov_ref[0] = out.qvel
        os_ref[0] = out.sensordata if ns else jnp.zeros_like(os_ref[0])
        op_ref[0] = out.policy_output

    def rollout_fn(qpos, qvel, pout0, cmds):
        """(nq,B), (nv,B), (12,B), (T,ncmd,B) ->
        ((T,nq,B), (T,nv,B), (T,ns_,B), (T,12,B))."""
        B = qpos.shape[-1]
        assert B % LANE_TILE == 0, f"lane batch {B} must be a multiple of {LANE_TILE}"
        dtype = qpos.dtype
        tile = pick_lane_tile(B)
        grid = (B // tile, T)
        in_specs = [
            pl.BlockSpec((nq, tile), lambda i, t: (0, i)),
            pl.BlockSpec((nv, tile), lambda i, t: (0, i)),
            pl.BlockSpec((12, tile), lambda i, t: (0, i)),
            pl.BlockSpec((1, ncmd, tile), lambda i, t: (t, 0, i)),
        ] + [
            # MLP weights: whole block, same for every grid step (loaded once)
            pl.BlockSpec(w.shape, lambda i, t: (0, 0))
            for w in waugs_np
        ]
        out_specs = (
            pl.BlockSpec((1, nq, tile), lambda i, t: (t, 0, i)),
            pl.BlockSpec((1, nv, tile), lambda i, t: (t, 0, i)),
            pl.BlockSpec((1, ns_, tile), lambda i, t: (t, 0, i)),
            pl.BlockSpec((1, 12, tile), lambda i, t: (t, 0, i)),
        )
        out_shape = (
            jax.ShapeDtypeStruct((T, nq, B), dtype),
            jax.ShapeDtypeStruct((T, nv, B), dtype),
            jax.ShapeDtypeStruct((T, ns_, B), dtype),
            jax.ShapeDtypeStruct((T, 12, B), dtype),
        )
        scratch_shapes = [
            pltpu.VMEM((nq, tile), dtype),
            pltpu.VMEM((nv, tile), dtype),
            pltpu.VMEM((12, tile), dtype),
            pltpu.VMEM((nefc_, tile), dtype),
            pltpu.VMEM((nefc_, tile), dtype),
        ]
        w_args = [jnp.asarray(w, dtype) for w in waugs_np]
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                dimension_semantics=(
                    pltpu.GridDimensionSemantics.ARBITRARY,
                    pltpu.GridDimensionSemantics.ARBITRARY,
                ),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(qpos, qvel, pout0, cmds, *w_args)

    return rollout_fn


class PolicyLaneRolloutOutput(NamedTuple):
    states: jnp.ndarray  # (R, T, nq + nv)
    sensordata: jnp.ndarray  # (R, T, nsensordata)
    final_policy_output: jnp.ndarray  # (R, 12)


def policy_rollout_lanes(
    m: PhysicsModel,
    policy,
    qpos0: jnp.ndarray,  # (R, nq)
    qvel0: jnp.ndarray,  # (R, nv)
    commands: jnp.ndarray,  # (R, T, 25)
    last_policy_output: jnp.ndarray,  # (R, 12)
    physics_substeps: int = 2,
    iterations: int | None = None,
    backend: str = "pallas",
) -> PolicyLaneRolloutOutput:
    """Batched policy-in-the-loop rollout, lanes formulation (the Spot
    counterpart of rollout_lanes; semantics match vmap(policy.policy_rollout)
    with exact per-step inverses)."""
    R, T = commands.shape[0], commands.shape[1]
    nefc = num_constraint_rows(m)
    ns = m.nsensordata
    dtype = qpos0.dtype

    pad = (-R) % LANE_TILE if backend in ("pallas", "interpret") else 0
    B = R + pad
    qp = jnp.concatenate([qpos0, jnp.repeat(qpos0[-1:], pad, axis=0)], axis=0).T
    qv = jnp.concatenate([qvel0, jnp.repeat(qvel0[-1:], pad, axis=0)], axis=0).T
    po = jnp.concatenate(
        [last_policy_output, jnp.repeat(last_policy_output[-1:], pad, axis=0)], axis=0
    ).T  # (12, B)
    ct = jnp.concatenate([commands, jnp.repeat(commands[-1:], pad, axis=0)], axis=0)
    ct = jnp.transpose(ct, (1, 2, 0))  # (T, 25, B)

    if backend in ("pallas", "interpret"):
        roll = _build_fused_policy_rollout(
            m, policy, T, physics_substeps, iterations, interpret=(backend == "interpret")
        )
        qps, qvs, senss, pouts = roll(qp, qv, po, ct)
    elif backend == "xla":
        from judo_tpu.tasks.spot.policy_lanes import lanes_policy_params, spot_policy_step_l

        lp = lanes_policy_params(policy, dtype)
        f0 = jnp.zeros((max(nefc, 1), B), dtype)
        v0 = jnp.ones((max(nefc, 1), B), dtype)

        def body(carry, cmd_t):
            qp_, qv_, po_, f, v = carry
            out = spot_policy_step_l(
                m, lp, qp_, qv_, cmd_t, po_,
                physics_substeps=physics_substeps,
                f_warm=f if nefc else None, cw_v=v if nefc else None,
                solver_iterations=iterations,
            )
            fo = out.efc_force if nefc else f
            vo = out.cw_v if nefc else v
            return (out.qpos, out.qvel, out.policy_output, fo, vo), (
                out.qpos, out.qvel,
                out.sensordata if ns else jnp.zeros((1, B), dtype),
                out.policy_output,
            )

        _, (qps, qvs, senss, pouts) = jax.lax.scan(body, (qp, qv, po, f0, v0), ct)
    else:  # pragma: no cover
        raise ValueError(f"unknown lane backend {backend!r}")

    states = jnp.concatenate([qps, qvs], axis=1)  # (T, nq+nv, B)
    states = jnp.transpose(states, (2, 0, 1))[:R]
    senss = jnp.transpose(senss, (2, 0, 1))[:R, :, : max(ns, 1)]
    if ns == 0:
        senss = senss[:, :, :0]
    final_pout = jnp.transpose(pouts[T - 1], (1, 0))[:R]  # (R, 12)
    return PolicyLaneRolloutOutput(states=states, sensordata=senss, final_policy_output=final_pout)


class LaneRolloutOutput(NamedTuple):
    states: jnp.ndarray  # (R, T, nq + nv)
    sensordata: jnp.ndarray  # (R, T, nsensordata)
    # converged step-0 constraint forces (R, nefc): carry into the NEXT
    # solve's efc_warm to warm-start contact onset (the plant state moves
    # little between control cycles) — the TPU analogue of mjData's efc
    # warm-start persisting across the reference's per-thread rollouts
    efc0: jnp.ndarray | None = None


def rollout_lanes(
    m: PhysicsModel,
    qpos0: jnp.ndarray,  # (R, nq)
    qvel0: jnp.ndarray,  # (R, nv)
    controls: jnp.ndarray,  # (R, T, nu)
    physics_substeps: int = 1,
    iterations: int | None = None,
    backend: str = "pallas",
    lipschitz: str = "cw",
    efc_warm: jnp.ndarray | None = None,  # (R, nefc) onset warm start
) -> LaneRolloutOutput:
    """Batched rollout in the lanes formulation (states batch-first at the
    API boundary; one transpose each way per solve).

    Semantics match vmap(step.rollout) with exact per-step inverses: record
    post-step (qpos, qvel) and the final substep's pre-integration sensordata
    per command (mujoco.rollout convention).
    """
    R, T = controls.shape[0], controls.shape[1]
    nefc = num_constraint_rows(m)
    ns = m.nsensordata
    dtype = qpos0.dtype

    pad = (-R) % LANE_TILE if backend in ("pallas", "interpret") else 0
    B = R + pad
    qp = jnp.concatenate([qpos0, jnp.repeat(qpos0[-1:], pad, axis=0)], axis=0).T  # (nq, B)
    qv = jnp.concatenate([qvel0, jnp.repeat(qvel0[-1:], pad, axis=0)], axis=0).T
    ct = jnp.concatenate([controls, jnp.repeat(controls[-1:], pad, axis=0)], axis=0)
    ct = jnp.transpose(ct, (1, 2, 0))  # (T, nu, B)
    if efc_warm is None:
        f0 = jnp.zeros((max(nefc, 1), B), dtype)
    else:
        f0 = jnp.concatenate(
            [efc_warm, jnp.repeat(efc_warm[-1:], pad, axis=0)], axis=0
        ).T.astype(dtype)  # (nefc, B)

    if backend in ("pallas", "interpret"):
        # fused path: the whole T-rollout is ONE kernel (see _build_fused_rollout)
        if m.nu == 0:
            ct = jnp.zeros((T, 1, B), dtype)
        roll = _build_fused_rollout(
            m, T, physics_substeps, iterations,
            interpret=(backend == "interpret"), lipschitz=lipschitz,
        )
        qps, qvs, senss, f0_out = roll(qp, qv, ct, f0)
    elif backend == "xla":
        step_fn = _xla_step_fn(m, iterations, lipschitz=lipschitz)
        v0 = jnp.ones((max(nefc, 1), B), dtype)  # carried CW probe

        def body(carry, ctrl_t):
            qp, qv, f, v = carry
            sens = None
            for _ in range(physics_substeps):
                qp, qv, sens, f, v = step_fn(qp, qv, ctrl_t, f, v)
            return (qp, qv, f, v), (qp, qv, sens, f)

        (_, _, _, _), (qps, qvs, senss, fs) = jax.lax.scan(body, (qp, qv, f0, v0), ct)
        f0_out = fs[0]
    else:  # pragma: no cover
        raise ValueError(f"unknown lane backend {backend!r}")

    states = jnp.concatenate([qps, qvs], axis=1)  # (T, nq+nv, B)
    states = jnp.transpose(states, (2, 0, 1))[:R]  # (R, T, nq+nv)
    senss = jnp.transpose(senss, (2, 0, 1))[:R, :, : max(ns, 1)]
    if ns == 0:
        senss = senss[:, :, :0]
    efc0 = jnp.transpose(f0_out, (1, 0))[:R, : max(nefc, 1)]
    return LaneRolloutOutput(states=states, sensordata=senss, efc0=efc0)
