"""Contact-solver accuracy regression test (VERDICT r3 item 6).

Pins the APGD dual solver's accuracy on REAL mid-rollout leap_cube states
against a 300-iteration reference — so a future "speed up by dropping
iterations / loosening the Lipschitz bound" change cannot silently degrade
contact physics while the rest of the suite stays green.

Regimes pinned (measured values in parens, scratch r4):

- WARM-STARTED tracking — the regime the rollout actually runs in (efc
  forces carried across steps): 8 iterations from a converged warm start
  track the reference to ~2e-5 relative. This is the load-bearing bound.
- COLD start at the stock budget: convergence from f=0 is slow on these
  highly-coupled grasp states (~0.8 relative after 25 iters — forces need a
  few steps of carry to converge after contact onset; trajectory-level
  accuracy is covered by test_scene_parity.py). Only boundedness/finiteness
  is asserted.
- More iterations must only refine (CW is a valid upper bound, so APGD
  cannot diverge).

Runs the lanes formulation (the kernel's exact numerics) under plain jit on
CPU; the Pallas TPU kernel wraps the same step_l (pallas_step.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from judo_tpu.physics.lane_step import step_l
from judo_tpu.physics.pallas_step import rollout_lanes
from judo_tpu.tasks.leap_cube import LeapCube


@pytest.fixture(scope="module")
def mid_rollout_state():
    """Contact-rich states 30 steps into a leap rollout (B=8 lanes)."""
    task = LeapCube()
    pm = task.planning_model
    B = 8
    rng = np.random.default_rng(0)
    warm = np.asarray(task.optimizer_warm_start(), np.float32)
    qp0 = jnp.asarray(np.tile(task.data.qpos, (B, 1)), jnp.float32)
    qv0 = jnp.zeros((B, pm.nv), jnp.float32)
    ct = jnp.asarray(
        warm[None, None] + 0.05 * rng.standard_normal((B, 30, pm.nu)), jnp.float32
    )
    out = jax.jit(lambda a, b, c: rollout_lanes(pm, a, b, c, backend="xla"))(qp0, qv0, ct)
    qp = out.states[:, -1, : pm.nq].T  # (nq, B)
    qv = out.states[:, -1, pm.nq :].T
    ctrl = ct[:, -1].T

    step = jax.jit(
        lambda f, it: step_l(pm, qp, qv, ctrl, f, solver_iterations=it, lipschitz="cw"),
        static_argnums=1,
    )
    ref = step(None, 300)
    return pm, np.asarray(qv), ref, step


def test_warm_started_tracking_accuracy(mid_rollout_state):
    """The shipped regime: 8 iterations from a warm start track a 300-iter
    reference to ~2e-5 (measured); assert well under 1e-3."""
    pm, qv, ref, step = mid_rollout_state
    dv_ref = np.asarray(ref.qvel) - qv
    scale = max(np.abs(dv_ref).max(), 1e-9)
    out = step(ref.efc_force, 8)
    rel = np.abs((np.asarray(out.qvel) - qv) - dv_ref).max() / scale
    assert rel < 1e-3, f"warm-started relative dv error {rel:.2e} >= 1e-3"


def test_cold_start_bounded(mid_rollout_state):
    """Cold starts at the stock budget must stay bounded and finite."""
    pm, qv, ref, step = mid_rollout_state
    dv_ref = np.asarray(ref.qvel) - qv
    scale = max(np.abs(dv_ref).max(), 1e-9)
    out = step(None, max(pm.solver_iterations, 8))
    dv = np.asarray(out.qvel) - qv
    assert np.isfinite(dv).all()
    rel = np.abs(dv - dv_ref).max() / scale
    assert rel < 1.0, f"cold-start relative dv error {rel:.3f} >= 1.0 (diverging?)"


def test_converged_forces_respect_friction_cone(mid_rollout_state):
    """Converged elliptic forces must satisfy ||f_t|| <= mu * f_n per contact.

    Advisor r4 (high): Jacobi preconditioning with per-row reg (reg_t =
    reg_n/impratio) distorts the SOC, and projecting with the ORIGINAL mu in
    the scaled space converges to forces violating the cone by ~5%. Fixed by
    projecting with mu' = mu * inv_s_n / inv_s_t; this test pins it.
    """
    from judo_tpu.physics.lane_collision import find_contacts_l
    from judo_tpu.physics.lane_engine import kinematics_l
    from judo_tpu.physics.solver import num_noncontact_rows

    pm, qv, ref, step = mid_rollout_state
    assert not pm.cone_pyramidal
    f = np.asarray(ref.efc_force)  # (nefc, B)
    n0 = num_noncontact_rows(pm)
    nc = (f.shape[0] - n0) // 3
    # static per-candidate friction, same construction as step_l
    task = LeapCube()
    kin = kinematics_l(pm, jnp.asarray(np.tile(task.data.qpos, (4, 1)).T, jnp.float32))
    mus = np.asarray(find_contacts_l(pm, kin).friction, np.float32)
    assert mus.shape[0] == nc
    fn = f[n0 : n0 + nc]
    ft = np.sqrt(f[n0 + nc : n0 + 2 * nc] ** 2 + f[n0 + 2 * nc :] ** 2)
    # relative cone violation, zero-force contacts excluded via the floor
    viol = (ft - mus[:, None] * fn) / np.maximum(mus[:, None] * np.abs(fn), 1e-6)
    assert fn.min() >= -1e-5, "normal forces must be nonnegative"
    assert viol.max() < 1e-3, f"friction-cone violation {viol.max():.2%} (>=0.1%)"


def test_more_iterations_do_not_diverge(mid_rollout_state):
    """The CW bound is a valid upper bound: doubling iterations must only
    refine the solution, never blow up."""
    pm, qv, ref, step = mid_rollout_state
    dv_ref = np.asarray(ref.qvel) - qv
    scale = max(np.abs(dv_ref).max(), 1e-9)
    e_lo = np.abs((np.asarray(step(None, 25).qvel) - qv) - dv_ref).max() / scale
    e_hi = np.abs((np.asarray(step(None, 100).qvel) - qv) - dv_ref).max() / scale
    assert np.isfinite(e_lo) and np.isfinite(e_hi)
    assert e_hi <= e_lo + 1e-6
