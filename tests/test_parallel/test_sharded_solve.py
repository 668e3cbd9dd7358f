"""Multi-device correctness tests on the 8-virtual-CPU mesh (conftest).

SURVEY §4 lesson: the reference has no distributed tests; the TPU build adds
CPU-simulated multi-device tests. These assert that the solve under a rollout
mesh is numerically identical to the unsharded solve (same rng), that the
candidate batch really is partitioned over the mesh (fails if the
with_sharding_constraint in the solve is removed), and that optimizer updates
reduce correctly over sharded reward batches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec

from judo_tpu.controller import Controller, ControllerConfig
from judo_tpu.optimizers import (
    MPPI,
    CrossEntropyMethod,
    CrossEntropyMethodConfig,
    MPPIConfig,
    PredictiveSampling,
    PredictiveSamplingConfig,
)
from judo_tpu.parallel import ROLLOUT_AXIS, make_rollout_mesh, rollout_sharding
from judo_tpu.tasks import get_registered_tasks

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs the multi-device CPU mesh from conftest"
)


def _make_controller(task_name: str, mesh, num_rollouts: int = 8, horizon: float = 0.1):
    task_cls, _ = get_registered_tasks()[task_name]
    task = task_cls()
    opt = MPPI(MPPIConfig(num_rollouts=num_rollouts, num_nodes=4, sigma=0.2), task.nu)
    cc = ControllerConfig(horizon=horizon, spline_order="zero", full_outputs=True)
    return Controller(cc, task, opt, mesh=mesh)


def _run_solve(task_name: str, mesh, seed: int = 1234, **kw):
    np.random.seed(seed)  # Controller.reset derives its PRNG key from numpy
    c = _make_controller(task_name, mesh, **kw)
    c.update_action()
    return c


@pytest.mark.parametrize("task_name", ["cylinder_push", "leap_cube"])
def test_sharded_solve_matches_unsharded(task_name):
    """Contact-rich solve: mesh-sharded == single-device to tolerance."""
    mesh = make_rollout_mesh(8)
    ref = _run_solve(task_name, None)
    sh = _run_solve(task_name, mesh)
    np.testing.assert_allclose(np.sort(sh.rewards), np.sort(ref.rewards), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(sh.rewards, ref.rewards, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(sh.nominal_knots, ref.nominal_knots, rtol=1e-6, atol=1e-8)


def test_sharded_solve_spot_policy_path():
    """Locomotion-policy rollout path with carried per-rollout policy output."""
    mesh = make_rollout_mesh(8)
    ref = _run_solve("spot_navigate", None, num_rollouts=8, horizon=0.2)
    sh = _run_solve("spot_navigate", mesh, num_rollouts=8, horizon=0.2)
    # f32 policy path: GSPMD partitioning may reassociate reductions; allow
    # a few ulps beyond the contact tasks' tolerance
    np.testing.assert_allclose(sh.rewards, ref.rewards, rtol=5e-5, atol=1e-6)
    np.testing.assert_allclose(sh.nominal_knots, ref.nominal_knots, rtol=5e-5, atol=1e-6)
    # carried policy output stays per-rollout shaped
    assert np.asarray(sh._carry.last_policy_output).shape == (8, 12)
    # same f32 GSPMD reassociation tolerance as the rewards/knots above
    # (observed mismatch up to ~1e-4 relative on the CPU mesh)
    np.testing.assert_allclose(
        sh._carry.last_policy_output, ref._carry.last_policy_output, rtol=2e-4, atol=1e-6
    )


def test_sharded_lanes_backend_matches_unsharded():
    """The production lanes formulation under the mesh: shard_map runs the
    lane rollout per-shard (VERDICT r3 item 4 — no more vmap fallback on
    multi-device meshes). Uses the xla lane backend (CPU form of the same
    step_l numerics the Pallas kernel compiles)."""
    mesh = make_rollout_mesh(8)

    def run(mesh_):
        np.random.seed(1234)
        task_cls, _ = get_registered_tasks()["cylinder_push"]
        task = task_cls()
        opt = MPPI(MPPIConfig(num_rollouts=16, num_nodes=4, sigma=0.2), task.nu)
        cc = ControllerConfig(horizon=0.1, spline_order="zero", full_outputs=True)
        c = Controller(cc, task, opt, rollout_backend="lanes_xla", mesh=mesh_)
        c.update_action()
        return c

    ref = run(None)
    sh = run(mesh)
    np.testing.assert_allclose(sh.rewards, ref.rewards, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(sh.nominal_knots, ref.nominal_knots, rtol=1e-6, atol=1e-8)
    sharding = sh.last_outputs.states.sharding
    assert isinstance(sharding, NamedSharding)
    assert sharding.spec[0] == ROLLOUT_AXIS


def test_solve_outputs_actually_sharded():
    """The candidate batch is partitioned over the mesh — this is the test
    that fails if the with_sharding_constraint in Controller._build_solve is
    removed (outputs then come back fully replicated)."""
    mesh = make_rollout_mesh(8)
    c = _run_solve("cylinder_push", mesh, num_rollouts=16)
    states = c.last_outputs.states  # (R, T, nq+nv)
    sharding = states.sharding
    assert isinstance(sharding, NamedSharding)
    assert sharding.spec[0] == ROLLOUT_AXIS, f"rollout axis not sharded: {sharding.spec}"
    # 16 rollouts over 8 devices: each shard holds 2
    shard_shapes = {s.data.shape[0] for s in states.addressable_shards}
    assert shard_shapes == {2}


@pytest.mark.parametrize(
    "opt_cls,cfg_cls",
    [
        (PredictiveSampling, PredictiveSamplingConfig),
        (MPPI, MPPIConfig),
        (CrossEntropyMethod, CrossEntropyMethodConfig),
    ],
)
def test_optimizer_update_with_sharded_rewards(opt_cls, cfg_cls):
    """update() reduces over a mesh-sharded reward/candidate batch exactly
    (argmax / softmax-average / top-k elites ride GSPMD collectives)."""
    mesh = make_rollout_mesh(8)
    nu, n, r = 3, 4, 16
    cfg = cfg_cls(num_rollouts=r, num_nodes=n)
    opt = opt_cls(cfg, nu)
    rng = np.random.default_rng(0)
    cands = jnp.asarray(rng.standard_normal((r, n, nu)))
    rewards = jnp.asarray(rng.standard_normal(r))
    state = opt.init_state(cands.dtype)
    params = opt.params()

    ref_nominal, ref_state = jax.jit(opt.update)(params, state, cands, rewards)

    sh = rollout_sharding(mesh)
    cands_s = jax.device_put(cands, sh)
    rewards_s = jax.device_put(rewards, sh)
    out_nominal, out_state = jax.jit(opt.update)(params, state, cands_s, rewards_s)

    np.testing.assert_allclose(out_nominal, ref_nominal, rtol=1e-12, atol=0)
    for a, b in zip(jax.tree.leaves(out_state), jax.tree.leaves(ref_state)):
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=0)


def test_replicated_spec_helper():
    mesh = make_rollout_mesh(4)
    from judo_tpu.parallel import replicated

    assert replicated(mesh).spec == PartitionSpec()


def test_hybrid_mesh_solve_matches_unsharded():
    """Multi-host topology: a (hosts=2, rollouts=4) hybrid mesh — the DCN
    mesh shape from make_rollout_mesh(hybrid=True) — is numerically identical
    to the unsharded solve and actually partitions the batch over both axes."""
    from judo_tpu.parallel import HOST_AXIS

    mesh = make_rollout_mesh(8, hybrid=True, devices_per_host=4)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == (HOST_AXIS, ROLLOUT_AXIS)

    ref = _run_solve("cylinder_push", None, num_rollouts=16)
    sh = _run_solve("cylinder_push", mesh, num_rollouts=16)
    np.testing.assert_allclose(sh.rewards, ref.rewards, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(sh.nominal_knots, ref.nominal_knots, rtol=1e-6, atol=1e-8)

    states = sh.last_outputs.states
    sharding = states.sharding
    assert isinstance(sharding, NamedSharding)
    # batch axis split over BOTH mesh axes: 16 rollouts / (2*4) devices = 2 each
    shard_shapes = {s.data.shape[0] for s in states.addressable_shards}
    assert shard_shapes == {2}


def test_initialize_distributed_single_host_noop():
    """Without a coordinator configured this must be a harmless no-op (the
    single-host path of the DCN bootstrap)."""
    from judo_tpu.parallel import initialize_distributed

    initialize_distributed()  # no env, no args: no-op
    assert len(jax.devices()) >= 1
