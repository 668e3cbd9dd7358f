"""Benchmark: plan-time distribution for the flagship solve on this machine.

Mirrors the reference ``benchmark`` tool's semantics (100-sample plan-time
distribution per task/optimizer pair — judo/app/benchmark.py:19,76-90) and
additionally measures a reference-equivalent CPU baseline (threaded
``mujoco.rollout`` with the reference's own solve shape) so the speedup is
computed against the reference's own engine on this host.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
  value       = our p50 steady-state plan time (ms) at 10x the reference
                sample count, 2-deep pipelined controller
  vs_baseline = reference-engine p50 plan time / our p50 plan time
                (>1 means faster than the reference at 10x its batch)

Also writes BENCH_EXTRA.json with the full detail: raw depth-0 (unpipelined)
solve latency, and the Spot policy-in-the-loop plan time at the reference
solve shape against its 8 Hz / 125 ms real-time budget
(judo/tasks/spot/spot_constants.py:17-18).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

TASK = "leap_cube"  # the BASELINE north-star task
OPTIMIZER = "mppi"
REF_NUM_ROLLOUTS = 32  # reference override for this task (optimizers/overrides.py)
OUR_NUM_ROLLOUTS = 320  # 10x, per the BASELINE north-star
N_SAMPLES = 100
WARMUP = 3
SPOT_BUDGET_MS = 125.0  # 8 Hz MPC rollout cutoff (spot_constants.py:17-18)


def _plan_times(c, n: int, rng, x0) -> np.ndarray:
    times = []
    for _ in range(n):
        c.current_state = x0 + 1e-4 * rng.standard_normal(x0.shape)  # fresh plant state
        t0 = time.perf_counter()
        c.update_action()
        times.append(time.perf_counter() - t0)
    c.flush_pipeline()
    return np.asarray(times)


def bench_ours() -> dict:
    """Plan-time distributions of the flagship solve.

    Two regimes, both reported:
    - depth-0: update_action dispatches AND syncs each solve — the raw
      unpipelined solve latency (includes the tunneled host<->device round
      trip on this machine).
    - depth-2 steady state: the production MPC architecture — the device
      works on solve N while the host consumes solve N-2; per-solve wall
      time in steady state is the honest device-rate cost of one solve, and
      the published mirrors lag 2 solves (closed-loop task success at depth
      0 vs 2 is pinned by tests/test_controller/test_pipelining_closed_loop.py).
    """
    import jax

    from judo_tpu.controller import make_controller

    np.random.seed(0)
    c = make_controller(TASK, OPTIMIZER)
    c.optimizer_cfg.num_rollouts = OUR_NUM_ROLLOUTS
    c.time = 0.0
    rng = np.random.default_rng(1)
    x0 = c.current_state.copy()

    c.controller_cfg.pipeline_depth = 0
    for _ in range(WARMUP):
        c.update_action()
    t_d0 = _plan_times(c, 30, rng, x0)

    c.controller_cfg.pipeline_depth = 2
    for _ in range(WARMUP + 2):
        c.update_action()
    t_d2 = _plan_times(c, N_SAMPLES, rng, x0)

    return {
        "p50_s": float(np.median(t_d2)),
        "p95_s": float(np.percentile(t_d2, 95)),
        "mean_s": float(t_d2.mean()),
        "p50_depth0_s": float(np.median(t_d0)),
        "rollouts_per_s": float(OUR_NUM_ROLLOUTS / np.median(t_d2)),
        "num_rollouts": OUR_NUM_ROLLOUTS,
        "horizon_steps": c.num_timesteps,
        "device": str(jax.devices()[0]),
    }


def bench_spot() -> dict:
    """Spot policy-in-the-loop plan time at the REFERENCE solve shape
    (R=24, N=3, horizon 2.0 — optimizers/overrides.py there) vs the 125 ms
    rollout cutoff the reference's native layer exists to meet."""
    from judo_tpu.controller import make_controller

    np.random.seed(0)
    c = make_controller("spot_navigate", OPTIMIZER)
    c.time = 0.0
    rng = np.random.default_rng(2)
    x0 = c.current_state.copy()
    c.controller_cfg.pipeline_depth = 0
    for _ in range(WARMUP):
        c.update_action()
    t_d0 = _plan_times(c, 20, rng, x0)
    c.controller_cfg.pipeline_depth = 2
    for _ in range(WARMUP + 2):
        c.update_action()
    t_d2 = _plan_times(c, 50, rng, x0)
    return {
        "p50_s": float(np.median(t_d2)),
        "p95_s": float(np.percentile(t_d2, 95)),
        "p50_depth0_s": float(np.median(t_d0)),
        "num_rollouts": c.optimizer_cfg.num_rollouts,
        "budget_ms": SPOT_BUDGET_MS,
        "within_budget": bool(np.percentile(t_d2, 95) * 1e3 < SPOT_BUDGET_MS),
    }


def bench_reference_equivalent() -> dict:
    """The reference's engine (threaded mujoco.rollout) at its own solve shape."""
    import mujoco
    import mujoco.rollout
    from scipy.interpolate import interp1d

    from judo_tpu.tasks import get_registered_tasks

    task_cls, _ = get_registered_tasks()[TASK]
    task = task_cls()
    model = task.model
    R = REF_NUM_ROLLOUTS
    models = [model] * R
    datas = [mujoco.MjData(model) for _ in range(R)]
    rollout_obj = mujoco.rollout.Rollout(nthread=R)

    horizon, num_nodes, sigma = 1.0, 4, 0.2
    T = int(np.ceil(horizon / model.opt.timestep))
    nu = model.nu
    rng = np.random.default_rng(0)
    nominal = np.tile(task.optimizer_warm_start(), (num_nodes, 1))
    x0 = np.concatenate([task.data.qpos, task.data.qvel])

    def plan_once(t0: float) -> np.ndarray:
        times = t0 + np.linspace(0, horizon, num_nodes)
        knots = np.concatenate(
            [nominal[None], nominal[None] + sigma * rng.standard_normal((R - 1, num_nodes, nu))]
        )
        spline = interp1d(times, knots, kind="cubic", axis=-2, bounds_error=False,
                          fill_value=(knots[..., 0, :], knots[..., -1, :]))
        controls = spline(t0 + model.opt.timestep * np.arange(T))
        full_state = np.tile(np.concatenate([[t0], x0]), (R, 1))
        state, sens = rollout_obj.rollout(models, datas, full_state, control=controls)
        # reward: same arithmetic class as the task's (quadratic forms)
        rewards = -0.5 * np.square(state[..., 1:8]).sum(-1).sum(-1)
        return knots[np.argmax(rewards)]

    for _ in range(WARMUP):
        plan_once(0.0)
    times = []
    for i in range(N_SAMPLES):
        t0 = time.perf_counter()
        plan_once(0.05 * i)
        times.append(time.perf_counter() - t0)
    rollout_obj.close()  # leave no thread pool contending with the TPU loop
    times = np.asarray(times)
    return {"p50_s": float(np.median(times)), "p95_s": float(np.percentile(times, 95)), "num_rollouts": R}


def main() -> None:
    ours = bench_ours()
    spot = None
    try:
        spot = bench_spot()
    except Exception as e:  # noqa: BLE001 — the headline metric must still print
        spot = {"error": repr(e)}
    ref = bench_reference_equivalent()

    extra = {"leap": ours, "spot_navigate": spot, "reference_engine": ref}
    Path(__file__).parent.joinpath("BENCH_EXTRA.json").write_text(json.dumps(extra, indent=1))

    spot_txt = (
        f"spot_navigate R={spot['num_rollouts']} p50 {spot['p50_s'] * 1e3:.1f} ms "
        f"vs 125 ms budget; " if spot and "p50_s" in spot else ""
    )
    result = {
        "metric": f"{TASK}+{OPTIMIZER} p50 steady-state plan time @ {OUR_NUM_ROLLOUTS} samples, "
        f"2-deep pipelined controller (ref engine @ {REF_NUM_ROLLOUTS} samples: "
        f"{ref['p50_s'] * 1e3:.2f} ms; ours p95 {ours['p95_s'] * 1e3:.2f} ms, "
        f"depth-0 p50 {ours['p50_depth0_s'] * 1e3:.2f} ms; {spot_txt}"
        f"{ours['rollouts_per_s']:.0f} rollouts/s/chip; device {ours['device']})",
        "value": round(ours["p50_s"] * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(ref["p50_s"] / ours["p50_s"], 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
