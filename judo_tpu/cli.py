"""Command-line entry points (reference: judo/cli.py:144-176).

The reference launches a 3-process dora dataflow via hydra; here a single
process hosts the sim + controller threads (+ visualizer when available), so
the CLI is a plain argparse app:

    python -m judo_tpu.cli run --task cartpole --optimizer ps --seconds 10
    python -m judo_tpu.cli benchmark --tasks cartpole --optimizers ps,mppi
"""

from __future__ import annotations

import argparse
import threading
import time


def _cmd_run(args: argparse.Namespace) -> None:
    from judo_tpu.app.bus import MessageBus
    from judo_tpu.app.nodes import ControllerNode, SimulationNode

    bus = MessageBus()
    sim_node = SimulationNode(bus, args.task, backend=args.sim_backend)
    ctrl_node = ControllerNode(bus, args.task, args.optimizer)

    threads = [
        threading.Thread(target=sim_node.spin, daemon=True),
        threading.Thread(target=ctrl_node.spin, daemon=True),
    ]
    for t in threads:
        t.start()

    t_end = time.time() + args.seconds if args.seconds > 0 else None
    try:
        while t_end is None or time.time() < t_end:
            time.sleep(0.5)
            plan_time = bus.read("plan_time")
            state = bus.read("states")
            if plan_time is not None and state is not None:
                print(
                    f"t={state.time:7.2f}s plan={plan_time * 1e3:7.1f}ms "
                    f"qpos[:3]={state.qpos[:3].round(3)}"
                )
    except KeyboardInterrupt:
        pass
    finally:
        sim_node.stop()
        ctrl_node.stop()
        for t in threads:
            t.join(timeout=2.0)


def _cmd_benchmark(args: argparse.Namespace) -> None:
    from judo_tpu.app.benchmark import format_table, run_benchmark

    tasks = args.tasks.split(",") if args.tasks else None
    optimizers = args.optimizers.split(",") if args.optimizers else None
    results = run_benchmark(tasks=tasks, optimizers=optimizers, num_samples=args.num_samples)
    print(format_table(results))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="judo-tpu", description="TPU-native sampling-based MPC")
    sub = p.add_subparsers(dest="command", required=True)

    run = sub.add_parser("run", help="closed-loop sim + controller")
    run.add_argument("--task", default="cylinder_push")
    run.add_argument("--optimizer", default="ps")
    run.add_argument("--sim-backend", default="mujoco")
    run.add_argument("--seconds", type=float, default=10.0, help="<=0 runs until Ctrl+C")
    run.set_defaults(func=_cmd_run)

    bench = sub.add_parser("benchmark", help="plan-time distribution per task/optimizer pair")
    bench.add_argument("--tasks", default="")
    bench.add_argument("--optimizers", default="")
    bench.add_argument("--num-samples", type=int, default=100)
    bench.set_defaults(func=_cmd_benchmark)
    return p


def main() -> None:
    args = build_parser().parse_args()
    args.func(args)


if __name__ == "__main__":
    main()
