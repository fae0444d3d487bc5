"""CLI launch entry points — the `make launch-*` / ros2-launch analogues.

Replaces the reference's launch graph (`mpc_launch_config.py:27-120`,
`dummy_sim.launch.py`) with single-process commands:

    python -m wb_humanoid_mpc_tpu.tools.launch dummy-sim  --formulation centroidal
    python -m wb_humanoid_mpc_tpu.tools.launch mujoco-sim --formulation wb
    python -m wb_humanoid_mpc_tpu.tools.launch bench-batched --batch 256

Commands read the reference robot pack configs directly; velocity commands
come from `--vx/--vy/--wz` flags or interactively from stdin
(`vel 0.3 0 0`, `gait trot`, `stop`).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_REF = os.environ.get("WBMPC_REFERENCE_ROOT", "/root/reference")
_G1 = os.path.join(_REF, "robot_models/unitree_g1")
DEFAULT_PATHS = {
    "urdf": os.path.join(_G1, "g1_description/urdf/g1_29dof.urdf"),
    "mjcf": os.path.join(_G1, "g1_description/urdf/g1_29dof.xml"),
    "gait": os.path.join(_REF, "humanoid_nmpc/humanoid_common_mpc/config/command/gait.info"),
    "centroidal_task": os.path.join(_G1, "g1_centroidal_mpc/config/mpc/task.info"),
    "centroidal_ref": os.path.join(_G1, "g1_centroidal_mpc/config/command/reference.info"),
    "wb_task": os.path.join(_G1, "g1_wb_mpc/config/mpc/task.info"),
    "wb_ref": os.path.join(_G1, "g1_wb_mpc/config/command/reference.info"),
}


def _build(args):
    from wb_humanoid_mpc_tpu.interface import build_centroidal_mpc, build_wb_mpc

    if args.formulation == "centroidal":
        return build_centroidal_mpc(
            args.urdf, args.task or DEFAULT_PATHS["centroidal_task"],
            args.reference or DEFAULT_PATHS["centroidal_ref"], args.gait,
            n_nodes=args.n_nodes, horizon=args.horizon,
            sqp_iterations=args.sqp_iterations)
    return build_wb_mpc(
        args.urdf, args.task or DEFAULT_PATHS["wb_task"],
        args.reference or DEFAULT_PATHS["wb_ref"], args.gait,
        n_nodes=args.n_nodes, horizon=args.horizon,
        sqp_iterations=args.sqp_iterations)


def cmd_dummy_sim(args):
    """Kinematic closed loop (SURVEY.md §3.2 / `make launch-g1-dummy-sim`)."""
    from wb_humanoid_mpc_tpu.sim.dummy import run_dummy_sim
    from wb_humanoid_mpc_tpu.tools.benchmarks import BenchmarksPublisher
    from wb_humanoid_mpc_tpu.tools.observation_logger import ObservationLogger
    from wb_humanoid_mpc_tpu.viz.visualizer import TrajectoryVisualizer

    mpc = _build(args)
    cmd = np.array([args.vx, args.vy, args.height, args.wz])
    print(f"[dummy-sim] {args.formulation} MPC, N={mpc.n_nodes}, dt={mpc.dt}; "
          f"command={cmd}")
    if args.interactive or args.gui:
        # operator plane: stdin commands `vel vx vy wz`, `gait trot`,
        # `pose dx dy dz dyaw`, `height h`, `stop` (reference keyboard
        # publishers + pose command node), optionally the Tk velocity GUI
        # (reference base_velocity_controller_gui)
        from wb_humanoid_mpc_tpu.tools.commands import CommandBus, KeyboardCommandSource

        bus = CommandBus()
        KeyboardCommandSource(bus).start()
        if args.gui:
            from wb_humanoid_mpc_tpu.tools.velocity_gui import launch_velocity_gui

            launch_velocity_gui(bus)

        def command_fn(t):
            bus.drain_into(mpc.motion_manager)
            return bus.get_velocity()
    else:
        def command_fn(t):
            return cmd if t > 0.2 else np.zeros(4)
    log = run_dummy_sim(
        mpc.runtime, mpc.initial_state, duration=args.duration,
        mrt_frequency=args.mrt_freq, mpc_frequency=args.mpc_freq,
        command_fn=command_fn,
        flow=mpc.model.flow_map)

    pub = BenchmarksPublisher()
    for s in log.solve_stats:
        pub.publish(s)
    print("[dummy-sim] solve summary:", json.dumps(pub.summary(), indent=2))
    print(f"[dummy-sim] final base xy: {log.states[-1, 6]:.3f}, {log.states[-1, 7]:.3f}"
          if args.formulation == "centroidal"
          else f"[dummy-sim] final base xy: {log.states[-1, 0]:.3f}, {log.states[-1, 1]:.3f}")

    if args.log_csv:
        ol = ObservationLogger()
        for i in range(len(log.times)):
            ol.log(log.times[i], log.states[i], log.inputs[i])
        ol.dump_csv(args.log_csv)
        print(f"[dummy-sim] observations -> {args.log_csv}")
    if args.plot:
        TrajectoryVisualizer.export_summary(log, args.plot,
                                            state_z_index=8 if args.formulation == "centroidal" else 2)
        print(f"[dummy-sim] summary plot -> {args.plot}")
    if args.scene:
        from wb_humanoid_mpc_tpu.viz.visualizer import render_scene

        policy = mpc.runtime.policy
        render_scene(mpc.model, log.states[-1], policy=policy,
                     x_target=None, u_current=log.inputs[-1],
                     out_path=args.scene)
        print(f"[dummy-sim] final scene (current/terminal robots, CoP, "
              f"corner forces) -> {args.scene}")


def cmd_mujoco_sim(args):
    """Full-physics closed loop (SURVEY.md §3.3 / `make launch-g1-sim`)."""
    from wb_humanoid_mpc_tpu.mpc.controller import CentroidalMrtController, WBMrtController
    from wb_humanoid_mpc_tpu.sim.closed_loop import run_mujoco_closed_loop
    from wb_humanoid_mpc_tpu.sim.mujoco_sim import MujocoSimInterface

    mpc = _build(args)
    joint_defaults = {
        name: float(v) for name, v in zip(
            mpc.model.robot.joint_names,
            mpc.initial_state[12:35] if args.formulation == "centroidal"
            else mpc.initial_state[6:29])
    }
    sim = MujocoSimInterface(args.mjcf, initial_joint_positions=joint_defaults,
                             initial_base_pos=(0, 0, float(
                                 mpc.initial_state[8] if args.formulation == "centroidal"
                                 else mpc.initial_state[2])))
    controller = (CentroidalMrtController(mpc.model)
                  if args.formulation == "centroidal" else WBMrtController(mpc.model))
    cmd = np.array([args.vx, args.vy, args.height, args.wz])
    command_fn = lambda t: cmd if t > 0.5 else np.zeros(4)  # noqa: E731
    if args.threaded:
        from wb_humanoid_mpc_tpu.sim.sim_thread import run_threaded_robot_sim

        log, metrics, renderer = run_threaded_robot_sim(
            mpc, controller, sim, duration=args.duration,
            mrt_frequency=args.mrt_freq, command_fn=command_fn,
            realtime=args.realtime, render_fps=args.render_fps)
        print(f"[mujoco-sim threaded] sim fps={metrics.sim_fps:.0f}, "
              f"rt factor={metrics.realtime_factor:.2f}, "
              f"frames={len(renderer.frames) if renderer else 0}")
    else:
        log = run_mujoco_closed_loop(
            mpc, controller, sim, duration=args.duration,
            mrt_frequency=args.mrt_freq, mpc_frequency=args.mpc_freq,
            command_fn=command_fn,
            solve_latency=args.solve_latency,
            use_pipeline=args.pipeline)
    print(f"[mujoco-sim] resets={log.n_resets}, "
          f"final base: {log.base_positions[-1]}, "
          f"height range [{log.base_heights.min():.3f}, {log.base_heights.max():.3f}]")


def cmd_bench_batched(args):
    """Batched-instance throughput benchmark (BASELINE configs 4/5)."""
    import jax
    import jax.numpy as jnp

    from wb_humanoid_mpc_tpu.parallel.scaling import batched_throughput

    result = batched_throughput(batch=args.batch, n_nodes=args.n_nodes or 28,
                                formulation=args.formulation,
                                n_rounds=args.rounds)
    print(json.dumps(result, indent=2))


def main(argv=None):
    p = argparse.ArgumentParser(prog="wb_humanoid_mpc_tpu.launch")
    p.add_argument("command", choices=["dummy-sim", "mujoco-sim", "bench-batched"])
    p.add_argument("--formulation", choices=["centroidal", "wb"], default="centroidal")
    p.add_argument("--urdf", default=DEFAULT_PATHS["urdf"])
    p.add_argument("--mjcf", default=DEFAULT_PATHS["mjcf"])
    p.add_argument("--task", default=None)
    p.add_argument("--reference", default=None)
    p.add_argument("--gait", default=DEFAULT_PATHS["gait"])
    p.add_argument("--n-nodes", type=int, default=None)
    p.add_argument("--horizon", type=float, default=None)
    p.add_argument("--sqp-iterations", type=int, default=None)
    p.add_argument("--duration", type=float, default=5.0)
    p.add_argument("--mrt-freq", type=float, default=100.0)
    p.add_argument("--mpc-freq", type=float, default=50.0)
    p.add_argument("--vx", type=float, default=0.0)
    p.add_argument("--vy", type=float, default=0.0)
    p.add_argument("--wz", type=float, default=0.0)
    p.add_argument("--height", type=float, default=0.0)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--rounds", type=int, default=10)
    p.add_argument("--log-csv", default=None)
    p.add_argument("--plot", default=None)
    p.add_argument("--scene", default=None,
                   help="write the final 3-D scene (current/terminal robots, "
                        "optimized base path, CoP, corner forces) to this PNG")
    p.add_argument("--interactive", action="store_true",
                   help="read vel/gait/pose commands from stdin while running")
    p.add_argument("--gui", action="store_true",
                   help="Tk velocity-controller GUI (reference "
                        "base_velocity_controller_gui); headless-safe no-op")
    p.add_argument("--solve-latency", type=float, default=0.0,
                   help="async MRT: policies activate this many sim-seconds "
                        "after their observation (mujoco-sim only)")
    p.add_argument("--threaded", action="store_true",
                   help="three-thread robot sim: dedicated 2 kHz physics "
                        "thread + solver thread + control loop (reference "
                        "MujocoSimInterface.cpp:393+ architecture; "
                        "mujoco-sim only)")
    p.add_argument("--realtime", action="store_true",
                   help="pace the threaded sim to the wall clock")
    p.add_argument("--render-fps", type=float, default=0.0,
                   help="> 0: start the render thread at this fps "
                        "(offscreen frames when GL is available)")
    p.add_argument("--pipeline", action="store_true",
                   help="run the MPC on a real solver thread (MrtPipeline; "
                        "the reference's solverWorker/control split, "
                        "mujoco-sim only)")
    args = p.parse_args(argv)

    {"dummy-sim": cmd_dummy_sim,
     "mujoco-sim": cmd_mujoco_sim,
     "bench-batched": cmd_bench_batched}[args.command](args)


if __name__ == "__main__":
    main()
