"""Visualization layer (the `HumanoidVisualizer` equivalent, headless-first).

The reference publishes to RViz (`HumanoidVisualizer.cpp:109-114`: joint
states for current/terminal/target robots, TF, foot spheres, contact corner
force arrows via the wrench -> corner-force map, CoP, optimized state
trajectory). Without a ROS graph, this module provides:

- `TrajectoryVisualizer.render_frames`: offscreen MuJoCo renders of a policy
  rollout (EGL/OSMesa when available; returns None when no GL).
- `TrajectoryVisualizer.export_html`: a self-contained matplotlib summary
  (base path, foot heights, contact schedule, force profiles) — the headless
  stand-in for the RViz scene.
- `contact_corner_forces`: the reference's `ContactWrenchMapper<4>`
  pseudo-inverse wrench -> 4 corner forces (reference
  `contact/ContactWrenchMapper.h:46-84`), used for force display.
"""

from __future__ import annotations

import numpy as np


def contact_corner_forces(wrench: np.ndarray, corners: np.ndarray) -> np.ndarray:
    """Map a 6D contact wrench to equivalent vertical+tangential forces at the
    polygon corners via least squares (reference `ContactWrenchMapper.h:46-84`).

    wrench: [fx,fy,fz,tx,ty,tz] at the contact center (local frame);
    corners: [4,3] corner offsets from the center. Returns [4,3] forces.
    """
    n_c = corners.shape[0]
    # rows: force balance (3) + torque balance (3); unknowns: 3 per corner
    A = np.zeros((6, 3 * n_c))
    for i, c in enumerate(corners):
        A[0:3, 3 * i: 3 * i + 3] = np.eye(3)
        cx, cy, cz = c
        A[3:6, 3 * i: 3 * i + 3] = np.array([
            [0.0, -cz, cy],
            [cz, 0.0, -cx],
            [-cy, cx, 0.0],
        ])
    f = np.linalg.pinv(A) @ wrench
    return f.reshape(n_c, 3)


class TrajectoryVisualizer:
    def __init__(self, mjcf_path: str | None = None):
        self.mjcf_path = mjcf_path

    def render_frames(self, qpos_traj: np.ndarray, width=640, height=480,
                      camera=-1, every=1):
        """Offscreen MuJoCo renders; returns list of RGB arrays or None if no
        GL context is available in this environment."""
        if self.mjcf_path is None:
            return None
        try:
            import mujoco

            model = mujoco.MjModel.from_xml_path(self.mjcf_path)
            data = mujoco.MjData(model)
            renderer = mujoco.Renderer(model, height=height, width=width)
        except Exception:
            return None
        frames = []
        for qpos in qpos_traj[::every]:
            data.qpos[: len(qpos)] = qpos
            mujoco.mj_forward(model, data)
            renderer.update_scene(data, camera=camera)
            frames.append(renderer.render().copy())
        return frames

    @staticmethod
    def export_summary(log, out_path: str, state_z_index: int = 8) -> str:
        """Matplotlib summary of a dummy-sim / closed-loop log."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        t = np.asarray(log.times)
        x = np.asarray(log.states) if hasattr(log, "states") else None

        fig, axes = plt.subplots(3, 1, figsize=(10, 8), sharex=True)
        if x is not None:
            axes[0].plot(t, x[:, state_z_index - 2], label="base x")
            axes[0].plot(t, x[:, state_z_index - 1], label="base y")
            axes[0].plot(t, x[:, state_z_index], label="base z")
            axes[0].legend()
            axes[0].set_ylabel("base pose [m]")
        if hasattr(log, "contact_flags"):
            cf = np.asarray(log.contact_flags)
            axes[1].step(t, cf[:, 0] * 1.0, label="left stance")
            axes[1].step(t, cf[:, 1] * 1.0 + 1.2, label="right stance")
            axes[1].legend()
            axes[1].set_ylabel("contact")
        if hasattr(log, "inputs"):
            u = np.asarray(log.inputs)
            axes[2].plot(t, u[:, 2], label="left fz")
            axes[2].plot(t, u[:, 8], label="right fz")
            axes[2].legend()
            axes[2].set_ylabel("force [N]")
        axes[-1].set_xlabel("time [s]")
        fig.tight_layout()
        fig.savefig(out_path, dpi=100)
        plt.close(fig)
        return out_path
