"""Multi-host mesh construction: the DCN/ICI-aware device layout.

The reference's "distributed system" is two ROS2 processes on one machine
(SURVEY.md §1 process topology). The TPU-native equivalent of scaling past
one machine is a multi-host TPU slice: JAX processes (one per host) joined
through `jax.distributed`, with a single global `Mesh` spanning all chips.

The layout rule (BASELINE.md scaling points; scaling-book recipe): put the
COLLECTIVE-FREE axis across hosts and the collective-carrying axis inside a
host. For this framework:

- `dp` (batched MPC instances, `parallel/batched.py`) is embarrassingly
  parallel — no hot-path collectives — so it is safe to span DCN.
- `h` (horizon blocks, `parallel/horizon.py` distributed Riccati) carries
  `all_gather`/`ppermute` on every solve — it must ride ICI, i.e. stay
  within one host's chips.

`jax.devices()` orders devices by process index, so reshaping the global
device list to [num_hosts, devices_per_host] and naming the axes
("dp", "h") realizes exactly that layout.
"""

from __future__ import annotations

import numpy as np
from jax.sharding import Mesh


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Join this process to a multi-host JAX runtime.

    On TPU pods the arguments are auto-detected from the environment; on
    other platforms pass them explicitly. No-op when already initialized or
    when running single-process (the common single-host case)."""
    import jax

    if jax.process_count() > 1:
        return
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:
            return  # single-process run — nothing to join
    else:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mpc_mesh(n_dp: int | None = None, n_h: int | None = None,
                  devices=None, devices_per_host: int | None = None) -> Mesh:
    """Global ("dp", "h") mesh with horizon collectives pinned to ICI.

    n_dp x n_h must equal the device count. Defaults: `n_h` = chips per host
    (every horizon `all_gather`/`ppermute` stays on ICI), `n_dp` = number of
    hosts (the data-parallel axis crosses DCN, where it costs nothing).
    `devices_per_host` overrides host detection — used to emulate a
    multi-host topology on a single-host (or CPU) device set in tests.
    """
    import jax

    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if devices_per_host is None:
        per_host = {}
        for d in devices:
            per_host.setdefault(d.process_index, 0)
            per_host[d.process_index] += 1
        devices_per_host = max(per_host.values())
    if n_h is None:
        n_h = devices_per_host if n % devices_per_host == 0 else n
    if n_dp is None:
        n_dp = n // n_h
    if n_dp * n_h != n:
        raise ValueError(f"mesh {n_dp}x{n_h} != {n} devices")
    if n_h > devices_per_host and n_dp > 1:
        raise ValueError(
            f"horizon axis ({n_h}) spans more than one host "
            f"({devices_per_host} devices/host): Riccati collectives would "
            "cross DCN — shrink n_h or grow n_dp")
    # jax.devices() is process-major: consecutive blocks of
    # `devices_per_host` share a host, so row-major [n_dp, n_h] keeps each
    # h-row inside one host whenever n_h divides devices_per_host.
    grid = np.array(devices).reshape(n_dp, n_h)
    return Mesh(grid, axis_names=("dp", "h"))


def mesh_report(mesh: Mesh) -> dict:
    """Topology summary for SCALING artifacts."""
    devs = mesh.devices
    hosts = sorted({d.process_index for d in devs.ravel()})
    h_hosts = [len({d.process_index for d in row}) for row in devs]
    return {
        "axes": dict(zip(mesh.axis_names, devs.shape)),
        "n_devices": int(devs.size),
        "n_hosts": len(hosts),
        "h_axis_hosts_per_row": h_hosts,
        "h_axis_on_ici": all(k == 1 for k in h_hosts),
    }
