"""Multi-host mesh layout tests (`parallel/multihost.py`) on the 8-virtual-
device CPU backend, emulating a 2-host x 4-chip topology."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from wb_humanoid_mpc_tpu.parallel.multihost import make_mpc_mesh, mesh_report


def test_mesh_layout_emulated_two_hosts():
    mesh = make_mpc_mesh(devices_per_host=4)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("dp", "h")
    # each h-row must be one contiguous process-major block (the ICI rule)
    flat = np.array(jax.devices())
    for r, row in enumerate(mesh.devices):
        assert list(row) == list(flat[r * 4:(r + 1) * 4])
    rep = mesh_report(mesh)
    assert rep["axes"] == {"dp": 2, "h": 4}
    assert rep["h_axis_on_ici"]


def test_mesh_rejects_dcn_horizon_axis():
    with pytest.raises(ValueError, match="cross DCN"):
        make_mpc_mesh(n_dp=2, n_h=4, devices_per_host=2)


def test_mesh_single_host_default():
    mesh = make_mpc_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh_report(mesh)["h_axis_on_ici"]


def test_collectives_ride_the_mesh():
    """dp-mean + h-cumsum through shard_map on the 2x4 mesh executes and
    matches the unsharded computation."""
    mesh = make_mpc_mesh(devices_per_host=4)
    x = jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 3)

    def f(xs):  # xs: [1, 1, 3] per device
        s = jax.lax.psum(xs, "h")       # horizon reduction (ICI)
        m = jax.lax.pmean(s, "dp")      # instance mean (DCN-safe)
        return m

    y = shard_map(f, mesh=mesh, in_specs=P("dp", "h"),
                  out_specs=P("dp", "h"))(x)
    expect = jnp.tile(x.sum(axis=1, keepdims=True).mean(axis=0, keepdims=True),
                      (2, 4, 1))
    np.testing.assert_allclose(np.asarray(y), np.asarray(expect), rtol=1e-6)
