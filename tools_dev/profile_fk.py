"""Micro-profile: FK / mass_and_nle / flow / jacfwd on the real TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

from __graft_entry__ import _wb_setup
from wb_humanoid_mpc_tpu.models import dynamics as dyn
from wb_humanoid_mpc_tpu.models import kinematics as kin
from wb_humanoid_mpc_tpu.solver.transcription import rk4_step

cfg, model = _wb_setup()
robot = model.robot
x0 = jnp.asarray(cfg.initial_state, dtype=jnp.float32)
nq = robot.nq
q = x0[:nq]
v = x0[nq:]
u0 = jnp.zeros(model.layout.input_dim, dtype=jnp.float32)

N = 28
qs = jnp.tile(q, (N, 1))
vs = jnp.tile(v, (N, 1))
xs = jnp.tile(x0, (N, 1))
us = jnp.tile(u0, (N, 1))

def timeit(name, fn, *args, n=30):
    out = jax.block_until_ready(fn(*args))
    lat = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        lat.append(time.perf_counter() - t0)
    print(f"{name:36s} p50 {np.percentile(lat,50)*1e3:8.2f} ms")
    return out

f_fk1 = jax.jit(lambda q: kin.forward_kinematics(robot, q).p)
f_fkN = jax.jit(jax.vmap(lambda q: kin.forward_kinematics(robot, q).p))
f_mnN = jax.jit(jax.vmap(lambda q, v: dyn.mass_and_nle(robot, q, v).nle))
f_flowN = jax.jit(jax.vmap(lambda x, u: model.flow_map(0.0, x, u)))
f_rk4N = jax.jit(jax.vmap(lambda x, u: rk4_step(model.flow_map, 0.0, x, u, 0.035)))
f_jacN = jax.jit(jax.vmap(lambda x, u: jax.jacfwd(
    lambda z: rk4_step(model.flow_map, 0.0, z[:x0.shape[0]], z[x0.shape[0]:], 0.035)
)(jnp.concatenate([x, u]))))

timeit("fk x1", f_fk1, q)
timeit("fk x28 (vmap)", f_fkN, qs)
timeit("mass_and_nle x28", f_mnN, qs, vs)
timeit("flow x28", f_flowN, xs, us)
timeit("rk4 x28", f_rk4N, xs, us)
timeit("jacfwd(rk4) x28 (93 tangents)", f_jacN, xs, us)
f_triv = jax.jit(lambda x: x + 1.0)
timeit("trivial dispatch", f_triv, q)
