"""Characterize axon-tunnel execute overhead vs program shape."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def bench(f, *args, n=20, label=""):
    jax.block_until_ready(f(*args))
    lat = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        lat.append(time.perf_counter() - t0)
    # sustained (dependent chain where possible is skipped; independent dispatch)
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(n)]
    jax.block_until_ready(outs[-1])
    sus = n / (time.perf_counter() - t0)
    print(f"{label}: p50 {np.percentile(lat,50)*1e3:.2f} ms  min {min(lat)*1e3:.2f} ms  "
          f"indep-sustained {sus:.0f}/s")

x = jnp.zeros((8, 128))

for K in (10, 100, 1000):
    f = jax.jit(lambda x, K=K: jax.lax.scan(lambda c, _: (c * 1.0001 + 0.1, None),
                                            x, None, length=K)[0])
    bench(f, x, label=f"scan-{K} trivial steps")

a = jnp.zeros((1024, 1024))
bench(jax.jit(lambda a: a @ a), a, label="matmul 1024^3")

# scan of small matmuls (Riccati-like): 28 steps of 58x58 chains
A = jnp.zeros((28, 64, 64))
def riclike(A):
    def step(P, Ak):
        P = Ak.T @ P @ Ak + jnp.eye(64)
        return P, P
    return jax.lax.scan(step, jnp.eye(64), A)[0]
bench(jax.jit(riclike), A, label="scan-28 64x64 matmul chain")

# batched cholesky+solve (28, 21, 21) like the projection/backward
M = jnp.tile(jnp.eye(21)[None], (28, 1, 1)) * 2.0
def chol(M):
    L = jnp.linalg.cholesky(M)
    return jax.scipy.linalg.cho_solve((L[0], True), jnp.eye(21))
bench(jax.jit(chol), M, label="cholesky batch 28x21x21")

# QR like projection: (28, 35, 35)
Q = jnp.tile(jnp.eye(35)[None], (28, 1, 1))
bench(jax.jit(lambda Q: jnp.linalg.qr(Q, mode="complete")[0]), Q, label="QR batch 28x35")
