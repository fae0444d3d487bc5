"""Native C++ MRT core: build, bindings, correctness vs numpy."""

import threading

import numpy as np

from wb_humanoid_mpc_tpu import native


def test_native_builds():
    assert native.available(), "C++ MRT core failed to build"


def test_evaluate_policy_matches_numpy():
    rng = np.random.default_rng(0)
    N, nx, nu = 10, 7, 5
    xs = rng.standard_normal((N + 1, nx))
    us = rng.standard_normal((N, nu))
    for t in [0.0, 0.013, 0.05, 0.099, 0.2, -0.1]:
        x, u = native.evaluate_policy(xs, us, 0.0, 0.01, t)
        s = np.clip(t / 0.01, 0.0, N)
        k = min(int(s), N - 1)
        a = np.clip(s - k, 0.0, 1.0)
        np.testing.assert_allclose(x, (1 - a) * xs[k] + a * xs[k + 1], atol=1e-12)
        np.testing.assert_allclose(u, us[k], atol=1e-12)


def test_joint_torques():
    rng = np.random.default_rng(1)
    n = 23
    args = [rng.standard_normal(n) for _ in range(7)]
    tau = native.joint_torques(*args)
    q_des, qd_des, kp, kd, ff, q, qd = args
    np.testing.assert_allclose(tau, kp * (q_des - q) + kd * (qd_des - qd) + ff,
                               atol=1e-12)


def test_threadsafe_buffer_concurrent():
    buf = native.ThreadSafeBuffer(64)
    stop = threading.event = threading.Event()
    errors = []

    def writer():
        i = 0
        while not stop.is_set():
            buf.write(np.full(64, float(i)))
            i += 1

    def reader():
        for _ in range(2000):
            v = buf.read()
            # torn reads would show mixed values within one snapshot
            if not np.all(v == v[0]):
                errors.append(v.copy())

    wt = threading.Thread(target=writer)
    rts = [threading.Thread(target=reader) for _ in range(2)]
    wt.start()
    [r.start() for r in rts]
    [r.join() for r in rts]
    stop.set()
    wt.join()
    assert not errors, f"torn reads detected: {errors[:1]}"
