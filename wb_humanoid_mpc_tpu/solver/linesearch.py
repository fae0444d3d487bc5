"""Filter line-search acceptance rule (shared by every SQP variant).

Reproduces ocs2's `FilterLinesearch` step-acceptance semantics (the
reference solver's globalization; thresholds `multiple_shooting.{g_max,g_min}`
in `g1_wb_mpc/config/mpc/task.info`). With baseline performance (c0, v0) and
candidate performance (cs, vs), where v = sqrt(SSE(equalities) +
SSE(shooting defects)) is the ocs2 "total constraint violation":

  vs > g_max             -> high violation: accept ONLY a violation decrease
                            (the branch is keyed on the CANDIDATE's violation,
                            not the baseline's — a step may not buy a cost
                            decrease with a large new violation);
  max(vs, v0) < g_min    -> both nearly feasible: accept on cost decrease;
  otherwise              -> medium violation: accept if the cost decreases
                            (beyond a violation-proportional margin) OR the
                            violation decreases.

One rule, one implementation: `make_sqp_solver`, `make_staged_sqp_solver`
(solver/sqp.py) and the 2-D sharded solver (solver/sharded_sqp.py) all call
`filter_accept`; keeping three copies in sync is how round 3 shipped a
divergent sharded twin.
"""

from __future__ import annotations

import jax.numpy as jnp

GAMMA = 1e-6  # relative-decrease factor (ocs2 gamma_c)


def filter_accept(c0, v0, cs, vs, g_max: float, g_min: float,
                  gamma: float = GAMMA):
    """Vectorized acceptance mask. `c0`/`v0` broadcast against `cs`/`vs`
    (candidates along the leading axis). Non-finite candidates are rejected."""
    c0 = jnp.asarray(c0)
    v0 = jnp.asarray(v0)
    viol_decreased = vs < (1.0 - gamma) * v0
    high = vs > g_max
    low = jnp.maximum(vs, v0) < g_min
    accept = jnp.where(
        high,
        viol_decreased,
        jnp.where(low,
                  cs < c0,
                  (cs < c0 - gamma * vs) | viol_decreased),
    )
    return accept & jnp.isfinite(cs) & jnp.isfinite(vs)
