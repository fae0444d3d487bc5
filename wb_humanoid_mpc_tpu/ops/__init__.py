"""Pallas TPU kernels for the solver's launch-bound hot ops.

The SQP solve is kernel-depth bound, not FLOP bound (PERF_r04.md §4): the
win from a hand-written kernel is collapsing a chain of tiny XLA kernels
into one launch with VMEM-resident state, not beating the MXU at matmuls.

Kernels:
- `rollout.forward_rollout` — the LQ forward pass (N-step closed-loop
  recursion) as ONE kernel; ~1 us marginal cost on a v5e vs ~68 us for the
  `lax.scan` lowering at N=28 (measured pipelined, see PERF_r04.md).
"""

from wb_humanoid_mpc_tpu.ops.rollout import forward_rollout, pallas_forward_rollout

__all__ = ["forward_rollout", "pallas_forward_rollout"]
