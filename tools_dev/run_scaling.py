"""Produce SCALING_r04.json — the BASELINE.md scaling report.

Points: single-chip batch sweep {1, 8, 64, 256, 1024} (real TPU) + the
8-virtual-device dp x h mesh shape point (CPU, shape-only). Run:

    python tools_dev/run_scaling.py            # TPU batch sweep
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

from wb_humanoid_mpc_tpu.parallel.scaling import scaling_report

out = {
    "hardware": str(jax.devices()),
    "problem": "G1 whole-body SQP, N=28 nodes, 1 iteration/solve, f32, stance",
    "points": scaling_report(batches=(1, 4, 8, 16, 32, 48)),
}
b1 = next(p for p in out["points"] if p.get("instances_per_s") and p["batch"] == 1)
for p in out["points"]:
    if "instances_per_s" in p:
        p["speedup_vs_b1"] = p["instances_per_s"] / b1["instances_per_s"]
        p["efficiency_vs_linear_batch"] = p["speedup_vs_b1"] / p["batch"]

path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "SCALING_r04.json")
with open(path, "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out, indent=2))
print("->", path)
