"""Flagship full env under the multi-device mesh (round-4 verdict item 1).

This test runs the CPU-mesh leg of the proof chain: the
``rollout_full_sharded`` wrapper's sharding/slicing/seed-striding logic is
bit-exact on a 2-device mesh (fed + sampling modes), with the kernel body
injected as a stand-in — XLA:CPU cannot compile the real (or interpret-mode)
kernel body in test time (>50 min measured even at opt-level 0).

The other legs:

* full-env jnp-path DP update (all-reduce-only HLO + execution) —
  tests/test_checkpoint_scaling.py::test_sharded_update_collectives_full_env;
* two-process loopback with the full env — tests/test_distributed_loopback.py;
* the wrapper composed with the REAL pallas kernel + a fused-collection DP
  PPO update, on the real chip — scripts/validate_full_sharded_tpu.py
  (artifact docs/full_mesh_validation.json);
* the kernel body's own semantics — tests/test_fused_full_rollout.py.
"""
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SCRIPT = os.path.join(_REPO, "scripts", "validate_full_mesh_cpu.py")


def test_full_env_mesh_wrapper_sharding():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    res = subprocess.run(
        [sys.executable, _SCRIPT, "--steps", "6"],
        capture_output=True, text=True, timeout=600, env=env, cwd=_REPO)
    tail = "\n".join((res.stdout + res.stderr).splitlines()[-30:])
    assert res.returncode == 0, f"validator failed:\n{tail}"
    assert "OK" in res.stdout.splitlines()[-1]
