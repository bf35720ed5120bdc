#!/usr/bin/env python
"""Unconfounded DP scaling artifact (r04 verdict item 6).

The r04 artifact (SCALING_full_r04.json, 0.513) oversubscribed 8 virtual
devices onto 2 physical cores, so wall-clock efficiency measured core
contention, not the sharding. Two confounds are removed here:

* 1:1 device:core mapping — 2 virtual CPU devices on the 2 physical cores;
* a PINNED single-core baseline — XLA:CPU gives a single device the whole
  host thread pool, so an unpinned 1-device run uses BOTH cores and
  inflates the denominator. Each configuration runs in a subprocess under
  ``taskset``: the 1-device baseline on core 0 only, the 2-device run on
  cores 0-1 — every device owns exactly one core in both runs.

Efficiency = tput(2 dev, 2 cores) / (2 x tput(1 dev, 1 core)) on the
FLAGSHIP env's distributed PPO update (shard_map, pmean grads). Writes
SCALING_r05.json at the repo root. The HLO-level all-reduce-only evidence
(tests/test_checkpoint_scaling.py) remains the correctness artifact; this
is the wall-clock one.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys
sys.path.insert(0, %r)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", int(sys.argv[1]))
from balatro_gym_tpu.parallel.scaling_bench import measure
n = int(sys.argv[1])
t = measure(n, envs_per_dev=128, rollout=8, updates=6, env="full")
print(json.dumps({"n": n, "steps_per_sec": round(t, 1)}))
""" % (REPO,)


def run(n_devices, cores):
    res = subprocess.run(
        ["taskset", "-c", cores, sys.executable, "-c", CHILD, str(n_devices)],
        capture_output=True, text=True, timeout=2400, cwd=REPO)
    lines = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
    if res.returncode != 0 or not lines:
        raise RuntimeError((res.stdout + res.stderr)[-800:])
    return json.loads(lines[-1])


def main():
    one = run(1, "0")
    two = run(2, "0,1")
    eff = two["steps_per_sec"] / (2 * one["steps_per_sec"])
    out = {
        "metric": "dp_scaling_efficiency",
        "env": "full",
        "n_devices": 2,
        "config": "1 core per device (taskset-pinned; unconfounded 1:1)",
        "steps_per_sec_1dev_1core": one["steps_per_sec"],
        "steps_per_sec_2dev_2core": two["steps_per_sec"],
        "value": round(eff, 3),
        "unit": "fraction",
        "vs_baseline": round(eff / 0.8, 3),
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "SCALING_r05.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
