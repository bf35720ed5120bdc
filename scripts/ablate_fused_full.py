#!/usr/bin/env python
"""Attribute fused full-env kernel wall time by stage ablation (round-4
verdict item 2: 84M steps/s is 7.6x below the sim kernel).

For each stage in $FF_ABLATE (play, disc, cons, shopgen, draw, ohd, reset —
see ops/fused_full_rollout._ABLATE) this spawns a SUBPROCESS (the switch is
read at module import) that times ``rollout_full_fused`` in sampling mode
with that stage stubbed, using bench.py's protocol (pipelined reps,
data-fetch sync, median of samples). The throughput DELTA vs the unablated
kernel is that stage's share of the step body.

Ablated kernels are semantically WRONG (stubbed stages freeze state) — the
numbers are only meaningful as time attribution.

Run on the TPU: python scripts/ablate_fused_full.py
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, statistics, sys, time
sys.path.insert(0, %r)
import jax
from balatro_gym_tpu.ops.fused_full_rollout import TILE, rollout_full_fused

N, STEPS, REPS, SAMPLES = 16384, 256, 8, 3
nt = N // TILE
for s in (0, 100):
    float(rollout_full_fused(s, N, STEPS)["total_reward"][0])
times = []
seed = 1
for _ in range(SAMPLES):
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = rollout_full_fused(seed, N, STEPS)
        seed += nt
    float(out["total_reward"][0])
    times.append(time.perf_counter() - t0)
med = statistics.median(REPS * N * STEPS / t for t in times)
print(json.dumps({"ablate": __import__("os").environ.get("FF_ABLATE", ""),
                  "steps_per_sec": round(med)}))
""" % ("%s",)


def run_one(ablate: str):
    env = dict(os.environ)
    env["FF_ABLATE"] = ablate
    env["FF_ABLATE_OK"] = "1"  # explicit opt-in (fused_full_rollout guard)
    env.pop("JAX_PLATFORMS", None)
    res = subprocess.run([sys.executable, "-c", CHILD % REPO],
                         capture_output=True, text=True, timeout=1200,
                         env=env, cwd=REPO)
    lines = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
    if res.returncode != 0 or not lines:
        return {"ablate": ablate, "error": (res.stdout + res.stderr)[-400:]}
    return json.loads(lines[-1])


def main():
    stages = ["", "play", "disc", "cons", "shopgen", "draw", "ohd", "reset",
              "cons,shopgen", "play,cons,shopgen",
              # round-5 sub-stage attribution INSIDE the consumable branch
              "cons_mods", "cons_crea", "cons_hang", "cons_fgi", "cons_sigil",
              "cons_immo", "cons_cryptid",
              "cons_hang,cons_fgi,cons_immo,cons_cryptid"]
    base = None
    for st in stages:
        r = run_one(st)
        if "steps_per_sec" in r:
            if st == "":
                base = r["steps_per_sec"]
            elif base:
                r["speedup_vs_base"] = round(r["steps_per_sec"] / base, 3)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
