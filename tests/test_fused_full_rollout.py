"""Fused full-env Pallas kernel vs the jnp flagship engine (bit-exact).

The kernel (ops/fused_full_rollout.py) mirrors engine/full_env.step under
the f32/i32 production configuration, so its validation needs x64 OFF —
while this suite forces x64 ON for reference parity (tests/conftest.py).
The check therefore runs out-of-process: scripts/validate_fused_full_cpu.py
replays coverage-biased legal action scripts through the kernel's exact
arithmetic (rollout_full_rows — the same program Mosaic compiles on TPU,
executed per-op via jax.disable_jit to sidestep the pathological XLA:CPU
compile of the 2.4k-line step body) and through the jnp engine, diffing
every packed state row / reward / done per step across play, discard,
select, consumable, shop-buy, reroll, sell, shop-end, blind-select and
skip branches, with jokers, enhanced/edition/sealed cards, consumables and
acting bosses planted by state surgery.

The real pallas_call is validated on the TPU by
scripts/validate_fused_full_tpu.py (fed-mode bit-exactness + sampling-mode
distribution), recorded in docs/fused_full_tpu_validation.json.
"""
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SCRIPT = os.path.join(_REPO, "scripts", "validate_fused_full_cpu.py")


def test_fused_full_kernel_matches_engine_bit_exact():
    """8 mixed-phase steps x 1024 surgically diversified envs, per-step
    bit-equality of all packed integer state vs the jnp engine (rewards at
    the documented 1e-4 FMA tolerance). Runs ~2.5 min (eager per-op)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    res = subprocess.run(
        [sys.executable, _SCRIPT, "--steps", "8", "--prelude", "4"],
        capture_output=True, text=True, timeout=1500, env=env, cwd=_REPO)
    tail = "\n".join((res.stdout + res.stderr).splitlines()[-30:])
    assert res.returncode == 0, f"validator failed:\n{tail}"
    assert "OK" in res.stdout.splitlines()[-1]
