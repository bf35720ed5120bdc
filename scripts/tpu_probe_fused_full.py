"""Quick TPU lowering probe for the fused full-env kernel (both modes)."""
import sys, time, traceback
sys.path.insert(0, "/root/repo")
t0 = time.time()
import jax
from balatro_gym_tpu.ops.fused_full_rollout import rollout_full_fused, TILE
print(f"[{time.time()-t0:.0f}s] import done, backend={jax.default_backend()}", flush=True)
for name, kw in (("SAMPLING", {}), ("FED", {"actions": [45, 2]})):
    try:
        out = rollout_full_fused(0, TILE, 2, **kw)
        r = float(out["total_reward"][0])
        print(f"[{time.time()-t0:.0f}s] {name} MODE OK reward0={r}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:300]
        print(f"[{time.time()-t0:.0f}s] {name} MODE FAILED: {type(e).__name__}: {msg}", flush=True)
        traceback.print_exc(limit=3)
