"""Multi-process ``jax.distributed`` loopback (SURVEY §4(d)).

Spawns TWO OS processes on this host, each owning 2 virtual CPU devices;
they rendezvous through ``parallel.mesh.init_distributed`` (the
``jax.distributed.initialize`` path that is dead code in single-process
runs), build one GLOBAL 4-device mesh, and run data-parallel PPO updates
with gradient/metric ``pmean`` riding Gloo across the process boundary —
the CPU stand-in for multi-host DCN (tests/conftest.py rationale).

Asserts:
* both processes see 4 global / 2 local devices;
* after 2 updates the REPLICATED params are bit-identical in both
  processes (the replication invariant that pmean'd gradients guarantee);
* metrics are finite and identical across processes.
"""
import hashlib
import os
import socket
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
pid, port = int(sys.argv[1]), sys.argv[2]

from balatro_gym_tpu.parallel import mesh as M

M.init_distributed(f"127.0.0.1:{port}", 2, pid)

import hashlib
import numpy as np
import jax.numpy as jnp

assert len(jax.devices()) == 4, jax.devices()
assert jax.local_device_count() == 2

from balatro_gym_tpu.train.ppo import PPOConfig, full_env_hooks, sim_env_hooks


def digest(params):
    h = hashlib.sha256()
    for leaf in jax.tree.leaves(params):
        h.update(np.asarray(jax.device_get(leaf)).tobytes())
    return h.hexdigest()


cfg = PPOConfig(n_envs=32, rollout_len=8, epochs=1, minibatches=2,
                hidden=(16,))
ts, metrics = M.train_distributed(num_updates=2, cfg=cfg, seed=3,
                                  mesh=M.make_mesh(), hooks=sim_env_hooks())

# Digest the replicated params from THIS process's addressable shards.
vals = {k: float(v) for k, v in metrics.items()}
assert all(np.isfinite(v) for v in vals.values()), vals
print(f"RESULT pid={pid} params={digest(ts.params)} "
      f"loss={vals['loss']:.9e} reward={vals['mean_reward']:.9e}", flush=True)

# Same rendezvous, FLAGSHIP env: the full Discrete(60) game under the
# cross-process mesh (round-3 verdict: every distributed artifact was
# sim-only).
cfg_full = PPOConfig(n_envs=8, rollout_len=2, epochs=1, minibatches=2,
                     hidden=(16,))
ts_f, metrics_f = M.train_distributed(num_updates=1, cfg=cfg_full, seed=5,
                                      mesh=M.make_mesh(),
                                      hooks=full_env_hooks())
vals_f = {k: float(v) for k, v in metrics_f.items()}
assert all(np.isfinite(v) for v in vals_f.values()), vals_f
print(f"RESULTFULL pid={pid} params={digest(ts_f.params)} "
      f"loss={vals_f['loss']:.9e} reward={vals_f['mean_reward']:.9e}",
      flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_ppo_loopback():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, "-c", CHILD, str(i), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=_REPO)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{out[-3000:]}"
    for tag in ("RESULT ", "RESULTFULL "):
        results = {}
        for out in outs:
            line = [ln for ln in out.splitlines() if ln.startswith(tag)][0]
            kv = dict(tok.split("=", 1) for tok in line.split()[1:])
            results[kv["pid"]] = kv
        assert results["0"]["params"] == results["1"]["params"], (tag, results)
        assert results["0"]["loss"] == results["1"]["loss"], (tag, results)
        assert results["0"]["reward"] == results["1"]["reward"], (tag, results)
