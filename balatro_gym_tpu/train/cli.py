"""Training CLI — the L6 tooling layer.

Replaces the reference's script zoo (train_balatro_agent.py, hpc_train.py,
train_balatro_fixed.py, train_progressive.py, robust_training.py) with one
entry point over the on-device PPO learner:

* ``--env sim|full`` picks the single-blind engine or the flagship env.
* ``--n-envs/--rollout/--updates`` control scale (the reference's 16-128
  SubprocVecEnv workers become vmapped env lanes — thousands per chip).
* ``--distributed`` shards envs over all visible devices (shard_map DP,
  pmean gradients) — the TPU equivalent of hpc_train's single-GPU SLURM run.
* Checkpointing via orbax (reference: SB3 CheckpointCallback,
  hpc_train.py:101-152); metrics go to ``training_summary.json``
  (hpc_train.py:155-167) and optional W&B if installed (train_balatro_agent
  .py:285-296 — gated, never required).
* ``--progressive`` adds the ProgressionRewardWrapper-style ante bonuses
  (train_progressive.py:21-120) on the host metric side.

Usage: python -m balatro_gym_tpu.train.cli --env sim --updates 50
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import numpy as np



def _enable_compile_cache():
    """Persist XLA compiles across processes (full-env programs take minutes
    to compile on TPU; the cache makes reruns start in seconds)."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native Balatro trainer")
    p.add_argument("--algorithm", choices=["ppo", "a2c", "dqn"], default="ppo",
                   help="ppo (default) | a2c | dqn — the reference's three "
                        "algorithms (train_balatro_agent.py --algorithm)")
    p.add_argument("--env", choices=["sim", "full"], default="sim")
    p.add_argument("--updates", type=int, default=50)
    p.add_argument("--n-envs", type=int, default=1024)
    p.add_argument("--rollout", type=int, default=16)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--minibatches", type=int, default=4)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--distributed", action="store_true",
                   help="shard envs over all visible devices (DP)")
    p.add_argument("--checkpoint-dir", type=str, default="")
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--resume", type=str, default="")
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--summary", type=str, default="training_summary.json")
    p.add_argument("--fused-rollout", action="store_true",
                   help="collect rollouts through the single-step fused "
                        "Pallas kernel (full env on TPU only; ~40x the jnp "
                        "collection path)")
    p.add_argument("--structured-net", action="store_true",
                   help="three-branch features extractor (the reference "
                        "BalatroFeaturesExtractor's intent; full env only, "
                        "incompatible with --fused-rollout)")
    p.add_argument("--hidden", type=int, nargs="*", default=None,
                   help="flat-MLP hidden widths (default 256 256)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 matmuls for the policy net (MXU-native; "
                        "params stay f32)")
    p.add_argument("--env-shuffle", action="store_true",
                   help="minibatch mixing via env-axis permutation + "
                        "timestep blocks (O(E) contiguous gather instead of "
                        "the O(B) random-row gather; see PPOConfig)")
    p.add_argument("--ent-final", type=float, default=-1.0,
                   help="linear entropy-coefficient decay target over the "
                        "run (<0 = constant)")
    p.add_argument("--lr-final", type=float, default=-1.0,
                   help="linear lr decay target over the run (<0 = constant)")
    return p


def _save_checkpoint(ckpt_dir: str, step: int, ts) -> None:
    from balatro_gym_tpu.utils.checkpoint import save_train_state

    save_train_state(Path(ckpt_dir) / f"step_{step}", ts)


def main(argv=None) -> dict:
    _enable_compile_cache()
    args = build_parser().parse_args(argv)

    from balatro_gym_tpu.train.ppo import (
        PPOConfig, full_env_hooks, make_ppo, sim_env_hooks)

    hooks = sim_env_hooks() if args.env == "sim" else full_env_hooks()
    cfg = PPOConfig(n_envs=args.n_envs, rollout_len=args.rollout,
                    epochs=args.epochs, minibatches=args.minibatches,
                    lr=args.lr, fused_rollout=args.fused_rollout,
                    structured_net=args.structured_net,
                    bf16_compute=args.bf16, env_shuffle=args.env_shuffle,
                    total_updates=args.updates, ent_coef_final=args.ent_final,
                    lr_final=args.lr_final,
                    **({"hidden": tuple(args.hidden)} if args.hidden else {}))
    if args.fused_rollout and args.env != "full":
        raise SystemExit("--fused-rollout requires --env full")
    if args.structured_net and args.env != "full":
        raise SystemExit("--structured-net requires --env full")

    wandb_run = None
    if args.wandb:
        try:
            import wandb

            wandb_run = wandb.init(project="balatro-tpu", config=vars(args))
        except Exception:
            wandb_run = None  # offline / not installed: train anyway

    import functools

    if args.algorithm == "a2c":
        from balatro_gym_tpu.train.a2c import A2CConfig, make_a2c

        acfg = A2CConfig(n_envs=args.n_envs, rollout_len=args.rollout,
                         lr=args.lr)
        init_fn, update_fn = make_a2c(hooks, acfg)
        step_fn = jax.jit(functools.partial(update_fn, axis_name=None))
    elif args.algorithm == "dqn":
        from balatro_gym_tpu.train.dqn import DQNConfig, make_dqn

        dcfg = DQNConfig(n_envs=args.n_envs, lr=args.lr,
                         steps_per_update=args.rollout)
        init_fn, update_fn = make_dqn(hooks, dcfg)
        step_fn = jax.jit(update_fn)
    elif args.distributed:
        from balatro_gym_tpu.parallel.mesh import make_distributed_ppo, make_mesh

        mesh = make_mesh()
        init_fn, step_fn, _ = make_distributed_ppo(hooks, cfg, mesh)
    else:
        init_fn, update_fn, _ = make_ppo(hooks, cfg)
        step_fn = jax.jit(functools.partial(update_fn, axis_name=None))

    ts = init_fn(jax.random.key(args.seed))
    if args.resume:
        from balatro_gym_tpu.utils.checkpoint import restore_train_state

        ts = restore_train_state(args.resume, ts)
        print(f"resumed from {args.resume} at update {int(ts.update_idx)}",
              flush=True)

    t0 = time.perf_counter()
    history = []
    for i in range(args.updates):
        ts, metrics = step_fn(ts)
        if args.log_every and (i + 1) % args.log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            m["update"] = i + 1
            elapsed = time.perf_counter() - t0
            m["env_steps_per_sec"] = (i + 1) * cfg.n_envs * cfg.rollout_len / elapsed
            history.append(m)
            print(json.dumps(m), flush=True)
            if wandb_run:
                wandb_run.log(m)
        if args.checkpoint_every and args.checkpoint_dir and \
                (i + 1) % args.checkpoint_every == 0:
            _save_checkpoint(args.checkpoint_dir, i + 1, ts)

    jax.block_until_ready(ts.params)
    elapsed = time.perf_counter() - t0
    total_steps = args.updates * cfg.n_envs * cfg.rollout_len
    summary = {
        "algorithm": args.algorithm,
        "env": args.env,
        "total_env_steps": total_steps,
        "wall_seconds": elapsed,
        "steps_per_second": total_steps / elapsed,
        "updates": args.updates,
        "final_metrics": {k: float(v) for k, v in metrics.items()},
        "n_devices": len(jax.devices()) if args.distributed else 1,
    }
    if args.summary:
        Path(args.summary).write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary))
    if wandb_run:
        wandb_run.finish()
    return summary


if __name__ == "__main__":  # pragma: no cover
    main()
