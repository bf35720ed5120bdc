"""Policy evaluation — the reference's trained-agent test path
(train_balatro_agent.py:538-601: run N episodes, report stats, optional
episode transcript instead of video).

Evaluation is vectorized: N episodes run as vmapped envs in one scan; the
transcript option replays one episode host-side through the Gym shell.
"""
from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


def evaluate_policy(policy_fn: Callable, params: Any, hooks, n_episodes: int = 64,
                    max_steps: int = 256, seed: int = 0, greedy: bool = True,
                    obs_stats=None, greedy_antiloop: bool = True,
                    temperature: float = 1.0):
    """Run one episode per env lane; returns aggregate stats.

    policy_fn(params, obs [B,D], mask [B,A]) -> (logits, value).
    obs_stats: pass TrainState.obs_stats when the policy was trained with
    the default observation normalization — eval inputs must match the
    training distribution.

    temperature: decode temperature for ``greedy=False`` — logits are
    divided by it before sampling, interpolating between the training-time
    stochastic policy (1.0) and argmax (→0). The flagship policies are much
    stronger under low-temperature decoding than the sampled eval shows
    (docs/training_summary_progression.json: greedy peak ante 21 vs
    sampled 9.3), so report the temperature next to any eval number.
    Ignored when ``greedy=True``.

    greedy_antiloop: deterministic argmax policies can LIVELOCK on the
    flagship env (e.g. toggling the same card selection forever — the env
    is happy to repeat zero-reward steps indefinitely). When on, each lane
    masks out actions already taken since its last nonzero-reward step, so
    a cycling lane is forced through fresh actions until something scores
    (the mask resets on nonzero reward, episode end, or when every legal
    action has been tried). EVAL-ONLY heuristic, not part of the parity
    contract (PARITY #B13); no effect when ``greedy=False``.
    """
    stats_t = _compiled_eval(policy_fn, hooks, n_episodes, max_steps,
                             greedy, greedy_antiloop, obs_stats is None)(
        params, obs_stats, jnp.asarray(temperature, jnp.float32),
        jnp.asarray(seed, jnp.int32))
    ep_rew, ep_len, done_flag, max_ante, has_ante = stats_t
    stats = {
        "episodes": int(np.sum(np.asarray(done_flag))),
        "mean_reward": float(np.mean(np.asarray(ep_rew))),
        "mean_length": float(np.mean(np.asarray(ep_len))),
        "max_reward": float(np.max(np.asarray(ep_rew))),
    }
    if has_ante:
        stats["mean_ante"] = float(np.mean(np.asarray(max_ante)))
        stats["max_ante"] = int(np.max(np.asarray(max_ante)))
    return stats


@functools.lru_cache(maxsize=64)
def _compiled_eval(policy_fn, hooks, n_episodes, max_steps, greedy,
                   greedy_antiloop, no_stats):
    """One jitted eval program per structural config — seed and decode
    temperature ride as traced arguments, so temperature sweeps and
    re-seeded evals reuse a single compile (each used to pay a full
    re-trace: ~minutes on the flagship env)."""
    from balatro_gym_tpu.train.normalize import normalize

    B = n_episodes
    has_ante = hasattr(jax.eval_shape(hooks.reset, jax.random.key(0)), "ante")
    step_fn = getattr(hooks, "step", None) or hooks.step_autoreset
    n_actions = getattr(hooks, "n_actions", 0) or \
        int(jax.eval_shape(hooks.action_mask,
                           jax.eval_shape(hooks.reset, jax.random.key(0))).shape[-1])

    def run(params, obs_stats, temperature, seed):
        states = jax.vmap(hooks.reset)(
            jax.random.split(jax.random.key(seed), B))

        def body(carry, k):
            sts, ep_rew, ep_len, done_flag, max_ante, used = carry
            obs = jax.vmap(hooks.observe)(sts)
            if not no_stats:
                obs = normalize(obs_stats, obs)
            mask = jax.vmap(hooks.action_mask)(sts)
            logits, _ = policy_fn(params, obs, mask)
            if greedy and greedy_antiloop:
                # Suppress already-tried actions; if that would leave no
                # legal action, fall back to the unsuppressed logits (cycle
                # covered the whole legal set - let it restart).
                blocked = used & mask
                any_free = jnp.any(mask & ~blocked, axis=-1, keepdims=True)
                logits = jnp.where(blocked & any_free, -jnp.inf, logits)
                used = jnp.where(any_free, used, jnp.zeros_like(used))
            if greedy:
                action = jnp.argmax(logits, -1)
            else:
                action = jax.random.categorical(k, logits / temperature)
            sts2, rew, done = jax.vmap(step_fn)(sts, action)
            if greedy and greedy_antiloop:
                used = used | (jnp.arange(n_actions)[None, :] == action[:, None])
                used = jnp.where(((jnp.abs(rew) > 1e-6) | done)[:, None],
                                 False, used)
            live = ~done_flag
            ep_rew = ep_rew + jnp.where(live, rew, 0.0).astype(jnp.float32)
            ep_len = ep_len + live.astype(jnp.int32)
            if has_ante:  # track per-lane peak ante while the episode is
                # live, incl. the post-step state (non-autoreset: terminal-
                # step ante advances are observed too).
                max_ante = jnp.maximum(max_ante, jnp.where(live, sts.ante, 0))
                max_ante = jnp.maximum(max_ante, jnp.where(live, sts2.ante, 0))
            done_flag = done_flag | done
            return (sts2, ep_rew, ep_len, done_flag, max_ante, used), None

        init = (states, jnp.zeros(B, jnp.float32), jnp.zeros(B, jnp.int32),
                jnp.zeros(B, bool), jnp.zeros(B, jnp.int32),
                jnp.zeros((B, n_actions), bool))
        (_, ep_rew, ep_len, done_flag, max_ante, _), _ = jax.lax.scan(
            body, init, jax.random.split(jax.random.key(seed + 1), max_steps))
        return ep_rew, ep_len, done_flag, max_ante

    jitted = jax.jit(run)

    def call(params, obs_stats, temperature, seed):
        out = jitted(params, obs_stats, temperature, seed)
        return (*out, has_ante)

    return call


def transcript_episode(env, select_action, max_steps: int = 200) -> list[str]:
    """Replay one episode through a Gym shell, returning text lines (the
    reference's video path becomes a transcript — no display on TPU hosts)."""
    lines = []
    obs, _ = env.reset()
    total = 0.0
    for t in range(max_steps):
        action = int(select_action(obs))
        obs, r, done, trunc, info = env.step(action)
        total += r
        lines.append(f"t={t} a={action} r={r:+.2f} phase={int(obs['phase'])}"
                     f" ante={int(obs.get('ante', 0))}")
        if done:
            lines.append(f"episode done: total reward {total:.2f}")
            break
    return lines
